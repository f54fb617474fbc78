"""VGG19 perceptual (feature-space) loss in flax.

Reference semantics (reference: Backup/src/losses.py:27-59): torchvision
vgg19.features[:18] — i.e. conv1_1 .. relu3_4 — frozen, ImageNet-normalized,
single-channel inputs repeated to 3 channels, L1 in feature space. The
ESRGAN convention (conv5_4 pre-activation) is also supported via `tap`.

Weights: this environment has no torchvision weights and no egress, so
`load_params` reads a converted .npz from SRTPU_VGG19_NPZ (keys
'features.N.weight'/'features.N.bias' in torch OIHW layout) when present;
otherwise a fixed-seed random init is used — a valid (published: "random
VGG" perceptual metrics correlate with trained ones) but clearly-flagged
fallback.
"""

from __future__ import annotations

import os
from functools import lru_cache

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (name, out_channels); 'M' = 2x2 maxpool. Standard VGG19 feature stack.
_VGG19_CFG = [
    ("conv1_1", 64), ("conv1_2", 64), ("M", 0),
    ("conv2_1", 128), ("conv2_2", 128), ("M", 0),
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256), ("M", 0),
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512), ("M", 0),
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("conv5_4", 512),
]

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)

# torchvision features.N index for each conv, for .npz key mapping
_TORCH_IDX = {}
_i = 0
for _name, _c in _VGG19_CFG:
    if _name == "M":
        _i += 1
    else:
        _TORCH_IDX[_name] = _i
        _i += 2  # conv + relu


class VGG19Features(nn.Module):
    """Runs the VGG19 trunk up to `tap` (inclusive, post-ReLU unless
    pre_activation) and returns the feature map. Input NHWC RGB in [0,1]."""

    tap: str = "relu3_4"  # reference cut: features[:18]
    pre_activation: bool = False  # ESRGAN uses conv5_4 before ReLU

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        mean = jnp.asarray(_IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(_IMAGENET_STD, x.dtype)
        x = (jnp.clip(x, 0.0, 1.0) - mean) / std
        target_conv = self.tap.replace("relu", "conv")
        for name, ch in _VGG19_CFG:
            if name == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(ch, (3, 3), padding="SAME", name=name,
                        dtype=x.dtype, param_dtype=jnp.float32)(x)
            if name == target_conv and self.pre_activation:
                return x
            x = nn.relu(x)
            if name == target_conv:
                return x
        raise ValueError(f"unknown tap {self.tap!r}")


@lru_cache(maxsize=None)
def _load_cached(tap: str, pre_activation: bool):
    model = VGG19Features(tap=tap, pre_activation=pre_activation)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    # the cache may be filled from inside a jit trace (e.g. the GAN train
    # step); force concrete param values so no tracer leaks into the cache
    with jax.ensure_compile_time_eval():
        params = model.init(jax.random.key(0), dummy)
    npz_path = os.environ.get("SRTPU_VGG19_NPZ", "")
    pretrained = False
    if npz_path and os.path.exists(npz_path):
        raw = np.load(npz_path)
        loaded = dict(params["params"])
        for name in list(loaded):
            idx = _TORCH_IDX.get(name)
            wkey, bkey = f"features.{idx}.weight", f"features.{idx}.bias"
            if idx is None or wkey not in raw:
                continue
            w = raw[wkey]  # torch OIHW -> flax HWIO
            loaded[name] = {
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                "bias": jnp.asarray(raw[bkey]),
            }
        params = {"params": loaded}
        pretrained = True
    return model, params, pretrained


def perceptual_loss(pred: jnp.ndarray, target: jnp.ndarray,
                    tap: str = "relu3_4",
                    pre_activation: bool = False) -> jnp.ndarray:
    """L1 distance in VGG19 feature space (fp32)."""
    model, params, _ = _load_cached(tap, pre_activation)
    fp = model.apply(params, pred.astype(jnp.float32))
    ft = model.apply(params, target.astype(jnp.float32))
    return jnp.mean(jnp.abs(fp - jax.lax.stop_gradient(ft)))


def has_pretrained_vgg() -> bool:
    return _load_cached("relu3_4", False)[2]
