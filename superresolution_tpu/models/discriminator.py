"""VGG-style discriminator for ESRGAN GAN training (BASELINE config 5).

TPU-first deviation: BatchNorm (used by the original ESRGAN discriminator)
is replaced with GroupNorm — identical capacity, but no cross-replica
batch-stat sync on the data-parallel mesh and no train/eval mode split in
the train state.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from superresolution_tpu.models.common import lrelu, msra_init


class VGGStyleDiscriminator(nn.Module):
    in_channels: int = 3
    features: int = 64
    # the flattened Dense head sizes itself to the first input; this
    # declares (and enforces) the intended HR patch size so a mismatch
    # errors loudly instead of silently creating a different Dense kernel
    input_size: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.input_size and x.shape[1] != self.input_size:
            raise ValueError(
                f"discriminator built for {self.input_size}^2 inputs, got"
                f" {x.shape[1]}x{x.shape[2]}")
        f = self.features

        def block(x, feats, stride, norm=True):
            x = nn.Conv(feats, (3, 3) if stride == 1 else (4, 4),
                        strides=(stride, stride), padding="SAME",
                        use_bias=not norm, kernel_init=msra_init(),
                        dtype=x.dtype, param_dtype=jnp.float32)(x)
            if norm:
                x = nn.GroupNorm(num_groups=min(32, feats),
                                 dtype=x.dtype, param_dtype=jnp.float32)(x)
            return lrelu(x)

        x = block(x, f, 1, norm=False)
        x = block(x, f, 2)
        for mult in (2, 4, 8, 8):
            x = block(x, f * mult, 1)
            x = block(x, f * mult, 2)
        x = x.reshape(x.shape[0], -1)
        x = lrelu(nn.Dense(100, dtype=x.dtype, param_dtype=jnp.float32)(x))
        return nn.Dense(1, dtype=x.dtype, param_dtype=jnp.float32)(x)
