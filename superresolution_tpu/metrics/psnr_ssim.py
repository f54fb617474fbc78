"""PSNR / SSIM with reference-exact semantics.

Two SSIM variants are provided:

  * `ssim_reference` — bit-parity with the reference implementation
    (reference: src/metrics.py:5-19): 11x11 Gaussian window (sigma 1.5),
    *VALID* convolution (no padding), C1=0.01^2, C2=0.03^2, mean over the
    whole batch. Used for parity numbers against the reference.
  * `ssim` — the standard per-image SSIM (same window/constants, valid conv,
    per-image mean) used for literature-comparable Set5/Set14 numbers.

PSNR follows the reference exactly (reference: src/metrics.py:24-30):
inputs clamped to [0,1], per-image MSE over CHW, 10*log10(1/(mse+1e-8)).
All metric math runs in float32 regardless of the training compute dtype
(the analog of the reference's `.float()` before metric update,
scripts/Modello_supporto.py:167).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from jax import lax


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.array(
        [math.exp(-((x - size // 2) ** 2) / (2.0 * sigma**2)) for x in range(size)],
        dtype=np.float64,
    )
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


_WIN = _gaussian_window()


def _valid_depthwise(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    c = x.shape[-1]
    filt = jnp.broadcast_to(win[:, :, None, None], (*win.shape, 1, c)).astype(x.dtype)
    return lax.conv_general_dilated(
        x, filt, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _ssim_map(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    win = jnp.asarray(_WIN)
    mu1 = _valid_depthwise(img1, win)
    mu2 = _valid_depthwise(img2, win)
    s1 = _valid_depthwise(img1 * img1, win) - mu1 * mu1
    s2 = _valid_depthwise(img2 * img2, win) - mu2 * mu2
    s12 = _valid_depthwise(img1 * img2, win) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    return ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2))


def ssim_reference(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Scalar SSIM, mean over the whole NHWC batch (reference semantics)."""
    return jnp.mean(_ssim_map(img1.astype(jnp.float32), img2.astype(jnp.float32)))


def ssim(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-image SSIM over NHWC inputs -> [B]."""
    m = _ssim_map(img1.astype(jnp.float32), img2.astype(jnp.float32))
    return jnp.mean(m, axis=(1, 2, 3))


def psnr(pred: jnp.ndarray, target: jnp.ndarray, clamp: bool = True) -> jnp.ndarray:
    """Per-image PSNR over NHWC inputs in [0,1] -> [B] (reference semantics)."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    if clamp:
        p = jnp.clip(p, 0.0, 1.0)
        t = jnp.clip(t, 0.0, 1.0)
    mse = jnp.mean((p - t) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(1.0 / (mse + 1e-8))


class Metrics:
    """Running-mean PSNR/SSIM accumulator (reference: src/metrics.py:21-35).

    update() takes NHWC device arrays; accumulation happens host-side in
    float64 so long eval runs don't drift.
    """

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self._psnr = 0.0
        self._ssim = 0.0
        self._count = 0

    def update(self, pred, target) -> None:
        n = int(pred.shape[0])
        self._psnr += float(jnp.sum(psnr(pred, target)))
        # reference weights the batch-mean SSIM by batch size
        self._ssim += float(ssim_reference(jnp.clip(pred, 0, 1),
                                           jnp.clip(target, 0, 1))) * n
        self._count += n

    def update_sums(self, psnr_sum: float, ssim_sum: float, n: float) -> None:
        """Accumulate pre-computed (masked) per-image sums — the path used
        by jitted eval steps so only scalars cross the device boundary."""
        self._psnr += psnr_sum
        self._ssim += ssim_sum
        self._count += n

    def compute(self) -> dict[str, float]:
        if not self._count:
            return {"psnr": 0.0, "ssim": 0.0}
        return {"psnr": self._psnr / self._count, "ssim": self._ssim / self._count}
