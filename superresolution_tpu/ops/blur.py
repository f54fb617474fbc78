"""Fixed (non-learned) smoothing filters.

Re-creates the reference's anti-checkerboard layer semantics (reference:
src/architecture.py:9-27): a depthwise binomial blur with three strengths —
'light' 3x3/16, 'balanced' 5x5/256, 'strong' 7x7/1600 — applied with SAME
(zero) padding per channel. Implemented as a depthwise
lax.conv_general_dilated in NHWC, which XLA maps onto the VPU/MXU directly.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax


@lru_cache(maxsize=None)
def binomial_kernel(size: int, norm: float | None = None) -> np.ndarray:
    """2-D binomial (Pascal) kernel of odd `size`, normalized by `norm`.

    With norm=None, uses the true binomial sum (kernel sums to 1). The
    reference's 'strong' mode divides the 7x7 kernel (sum 4096) by 1600,
    deliberately over-unity; pass norm=1600.0 to match that behavior exactly.
    """
    row = np.array([math.comb(size - 1, k) for k in range(size)], dtype=np.float64)
    k2d = np.outer(row, row)
    k2d /= (norm if norm is not None else k2d.sum())
    return k2d.astype(np.float32)


# Reference-exact (mode -> (size, norm)); 'strong' is intentionally /1600
# like reference src/architecture.py:13 even though the binomial sum is 4096.
_MODES = {"light": (3, 16.0), "balanced": (5, 256.0), "strong": (7, 1600.0)}


@lru_cache(maxsize=None)
def gaussian_kernel_1d(size: int, sigma: float) -> np.ndarray:
    xs = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def depthwise_blur(x: jnp.ndarray, kernel2d, padding: str = "SAME") -> jnp.ndarray:
    """Depthwise 2-D convolution of NHWC `x` with a single shared kernel.

    padding: 'SAME' (reference anti-checkerboard) or 'VALID' (reference SSIM,
    src/metrics.py:14 uses F.conv2d with no padding).
    """
    c = x.shape[-1]
    k = jnp.asarray(kernel2d, dtype=x.dtype)
    kh, kw = k.shape
    # HWIO with feature_group_count=C: [kh, kw, 1, C]
    filt = jnp.broadcast_to(k[:, :, None, None], (kh, kw, 1, c))
    return lax.conv_general_dilated(
        x, filt,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def anti_checkerboard(x: jnp.ndarray, mode: str = "balanced") -> jnp.ndarray:
    """The reference's AntiCheckerboardLayer as a pure function.

    mode in {'light','balanced','strong','none'}.
    """
    if mode in (None, "none"):
        return x
    if mode not in _MODES:
        raise ValueError(f"unknown smoothing mode {mode!r}")
    size, norm = _MODES[mode]
    return depthwise_blur(x, binomial_kernel(size, norm), padding="SAME")
