"""Exact separable bicubic resize as dense matmuls (MXU-friendly).

Instead of gather-based interpolation (poor TPU fit: dynamic indexing,
scalar-heavy), resize is expressed as two dense weight matrices applied along
H and W: out = W_h @ x @ W_w^T. The matrices are built host-side at trace
time (static shapes), so the whole op is two einsums that XLA tiles onto the
MXU. Supports:

  * a = -0.5 (Keys / MATLAB / PIL convention) with antialiasing — the
    standard-SR degradation convention for Set5/Set14/DIV2K evaluation;
  * a = -0.75 without antialias — torch.nn.functional.interpolate
    'bicubic', align_corners=False — for parity with the reference's
    output-resize (reference: src/architecture.py:81, scripts/Modello_5.py:83).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def cubic_kernel(t: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic convolution kernel with free parameter `a`."""
    t = np.abs(t)
    t2, t3 = t * t, t * t * t
    out = np.where(
        t <= 1.0,
        (a + 2.0) * t3 - (a + 3.0) * t2 + 1.0,
        np.where(t < 2.0, a * t3 - 5.0 * a * t2 + 8.0 * a * t - 4.0 * a, 0.0),
    )
    return out


@lru_cache(maxsize=None)
def _resize_matrix(n_in: int, n_out: int, a: float, antialias: bool,
                   border: str = "replicate") -> np.ndarray:
    """Dense [n_out, n_in] bicubic interpolation matrix, align_corners=False,
    rows normalized to sum 1.

    border='replicate': out-of-range taps clamp to the edge pixel (torch
    F.interpolate non-aa convention; also seam-friendly for tiling).
    border='renorm': out-of-range taps are dropped and the remaining window
    renormalized (PIL / torch antialias=True convention).
    """
    scale = n_in / n_out
    # antialias only matters when downscaling
    s = max(scale, 1.0) if antialias else 1.0
    support = 2.0 * s
    out_coords = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
    w = np.zeros((n_out, n_in), dtype=np.float64)
    for o, c in enumerate(out_coords):
        lo = int(np.floor(c - support)) + 1
        hi = int(np.ceil(c + support))
        taps = np.arange(lo, hi + 1)
        vals = cubic_kernel((taps - c) / s, a)
        if border == "renorm":
            keep = (taps >= 0) & (taps < n_in)
            taps, vals = taps[keep], vals[keep]
        idx = np.clip(taps, 0, n_in - 1)
        np.add.at(w[o], idx, vals)
        ssum = w[o].sum()
        if ssum != 0.0:
            w[o] /= ssum
    return w.astype(np.float32)


def resize_bicubic(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    a: float = -0.5,
    antialias: bool = True,
    border: str = "replicate",
) -> jnp.ndarray:
    """Bicubic resize of NHWC (or HWC) `x` to spatial size `out_hw`."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = x.shape
    oh, ow = out_hw
    dt = x.dtype
    xf = x.astype(jnp.float32)
    if oh != h:
        wh = jnp.asarray(_resize_matrix(h, oh, a, antialias, border))
        xf = jnp.einsum("oh,bhwc->bowc", wh, xf, precision="highest")
    if ow != w:
        ww = jnp.asarray(_resize_matrix(w, ow, a, antialias, border))
        xf = jnp.einsum("ow,bhwc->bhoc", ww, xf, precision="highest")
    out = xf.astype(dt)
    return out[0] if squeeze else out


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize of NHWC (or HWC) `x` (preview strips;
    reference: scripts/Modello_5.py:83 upsamples LR with mode='nearest')."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = x.shape
    oh, ow = out_hw
    rows = jnp.clip((jnp.arange(oh) * h) // oh, 0, h - 1)
    cols = jnp.clip((jnp.arange(ow) * w) // ow, 0, w - 1)
    out = x[:, rows][:, :, cols]
    return out[0] if squeeze else out
