"""Pallas anti-checkerboard blur — fused depthwise binomial smoothing.

The reference applies its fixed binomial blur three times per hybrid
forward at 256^2/512^2 resolution (reference: src/architecture.py:67-82).
This kernel computes the depthwise SAME-padded blur as a single
VMEM-resident weighted sum of k^2 statically-shifted slices (VPU work, one
HBM read + one write per band).

STATUS: EXPERIMENTAL — exact under the Pallas interpreter
(tests/test_pallas_blur.py); this libtpu's Mosaic rejects it for the
lane-dim widths SR images use ("Slice shape along dimension 3 must be
aligned to tiling (128)" for C in {1,3,8,64}); image-space tensors cannot
reach 128 lanes without 128x waste. The production path remains the XLA
depthwise conv (ops/blur.anti_checkerboard), which fuses fine. The
compiled-and-verified production kernel in this framework is
ops/pallas_loss.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.ops.blur import binomial_kernel


def _kernel(x_hbm, out_ref, band, sem, *, th, s_out, k, coeffs):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(i * th, th + k - 1)], band, sem)
    dma.start()
    dma.wait()
    v = band[:]
    dt = v.dtype
    acc = None
    for dy in range(k):
        for dx in range(k):
            tap = v[dy:dy + th, dx:dx + s_out, :] * jnp.asarray(
                coeffs[dy][dx], dt)
            acc = tap if acc is None else acc + tap
    out_ref[0] = acc.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("mode", "th"))
def anti_checkerboard_pallas(x: jnp.ndarray, mode: str = "balanced",
                             th: int = 64) -> jnp.ndarray:
    """NHWC depthwise binomial blur, reference-exact kernels/normalization
    (ops/blur.anti_checkerboard semantics, zero SAME padding)."""
    from superresolution_tpu.ops.blur import _MODES

    if mode in (None, "none"):
        return x
    size, norm = _MODES[mode]
    k2d = binomial_kernel(size, norm)
    p = size // 2
    b, h, w, c = x.shape
    th = min(th, h)
    while h % th:
        th //= 2
    s_out = -(-w // 8) * 8  # lane-rule: slice sizes 8-aligned on sublanes
    xp = jnp.pad(x, ((0, 0), (p, p), (p, s_out - w + p), (0, 0)))

    out = pl.pallas_call(
        partial(_kernel, th=th, s_out=s_out, k=size,
                coeffs=tuple(map(tuple, k2d.tolist()))),
        grid=(b, h // th),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, th, s_out, c), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, s_out, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + size - 1, s_out + 2 * p, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * size * size * b * h * s_out * c,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0),
    )(xp)
    return out[:, :, :w, :]
