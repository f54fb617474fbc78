"""Pallas TPU kernels for the SR hot paths.

`fused_conv3x3_depth_to_space` fuses the final sub-pixel stage of
ESPCN/FSRCNN/EDSR-style heads: the 3x3 conv that emits C_out*r^2 channels
AND the depth-to-space rearrangement, in one VMEM-resident pass. The conv
is expressed as 9 shifted [TH*W, C_in] x [C_in, C_out*r^2] matmuls (MXU)
accumulated in fp32 scratch; the pixel shuffle happens as a register-level
relayout on the way to the output block, so the (16x larger) HR tensor is
written to HBM exactly once and the C_out*r^2 intermediate never exists in
HBM at all. Input rows stream HBM->VMEM via explicit async DMA with a
row-band grid, giving the double-buffered pipeline shape from the Pallas
guide.

Numerics: accumulation in float32 regardless of input dtype; output cast
to the input dtype. Channel ordering matches ops/pixel_shuffle.py
(torch.PixelShuffle-compatible).

STATUS: EXPERIMENTAL — verified under the Pallas interpreter
(tests/test_pallas.py); the Mosaic compiler on v5e currently rejects the
in-kernel 5-D depth-to-space reshape ("unsupported shape cast:
vector<1024x256> -> vector<8x128x64x2x2>"). The production sub-pixel path
uses ops/pixel_shuffle.py + XLA convs (models/common.PixelShuffleUpsampler),
which XLA fuses into the conv epilogue. Revisit when Mosaic grows
multi-dim reshape support, or restructure with deferred row-interleave.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, out_ref, x_band, sem, *, th, w_len, c_in,
            c_out, r):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    # DMA the (th+2)-row input band (input is pre-padded by 1 on each side);
    # x_hbm is the full unblocked array, indexed explicitly per grid step.
    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(i * th, th + 2)], x_band, sem)
    dma.start()
    dma.wait()

    co_r2 = c_out * r * r
    acc = jnp.zeros((th * w_len, co_r2), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = x_band[dy:dy + th, dx:dx + w_len, :]
            lhs = patch.reshape(th * w_len, c_in)
            acc += jnp.dot(lhs, w_ref[dy * 3 + dx],
                           preferred_element_type=jnp.float32)
    acc += b_ref[:].reshape(1, co_r2)
    # depth-to-space relayout: [th, w, c_out, r, r] -> [th*r, w*r, c_out]
    y = acc.reshape(th, w_len, c_out, r, r)
    y = y.transpose(0, 3, 1, 4, 2)
    out_ref[0] = y.reshape(th * r, w_len * r, c_out).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("r", "th"))
def fused_conv3x3_depth_to_space(x: jnp.ndarray, w: jnp.ndarray,
                                 b: jnp.ndarray, r: int,
                                 th: int = 8) -> jnp.ndarray:
    """x: [B,H,W,C_in]; w: [3,3,C_in,C_out*r^2] (HWIO); b: [C_out*r^2].
    Returns [B, H*r, W*r, C_out]. H must be divisible by `th`."""
    bsz, h, wd, c_in = x.shape
    co_r2 = w.shape[-1]
    if co_r2 % (r * r):
        raise ValueError("w output channels must be divisible by r^2")
    c_out = co_r2 // (r * r)
    if h % th:
        raise ValueError(f"H={h} not divisible by row-band {th}")
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w9 = w.reshape(9, c_in, co_r2)

    grid = (bsz, h // th)
    kern = partial(_kernel, th=th, w_len=wd, c_in=c_in, c_out=c_out, r=r)
    flops = 2 * h * wd * 9 * c_in * co_r2
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th * r, wd * r, c_out),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h * r, wd * r, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wd + 2, c_in), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0),
    )(xp, w9, b)
