"""Pallas fused dense-block kernel for the RRDB trunk hot path.

One kernel application computes a COMPLETE fused-projection dense block
(models/rrdbnet.py FusedDenseBlock: 5 chained 3x3 convs with dense
connectivity, LeakyReLU(0.2), residual scale 0.2) for a row band of one
batch element, entirely in VMEM:

  * the input band streams HBM->VMEM once per grid step (halo 5 covers the
    whole 5-conv chain) and the output is written once — the four
    intermediate feature maps never touch HBM;
  * every conv is an im2col matmul: the 9 taps are staged into an aligned
    VMEM scratch (Mosaic cannot concatenate shifted slices directly) so
    the contraction dim becomes K = 9*C_in = 576 (first conv) / 288
    (growth convs) instead of the 64/32 that caps the XLA conv path at
    ~21% MFU on v5e;
  * accumulation in fp32 on the MXU, bf16 storage (XLA-path parity).

Boundary semantics: the input is zero-padded by 5 once and the 5 convs run
valid — identical to SAME-conv output except within 5 px of the image
border (the halo-tiling contract; use halo >= 5*n_blocks when tiling).

Weight layout: [9*C_in, C_out], tap-major (kernel positions (dy,dx) in
raster order), from `pack_fused_weights`.

STATUS: EXPERIMENTAL — correct under the Pallas interpreter (see
tests/test_pallas_dense.py) but rejected by the Mosaic compiler on v5e:
the shrinking per-stage regions produce (a) vector concats of shifted
slices with mismatched layouts and (b) memref slices whose sublane sizes
are not 8-aligned ("Slice shape along dimension 2 must be aligned to
tiling (8)"). Uniform-region variants fix alignment but either blow the
VMEM budget (the 9x im2col buffer) or pay >1.5x halo recompute, erasing
the MXU-utilization gain. The production trunk therefore uses the XLA
conv path (models/rrdbnet.py FusedDenseBlock, ~36-42 TF/s on v5e at batch
>= 15); revisit when Mosaic supports unaligned slicing or a native
conv primitive.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lrelu(v):
    return jnp.where(v >= 0, v, 0.2 * v)


def _conv_im2col(src, rows, cols_, cin, w_ref, cols_ref, out_dtype):
    """src: [rows+2, cols_+2, cin] value. Stages 9 shifted taps into
    `cols_ref` ([max_rows, 9*max_cin] scratch) and runs one matmul."""
    m = rows * cols_
    for t, (dy, dx) in enumerate([(y, x) for y in range(3) for x in range(3)]):
        tap = src[dy:dy + rows, dx:dx + cols_, :].reshape(m, cin)
        cols_ref[0:m, t * cin:(t + 1) * cin] = tap
    acc = jnp.dot(cols_ref[0:m, 0:9 * cin], w_ref[:],
                  preferred_element_type=jnp.float32)
    return acc.astype(out_dtype)


def _kernel(x_hbm, wx_ref, w1_ref, w2_ref, w3_ref, w4_ref, b_ref, out_ref,
            x_band, cols_ref, sem, *, th, w_len, c, g):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    # input pre-padded by 5 on each spatial side; band needs th + 10 rows
    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(i * th, th + 10)], x_band, sem)
    dma.start()
    dma.wait()
    xb = x_band[:]  # [th+10, w+10, c]
    dt = xb.dtype
    co_px = 4 * g + c

    # px over region radius 4: [th+8, w+8]
    r1, c1 = th + 8, w_len + 8
    px = _conv_im2col(xb, r1, c1, c, wx_ref, cols_ref, jnp.float32)
    px = (px + b_ref[:].reshape(1, co_px)).reshape(r1, c1, co_px).astype(dt)

    y1 = _lrelu(px[..., :g])
    r2, c2 = th + 6, w_len + 6
    p1 = _conv_im2col(y1, r2, c2, g, w1_ref, cols_ref,
                      dt).reshape(r2, c2, 3 * g + c)

    # px has radius 4; each later map has radius one less -> slice offsets
    y2 = _lrelu(px[1:1 + r2, 1:1 + c2, g:2 * g] + p1[..., :g])
    r3, c3 = th + 4, w_len + 4
    p2 = _conv_im2col(y2, r3, c3, g, w2_ref, cols_ref,
                      dt).reshape(r3, c3, 2 * g + c)

    y3 = _lrelu(px[2:2 + r3, 2:2 + c3, 2 * g:3 * g]
                + p1[1:1 + r3, 1:1 + c3, g:2 * g]
                + p2[..., :g])
    r4, c4 = th + 2, w_len + 2
    p3 = _conv_im2col(y3, r4, c4, g, w3_ref, cols_ref,
                      dt).reshape(r4, c4, g + c)

    y4 = _lrelu(px[3:3 + r4, 3:3 + c4, 3 * g:4 * g]
                + p1[2:2 + r4, 2:2 + c4, 2 * g:3 * g]
                + p2[1:1 + r4, 1:1 + c4, g:2 * g]
                + p3[..., :g])
    r5, c5 = th, w_len
    p4 = _conv_im2col(y4, r5, c5, g, w4_ref, cols_ref,
                      dt).reshape(r5, c5, c)

    acc = (px[4:4 + r5, 4:4 + c5, 4 * g:]
           + p1[3:3 + r5, 3:3 + c5, 3 * g:]
           + p2[2:2 + r5, 2:2 + c5, 2 * g:]
           + p3[1:1 + r5, 1:1 + c5, g:]
           + p4)
    center = xb[5:5 + r5, 5:5 + c5, :]
    out_ref[0] = (center + jnp.asarray(0.2, dt) * acc).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("th",))
def fused_dense_block_pallas(x: jnp.ndarray, wx, w1, w2, w3, w4, bias,
                             th: int = 8) -> jnp.ndarray:
    """x: [B, H, W, C]; weights in [9*C_in, C_out] tap-major layout.
    Returns the FusedDenseBlock output [B, H, W, C]. H % th == 0."""
    bsz, h, wd, c = x.shape
    g = (wx.shape[-1] - c) // 4
    if h % th:
        raise ValueError(f"H={h} not divisible by th={th}")
    xp = jnp.pad(x, ((0, 0), (5, 5), (5, 5), (0, 0)))

    grid = (bsz, h // th)
    kern = partial(_kernel, th=th, w_len=wd, c=c, g=g)
    macs = (9 * c * (4 * g + c) + 9 * g * (3 * g + c) + 9 * g * (2 * g + c)
            + 9 * g * (g + c) + 9 * g * c) * h * wd * bsz
    max_m = (th + 8) * (wd + 8)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((1, th, wd, c), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 10, wd + 10, c), x.dtype),
            pltpu.VMEM((max_m, 9 * c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * macs, bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0),
    )(xp, wx, w1, w2, w3, w4, bias)


def pack_fused_weights(params: dict, c: int, g: int):
    """FusedDenseBlock param subtree (HWIO kernels) -> tap-major matmul
    weights for the Pallas kernel."""
    import numpy as np

    def to_mat(k):  # [3,3,cin,cout] -> [9*cin, cout]
        k = np.asarray(k)
        return k.reshape(9 * k.shape[2], k.shape[3])

    wx = to_mat(params["Conv_0"]["Conv_0"]["kernel"])
    bias = np.asarray(params["Conv_0"]["Conv_0"]["bias"])
    w1 = to_mat(params["proj_y1"]["kernel"])
    w2 = to_mat(params["proj_y2"]["kernel"])
    w3 = to_mat(params["proj_y3"]["kernel"])
    w4 = to_mat(params["proj_y4"]["kernel"])
    return wx, w1, w2, w3, w4, bias
