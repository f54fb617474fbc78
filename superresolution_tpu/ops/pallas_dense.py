"""Pallas fused dense-block kernel for the RRDB trunk hot path.

One kernel application computes a COMPLETE fused-projection dense block
(models/rrdbnet.py FusedDenseBlock: 5 chained 3x3 convs with dense
connectivity, LeakyReLU(0.2), residual scale 0.2) for a row band of one
batch element, entirely in VMEM:

  * the input band streams HBM->VMEM once per grid step (halo 5 covers the
    whole 5-conv chain); the four intermediate feature maps never touch
    HBM;
  * every conv is an im2col matmul: the 9 taps are staged into a VMEM
    scratch so the contraction dim becomes K = 9*C_in (576 first conv /
    288 growth convs) instead of the 64/32 that caps the XLA conv path at
    ~21% MFU on v5e.

Mosaic constraints shaped the layout (found by probing the compiler):
slice SIZES along the sublane (width) dim must be 8-aligned; vector
concats of shifted slices and lane-split reshapes are unsupported; rolls
must have non-negative shifts and 32-bit data (bf16 goes through an int32
lane-pair bitcast). Hence every stage keeps ONE constant 8-aligned width
`s`: column taps come from positive rolls (wrap garbage enters only the
outermost column per stage and the final crop discards a >=5-column
margin), row taps are plain slices (the row dim has no alignment rule)
shrinking 2 rows per stage.

STATUS: EXPERIMENTAL — exact under the Pallas interpreter
(tests/test_pallas_dense.py) but still rejected by this libtpu's Mosaic:
the remaining blocker is the im2col staging store
`cols_ref[:, t*cin:(t+1)*cin] = tap`, which needs LANE-dim slices of
width 64/32 ("Slice shape along dimension 3 must be aligned to tiling
(128)"). Padding each tap to 128 lanes fits the rule but costs 2-4x MACs
on zero rows and blows VMEM, erasing the K-packing gain. The production
trunk therefore stays on the XLA conv path (~36-42 TF/s at batch >= 15);
revisit when Mosaic lifts the lane-slice alignment restriction.

Boundary semantics: input zero-padded once, valid chain — identical to
SAME convs except within 5 px of the border (the halo-tiling contract;
use halo >= 5 per block when tiling).

Weight layout: [9*C_in, C_out] tap-major from `pack_fused_weights`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lrelu(v):
    return jnp.where(v >= 0, v, 0.2 * v)


def _roll_cols(v, shift: int):
    """Positive roll along dim 1 (columns/sublanes). Mosaic's rotate only
    supports 32-bit data, so bf16 lane-pairs are bitcast through int32 —
    the column roll does not mix lanes, so packing is transparent."""
    if shift == 0:
        return v
    if v.dtype == jnp.bfloat16 and v.shape[-1] % 2 == 0:
        vi = pltpu.bitcast(v, jnp.int32)
        vi = pltpu.roll(vi, shift, 1)
        return pltpu.bitcast(vi, jnp.bfloat16)
    return pltpu.roll(v, shift, 1)


def _conv_stage(src, rows_out, s, cin, w_ref, cols_ref):
    """3x3 conv at constant width `s` with centered taps.

    src: [rows_out+2, s, cin] value. Output [rows_out, s, cout_f32]:
    out[r, j] = sum_{dy,dx} w[dy,dx] * src[r+dy, j+dx-1]  (column via roll).
    """
    m = rows_out * s
    for t, (dy, dx) in enumerate([(y, x) for y in range(3) for x in range(3)]):
        rs = src[dy:dy + rows_out, :, :]
        shift = (1 - dx) % s  # dx-1 column offset as a positive roll
        tap = _roll_cols(rs, shift)
        cols_ref[0:m, t * cin:(t + 1) * cin] = tap.reshape(m, cin)
    return jnp.dot(cols_ref[0:m, 0:9 * cin], w_ref[:],
                   preferred_element_type=jnp.float32)


def _kernel(x_hbm, wx_ref, w1_ref, w2_ref, w3_ref, w4_ref, b_ref, out_ref,
            x_band, cols_ref, sem, *, th, w_len, s, c, g):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(i * th, th + 10)], x_band, sem)
    dma.start()
    dma.wait()
    xb = x_band[:]  # [th+10, s, c]; image col p at buffer col p+5
    dt = xb.dtype
    co_px = 4 * g + c

    r1 = th + 8
    px = _conv_stage(xb, r1, s, c, wx_ref, cols_ref)
    px = (px + b_ref[:].reshape(1, co_px)).reshape(r1, s, co_px).astype(dt)

    y1 = _lrelu(px[..., :g])
    r2 = th + 6
    p1 = _conv_stage(y1, r2, s, g, w1_ref,
                     cols_ref).reshape(r2, s, 3 * g + c).astype(dt)

    y2 = _lrelu(px[1:1 + r2, :, g:2 * g] + p1[..., :g])
    r3 = th + 4
    p2 = _conv_stage(y2, r3, s, g, w2_ref,
                     cols_ref).reshape(r3, s, 2 * g + c).astype(dt)

    y3 = _lrelu(px[2:2 + r3, :, 2 * g:3 * g]
                + p1[1:1 + r3, :, g:2 * g] + p2[..., :g])
    r4 = th + 2
    p3 = _conv_stage(y3, r4, s, g, w3_ref,
                     cols_ref).reshape(r4, s, g + c).astype(dt)

    y4 = _lrelu(px[3:3 + r4, :, 3 * g:4 * g]
                + p1[2:2 + r4, :, 2 * g:3 * g]
                + p2[1:1 + r4, :, g:2 * g] + p3[..., :g])
    r5 = th
    p4 = _conv_stage(y4, r5, s, g, w4_ref,
                     cols_ref).reshape(r5, s, c).astype(dt)

    acc = (px[4:4 + r5, :, 4 * g:]
           + p1[3:3 + r5, :, 3 * g:]
           + p2[2:2 + r5, :, 2 * g:]
           + p3[1:1 + r5, :, g:]
           + p4)
    center = xb[5:5 + r5, :, :]
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
    s = -(-(wd + 10) // 8) * 8  # constant 8-aligned stage width
    xp = jnp.pad(x, ((0, 0), (5, 5), (5, s - wd - 5), (0, 0)))

    grid = (bsz, h // th)
    kern = partial(_kernel, th=th, w_len=wd, s=s, c=c, g=g)
    macs = (9 * c * (4 * g + c) + 9 * g * (3 * g + c) + 9 * g * (2 * g + c)
            + 9 * g * (g + c) + 9 * g * c) * h * s * bsz
    max_m = (th + 8) * s
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((1, th, s, c), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, s, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 10, s, c), x.dtype),
            pltpu.VMEM((max_m, 9 * c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * macs, bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0),
    )(xp, wx, w1, w2, w3, w4, bias)
    return out[:, :, 5:5 + wd, :]


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
