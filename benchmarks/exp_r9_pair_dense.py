"""exp r9 — pair-packed (2-column-phase) dense-block kernel: A WASH.

Measured on chip at matched width (wp=288, rb=94, 24-tile bench batch):
pair 23.84 ms vs roll 23.94 ms per dense block — and the pair form
needs wp % 32 (272 -> 288, +6% tokens), so the production kernel stays
the roll-conv form in ops/pallas_dense_trunk.py. Together with the
im2col-9 rebuild (exp_r7) this is the THIRD dot reshaping to land at
the same cost: the block is bound by per-element VPU machinery +
pipeline, not MXU dot shapes (BENCHMARKS.md 'Round-5 trunk').

The design (kept for the record): [B,H,Wp,C] -> [B,H,Wp/2,2C] is a
FREE row-major reshape; each conv becomes ONE full-MXU-fill dot
(K = 12*cin = 3 dy x 4 column-phase variants, 9*cin useful; N = 2*n)
with slot-interleaved output columns so every cascade slice stays
64-lane aligned, and the f32 output rolls become bf16 input-slab
shifts. Alignment rules it surfaced: Mosaic rejects lane-concat of
slabs whose SUBLANE offsets differ (any row-offset slice at a
non-multiple-of-16 flat-token base — hence wp % 32), while lane
offset 64 inside a 128-lane register is fine on the concat dim.

Usage: python benchmarks/exp_r9_pair_dense.py          (interpret check)
       python benchmarks/exp_r9_pair_dense.py --chip   (+ on-chip timing)
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.ops.pallas_dense_trunk import (  # noqa: E402
    HALO,
    PAD,
    _lrelu,
    fused_dense_block,
    pick_rb,
    proj_weights,
)
from superresolution_tpu.ops.pallas_windows import (  # noqa: E402
    const_spec,
    edge_windows,
    window_specs,
)

def pack_width_pair(width: int) -> int:
    """Padded width for the pair-packed kernel: multiple of 32 so the
    2-phase view's row stride wp/2 stays sublane-tile aligned."""
    return -(-(width + 2 * PAD) // 32) * 32


def pack_pair(x: jnp.ndarray) -> jnp.ndarray:
    wp = pack_width_pair(x.shape[2])
    return jnp.pad(x, ((0, 0), (0, 0), (PAD, wp - x.shape[2] - PAD),
                       (0, 0)))




# ---------------------------------------------------------------------------
# Pair-packed (2-column-phase) variant.
#
# [B,H,Wp,C] -> [B,H,Wp/2,2C] is a FREE reshape (row-major layout is
# identical), and in the packed space every conv becomes ONE dot in the
# full-MXU-fill shape class: K = 12*cin (3 dy x 4 column-phase
# variants; 9*cin useful -> 1.33x pad), N = 2*n (px conv [m,768]@
# [768,384], p_i convs [m,384]@[384, 320/256/192/128]) — versus the
# roll-conv form's 15 partial-fill dots (K=96/192, N=64..192) plus 10
# f32 output rolls. The dx=+-1 taps become two bf16 input-slab shifts
# per conv (the (p1,-1) and (p0,+1) variants); phase mixing is encoded
# in the weight columns. Output channels are SLOT-interLEAVED
# ([p0 slot | p1 slot] per g/c-sized slot) so every cascade slice and
# the residual stay 64-lane-aligned contiguous slabs, and the final
# c-slot pair IS the free-reshape output layout.
# ---------------------------------------------------------------------------

# column-phase variants in lhs slab order: (input phase, token shift)
V2 = ((1, -1), (0, 0), (1, 0), (0, 1))


def pair_weights(dense_params, dtype=jnp.bfloat16):
    """FusedDenseBlock param subtree -> pair-kernel weight list
    [W_px, bias_px, W_1, W_2, W_3, W_4]; W_j = [12*cin, 2*n] with V2
    variant row blocks and slot-interleaved columns."""
    px = dense_params["Conv_0"]["Conv_0"]
    kernels = [np.asarray(px["kernel"], np.float32)]
    for i in range(1, 5):
        kernels.append(np.asarray(dense_params[f"proj_y{i}"]["kernel"],
                                  np.float32))
    c = kernels[0].shape[2]
    g = (kernels[0].shape[3] - c) // 4
    out = []
    for j, k in enumerate(kernels):
        cin, n = k.shape[2], k.shape[3]
        sizes = [g] * (4 - j) + [c]
        offs = np.cumsum([0] + sizes[:-1])
        w = np.zeros((12 * cin, 2 * n), np.float32)
        for dyi in range(3):
            for vi, (ph, dt) in enumerate(V2):
                r0 = (dyi * 4 + vi) * cin
                for q in (0, 1):
                    dx = ph + 2 * dt - q
                    if dx not in (-1, 0, 1):
                        continue
                    for o, s in zip(offs, sizes):
                        w[r0:r0 + cin, 2 * o + q * s:2 * o + (q + 1) * s] \
                            = k[dyi, dx + 1, :, o:o + s]
        out.append(jnp.asarray(w, dtype))
        if j == 0:
            b = np.asarray(px["bias"], np.float32)
            bp = np.zeros(2 * n, np.float32)
            for o, s in zip(offs, sizes):
                for q in (0, 1):
                    bp[2 * o + q * s:2 * o + (q + 1) * s] = b[o:o + s]
            out.insert(1, jnp.asarray(bp.reshape(1, 2 * n), jnp.float32))
    return out


def _kernel_pair(top_ref, mid_ref, bot_ref, w_px, bias_px, w_1, w_2,
                 w_3, w_4, out_ref, *, rb, wp2, width, nb, h_img, g, c):
    row_start = (pl.program_id(0) % nb) * rb
    pad2 = PAD // 2
    c2 = 2 * c
    top = top_ref[0].reshape(HALO * wp2, c2)
    mid = mid_ref[0].reshape(rb * wp2, c2)
    bot = bot_ref[0].reshape(HALO * wp2, c2)
    xf = jnp.concatenate([top, mid, bot], axis=0)

    def rconv2(u, w, cin, mask_k, bias=None):
        # lhs pieces per dy are [sm | u | sp]: the (0,0)/(1,0) variants
        # are u itself (128-lane aligned); wp2 must be a multiple of 16
        # so the dy row-offset slices stay sublane-tile aligned (Mosaic
        # rejects concat inputs with mismatched sublane offsets)
        mu = u.shape[0]
        mo = mu - 2 * wp2
        p0 = u[:, :cin]
        p1 = u[:, cin:]
        sm = jnp.concatenate([p1[mu - 1:], p1[:mu - 1]], axis=0)
        sp = jnp.concatenate([p0[1:], p0[:1]], axis=0)
        slabs = []
        for dyo in (0, 1, 2):
            base = dyo * wp2
            slabs += [sm[base:base + mo], u[base:base + mo],
                      sp[base:base + mo]]
        lhs = jnp.concatenate(slabs, axis=1)
        acc = jnp.dot(lhs, w[:], preferred_element_type=jnp.float32)
        if bias is not None:
            acc = acc + bias[:]
        out = acc.astype(u.dtype)
        rows = mo // wp2
        n = out.shape[1]
        o2 = out.reshape(rows, wp2, n)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, wp2, 1), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
        r_img = row + (row_start - HALO + mask_k)
        ok = ((col >= pad2) & (col < pad2 + width // 2)
              & (r_img >= 0) & (r_img < h_img))
        o2 = jnp.where(ok, o2, jnp.asarray(0, o2.dtype))
        return o2.reshape(mo, n)

    px = rconv2(xf, w_px, c, 1, bias_px)
    ps = []
    ys = [_lrelu(px[:, 0:2 * g])]
    pw = (w_1, w_2, w_3, w_4)
    for i in range(1, 5):
        p_i = rconv2(ys[-1], pw[i - 1], g, i + 1)
        ps.append(p_i)
        m = p_i.shape[0]
        if i < 4:
            pre = px[i * wp2:i * wp2 + m, 2 * i * g:2 * (i + 1) * g]
            for j in range(1, i + 1):
                pre = pre + ps[j - 1][(i - j) * wp2:(i - j) * wp2 + m,
                                      2 * (i - j) * g:
                                      2 * (i - j + 1) * g]
            ys.append(_lrelu(pre))
    mo = ps[-1].shape[0]
    acc = px[4 * wp2:4 * wp2 + mo, 8 * g:8 * g + 2 * c]
    for j in range(1, 5):
        acc = acc + ps[j - 1][(4 - j) * wp2:(4 - j) * wp2 + mo,
                              2 * (4 - j) * g:2 * (4 - j) * g + 2 * c]
    xc = xf[HALO * wp2:HALO * wp2 + mo]
    out = xc + acc * jnp.asarray(0.2, xc.dtype)
    out_ref[0] = out.reshape(rb, wp2, c2)


def fused_dense_block_pair(xp, weights, *, width, rb=None,
                           interpret=False):
    """Pair-packed dense block WITH its residual on packed input.

    Same contract as fused_dense_block (xp [B, H, Wp, C]); requires
    even `width` (the 2-phase view needs whole token pairs — PAD is
    even by construction) and Wp a multiple of 32, so the packed-view
    row stride wp2 stays a multiple of the 16-row bf16 sublane tile
    (use `pack_pair`). weights: list from `pair_weights`.
    """
    b, h, wp, c = xp.shape
    assert width % 2 == 0 and wp % 32 == 0
    wp2 = wp // 2
    g = weights[2].shape[0] // 12  # W_1 is [12g, ...]
    if rb is None:
        rb = pick_rb(h, wp)
    nb = h // rb
    x2 = xp.reshape(b, h, wp2, 2 * c)  # free: row-major relabel
    xh = jnp.pad(x2, ((0, 0), (HALO, HALO), (0, 0), (0, 0)))
    mid = xh[:, HALO:HALO + h].reshape(b * nb, rb, wp2, 2 * c)
    tops = jnp.stack([xh[:, i * rb:i * rb + HALO] for i in range(nb)],
                     axis=1).reshape(b * nb, HALO, wp2, 2 * c)
    bots = jnp.stack(
        [xh[:, HALO + (i + 1) * rb:2 * HALO + (i + 1) * rb]
         for i in range(nb)], axis=1).reshape(b * nb, HALO, wp2, 2 * c)
    spec_mid = pl.BlockSpec((1, rb, wp2, 2 * c), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_edge = pl.BlockSpec((1, HALO, wp2, 2 * c),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)

    def cw(t):
        return pl.BlockSpec(t.shape, lambda i: (0,) * t.ndim,
                            memory_space=pltpu.VMEM)

    def kernel(*refs):
        *ins, out = refs
        _kernel_pair(*ins, out, rb=rb, wp2=wp2, width=width, nb=nb,
                     h_img=h, g=g, c=c)

    out = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        grid=(b * nb,),
        in_specs=[spec_edge, spec_mid, spec_edge]
        + [cw(t) for t in weights],
        out_specs=spec_mid,
        out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp2, 2 * c),
                                       xp.dtype),
        interpret=interpret,
    )(tops, mid, bots, *weights)
    return out.reshape(b, h, wp, c)



def verify(interpret=True):
    rng = np.random.default_rng(0)
    c, g = 16, 8

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.1)

    dense_params = {"Conv_0": {"Conv_0": {
        "kernel": mk((3, 3, c, 4 * g + c)), "bias": mk((4 * g + c,))}}}
    for i in range(1, 5):
        dense_params[f"proj_y{i}"] = {
            "kernel": mk((3, 3, g, (4 - i) * g + c))}
    x = mk((2, 12, 20, c))
    xp = pack_pair(x)
    ref = fused_dense_block(xp, proj_weights(dense_params, jnp.float32),
                            width=20, rb=4, interpret=interpret)
    got = fused_dense_block_pair(
        xp, pair_weights(dense_params, jnp.float32), width=20, rb=4,
        interpret=interpret)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)
    print("pair == roll (interpret): OK")


if __name__ == "__main__":
    if "--chip" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    verify()
