"""Fused RRDB dense-block kernel — the trunk's 5-conv dense block as ONE
Pallas program ('roll-conv', projection layout).

Why (measured, benchmarks/exp_r4c/r4d/r5c/r5e): XLA's conv3x3 at the
trunk's widths is bound by per-conv HBM round trips (~39 TF/s useful on
the dense block), while Mosaic dots on VMEM-resident data run at
100-198 TF/s when K>=96 and N>=64. Fusing the whole block leaves one
HBM read of x and one write of the residual output; the projection
layout (models/rrdbnet.py FusedDenseBlock) keeps every dot in the fast
shape class:

    px: K=192 N=4g+c    p_i: K=96 N=(4-i)g+c     (g=32, c=64)

Per conv (3x3 SAME), at p=1 (no pixel packing):
  lhs  = lane-concat of the 3 dy row-slices of the input   [mo, 3*cin]
  A/B/C = dx=0 / dx=-1 / dx=+1 taps stacked by dy          [3*cin, n]
  out  = lhs@A + roll(lhs@B, +1) + roll(lhs@C, -1)

W is padded with 8 zero columns each side (pad_l = pad_r = 8, total
width a multiple of 16 so every dy slice offset stays bf16-tile
aligned). EVERY conv output is masked (pad columns + out-of-image
rows): the reference's SAME convs zero-pad each INTERMEDIATE, and a
conv evaluated at a pad column adjacent to the image reads real pixels
through its taps — so a single-mask shortcut is wrong in a 4-px border
(measured 1e-4 edge error; tests/test_fused_trunk.py locks the exact
version). Masks run in bf16 AFTER the accumulate cast (identical
result, half the bytes and VMEM).

The 5 convs cascade over a 5-row halo each side ((rb+10) -> rb rows per
grid block; FLOP overhead 1 + 4/rb — pick the largest rb that divides H
and fits VMEM). Requires vmem_limit_bytes raised past the 16 MB
compiler default (the v5e's physical VMEM is larger; measured working
at rb=56, wp=432).

Mosaic constraints respected (each cost a debug round): no cmpf on
packed bf16 (lrelu is max/min), no bf16 tpu.matmul output (dots emit
f32), no bf16 dynamic_rotate (rolls stay f32), python-unrolled loops
do not reuse scoped stack (whole-stage bodies, no chunk loops).

Capability parity: BasicSR RRDB dense block (reference
src/architecture.py:38-43); exact math of FusedDenseBlock
(models/rrdbnet.py) up to one f.p. reassociation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 5  # 5 chained 3x3 convs
PAD = 8   # zero columns each side; must stay > HALO for wrap confinement


def pack_width(width: int) -> int:
    """Padded width: PAD zero cols each side, multiple of 16."""
    return -(-(width + 2 * PAD) // 16) * 16


def pack(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] -> [B,H,Wp,C] with zeroed pad columns."""
    wp = pack_width(x.shape[2])
    return jnp.pad(x, ((0, 0), (0, 0), (PAD, wp - x.shape[2] - PAD),
                       (0, 0)))


def pack_width_pair(width: int) -> int:
    """Padded width for the pair-packed kernel: multiple of 32 so the
    2-phase view's row stride wp/2 stays sublane-tile aligned."""
    return -(-(width + 2 * PAD) // 32) * 32


def pack_pair(x: jnp.ndarray) -> jnp.ndarray:
    wp = pack_width_pair(x.shape[2])
    return jnp.pad(x, ((0, 0), (0, 0), (PAD, wp - x.shape[2] - PAD),
                       (0, 0)))


def unpack(xp: jnp.ndarray, width: int) -> jnp.ndarray:
    return xp[:, :, PAD:PAD + width]


def pick_rb(h: int, wp: int, budget_rows: int = 28512) -> int:
    """Largest divisor of h whose (rb+10)*wp stays within the measured
    VMEM-safe row budget (rb=56 x wp=432 works; scale by wp)."""
    cap = max(1, budget_rows // wp - 2 * HALO)
    best = 1
    for rb in range(1, h + 1):
        if h % rb == 0 and rb <= cap:
            best = rb
    return best


def proj_weights(dense_params, dtype=jnp.bfloat16):
    """FusedDenseBlock param subtree -> kernel weight list.

    dense_params: FusedDenseBlock subtree — {'Conv_0': {'Conv_0':
    {'kernel' [3,3,c,4g+c], 'bias'}}, 'proj_y1'..'proj_y4':
    {'kernel' [3,3,g,(4-i)g+c]}} (models/rrdbnet.py)
    Returns [A_px, B_px, C_px, bias_px, A_1, B_1, C_1, ..., C_4] with
    A/B/C = [3*cin, n] dy-major stacks of the dx=0/-1/+1 taps.
    """
    out = []
    px = dense_params["Conv_0"]["Conv_0"]
    kernels = [np.asarray(px["kernel"], np.float32)]
    for i in range(1, 5):
        kernels.append(np.asarray(dense_params[f"proj_y{i}"]["kernel"],
                                  np.float32))
    for j, w in enumerate(kernels):
        cin, n = w.shape[2], w.shape[3]
        for dx in (1, 0, 2):
            out.append(jnp.asarray(w[:, dx].reshape(3 * cin, n), dtype))
        if j == 0:
            out.append(jnp.asarray(
                np.asarray(px["bias"], np.float32).reshape(1, n),
                jnp.float32))
    return out


def _lrelu(x):
    # max/min form: Mosaic rejects cmpf on packed bf16 vectors
    return (jnp.maximum(x, jnp.asarray(0, x.dtype))
            + jnp.asarray(0.2, x.dtype)
            * jnp.minimum(x, jnp.asarray(0, x.dtype)))


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


def _kernel(top_ref, mid_ref, bot_ref, *w_refs, out_ref=None,
            rb, wp, width, nb, h_img, g, c):
    (a_px, b_px, c_px, bias_px,
     a_1, b_1, c_1, a_2, b_2, c_2, a_3, b_3, c_3, a_4, b_4, c_4) = w_refs
    row_start = (pl.program_id(0) % nb) * rb

    top = top_ref[0].reshape(HALO * wp, c)
    mid = mid_ref[0].reshape(rb * wp, c)
    bot = bot_ref[0].reshape(HALO * wp, c)
    xf = jnp.concatenate([top, mid, bot], axis=0)

    def rconv(u, a, b, cm, mask_k, bias=None):
        mu = u.shape[0]
        mo = mu - 2 * wp
        lhs = jnp.concatenate(
            [u[0:mo], u[wp:wp + mo], u[2 * wp:2 * wp + mo]], axis=1)
        acc = jnp.dot(lhs, a[:], preferred_element_type=jnp.float32)
        if bias is not None:
            acc = acc + bias[:]
        pb = jnp.dot(lhs, b[:], preferred_element_type=jnp.float32)
        acc = acc + pltpu.roll(pb, 1, 0)
        pc = jnp.dot(lhs, cm[:], preferred_element_type=jnp.float32)
        acc = acc + pltpu.roll(pc, mo - 1, 0)
        out = acc.astype(u.dtype)
        # mask via the free [rows, wp, n] reshape + per-axis 2D iotas:
        # the flat-token idx%wp / idx//wp (wp not a power of two) cost
        # ~6 ms/block on the bench geometry (exp_r7b ablation:
        # 29.6 -> 23.5 ms with identical output).
        rows = mo // wp
        n = out.shape[1]
        o2 = out.reshape(rows, wp, n)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
        r_img = row + (row_start - HALO + mask_k)
        ok = ((col >= PAD) & (col < PAD + width)
              & (r_img >= 0) & (r_img < h_img))
        o2 = jnp.where(ok, o2, jnp.asarray(0, o2.dtype))
        return o2.reshape(mo, n)

    # Incremental cascade: each stage's pre-activation accumulator is
    # seeded from the px slice and every p_i's slices are distributed
    # the moment p_i is produced (ascending j — the SAME f.p. add order
    # as the materialize-all form, bit-identical), so p_i and px die
    # early instead of persisting to the end: peak VMEM per token drops
    # ~900 B, which is what admits larger row blocks.
    px = rconv(xf, a_px, b_px, c_px, 1, bias_px)
    mo = (xf.shape[0] - 2 * wp) - 8 * wp  # output rows after 5 convs
    m_of = [px.shape[0] - 2 * i * wp for i in range(5)]  # stage extents
    pre = [px[i * wp:i * wp + m_of[i], i * g:(i + 1) * g]
           for i in range(1, 4)]  # stage 2..4 accumulators
    acc = px[4 * wp:4 * wp + mo, 4 * g:]
    y = _lrelu(px[:, 0:g])
    pw = [(a_1, b_1, c_1), (a_2, b_2, c_2), (a_3, b_3, c_3),
          (a_4, b_4, c_4)]
    for i in range(1, 5):
        p_i = rconv(y, *pw[i - 1], i + 1)
        for k in range(i, 4):  # p_i's slice for stage k+1's pre
            pre[k - 1] = pre[k - 1] + p_i[(k - i) * wp:
                                          (k - i) * wp + m_of[k],
                                          (k - i) * g:(k - i + 1) * g]
        acc = acc + p_i[(4 - i) * wp:(4 - i) * wp + mo, (4 - i) * g:]
        if i < 4:
            y = _lrelu(pre[i - 1])
    xc = xf[HALO * wp:HALO * wp + mo]
    out = xc + acc * jnp.asarray(0.2, xc.dtype)
    out_ref[0] = out.reshape(rb, wp, c)


def fused_dense_block(xp, weights, *, width, rb=None, interpret=False):
    """One dense block WITH its residual on packed input.

    xp: [B, H, Wp, C] (from `pack`, zero pad cols); weights: flat list
    from `proj_weights`. Returns [B, H, Wp, C].
    """
    b, h, wp, c = xp.shape
    g = weights[4].shape[0] // 3  # A_1 is [3*g, ...]
    if rb is None:
        rb = pick_rb(h, wp)
    nb = h // rb
    xh = jnp.pad(xp, ((0, 0), (HALO, HALO), (0, 0), (0, 0)))
    mid = xh[:, HALO:HALO + h].reshape(b * nb, rb, wp, c)
    tops = jnp.stack([xh[:, i * rb:i * rb + HALO] for i in range(nb)],
                     axis=1).reshape(b * nb, HALO, wp, c)
    bots = jnp.stack(
        [xh[:, HALO + (i + 1) * rb:2 * HALO + (i + 1) * rb]
         for i in range(nb)], axis=1).reshape(b * nb, HALO, wp, c)
    spec_mid = pl.BlockSpec((1, rb, wp, c), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_edge = pl.BlockSpec((1, HALO, wp, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)

    def cw(t):
        return pl.BlockSpec(t.shape, lambda i: (0,) * t.ndim,
                            memory_space=pltpu.VMEM)

    def kernel(*refs):
        *ins, out = refs
        _kernel(*ins, out_ref=out, rb=rb, wp=wp, width=width, nb=nb,
                h_img=h, g=g, c=c)

    out = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        grid=(b * nb,),
        in_specs=[spec_edge, spec_mid, spec_edge]
        + [cw(t) for t in weights],
        out_specs=spec_mid,
        out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp, c), xp.dtype),
        interpret=interpret,
    )(tops, mid, bots, *weights)
    return out.reshape(b, h, wp, c)
