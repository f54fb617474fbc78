"""Phase-space x4 tail convolutions as Pallas kernels at LR resolution.

The folded tail (infer/folded_tail.py) still runs conv_hr and conv_last
at 4x resolution, where they measure 120 + 115 ms of the 306 ms bench
tail (benchmarks/exp_r8b_tail.py): conv_hr is a 64-channel conv (the
10.6 TF/s XLA class) and conv_last's N=3 output fills 3/128 MXU lanes.
The 64-lane d2s(4) interleave between them moves 8.5 GB at ~280 GB/s.

This module evaluates BOTH in *phase space* at LR resolution:

  conv_hr   4 Pallas dots, one per output row-phase a:
            lhs = 18 gathered slabs (3 py-variants x 6 px-variants),
            [m, 1152] @ [1152, 256]  (b*64+g outputs) — the fast MXU
            class; 2x FLOP padding (each output uses 576 of 1152 K).
  conv_last ONE dot over all 16 output phases:
            lhs = 36 slabs (6 py x 6 px variants),
            [m, 2304] @ [2304, 48]  (c*16+a*4+b outputs, d2s-ready);
            4x FLOP pad.

Phase index math: output 4x-pixel (4I+a, 4J+b) tap (dy, dx) reads input
phase py=(a+dy)%4 at LR row I+di with di=(a+dy-py)//4, and likewise in
x. dy = (py + 4*di) - a must land in {-1,0,1} for the weight to be
nonzero; all other (slab, output) pairs are zero-padded K.

The hr kernel's input is the FOUR stage-2 phase conv outputs as
separate refs (each [B,H,W,4c], channel (i2*2+j2)*c+f after the
weight-side permutation infer/phase_tail.py applies to the folded up2
kernel): phase (py,px) is ref (py//2)*2+(px//2), 64-lane offset
((py%2)*2+(px%2))*c. No phase-packing transpose/concat ever
materializes in HBM — the zero pad columns are synthesized in VMEM.
conv_last's output channel order folds the d2s(4) interleave
convention and its width crop happens at the out_ref write, so the
epilogue is one depth_to_space.

Out-of-image rows and pad columns are zeroed after conv_hr — which is
EXACTLY conv_last's SAME-padding semantics at 4x (the 4x pad row -1 is
phase py=3 of LR row -1).

Row shifts (di/dj = +-1) use the dense-trunk machinery: dy via wp-row
slab offsets, dx via sublane-concat pre-shifted copies of just the
needed 64-lane phase slabs; masks in the 2D-reshape form (exp_r7b).

Reference: ESRGAN RRDBNet upsampling head (BASELINE config 4); like
infer/folded_tail.py this is deploy-time TPU engineering with no
reference counterpart — outputs equal the standard tail up to fp
reassociation (tests/test_phase_tail.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.ops.pallas_windows import (
    const_spec,
    edge_windows,
    largest_row_block,
    padded_width,
    window_specs,
)

PAD = 8

# Mosaic scoped-VMEM ceiling for these kernels. 127 MB works when the
# pallas calls are the whole XLA program, but ABORTS when fused into a
# program that also runs XLA convs (the phase tail's prologue) — the
# compiler needs headroom for its own tiles. pick_rb budgets against
# the same number.
VMEM_LIMIT = 100 * 1024 * 1024

# (phase, shift) variants in lhs slab order; 6 cover all taps of 4 phases
VARIANTS = ((3, -1), (0, 0), (1, 0), (2, 0), (3, 0), (0, 1))


def pack_width(width: int) -> int:
    return padded_width(width, PAD)


def _lrelu(x):
    return (jnp.maximum(x, jnp.asarray(0, x.dtype))
            + jnp.asarray(0.2, x.dtype)
            * jnp.minimum(x, jnp.asarray(0, x.dtype)))


def hr_group_weights(k_hr, bias_hr, dtype=jnp.bfloat16):
    """conv_hr [3,3,64,64]+[64] -> per-a [1152, 256] weights + [1,256] bias.

    lhs slab order for group a: for dy in (-1,0,1) [py=(a+dy)%4 at row
    di], for (px, dj) in VARIANTS — weight row block is nonzero iff
    dx = (px + 4*dj) - b is in {-1,0,1}.
    """
    k = np.asarray(k_hr, np.float32)
    c = k.shape[2]
    ws = []
    for a in range(4):
        w = np.zeros((18 * c, 4 * c), np.float32)
        for dyi, dy in enumerate((-1, 0, 1)):
            for pxi, (px, dj) in enumerate(VARIANTS):
                blk = (dyi * 6 + pxi) * c
                for b in range(4):
                    dx = (px + 4 * dj) - b
                    if dx in (-1, 0, 1):
                        w[blk:blk + c, b * c:(b + 1) * c] = k[dy + 1, dx + 1]
        ws.append(jnp.asarray(w, dtype))
    bias = jnp.asarray(np.tile(np.asarray(bias_hr, np.float32), 4)
                       .reshape(1, 4 * c), jnp.float32)
    return ws, bias


def last_weights(k_last, bias_last, dtype=jnp.bfloat16):
    """conv_last [3,3,64,cout]+[cout] -> [2304, 16*cout] + [1, 16*cout].

    lhs slab order: for (py, di) in VARIANTS, for (px, dj) in VARIANTS.
    Output channel c*16 + a*4 + b — the d2s(4) convention, so the
    kernel output interleaves with one depth_to_space, no transpose.
    """
    k = np.asarray(k_last, np.float32)
    cin, cout = k.shape[2], k.shape[3]
    w = np.zeros((36 * cin, 16 * cout), np.float32)
    bias = np.zeros((16 * cout,), np.float32)
    bl = np.asarray(bias_last, np.float32)
    for a in range(4):
        for b in range(4):
            for ch in range(cout):
                bias[ch * 16 + a * 4 + b] = bl[ch]
    for pyi, (py, di) in enumerate(VARIANTS):
        for pxi, (px, dj) in enumerate(VARIANTS):
            blk = (pyi * 6 + pxi) * cin
            dy_of = py + 4 * di
            dx_of = px + 4 * dj
            for a in range(4):
                dy = dy_of - a
                if dy not in (-1, 0, 1):
                    continue
                for b in range(4):
                    dx = dx_of - b
                    if dx not in (-1, 0, 1):
                        continue
                    for ch in range(cout):
                        w[blk:blk + cin, ch * 16 + a * 4 + b] = \
                            k[dy + 1, dx + 1, :, ch]
    return jnp.asarray(w, dtype), jnp.asarray(bias.reshape(1, -1),
                                              jnp.float32)


def _gather_lhs(slab, shifts, variants_y, wp, mo):
    """Build [mo, len(variants_y)*6*c] lhs from phase slabs.

    slab(py, px): [mu, c] dj=0 slab; shifts[(py, px, dj)]: pre-shifted
    [mu, c] slabs for dj != 0. variants_y: ((py, di), ...) row variants.
    """
    slabs = []
    for py, di in variants_y:
        base = (di + 1) * wp
        for px, dj in VARIANTS:
            sl = slab(py, px) if dj == 0 else shifts[(py, px, dj)]
            slabs.append(sl[base:base + mo])
    return jnp.concatenate(slabs, axis=1)


def _make_shifts(slab, needed):
    """Pre-shift the needed (py, px, dj) 64-lane slabs by +-1 token.

    dj=-1 means the tap reads LR column J-1 -> out[i] = slab[i-1]
    (sublane concat; 16-bit rotate unsupported on this Mosaic).
    """
    out = {}
    for py, px, dj in needed:
        sl = slab(py, px)
        mu = sl.shape[0]
        if dj == -1:
            out[(py, px, dj)] = jnp.concatenate([sl[mu - 1:], sl[:mu - 1]],
                                                axis=0)
        else:
            out[(py, px, dj)] = jnp.concatenate([sl[1:], sl[:1]], axis=0)
    return out


def _mask2d(t, wp, width, row0, h_img):
    m, n = t.shape
    rows = m // wp
    t2 = t.reshape(rows, wp, n)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0) + row0
    ok = ((col >= PAD) & (col < PAD + width)
          & (row >= 0) & (row < h_img))
    t2 = jnp.where(ok, t2, jnp.asarray(0, t2.dtype))
    return t2.reshape(m, n)


def _wpad_flat(t, wp, width):
    """[rows, width, ch] window -> [rows*wp, ch] flat tokens with the
    PAD zero columns synthesized in VMEM (never materialized in HBM)."""
    rows, _, ch = t.shape
    zl = jnp.zeros((rows, PAD, ch), t.dtype)
    zr = jnp.zeros((rows, wp - width - PAD, ch), t.dtype)
    return jnp.concatenate([zl, t, zr], axis=1).reshape(rows * wp, ch)


def up2_tap_weights(kfp, bias2, dtype=jnp.bfloat16):
    """Permuted folded stage-2 kernel [2,2,2,2,4c,4c] (output channel
    (i2*2+j2)*c+f; infer/phase_tail.permute_up2) -> per-(i1,j1)
    [4*4c, 4c] tap-stacked dot weights (row block t = di*2+dj) and the
    [1, 4c] bias."""
    k = np.asarray(kfp, np.float32)
    c4 = k.shape[-1]
    ws = []
    for i1 in (0, 1):
        for j1 in (0, 1):
            w = np.zeros((4 * c4, c4), np.float32)
            for di in (0, 1):
                for dj in (0, 1):
                    t = di * 2 + dj
                    w[t * c4:(t + 1) * c4] = k[i1, j1, di, dj]
            ws.append(jnp.asarray(w, dtype))
    bias = jnp.asarray(np.asarray(bias2, np.float32).reshape(1, c4),
                       jnp.float32)
    return ws, bias


def _up2hr_kernel(*args, rb, wp, width, nb, h_img, c):
    """z1 -> (in-VMEM stage-2 phase convs) -> conv_hr, one program.

    args: 3 z1 window refs (2-row halos), 4 up2 tap weights + bias,
    4 hr group weights + bias, out_ref. The stage-2 phase outputs
    y_{i1,j1} (rows -1..rb relative to the block) are computed as
    [m, 4*4c] @ [4*4c, 4c] tap dots and never leave VMEM.
    """
    top, mid, bot = args[0], args[1], args[2]
    u0, u1, u2, u3, bias2 = args[3:8]
    w0, w1, w2, w3, bias = args[8:13]
    out_ref = args[13]
    row_start = (pl.program_id(0) % nb) * rb
    uz = jnp.concatenate(
        [_wpad_flat(top[0], wp, width),
         _wpad_flat(mid[0], wp, width),
         _wpad_flat(bot[0], wp, width)], axis=0)  # [(rb+4)*wp, 4c]
    muz = uz.shape[0]
    # column-shifted copies for the up2 taps (token col J-1 / J+1)
    uz_m = jnp.concatenate([uz[muz - 1:], uz[:muz - 1]], axis=0)
    uz_p = jnp.concatenate([uz[1:], uz[:1]], axis=0)
    by_co = {-1: uz_m, 0: uz, 1: uz_p}
    m2 = (rb + 2) * wp

    us = []
    for r, wu in enumerate((u0, u1, u2, u3)):
        i1, j1 = r // 2, r % 2
        slabs = []
        for di in (0, 1):
            for dj in (0, 1):
                co = dj - (1 - j1)
                base = (di + i1) * wp
                slabs.append(by_co[co][base:base + m2])
        lhs = jnp.concatenate(slabs, axis=1)
        acc = jnp.dot(lhs, wu[:], preferred_element_type=jnp.float32)
        acc = acc + bias2[:]
        y = _lrelu(acc.astype(uz.dtype))
        # out-of-image rows/pad cols of the stage-2 output are ZERO
        # (conv_hr's SAME semantics at 4x) — computed-from-zero-pad
        # values here are lrelu(bias), so mask them explicitly
        us.append(_mask2d(y, wp, width, row_start - 1, h_img))
    mu = m2
    mo = mu - 2 * wp

    def slab(py, px):
        r = (py // 2) * 2 + (px // 2)
        off = ((py % 2) * 2 + (px % 2)) * c
        return us[r][:, off:off + c]

    # shifted slabs used by ANY group: (py, px, dj) for px-variants dj!=0
    needed = {(py, 3, -1) for py in range(4)} | {(py, 0, 1)
                                                 for py in range(4)}
    shifts = _make_shifts(slab, needed)
    groups = []
    for a, w in enumerate((w0, w1, w2, w3)):
        vy = []
        for dy in (-1, 0, 1):
            py = (a + dy) % 4
            vy.append((py, (a + dy - py) // 4))
        lhs = _gather_lhs(slab, shifts, vy, wp, mo)
        acc = jnp.dot(lhs, w[:], preferred_element_type=jnp.float32)
        acc = acc + bias[:]
        g = _lrelu(acc.astype(us[0].dtype))
        groups.append(_mask2d(g, wp, width, row_start, h_img))
    out = jnp.concatenate(groups, axis=1)
    out_ref[0] = out.reshape(rb, wp, 16 * c)


def _last_kernel(top_ref, mid_ref, bot_ref, w, bias, out_ref,
                 *, rb, wp, width, nb, h_img, c, cout):
    cp = 16 * c
    top = top_ref[0].reshape(wp, cp)
    mid = mid_ref[0].reshape(rb * wp, cp)
    bot = bot_ref[0].reshape(wp, cp)
    u = jnp.concatenate([top, mid, bot], axis=0)
    mu = u.shape[0]
    mo = mu - 2 * wp

    def slab(py, px):
        return u[:, (py * 4 + px) * c:(py * 4 + px + 1) * c]

    needed = {(py, px, dj) for py, _ in VARIANTS
              for px, dj in VARIANTS if dj != 0}
    shifts = _make_shifts(slab, needed)
    lhs = _gather_lhs(slab, shifts, VARIANTS, wp, mo)
    acc = jnp.dot(lhs, w[:], preferred_element_type=jnp.float32)
    acc = acc + bias[:]
    out = acc.astype(u.dtype).reshape(rb, wp, 16 * cout)
    # crop the pad columns at the write: out is [rb, width, 16*cout],
    # image-exact — the epilogue is one d2s(4)
    out_ref[0] = out[:, PAD:PAD + width]


def _run_up2hr(z1, weights, *, rb, wp, width, nb, h_img, c, interpret):
    b, h, wd, c4 = z1.shape
    tops, mid, bots = edge_windows(z1, rb, nb, halo=2)
    out = pl.pallas_call(
        partial(_up2hr_kernel, rb=rb, wp=wp, width=width, nb=nb, h_img=h,
                c=c),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        grid=(b * nb,),
        in_specs=list(window_specs(rb, wd, c4, halo=2))
        + [const_spec(t) for t in weights],
        out_specs=pl.BlockSpec((1, rb, wp, 16 * c),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp, 16 * c),
                                       z1.dtype),
        interpret=interpret,
    )(tops, mid, bots, *weights)
    return out.reshape(b, h, wp, 16 * c)


def _run_last(x, weights, *, rb, width, nb, h_img, c, cout, interpret):
    b, h, wp, cp = x.shape
    tops, mid, bots = edge_windows(x, rb, nb)
    out = pl.pallas_call(
        partial(_last_kernel, rb=rb, wp=wp, width=width, nb=nb, h_img=h,
                c=c, cout=cout),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        grid=(b * nb,),
        in_specs=list(window_specs(rb, wp, cp))
        + [const_spec(t) for t in weights],
        out_specs=pl.BlockSpec((1, rb, width, 16 * cout),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * nb, rb, width, 16 * cout),
                                       x.dtype),
        interpret=interpret,
    )(tops, mid, bots, *weights)
    return out.reshape(b, h, width, 16 * cout)


def pick_rb(h: int, wp: int, per_token_bytes: int,
            budget: int = None) -> int:
    if budget is None:
        budget = VMEM_LIMIT - 8 * 1024 * 1024
    return largest_row_block(
        h, max(1, budget // (per_token_bytes * wp) - 2))


def phase_hr_last(z1, kfp, bias2, k_hr, b_hr, k_last, b_last, width,
                  interpret=False, rb=None):
    """z1: the stage-1 phase tensor [B, H, width, 4c] (UNPADDED width;
    the lrelu'd up1 conv output). kfp/bias2: the output-permuted folded
    stage-2 kernel [2,2,2,2,4c,4c] + bias (infer/phase_tail.permute_up2).
    Returns [B, H, width, 16*cout] with channel c*16+a*4+b, ready for
    d2s(4): stage-2 phase convs -> conv_hr -> lrelu -> conv_last, all
    in phase space (the stage-2 outputs never leave VMEM)."""
    b, h, w, c4 = z1.shape
    c = c4 // 4
    wp = pack_width(width)
    ws2, b2 = up2_tap_weights(kfp, bias2, z1.dtype)
    ws, bias_hr = hr_group_weights(k_hr, b_hr, z1.dtype)
    w_last, bias_last = last_weights(k_last, b_last, z1.dtype)
    cout = np.asarray(k_last).shape[3]
    # VMEM per token (bf16): the 16c-lane in AND out windows are
    # DOUBLE-buffered by the pipeline (2*2*16c) + shifts 8c + lhs 18c +
    # f32 acc 8c -> ~98c*2B (measured: rb=47 at c=64 wants 154M); the
    # fused up2 stage adds ~4c z1 windows + 12c y slabs + 16c up2
    # lhs/acc -> count ~130c.
    rb_hr = rb or pick_rb(h, wp, 2 * 130 * c)
    rb_l = rb or pick_rb(h, wp, 2 * 98 * c)
    y = _run_up2hr(z1, list(ws2) + [b2] + list(ws) + [bias_hr],
                   rb=rb_hr, wp=wp, width=width, nb=h // rb_hr,
                   h_img=h, c=c, interpret=interpret)
    out = _run_last(y, [w_last, bias_last], rb=rb_l, width=width,
                    nb=h // rb_l, h_img=h, c=c, cout=cout,
                    interpret=interpret)
    return out
