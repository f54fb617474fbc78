"""Strip-gridded fused HAB block — the CAB-merge lever (VERDICT r3
item 3 / BENCHMARKS.md round-4 split).

The window-gridded kernel (ops/pallas_hab.fused_hab_block) needs its
operands window-partitioned, which costs per HAB block in XLA glue:
window_partition(x), window_partition(cab), window_merge(out), the
squeeze-excite apply and conv_scale passes, and for shifted blocks
three jnp.roll round-trips — ~2.7 ms of the 11.97 ms pair cost at the
flagship geometry (benchmarks/exp_r23_hybrid_split.py).

This kernel grids over SPATIAL row strips ([rb, W, C] blocks, rb a
multiple of the window size) and does the window grouping in VMEM:
8-aligned sub-block slices + [64, C] reshapes, measured exact and
cheap in benchmarks/exp_r25_window_rearrange.py. Per HAB block, HBM
sees ONE read of x, one read of the pre-SE CAB conv output, and one
write — the partition/merge/SE-apply/conv-scale XLA passes disappear
(the SE SCALE vector still comes from XLA: its global mean is a
cross-strip reduction, so the squeeze-excite sigmoid cannot live in a
strip-local program).

Attention uses the stacked-head form (ops/pallas_hab._body
stacked=True): 2 MXU dots per window, heads on the M dimension with
lane masks, logits transposed so the apply contracts dim 0. Weights
dict = pallas_hab.WEIGHT_NAMES with rpb in the stacked [nh*n, n]
transposed layout (pallas_hab._stack_rpb).

Shifted blocks (shift = ws//2): the kernel reads 4-row wrap halos
(roll semantics) from neighbor strips via (i±1 mod nb)-indexed block
specs, rolls W in VMEM, computes the region-id mask from row/col
iotas, and writes the output back in ORIGINAL coordinates — no host
roll anywhere.

Capability parity: reference HAT HAB (reference src/architecture.py:
51-61 — W-MSA/SW-MSA + conv_scale*CAB + MLP, pre-norm).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.ops.pallas_hab import (
    WEIGHT_NAMES,
    _NEG,
    _ln,
    _stack_rpb,
    gelu_exact,
)
from superresolution_tpu.ops.pallas_windows import const_spec

__all__ = ["strip_hab_block", "strip_weights"]


def strip_weights(weights, nh, n):
    """pallas_hab-style weights -> this kernel's layout (stacked rpb)."""
    w = dict(weights)
    if w["rpb"].shape != (nh * n, n):
        w["rpb"] = _stack_rpb(w["rpb"], nh, n)
    return w


def _window_attn(q3, k3, v3, w, madd, *, ws, nh, c, scale, wr, wc):
    """Stacked-head attention for the window at (wr, wc) of a strip.

    q3/k3/v3: [rows, W, C] bf16. Returns [ws, ws, C] bf16."""
    n = ws * ws
    sl = (slice(wr * ws, (wr + 1) * ws), slice(wc * ws, (wc + 1) * ws))
    qw = q3[sl].reshape(n, c)
    kw = k3[sl].reshape(n, c)
    vw = v3[sl].reshape(n, c)
    hd = c // nh
    hm3 = (jax.lax.broadcasted_iota(jnp.int32, (nh, 1, c), 2) // hd
           == jax.lax.broadcasted_iota(jnp.int32, (nh, 1, c), 0)
           ).astype(kw.dtype)
    kst = (kw[None] * hm3).reshape(nh * n, c)
    vst = (vw[None] * hm3).reshape(nh * n, c)
    lt = jax.lax.dot_general(
        kst, qw, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    lt = lt + w["rpb"]
    if madd is not None:
        lt = (lt.reshape(nh, n, n) + madd[None]).reshape(nh * n, n)
    lt3 = lt.reshape(nh, n, n)
    lt3 = lt3 - jnp.max(lt3, axis=1, keepdims=True)
    e = jnp.exp(lt3)
    a = (e / jnp.sum(e, axis=1, keepdims=True)).reshape(nh * n, n)
    acc = jax.lax.dot_general(
        a.astype(vw.dtype), vst, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return acc.astype(q3.dtype).reshape(ws, ws, c)


def _tok_dense(t, wk, bk):
    y = jnp.dot(t, wk, preferred_element_type=jnp.float32) + bk
    return y


def _kernel(x_ref, cab_ref, se_ref, *rest, rb, wd, c, nh, ws, scale,
            shift, h_img, nb):
    if shift:
        xt_ref, xb_ref, *w_refs, out_ref = rest
    else:
        *w_refs, out_ref = rest
    w = {name: ref[:] for name, ref in zip(WEIGHT_NAMES, w_refs)}
    n = ws * ws
    x3 = x_ref[0]                       # [rb, W, C] bf16
    se = se_ref[0].astype(jnp.float32)  # [1, C] (conv_scale folded in)
    cab3 = (cab_ref[0].astype(jnp.float32)
            * se[None]).astype(x3.dtype)

    if shift:
        # assemble the shifted strip: rows [r0-shift, r0+rb+shift) in
        # roll (wrap) semantics via the neighbor halos, then roll W.
        xs = jnp.concatenate([xt_ref[0], x3, xb_ref[0]], axis=0)
        rows = rb + 2 * shift
    else:
        xs = x3
        rows = rb

    # LN1 + qkv on every token of the (haloed) strip
    xf = xs.reshape(rows * wd, c).astype(jnp.float32)
    y = _ln(xf, w["ln1_s"], w["ln1_b"]).astype(xs.dtype)
    q = (_tok_dense(y, w["wq"], w["bq"])).astype(xs.dtype)
    k = (_tok_dense(y, w["wk"], w["bk"])).astype(xs.dtype)
    v = (_tok_dense(y, w["wv"], w["bv"])).astype(xs.dtype)
    q3 = q.reshape(rows, wd, c)
    k3 = k.reshape(rows, wd, c)
    v3 = v.reshape(rows, wd, c)
    if shift:
        # W-roll by -shift with per-row wrap (Swin torch.roll semantics)
        def wroll(t):
            return jnp.concatenate([t[:, shift:], t[:, :shift]], axis=1)

        q3, k3, v3 = wroll(q3), wroll(k3), wroll(v3)

    nwr = rows // ws
    nwc = wd // ws
    if shift:
        # region ids from iotas, on ROLLED-frame positions (the Swin
        # mask labels the rolled image directly — models/hat_lite.py
        # _shift_region_ids). Strip-local window-row wr holds rolled
        # rows r0 - ws + wr*ws + tr (the assembled halo strip covers
        # rolled rows [r0 - ws, r0 + rb)); window-col wc holds rolled
        # cols wc*ws + tc. Region boundaries per axis:
        # [0, L-ws), [L-ws, L-shift), [L-shift, L).
        r0 = (pl.program_id(0) % nb) * rb
        tr = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) // ws
        tc = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) % ws

    def region(v_pos, limit):
        a = (v_pos >= limit - ws).astype(jnp.int32)
        b = (v_pos >= limit - shift).astype(jnp.int32)
        return a + b

    out_rows = []
    for wr in range(nwr):
        row_wins = []
        for wc in range(nwc):
            madd = None
            if shift:
                rpos = jax.lax.rem(r0 + jnp.int32(wr * ws - ws + h_img)
                                   + tr, jnp.int32(h_img))
                cpos = jnp.int32(wc * ws) + tc
                ids = region(rpos, h_img) * 3 + region(cpos, wd)
                madd = jnp.where(ids == ids.reshape(1, n),
                                 jnp.float32(0.0), jnp.float32(_NEG))
            row_wins.append(_window_attn(
                q3, k3, v3, w, madd, ws=ws, nh=nh, c=c, scale=scale,
                wr=wr, wc=wc))
        out_rows.append(jnp.concatenate(row_wins, axis=1))
    attn3 = jnp.concatenate(out_rows, axis=0)  # [rows, W, C] shifted
    if shift:
        # roll back: W by +shift (per-row wrap), rows by dropping the
        # halo (the halo rows' outputs belong to the neighbor strips)
        attn3 = jnp.concatenate(
            [attn3[:, wd - shift:], attn3[:, :wd - shift]], axis=1)
        attn3 = attn3[shift:shift + rb]
    attn = attn3.reshape(rb * wd, c)
    proj = _tok_dense(attn, w["wp"], w["bp"]).astype(x3.dtype)
    x1 = (x3.reshape(rb * wd, c) + proj
          + cab3.reshape(rb * wd, c)).astype(x3.dtype)
    z = _ln(x1.astype(jnp.float32), w["ln2_s"], w["ln2_b"]).astype(
        x3.dtype)
    h1 = _tok_dense(z, w["w1"], w["b1"])
    h1 = gelu_exact(h1).astype(x3.dtype)
    o = _tok_dense(h1, w["w2"], w["b2"]).astype(x3.dtype)
    out_ref[0] = (x1 + o).reshape(rb, wd, c)


def _pick_rb(h, ws, cap_windows, wd):
    """Largest rb (multiple of ws, divisor of h) whose window count per
    instance stays under cap_windows (program-size bound)."""
    best = ws
    for rb in range(ws, h + 1, ws):
        if h % rb == 0 and (rb // ws) * (wd // ws) <= cap_windows:
            best = rb
    return best


def strip_hab_block(x, cab_y, se, weights, *, num_heads, window_size,
                    shift=0, interpret=False, rb=None):
    """Fused HAB block on SPATIAL layout.

    x:      [B, H, W, C] compute-dtype
    cab_y:  [B, H, W, C] pre-squeeze-excite CAB conv output
            (ops/pallas_hab.fused_cab_convs)
    se:     [B, 1, C] f32 squeeze-excite sigmoid * conv_scale
    weights: pallas_hab.WEIGHT_NAMES dict (rpb either [nh, n, n] or
            already stacked [nh*n, n])
    shift:  0 or window_size//2 (the SW-MSA case; wrap/roll semantics)

    Returns [B, H, W, C] — equal to the window_partition ->
    fused_hab_block -> window_merge (+roll round-trip when shifted)
    composition, with the SE apply and conv_scale folded in.
    """
    b, h, wd, c = x.shape
    ws = int(window_size)
    nh = int(num_heads)
    n = ws * ws
    if h % ws or wd % ws:
        raise ValueError(f"H={h}, W={wd} must be multiples of ws={ws}")
    if shift not in (0, ws // 2):
        raise ValueError(f"shift={shift} must be 0 or ws//2={ws // 2}")
    w = strip_weights(weights, nh, n)
    scale = float(c // nh) ** -0.5
    if rb is None:
        rb = _pick_rb(h, ws, 64, wd)
    nb = h // rb
    mlp = w["w1"].shape[-1]
    w_shapes = {
        "ln1_s": (1, c), "ln1_b": (1, c),
        "wq": (c, c), "wk": (c, c), "wv": (c, c),
        "bq": (1, c), "bk": (1, c), "bv": (1, c),
        "rpb": (nh * n, n), "wp": (c, c), "bp": (1, c),
        "ln2_s": (1, c), "ln2_b": (1, c),
        "w1": (c, mlp), "b1": (1, mlp), "w2": (mlp, c), "b2": (1, c),
    }
    w_vals = [jnp.asarray(w[k]).reshape(w_shapes[k]) for k in WEIGHT_NAMES]
    w_specs = [const_spec(t) for t in w_vals]
    xspec = pl.BlockSpec((1, rb, wd, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    se_spec = pl.BlockSpec((1, 1, c), lambda i: (i // nb, 0, 0),
                           memory_space=pltpu.VMEM)
    xb = x.reshape(b * nb, rb, wd, c)
    cb = cab_y.reshape(b * nb, rb, wd, c)
    extra_vals, extra_specs = [], []
    if shift:
        # wrap halos (roll semantics, within each image): the last
        # `shift` rows of the strip above and the first `shift` rows of
        # the strip below, block indices taken mod nb per image.
        x5 = xb.reshape(b, nb, rb, wd, c)
        top = jnp.roll(x5, 1, axis=1)[:, :, rb - shift:]
        bot = jnp.roll(x5, -1, axis=1)[:, :, :shift]
        hspec = pl.BlockSpec((1, shift, wd, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        extra_vals = [top.reshape(b * nb, shift, wd, c),
                      bot.reshape(b * nb, shift, wd, c)]
        extra_specs = [hspec, hspec]
    out = pl.pallas_call(
        partial(_kernel, rb=rb, wd=wd, c=c, nh=nh, ws=ws, scale=scale,
                shift=shift, h_img=h, nb=nb),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        grid=(b * nb,),
        in_specs=[xspec, xspec, se_spec] + extra_specs + w_specs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b * nb, rb, wd, c), x.dtype),
        interpret=interpret,
    )(xb, cb, se, *extra_vals, *w_vals)
    return out.reshape(b, h, wd, c)
