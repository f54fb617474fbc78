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

from superresolution_tpu.ops.pallas_windows import (
    const_spec,
    edge_windows,
    largest_row_block,
    padded_width,
    window_specs,
)

HALO = 5  # 5 chained 3x3 convs
PAD = 8   # zero columns each side; must stay > HALO for wrap confinement


def pack_width(width: int) -> int:
    """Padded width: PAD zero cols each side, multiple of 16."""
    return padded_width(width, PAD)


def pack(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] -> [B,H,Wp,C] with zeroed pad columns."""
    wp = pack_width(x.shape[2])
    return jnp.pad(x, ((0, 0), (0, 0), (PAD, wp - x.shape[2] - PAD),
                       (0, 0)))


def unpack(xp: jnp.ndarray, width: int) -> jnp.ndarray:
    return xp[:, :, PAD:PAD + width]


def pick_rb(h: int, wp: int, budget_rows: int = 28512) -> int:
    """Largest divisor of h whose (rb+10)*wp stays within the measured
    VMEM-safe row budget (rb=56 x wp=432 works; scale by wp)."""
    return largest_row_block(h, max(1, budget_rows // wp - 2 * HALO))


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


def _roll_conv3(u, a, b, cm, *, wp, width, row0, h_img, bias=None,
                seg=None):
    """One 3x3 SAME roll-conv on a flat token stream.

    u: [(rows+2)*wp, cin] (one halo row each side); a/b/cm: the
    [3*cin, n] dy-major stacks of the dx=0/-1/+1 taps. Returns the
    masked [rows*wp, n] output whose first row is image row `row0`
    (negative while inside a halo cascade). Shared by dense_cascade and
    the prologue/epilogue fold kernels so the mask/roll math cannot
    diverge between them.

    seg: optional (stride, valid) ints for BATCH-PACKED inputs — B
    images stacked along H at `stride` rows apiece, the first `valid`
    real and the rest zero spacers. Rows with r_img % stride >= valid
    are masked at EVERY conv stage, so each image sees exact zero-pad
    SAME semantics and one spacer row suffices for any cascade depth
    (a 3x3 tap reaches one row past the image; that row is a spacer
    re-zeroed before the next stage reads it).
    """
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
    r_img = row + row0
    ok = ((col >= PAD) & (col < PAD + width)
          & (r_img >= 0) & (r_img < h_img))
    if seg is not None:
        stride, valid = seg
        ok = ok & (r_img % stride < valid)
    o2 = jnp.where(ok, o2, jnp.asarray(0, o2.dtype))
    return o2.reshape(mo, n)


def dense_cascade(xf, weights, *, wp, width, row_start, h_img, g,
                  out_halo=0, seg=None):
    """The 5-conv dense-block body on a flat token stream.

    xf: [m, cin] at halo `out_halo + HALO`; weights: the 16-entry
    ref/array list from proj_weights. Returns the block output
    (x_center + 0.2 * acc) at halo `out_halo` — shared by the
    single-block kernel (out_halo=0) and the chained whole-RRDB kernel
    (out_halo = 10, 5, 0 for its three stages).
    """
    (a_px, b_px, c_px, bias_px,
     a_1, b_1, c_1, a_2, b_2, c_2, a_3, b_3, c_3, a_4, b_4, c_4) = weights

    def rconv(u, a, b, cm, mask_k, bias=None):
        return _roll_conv3(u, a, b, cm, wp=wp, width=width,
                           row0=row_start - out_halo - HALO + mask_k,
                           h_img=h_img, bias=bias, seg=seg)

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
    return xc + acc * jnp.asarray(0.2, xc.dtype)


def _kernel(top_ref, mid_ref, bot_ref, *w_refs, out_ref=None,
            rb, wp, width, nb, h_img, g, c, res_ref=None, seg=None):
    row_start = (pl.program_id(0) % nb) * rb
    top = top_ref[0].reshape(HALO * wp, c)
    mid = mid_ref[0].reshape(rb * wp, c)
    bot = bot_ref[0].reshape(HALO * wp, c)
    xf = jnp.concatenate([top, mid, bot], axis=0)
    out = dense_cascade(xf, w_refs, wp=wp, width=width,
                        row_start=row_start, h_img=h_img, g=g, seg=seg)
    if res_ref is not None:
        # fold the RRDB-level residual (carry + block_out*0.2) into this
        # kernel's epilogue — equal to the separate XLA pass up to FMA
        # rounding, and the pass itself (measured 4.85 ms/RRDB at the
        # bench geometry, benchmarks/exp_r13_residual.py) disappears
        res = res_ref[0].reshape(rb * wp, c)
        out = res + out * jnp.asarray(0.2, out.dtype)
    out_ref[0] = out.reshape(rb, wp, c)


def fused_dense_block(xp, weights, *, width, rb=None, interpret=False,
                      residual=None, seg=None):
    """One dense block WITH its residual on packed input.

    xp: [B, H, Wp, C] (from `pack`, zero pad cols); weights: flat list
    from `proj_weights`. Returns [B, H, Wp, C].

    residual (packed, same shape as xp): fold `residual + out*0.2` — the
    RRDB-level residual — into the kernel epilogue instead of paying a
    separate XLA elementwise pass over the full tensor.

    seg ((stride, valid) or None): batch-packed rows — see _roll_conv3.
    Spacer rows pass through the identity path (xc + 0.2*masked-acc and
    the folded residual keep them exactly zero when the input's are).
    """
    b, h, wp, c = xp.shape
    g = weights[4].shape[0] // 3  # A_1 is [3*g, ...]
    if rb is None:
        rb = pick_rb(h, wp)
    nb = h // rb
    tops, mid, bots = edge_windows(xp, rb, nb, halo=HALO)
    spec_edge, spec_mid, _ = window_specs(rb, wp, c, halo=HALO)
    extra = ()
    if residual is not None:
        extra = (residual.reshape(b * nb, rb, wp, c),)

    def kernel(*refs):
        *ins, out = refs
        res = None
        if residual is not None:
            *ins, res = ins
        _kernel(*ins, out_ref=out, rb=rb, wp=wp, width=width, nb=nb,
                h_img=h, g=g, c=c, res_ref=res, seg=seg)

    out = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        grid=(b * nb,),
        in_specs=[spec_edge, spec_mid, spec_edge]
        + [const_spec(t) for t in weights]
        + ([spec_mid] if residual is not None else []),
        out_specs=spec_mid,
        out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp, c), xp.dtype),
        interpret=interpret,
    )(tops, mid, bots, *weights, *extra)
    return out.reshape(b, h, wp, c)


# --------------------------------------------------------------------
# Chained whole-RRDB kernel: all 3 dense blocks of one RRDB (plus the
# RRDB-level residual) in ONE Pallas program — kills 2 of the 3
# per-RRDB packed-tensor HBM write+read boundaries at the cost of a
# deeper halo cascade (x at halo 15; per-stage conv extents average
# +24/+14/+4 rows vs +4.8 each for separate calls).

RRDB_HALO = 3 * HALO  # 15


def pick_rb_rrdb(h: int, wp: int, budget_rows: int = 17000) -> int:
    """The chained kernel holds up to ~3x a single block's live VMEM
    (python-unrolled stages do not reuse scoped stack)."""
    return largest_row_block(h, max(1, budget_rows // wp - 2 * RRDB_HALO))


def _rrdb_kernel(top_ref, mid_ref, bot_ref, *w_refs, out_ref, rb, wp,
                 width, nb, h_img, g, c):
    w0, w1, w2 = (w_refs[:16], w_refs[16:32], w_refs[32:48])
    row_start = (pl.program_id(0) % nb) * rb
    top = top_ref[0].reshape(RRDB_HALO * wp, c)
    mid = mid_ref[0].reshape(rb * wp, c)
    bot = bot_ref[0].reshape(RRDB_HALO * wp, c)
    xf = jnp.concatenate([top, mid, bot], axis=0)
    kw = dict(wp=wp, width=width, row_start=row_start, h_img=h_img, g=g)
    b1 = dense_cascade(xf, w0, out_halo=2 * HALO, **kw)
    b2 = dense_cascade(b1, w1, out_halo=HALO, **kw)
    b3 = dense_cascade(b2, w2, out_halo=0, **kw)
    xc = xf[RRDB_HALO * wp:RRDB_HALO * wp + rb * wp]
    out = xc + b3 * jnp.asarray(0.2, xc.dtype)
    out_ref[0] = out.reshape(rb, wp, c)


def conv3_rollconv_weights(conv_params, cin_pad=None,
                           dtype=jnp.bfloat16):
    """3x3 Conv param subtree {'kernel' [3,3,cin,n], 'bias' [n]} ->
    [A, B, C, bias] roll-conv stacks (A/B/C = [3*cin, n] dy-major
    dx=0/-1/+1 taps, the proj_weights convention). `cin_pad` zero-pads
    the input-channel axis — used by the conv_first prologue so the raw
    image's few channels land lane-aligned."""
    w = np.asarray(conv_params["kernel"], np.float32)
    cin, n = w.shape[2], w.shape[3]
    if cin_pad is not None and cin_pad > cin:
        w = np.concatenate(
            [w, np.zeros((3, 3, cin_pad - cin, n), np.float32)], axis=2)
        cin = cin_pad
    out = []
    for dx in (1, 0, 2):
        out.append(jnp.asarray(w[:, dx].reshape(3 * cin, n), dtype))
    out.append(jnp.asarray(
        np.asarray(conv_params["bias"], np.float32).reshape(1, n),
        jnp.float32))
    return out


# --------------------------------------------------------------------
# End folds (VERDICT r2 item 3): conv_first rides the FIRST dense
# block's prologue and trunk_conv + the global trunk residual ride the
# LAST dense block's epilogue — the same in-kernel fold family as the
# r13 RRDB-residual fold (in-block folds win; cross-block chaining
# loses on the VMEM budget). Each removes full packed-tensor XLA
# passes at a trunk end: the pack copy + separate conv_first call at
# the head, and the unpack + trunk_conv + residual-add passes at the
# tail. Capability parity: RRDBNet conv_first/trunk_conv
# (models/rrdbnet.py; reference src/architecture.py:38-43).

END_HALO = HALO + 1  # one extra conv chained onto the 5-conv cascade


def fused_dense_block_prologue(xp_raw, head_w, weights, *, width,
                               rb=None, interpret=False):
    """conv_first + the first dense block as ONE Pallas program.

    xp_raw: [B, H, Wp, Cin] packed raw input (Cin zero-padded to a
    multiple of 8; `pack` zero cols); head_w: conv3_rollconv_weights of
    conv_first; weights: proj_weights of dense block 0.

    Returns (block_out, head), both [B, H, Wp, C]: head is the packed
    conv_first output (the trunk's global-residual anchor, still needed
    in HBM for the RRDB-0 residual and the final add), block_out is the
    first dense block's output. Equal to conv_first -> pack ->
    fused_dense_block up to f.p. reassociation.
    """
    b, h, wp, cin = xp_raw.shape
    g = weights[4].shape[0] // 3
    c = weights[0].shape[0] // 3  # A_px is [3*c, ...]
    if rb is None:
        rb = pick_rb(h, wp)
    nb = h // rb
    tops, mid, bots = edge_windows(xp_raw, rb, nb, halo=END_HALO)
    spec_edge, spec_mid_in, _ = window_specs(rb, wp, cin, halo=END_HALO)
    _, spec_mid_out, _ = window_specs(rb, wp, c)

    def kernel(top_ref, mid_ref, bot_ref, *refs):
        *w_refs, out_ref, head_ref = refs
        hw, bw = w_refs[:4], w_refs[4:]
        row_start = (pl.program_id(0) % nb) * rb
        top = top_ref[0].reshape(END_HALO * wp, cin)
        m = mid_ref[0].reshape(rb * wp, cin)
        bot = bot_ref[0].reshape(END_HALO * wp, cin)
        xf_raw = jnp.concatenate([top, m, bot], axis=0)
        # conv_first: raw at halo 6 -> features at halo 5 (the cascade's
        # expected input halo); masked like every cascade stage
        x = _roll_conv3(xf_raw, hw[0], hw[1], hw[2], wp=wp, width=width,
                        row0=row_start - HALO, h_img=h, bias=hw[3])
        out = dense_cascade(x, bw, wp=wp, width=width,
                            row_start=row_start, h_img=h, g=g)
        head_ref[0] = x[HALO * wp:HALO * wp + rb * wp].reshape(rb, wp, c)
        out_ref[0] = out.reshape(rb, wp, c)

    out, head = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        grid=(b * nb,),
        in_specs=[spec_edge, spec_mid_in, spec_edge]
        + [const_spec(t) for t in head_w]
        + [const_spec(t) for t in weights],
        out_specs=(spec_mid_out, spec_mid_out),
        out_shape=(jax.ShapeDtypeStruct((b * nb, rb, wp, c),
                                        xp_raw.dtype),
                   jax.ShapeDtypeStruct((b * nb, rb, wp, c),
                                        xp_raw.dtype)),
        interpret=interpret,
    )(tops, mid, bots, *head_w, *weights)
    return out.reshape(b, h, wp, c), head.reshape(b, h, wp, c)


def fused_dense_block_epilogue(xp, weights, residual, trunk_w, head, *,
                               width, rb=None, interpret=False):
    """Last dense block + RRDB residual + trunk_conv + global residual
    as ONE Pallas program.

    xp: [B, H, Wp, C] (the last RRDB's second dense-block output);
    weights: proj_weights of its third dense block; residual: the last
    RRDB's input (its residual anchor); trunk_w:
    conv3_rollconv_weights of trunk_conv; head: packed conv_first
    output. Returns packed trunk features [B, H, Wp, C]:

        trunk_conv(residual + block(xp) * 0.2) + head

    — equal to fused_dense_block(..., residual=...) -> unpack ->
    XLA trunk_conv -> + head up to f.p. reassociation.
    """
    b, h, wp, c = xp.shape
    g = weights[4].shape[0] // 3
    if rb is None:
        rb = pick_rb(h, wp)
    nb = h // rb
    tops, mid, bots = edge_windows(xp, rb, nb, halo=END_HALO)
    rtops, rmid, rbots = edge_windows(residual, rb, nb, halo=1)
    spec_edge, spec_mid, _ = window_specs(rb, wp, c, halo=END_HALO)
    spec_redge, _, _ = window_specs(rb, wp, c, halo=1)
    head_b = head.reshape(b * nb, rb, wp, c)

    def kernel(top_ref, mid_ref, bot_ref, *refs):
        (*w_refs, rtop_ref, rmid_ref, rbot_ref, head_ref,
         out_ref) = refs
        bw, tw = w_refs[:16], w_refs[16:]
        row_start = (pl.program_id(0) % nb) * rb
        top = top_ref[0].reshape(END_HALO * wp, c)
        m = mid_ref[0].reshape(rb * wp, c)
        bot = bot_ref[0].reshape(END_HALO * wp, c)
        xf = jnp.concatenate([top, m, bot], axis=0)
        # block output at halo 1 (trunk_conv consumes one halo row)
        out = dense_cascade(xf, bw, wp=wp, width=width,
                            row_start=row_start, h_img=h, g=g,
                            out_halo=1)
        res = jnp.concatenate(
            [rtop_ref[0].reshape(wp, c), rmid_ref[0].reshape(rb * wp, c),
             rbot_ref[0].reshape(wp, c)], axis=0)
        feat = res + out * jnp.asarray(0.2, out.dtype)
        tout = _roll_conv3(feat, tw[0], tw[1], tw[2], wp=wp, width=width,
                           row0=row_start, h_img=h, bias=tw[3])
        out_ref[0] = (tout + head_ref[0].reshape(rb * wp, c)
                      ).reshape(rb, wp, c)

    out = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        grid=(b * nb,),
        in_specs=[spec_edge, spec_mid, spec_edge]
        + [const_spec(t) for t in weights]
        + [const_spec(t) for t in trunk_w]
        + [spec_redge, pl.BlockSpec((1, rb, wp, c),
                                    lambda i: (i, 0, 0, 0),
                                    memory_space=pltpu.VMEM),
           spec_redge,
           pl.BlockSpec((1, rb, wp, c), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rb, wp, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp, c), xp.dtype),
        interpret=interpret,
    )(tops, mid, bots, *weights, *trunk_w, rtops, rmid, rbots, head_b)
    return out.reshape(b, h, wp, c)


def fused_rrdb(xp, w0, w1, w2, *, width, rb=None, interpret=False):
    """One whole RRDB (3 dense blocks + residual) on packed input.

    xp: [B, H, Wp, C]; w0/w1/w2: proj_weights lists for the three dense
    blocks. Returns [B, H, Wp, C] — equal to three fused_dense_block
    calls with the residual fold, up to f.p. reassociation.
    """
    b, h, wp, c = xp.shape
    g = w0[4].shape[0] // 3
    if rb is None:
        rb = pick_rb_rrdb(h, wp)
    nb = h // rb
    tops, mid, bots = edge_windows(xp, rb, nb, halo=RRDB_HALO)
    spec_edge, spec_mid, _ = window_specs(rb, wp, c, halo=RRDB_HALO)
    weights = list(w0) + list(w1) + list(w2)

    def kernel(*refs):
        *ins, out = refs
        _rrdb_kernel(*ins, out_ref=out, rb=rb, wp=wp, width=width,
                     nb=nb, h_img=h, g=g, c=c)

    out = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        grid=(b * nb,),
        in_specs=[spec_edge, spec_mid, spec_edge]
        + [const_spec(t) for t in weights],
        out_specs=spec_mid,
        out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp, c), xp.dtype),
        interpret=interpret,
    )(tops, mid, bots, *weights)
    return out.reshape(b, h, wp, c)
