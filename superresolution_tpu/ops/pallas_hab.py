"""Fused HAB transformer-block kernel — the whole HATLite block body in
one Pallas program.

Why: the HAT stage's K=96 dense layers (qkv/proj/MLP) run at 9-20 TF/s
under XLA — not an MXU limit but a traffic one: each HABlock makes ~8
HBM round-trips of [tokens, C] activations (LN out, qkv, attention out,
proj, MLP hidden, residuals), and 96-lane tensors move at reduced
effective bandwidth on this chip. This kernel keeps the entire block
body in VMEM:

    LN1 -> q/k/v dots -> per-window masked-K flash attention (see
    ops/pallas_attn.py for the head-packing trick) -> proj ->
    (+x +cab residual) -> LN2 -> MLP(gelu) -> (+residual)

with all weights VMEM-resident. HBM sees ONE read of x, one read of the
(XLA-computed) CAB branch, and one write of the output. Measured
(benchmarks/exp_r3_fused_hab.py, nb=4096 hybrid shape): 4.43 ms vs
13.2 ms for the identical XLA region — 3x.

Mosaic constraints respected:
  * qkv is computed as three separate [C,C] dots — lane-slicing a
    [M, 3C] result at C-offsets is forbidden (128-alignment rule), so
    the [C, 3C] qkv weight is split OUTSIDE the kernel;
  * heads stay packed on the lane dim (masked-K / masked-V trick);
  * GELU: Mosaic has no erf/erfc primitive, so the exact (erf) GELU is
    computed with the Abramowitz-Stegun 7.1.26 polynomial (max abs err
    1.5e-7 — far below bf16 IO resolution, i.e. exact at block
    precision).

The kernel is the deploy-time inference path (infer/fused_hat.py);
gradients fall back to the jnp reference via custom_vjp.

Capability parity: reference HAT block (src/architecture.py:51-61 uses
the external HAT's HAB: W-MSA + conv_scale*CAB + MLP, LayerNorm pre-norm
— same math, fused execution).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9
_EPS = 1e-5

# weight order shared by the kernel signature and callers.
# The qkv bias is pre-split into bq/bk/bv OUTSIDE the kernel: lane-slicing
# a [1, 3C] row at C-offsets inside Mosaic hits the 128-alignment rule
# (observed: 'Invalid input layout' on the broadcast of the unaligned
# slice when C=96).
WEIGHT_NAMES = ("ln1_s", "ln1_b", "wq", "wk", "wv", "bq", "bk", "bv",
                "rpb", "wp", "bp", "ln2_s", "ln2_b", "w1", "b1", "w2",
                "b2")


def _ln(xf, s, b, c_real=None):
    """LayerNorm over the last axis. c_real: when the lane dim is
    zero-PADDED past the model's true channel count (the pad-to-128
    deploy transform, infer/lane_pad.py), statistics must average over
    the REAL channels only — pad lanes are zero, so the sums are
    unchanged and only the divisor differs."""
    if c_real is None or c_real == xf.shape[-1]:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = (jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
               - jnp.square(mu))
    else:
        inv = 1.0 / c_real
        mu = jnp.sum(xf, axis=-1, keepdims=True) * inv
        var = (jnp.sum(jnp.square(xf), axis=-1, keepdims=True) * inv
               - jnp.square(mu))
    return (xf - mu) * jax.lax.rsqrt(var + _EPS) * s + b


def erf_poly(z):
    """Abramowitz & Stegun 7.1.26 erf approximation (max abs err 1.5e-7)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    az = jnp.abs(z)
    t = 1.0 / (1.0 + p * az)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))


def gelu_exact(x):
    """erf-based GELU on the polynomial erf (f32 in/out)."""
    return 0.5 * x * (1.0 + erf_poly(x * 0.7071067811865476))


def _body(x, cab, w, madd_fn, *, nw, n, c, nh, scale, stacked=False,
          c_real=None):
    """Shared fused-block math on VMEM-resident values.

    x, cab: [nw*n, c] compute-dtype; w: dict of weight values;
    madd_fn(window) -> additive [n, n] mask or None.

    stacked=False: 2 dots per (window, head) — 12 per window at nh=6.
    stacked=True: 2 dots per WINDOW. Heads ride the M dimension with
    lane masks: K' = stack_h(kw*hm_h) [nh*n, c] contracted with qw on c
    gives TRANSPOSED per-head logits [nh*n, n] in one dot (transposed so
    the apply can contract dim 0: out = aT' . V' with V' = stack_h
    (vw*hm_h), which is exactly the masked-V head sum). Requires
    w["rpb"] pre-transposed to [nh*n, n] (block h = rpb[h].T) — callers
    go through _stack_rpb. The region mask is symmetric (ids_i == ids_j)
    so madd needs no transpose."""
    hd = c // nh
    xf = x.astype(jnp.float32)
    y = _ln(xf, w["ln1_s"], w["ln1_b"], c_real).astype(x.dtype)
    q = (jnp.dot(y, w["wq"], preferred_element_type=jnp.float32)
         + w["bq"]).astype(x.dtype)
    k = (jnp.dot(y, w["wk"], preferred_element_type=jnp.float32)
         + w["bk"]).astype(x.dtype)
    v = (jnp.dot(y, w["wv"], preferred_element_type=jnp.float32)
         + w["bv"]).astype(x.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1) // hd
    if stacked:
        # [nh, 1, c] lane masks, built once
        hm3 = (jax.lax.broadcasted_iota(jnp.int32, (nh, 1, c), 2) // hd
               == jax.lax.broadcasted_iota(jnp.int32, (nh, 1, c), 0)
               ).astype(k.dtype)
    attn_parts = []
    for wi in range(nw):
        qw = q[wi * n:(wi + 1) * n]
        kw = k[wi * n:(wi + 1) * n]
        vw = v[wi * n:(wi + 1) * n]
        madd = madd_fn(wi)
        if stacked:
            kst = (kw[None] * hm3).reshape(nh * n, c)
            vst = (vw[None] * hm3).reshape(nh * n, c)
            lt = jax.lax.dot_general(
                kst, qw, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            lt = lt + w["rpb"]  # pre-transposed [nh*n, n]
            if madd is not None:
                lt = (lt.reshape(nh, n, n) + madd[None]).reshape(
                    nh * n, n)
            lt3 = lt.reshape(nh, n, n)
            lt3 = lt3 - jnp.max(lt3, axis=1, keepdims=True)
            e = jnp.exp(lt3)
            a = (e / jnp.sum(e, axis=1, keepdims=True)).reshape(
                nh * n, n)
            acc = jax.lax.dot_general(
                a.astype(vw.dtype), vst, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            attn_parts.append(acc.astype(x.dtype))
            continue
        acc = None
        for h in range(nh):
            hm = (lane == h).astype(kw.dtype)
            logits = jax.lax.dot_general(
                qw, kw * hm, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = logits + w["rpb"][h]
            if madd is not None:
                logits = logits + madd
            a = jax.nn.softmax(logits, axis=-1)
            part = jax.lax.dot_general(
                a.astype(vw.dtype), vw * hm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        attn_parts.append(acc.astype(x.dtype))
    attn = jnp.concatenate(attn_parts, axis=0)
    proj = (jnp.dot(attn, w["wp"], preferred_element_type=jnp.float32)
            + w["bp"]).astype(x.dtype)
    x1 = x + proj + cab
    z = _ln(x1.astype(jnp.float32), w["ln2_s"], w["ln2_b"],
            c_real).astype(x.dtype)
    h1 = (jnp.dot(z, w["w1"], preferred_element_type=jnp.float32)
          + w["b1"])
    h1 = gelu_exact(h1).astype(x.dtype)
    o = (jnp.dot(h1, w["w2"], preferred_element_type=jnp.float32)
         + w["b2"]).astype(x.dtype)
    return x1 + o


def _kernel(x_ref, cab_ref, *rest, nw, n, c, nh, scale, masked,
            stacked=False, c_real=None):
    if masked:
        *w_refs, ids_s_ref, ids_l_ref, out_ref = rest
    else:
        *w_refs, out_ref = rest
    w = {name: ref[:] for name, ref in zip(WEIGHT_NAMES, w_refs)}
    x = x_ref[:].reshape(nw * n, c)
    cab = cab_ref[:].reshape(nw * n, c)

    def madd_fn(wi):
        if not masked:
            return None
        return jnp.where(ids_s_ref[wi] == ids_l_ref[wi],
                         jnp.float32(0.0), jnp.float32(_NEG))

    out = _body(x, cab, w, madd_fn, nw=nw, n=n, c=c, nh=nh, scale=scale,
                stacked=stacked, c_real=c_real)
    out_ref[:] = out.reshape(nw, n, c)


def _stack_rpb(rpb, nh, n):
    """[nh, n, n] rel-pos bias -> the stacked _body's transposed
    [nh*n, n] layout (block h = rpb[h].T)."""
    return jnp.transpose(jnp.asarray(rpb, jnp.float32),
                         (0, 2, 1)).reshape(nh * n, n)


def stacked_attn_default() -> bool:
    """Stacked-head attention layout (2 MXU dots per window, heads on
    the M dim) — DEFAULT since round 4: exp_r26 measured 3.63->3.01 ms
    (plain) / 3.19->2.73 ms (masked) marginal per 12-HAB chain and
    exp_r27 measured the e2e hybrid 0.2745->0.2969 MP/s (+8.2%);
    chip-equivalence `fused_hat_stacked_attn` rel 1.5e-2 (bf16). Set
    SRTPU_STACKED_ATTN=0 to fall back to the per-head loop."""
    import os

    return os.environ.get("SRTPU_STACKED_ATTN", "1") == "1"


def reference_hab_body(x_wins, cab_wins, weights, num_heads,
                       region_ids=None):
    """jnp reference of the fused region, for tests and the backward
    pass. x_wins/cab_wins: [nb, n, C]; weights: dict per WEIGHT_NAMES
    (wq/wk/wv [C,C], bq/bk/bv [1,C], rpb [nh,n,n], ln*/b* [1,C],
    w1 [C,M], b1 [1,M], w2 [M,C], b2 [1,C])."""
    nb, n, c = x_wins.shape
    w = weights
    scale = float(c // num_heads) ** -0.5
    xf = x_wins.astype(jnp.float32)
    y = _ln(xf, w["ln1_s"], w["ln1_b"]).astype(x_wins.dtype)
    toks = y.reshape(nb * n, c)
    q = (jnp.dot(toks, w["wq"], preferred_element_type=jnp.float32)
         + w["bq"]).astype(x_wins.dtype).reshape(nb, n, c)
    k = (jnp.dot(toks, w["wk"], preferred_element_type=jnp.float32)
         + w["bk"]).astype(x_wins.dtype).reshape(nb, n, c)
    v = (jnp.dot(toks, w["wv"], preferred_element_type=jnp.float32)
         + w["bv"]).astype(x_wins.dtype).reshape(nb, n, c)
    from superresolution_tpu.ops.pallas_attn import (
        reference_window_attention)

    attn = reference_window_attention(q, k, v, w["rpb"],
                                      region_ids=region_ids)
    proj = (jnp.dot(attn.reshape(nb * n, c), w["wp"],
                    preferred_element_type=jnp.float32)
            + w["bp"]).astype(x_wins.dtype).reshape(nb, n, c)
    x1 = x_wins + proj + cab_wins
    z = _ln(x1.astype(jnp.float32), w["ln2_s"],
            w["ln2_b"]).astype(x_wins.dtype)
    h = (jnp.dot(z.reshape(nb * n, c), w["w1"],
                 preferred_element_type=jnp.float32) + w["b1"])
    h = jax.nn.gelu(h, approximate=False).astype(x_wins.dtype)
    o = (jnp.dot(h, w["w2"], preferred_element_type=jnp.float32)
         + w["b2"]).astype(x_wins.dtype).reshape(nb, n, c)
    return x1 + o


def _pick_block(n_windows: int, prefer: int = 8) -> int:
    for nw in (prefer, 4, 2, 1):
        if n_windows % nw == 0:
            return nw
    return 1


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_hab_block(x_wins, cab_wins, num_heads, interpret, weights,
                    region_ids=None):
    """Fused HAB block on window-partitioned activations.

    x_wins, cab_wins: [nb, n, C] (cab pre-scaled by conv_scale, in the
    SAME roll/partition layout as x). weights: dict per WEIGHT_NAMES.
    region_ids: [nW_img, n] int32 Swin labels or None.
    Returns [nb, n, C].
    """
    return _fused_fwd_impl(x_wins, cab_wins, num_heads, interpret,
                           weights, region_ids)


def fused_hab_block_inference(x_wins, cab_wins, num_heads, interpret,
                              weights, region_ids, c_real=None):
    """Plain (non-custom_vjp) fused HAB block for the deploy path —
    identical to fused_hab_block but with c_real LayerNorm support for
    the pad-to-128 lane transform (infer/lane_pad.py). Inference only:
    no backward rule."""
    return _fused_fwd_impl(x_wins, cab_wins, num_heads, interpret,
                           weights, region_ids, c_real=c_real)


def _fused_fwd_impl(x_wins, cab_wins, num_heads, interpret, weights,
                    region_ids, c_real=None):
    nb, n, c = x_wins.shape
    nh = num_heads
    if c % nh:
        raise ValueError(f"C={c} not divisible by num_heads={nh}")
    mlp = weights["w1"].shape[-1]
    scale = float(c // nh) ** -0.5
    if region_ids is not None:
        nw_img = region_ids.shape[0]
        if nb % nw_img:
            raise ValueError(f"nb={nb} not a multiple of nW_img={nw_img}")
        nw = _pick_block(nw_img)
    else:
        nw = _pick_block(nb)
    xspec = pl.BlockSpec((nw, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    stacked = stacked_attn_default()
    w_shapes = {
        "ln1_s": (1, c), "ln1_b": (1, c),
        "wq": (c, c), "wk": (c, c), "wv": (c, c),
        "bq": (1, c), "bk": (1, c), "bv": (1, c),
        "rpb": (nh * n, n) if stacked else (nh, n, n),
        "wp": (c, c), "bp": (1, c),
        "ln2_s": (1, c), "ln2_b": (1, c),
        "w1": (c, mlp), "b1": (1, mlp), "w2": (mlp, c), "b2": (1, c),
    }
    weights = dict(weights)
    if stacked:
        weights["rpb"] = _stack_rpb(weights["rpb"], nh, n)
    w_vals = [weights[k].reshape(w_shapes[k]) for k in WEIGHT_NAMES]
    w_specs = [const(w_shapes[k]) for k in WEIGHT_NAMES]
    out_shape = jax.ShapeDtypeStruct(x_wins.shape, x_wins.dtype)
    masked = region_ids is not None
    extra_vals, extra_specs = [], []
    if masked:
        nw_img = region_ids.shape[0]
        blocks = nw_img // nw
        extra_vals = [region_ids.reshape(nw_img, n, 1),
                      region_ids.reshape(nw_img, 1, n)]
        extra_specs = [
            pl.BlockSpec((nw, n, 1), lambda i: (i % blocks, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nw, 1, n), lambda i: (i % blocks, 0, 0),
                         memory_space=pltpu.VMEM)]
    return pl.pallas_call(
        partial(_kernel, nw=nw, n=n, c=c, nh=nh, scale=scale,
                masked=masked, stacked=stacked, c_real=c_real),
        grid=(nb // nw,),
        in_specs=[xspec, xspec] + w_specs + extra_specs,
        out_specs=xspec,
        out_shape=out_shape,
        interpret=interpret,
    )(x_wins, cab_wins, *w_vals, *extra_vals)


def _fused_fwd(x_wins, cab_wins, num_heads, interpret, weights,
               region_ids):
    out = _fused_fwd_impl(x_wins, cab_wins, num_heads, interpret, weights,
                          region_ids)
    return out, (x_wins, cab_wins, weights, region_ids)


def _fused_bwd(num_heads, interpret, residuals, g):
    x_wins, cab_wins, weights, region_ids = residuals
    ref = partial(reference_hab_body, num_heads=num_heads,
                  region_ids=region_ids)
    _, vjp = jax.vjp(lambda x, cab, w: ref(x, cab, w), x_wins, cab_wins,
                     weights)
    dx, dcab, dw = vjp(g)
    return dx, dcab, dw, None


fused_hab_block.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Fused CAB: LN -> conv3x3 (C -> C/3) -> GELU -> conv3x3 (-> C), the
# channel-attention branch's conv stack in one VMEM-resident program.
# The squeeze-excite tail (global mean + 2 tiny dense) stays XLA. Same
# roll-conv machinery as ops/pallas_dense_trunk.py (see its module doc
# for the design and the Mosaic constraints); both convs carry biases,
# so every stage output is masked (pad cols + out-of-image rows).
# ---------------------------------------------------------------------------

_CAB_PAD = 8


def cab_pack_width(width: int) -> int:
    from superresolution_tpu.ops.pallas_windows import padded_width

    return padded_width(width, _CAB_PAD)


def cab_weights(hp, dtype=jnp.bfloat16):
    """HABlock params -> fused-CAB weight list.

    hp: the HABlock subtree (LayerNorm_0 + ChannelAttentionBlock_0).
    Tracer-safe (jnp ops only — callers apply it under lax.scan).
    Returns [ln_s, ln_b, A1,B1,C1,bias1, A2,B2,C2,bias2].
    """
    cab = hp["ChannelAttentionBlock_0"]
    out = [jnp.asarray(hp["LayerNorm_0"]["scale"],
                       jnp.float32).reshape(1, -1),
           jnp.asarray(hp["LayerNorm_0"]["bias"],
                       jnp.float32).reshape(1, -1)]
    for name in ("Conv_0", "Conv_1"):
        cp = cab[name]["Conv_0"]
        w = jnp.asarray(cp["kernel"], jnp.float32)  # [3, 3, cin, n]
        cin, n = w.shape[2], w.shape[3]
        for dx in (1, 0, 2):
            out.append(w[:, dx].reshape(3 * cin, n).astype(dtype))
        out.append(jnp.asarray(cp["bias"],
                               jnp.float32).reshape(1, n))
    return out


def _cab_kernel(top_ref, mid_ref, bot_ref, ln_s, ln_b,
                a1, b1, c1, bias1, a2, b2, c2, bias2, out_ref,
                *, rb, w_img, wp, nb, h_img, c, c_real=None):
    halo = 2
    row_start = (pl.program_id(0) % nb) * rb
    pad_r = wp - w_img - _CAB_PAD

    def padw(t, rows):
        z = jnp.zeros((rows, _CAB_PAD, c), t.dtype)
        zr = jnp.zeros((rows, pad_r, c), t.dtype)
        return jnp.concatenate([z, t, zr], axis=1).reshape(rows * wp, c)

    xf = jnp.concatenate([
        padw(top_ref[0], halo), padw(mid_ref[0], rb),
        padw(bot_ref[0], halo)], axis=0)

    def mask(t, k):
        # 2D-reshape mask — no per-element %// by non-pow2 wp
        # (exp_r7b: the flat form costs ~20% of the whole kernel)
        m = t.shape[0]
        rows, n = m // wp, t.shape[1]
        t2 = t.reshape(rows, wp, n)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
        r_img = row + (row_start - halo + k)
        ok = ((col >= _CAB_PAD) & (col < _CAB_PAD + w_img)
              & (r_img >= 0) & (r_img < h_img))
        t2 = jnp.where(ok, t2, jnp.asarray(0, t2.dtype))
        return t2.reshape(m, n)

    def rconv(u, a, b, cm, bias, k):
        mu = u.shape[0]
        mo = mu - 2 * wp
        lhs = jnp.concatenate(
            [u[0:mo], u[wp:wp + mo], u[2 * wp:2 * wp + mo]], axis=1)
        acc = jnp.dot(lhs, a[:], preferred_element_type=jnp.float32)
        acc = acc + bias[:]
        pb = jnp.dot(lhs, b[:], preferred_element_type=jnp.float32)
        acc = acc + pltpu.roll(pb, 1, 0)
        pc = jnp.dot(lhs, cm[:], preferred_element_type=jnp.float32)
        acc = acc + pltpu.roll(pc, mo - 1, 0)
        return mask(acc, k)

    ln = _ln(xf.astype(jnp.float32), ln_s[:], ln_b[:], c_real)
    ln = mask(ln, 0).astype(xf.dtype)
    h1 = rconv(ln, a1, b1, c1, bias1, 1)
    h1 = gelu_exact(h1).astype(xf.dtype)
    h2 = rconv(h1, a2, b2, c2, bias2, 2).astype(xf.dtype)
    out_ref[0] = h2.reshape(rb, wp, c)


def fused_cab_convs(x, weights, interpret=False, rb=None, c_real=None):
    """LN + the CAB conv stack on x [B, H, W, C]; returns the pre-SE
    tensor [B, H, W, C]. W-padding happens IN-KERNEL (zero concat)."""
    b, h, w_img, c = x.shape
    wp = cab_pack_width(w_img)
    from superresolution_tpu.ops.pallas_windows import (
        const_spec, edge_windows, largest_row_block, window_specs)

    halo = 2
    if rb is None:
        # f32 intermediates at 128-padded lanes cost ~5 stage tensors of
        # (rb+4)*wp tokens; 9000 tokens keeps the program under the
        # 128 MB physical VMEM (rb=128/wp=272 measured 153.7M — OOM).
        rb = largest_row_block(h, max(1, 9000 // wp - 2 * halo))
    nb = h // rb
    tops, mid, bots = edge_windows(x, rb, nb, halo=halo)
    spec_edge, spec_mid, _ = window_specs(rb, w_img, c, halo=halo)

    out = pl.pallas_call(
        partial(_cab_kernel, rb=rb, w_img=w_img, wp=wp, nb=nb, h_img=h,
                c=c, c_real=c_real),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        grid=(b * nb,),
        in_specs=[spec_edge, spec_mid, spec_edge]
        + [const_spec(t) for t in weights],
        out_specs=pl.BlockSpec((1, rb, wp, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp, c), x.dtype),
        interpret=interpret,
    )(tops, mid, bots, *weights)
    return out.reshape(b, h, wp, c)[:, :, _CAB_PAD:_CAB_PAD + w_img]


# ---------------------------------------------------------------------------
# Pair-packed fused CAB (round 3). The roll-conv fused_cab_convs above
# only MATCHED XLA (2.91 vs 2.97 ms at [4,256,256,96] — exp_r6_cab):
# its dots sit in the slow MXU class (conv1 K=288 N=32, conv2 K=96
# N=96). The 2-column-phase view ([B,H,Wp,C] -> [B,H,Wp/2,2C], a FREE
# row-major reshape) makes each conv ONE dot in the full-fill class —
# conv1 [m,1152]@[1152,64], conv2 [m,384]@[384,192] (K = 12*cin: 3 dy x
# 4 phase variants, 9*cin useful) — the exp_r9 pair formulation, which
# was a wash for the (already-fast) dense trunk but targets exactly
# this kernel's deficit. LN runs per phase slice in-kernel; dx taps are
# two bf16 input-slab token shifts; output columns are phase-blocked
# [p0 n | p1 n], which IS the packed layout of two adjacent pixels.
# ---------------------------------------------------------------------------

# column-phase variants in lhs slab order: (input phase, token shift)
_V2 = ((1, -1), (0, 0), (1, 0), (0, 1))


def _pair_conv_weight(k, dtype):
    """[3,3,cin,n] conv kernel -> pair-packed [12*cin, 2*n] tap matrix.

    Tracer-safe (jnp concats of kernel slices) — callers apply it under
    lax.scan over blocks, like cab_weights."""
    k = jnp.asarray(k)
    cin, n = k.shape[2], k.shape[3]
    z = jnp.zeros((cin, n), k.dtype)
    blocks = []
    for dyi in range(3):
        for ph, dt in _V2:
            row = []
            for q in (0, 1):
                dx = ph + 2 * dt - q
                row.append(k[dyi, dx + 1] if dx in (-1, 0, 1) else z)
            blocks.append(jnp.concatenate(row, axis=1))
    return jnp.concatenate(blocks, axis=0).astype(dtype)


def cab_pair_weights(hp, dtype=jnp.bfloat16):
    """HABlock params -> pair-kernel weight list
    [ln_s, ln_b, W1, bias1, W2, bias2] (biases duplicated per phase).
    Tracer-safe."""
    cab = hp["ChannelAttentionBlock_0"]
    out = [jnp.asarray(hp["LayerNorm_0"]["scale"],
                       jnp.float32).reshape(1, -1),
           jnp.asarray(hp["LayerNorm_0"]["bias"],
                       jnp.float32).reshape(1, -1)]
    for name in ("Conv_0", "Conv_1"):
        cp = cab[name]["Conv_0"]
        out.append(_pair_conv_weight(cp["kernel"], dtype))
        b = jnp.asarray(cp["bias"], jnp.float32)
        out.append(jnp.concatenate([b, b]).reshape(1, -1))
    return out


def _cab_pair_kernel(top_ref, mid_ref, bot_ref, ln_s, ln_b,
                     w1, bias1, w2, bias2, out_ref,
                     *, rb, w_img, wp2, nb, h_img, c):
    halo = 2
    row_start = (pl.program_id(0) % nb) * rb
    pad2 = _CAB_PAD // 2
    w2_img = w_img // 2
    c2 = 2 * c

    # the pair view + zero pad happen HOST-side (a free row-major
    # relabel of the padded array): Mosaic rejects the lane-halving
    # [rows, w, c] -> [rows, w/2, 2c] reshape as an in-kernel vector
    # shape cast ('infer-vector-layout: unsupported shape cast')
    xf = jnp.concatenate([top_ref[0].reshape(halo * wp2, c2),
                          mid_ref[0].reshape(rb * wp2, c2),
                          bot_ref[0].reshape(halo * wp2, c2)], axis=0)

    def mask(t, k):
        m = t.shape[0]
        rows, n = m // wp2, t.shape[1]
        t2 = t.reshape(rows, wp2, n)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, wp2, 1), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
        r_img = row + (row_start - halo + k)
        ok = ((col >= pad2) & (col < pad2 + w2_img)
              & (r_img >= 0) & (r_img < h_img))
        t2 = jnp.where(ok, t2, jnp.asarray(0, t2.dtype))
        return t2.reshape(m, n)

    def rconv2(u, w, bias, k):
        # lhs slabs per dy: [sm | u | sp] (exp_r9 formulation); wp2 is a
        # multiple of 16 so dy row-offset slices stay sublane-aligned
        cin = u.shape[1] // 2
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
        acc = acc + bias[:]
        return mask(acc, k)

    # LN per phase slice (lane slices at multiples of 32 are fine;
    # it's 3C-row broadcasts and mismatched-sublane concats that
    # Mosaic rejects)
    xf32 = xf.astype(jnp.float32)
    ln = jnp.concatenate(
        [_ln(xf32[:, :c], ln_s[:], ln_b[:]),
         _ln(xf32[:, c:], ln_s[:], ln_b[:])], axis=1)
    ln = mask(ln, 0).astype(xf.dtype)
    h1 = rconv2(ln, w1, bias1, 1)
    h1 = gelu_exact(h1).astype(xf.dtype)
    h2 = rconv2(h1, w2, bias2, 2).astype(xf.dtype)
    out_ref[0] = h2.reshape(rb, wp2, c2)


def fused_cab_convs_pair(x, weights, interpret=False, rb=None):
    """LN + the CAB conv stack on x [B, H, W, C] via the pair-packed
    kernel; returns the pre-SE tensor [B, H, W, C]. Requires even W."""
    b, h, w_img, c = x.shape
    if w_img % 2:
        raise ValueError("pair-packed CAB needs even width")
    # packed width: pad2 cols each side, multiple of 16 (so wp2*2c rows
    # stay tile-aligned and dy slices at wp2 offsets align)
    w2_img = w_img // 2
    pad2 = _CAB_PAD // 2
    wp2 = -(-(w2_img + 2 * pad2) // 16) * 16
    from superresolution_tpu.ops.pallas_windows import (
        const_spec, edge_windows, largest_row_block, window_specs)

    halo = 2
    if rb is None:
        # live stages at 2C lanes: xf/ln/h2 [m,192]b16+f32, lhs1
        # [m,1152] bf16 dominates; 12000 packed tokens measured-safe
        # headroom class (cf. fused_cab_convs' 9000 at wp lanes)
        rb = largest_row_block(h, max(1, 12000 // wp2 - 2 * halo))
    nb = h // rb
    # pad + pair view host-side (free row-major relabel; Mosaic rejects
    # the lane-halving reshape in-kernel)
    xp = jnp.pad(x, ((0, 0), (0, 0),
                     (_CAB_PAD, 2 * wp2 - w_img - _CAB_PAD), (0, 0)))
    x2 = xp.reshape(b, h, wp2, 2 * c)
    tops, mid, bots = edge_windows(x2, rb, nb, halo=halo)
    spec_edge, spec_mid, _ = window_specs(rb, wp2, 2 * c, halo=halo)

    out = pl.pallas_call(
        partial(_cab_pair_kernel, rb=rb, w_img=w_img, wp2=wp2, nb=nb,
                h_img=h, c=c),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        grid=(b * nb,),
        in_specs=[spec_edge, spec_mid, spec_edge]
        + [const_spec(t) for t in weights],
        out_specs=pl.BlockSpec((1, rb, wp2, 2 * c),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp2, 2 * c),
                                       x.dtype),
        interpret=interpret,
    )(tops, mid, bots, *weights)
    out = out.reshape(b, h, wp2 * 2, c)
    return out[:, :, _CAB_PAD:_CAB_PAD + w_img]
