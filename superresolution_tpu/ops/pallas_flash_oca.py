"""Flash OCAB with the kv gather INSIDE the kernel.

The deployed OCAB path (infer/fused_hat._ocab) spends ~3.9 ms of its
~12.5 ms on extract_overlapping_windows (exp_r23): XLA materializes the
per-window [m=ows^2, C] key/value patches — a [B*nW, 144, 2C] tensor
(~226 MB at the flagship geometry) written and re-read through HBM,
with a full-tensor transpose to reach token order.

This kernel never materializes the gathered tensor. It grids over
(image, window-row) and reads the padded k/v MAPS directly — each grid
step gets two ws-row blocks per map (the window-row's rows and the next
block, covering the ows-row overlap without overlapping BlockSpecs) —
then slices each window's [ows, 2*ws] patch out of the VMEM slab.

Two layout choices keep every Mosaic op on cheap paths:

  * the patch keeps 2*ws COLUMNS (16 at ws=8) instead of ows (12), so
    the [ows, 2*ws, C] -> [ows*2*ws, C] token flatten merges the outer
    dim into an 8-aligned sublane dim (free); the 2*ws - ows junk
    columns are masked with -1e9 logits, which underflow to exactly 0
    after the f32 softmax — bit-equal to not gathering them at all;
  * attention is permutation-safe: the rel-pos bias is scattered into
    the widened [m = ows*2*ws] token axis at weight-prep time, so the
    in-kernel token order IS the reference token order with masked
    gaps, and no reorder is ever needed.

Attention uses the stacked-head form (2 MXU dots per window, heads on
the M dim with lane masks — ops/pallas_attn._attn_window semantics).

Autodiff: custom_vjp; backward recomputes the reference gather +
attention (ops/unfold + pallas_attn.reference_window_attention) and
differentiates that, like flash_window_attention. Deploy path only —
training keeps the einsum OCA under remat (BENCHMARKS.md round-3).

Capability parity: reference HAT OCAB (reference src/architecture.py:
51-61 — overlapping cross-attention, overlap_ratio 0.5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.ops.pallas_windows import const_spec

_NEG = -1e9

__all__ = ["flash_oca_gathered", "oca_gather_supported"]


def oca_gather_supported(ws: int, ows: int, h: int, w: int) -> bool:
    """The kernel covers the production OCAB geometries: the overlap
    extent must fit the two-block slab (ows <= 2*ws), be even (the
    caller pads the kv map by 2*((ows-ws)//2) — an odd ows-ws would
    make _fwd_impl's derived h disagree with the padded map and fail
    at trace time; advisor round-4 finding), and the feature map must
    tile into whole windows."""
    return (ws < ows <= 2 * ws and (ows - ws) % 2 == 0
            and h % ws == 0 and w % ws == 0)


def _kernel(q_ref, ka_ref, kb_ref, va_ref, vb_ref, bias_ref, out_ref, *,
            nw_w, ws, ows, nh, scale):
    pb = 2 * ws
    m = ows * pb
    n = ws * ws
    c = q_ref.shape[-1]
    hd = c // nh
    kslab = jnp.concatenate(
        [ka_ref[0, 0], kb_ref[0, 0][: ows - ws]], axis=0)  # [ows, WP, C]
    vslab = jnp.concatenate(
        [va_ref[0, 0], vb_ref[0, 0][: ows - ws]], axis=0)
    hm3 = (jax.lax.broadcasted_iota(jnp.int32, (nh, 1, c), 2) // hd
           == jax.lax.broadcasted_iota(jnp.int32, (nh, 1, c), 0)
           ).astype(kslab.dtype)
    # junk-column mask: token t sits at patch col t % pb; cols >= ows
    # belong to the next window's rows and are not part of the patch
    tc = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1) % pb
    madd = jnp.where(tc < ows, jnp.float32(0.0), jnp.float32(_NEG))
    bias = bias_ref[:]  # stacked [nh*m, n] f32
    for wc in range(nw_w):
        sl = slice(wc * ws, wc * ws + pb)
        kp = kslab[:, sl, :].reshape(m, c)
        vp = vslab[:, sl, :].reshape(m, c)
        qw = q_ref[0, wc]  # [n, C]
        kst = (kp[None] * hm3).reshape(nh * m, c)
        vst = (vp[None] * hm3).reshape(nh * m, c)
        lt = jax.lax.dot_general(
            kst, qw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        lt3 = (lt + bias).reshape(nh, m, n) + madd
        lt3 = lt3 - jnp.max(lt3, axis=1, keepdims=True)
        e = jnp.exp(lt3)
        a = (e / jnp.sum(e, axis=1, keepdims=True)).reshape(nh * m, n)
        acc = jax.lax.dot_general(
            a.astype(vp.dtype), vst, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, wc] = acc.astype(out_ref.dtype)


def _widen_bias(bias, nh, n, ws, ows):
    """[nh, n, ows*ows] -> stacked-transposed [nh*m, n] on the widened
    m = ows*2*ws token axis (junk cols get 0 bias; their -1e9 mask
    makes the value irrelevant)."""
    pb = 2 * ws
    b4 = jnp.asarray(bias, jnp.float32).reshape(nh, n, ows, ows)
    b4 = jnp.pad(b4, ((0, 0), (0, 0), (0, 0), (0, pb - ows)))
    bw = b4.reshape(nh, n, ows * pb)
    return jnp.transpose(bw, (0, 2, 1)).reshape(nh * ows * pb, n)


def _fwd_impl(q, k_map, v_map, bias, num_heads, ws, ows, interpret):
    b, hp0, wp0, c = k_map.shape
    h, w = hp0 - (ows - ws), wp0 - (ows - ws)
    nh_w, nw_w = h // ws, w // ws
    nh = num_heads
    n = ws * ws
    pb = 2 * ws
    if q.shape != (b * nh_w * nw_w, n, c):
        raise ValueError(f"q {q.shape} != {(b * nh_w * nw_w, n, c)}")
    if not oca_gather_supported(ws, ows, h, w):
        raise ValueError(f"unsupported geometry ws={ws} ows={ows}")
    scale = float(c // nh) ** -0.5
    # pad the maps so every (row-block, row-block+1) pair and every
    # [wc*ws, wc*ws + 2*ws) column slice stays in bounds
    hp = ws * (nh_w + 1)
    wp = ws * (nw_w + 1)
    pad_h, pad_w = hp - hp0, wp - wp0
    if pad_h or pad_w:
        cfg = ((0, 0), (0, pad_h), (0, pad_w), (0, 0))
        k_map = jnp.pad(k_map, cfg)
        v_map = jnp.pad(v_map, cfg)
    kb = k_map.reshape(b, nh_w + 1, ws, wp, c)
    vb = v_map.reshape(b, nh_w + 1, ws, wp, c)
    q4 = q.reshape(b * nh_w, nw_w, n, c)
    bias_st = _widen_bias(bias, nh, n, ws, ows)
    spec_a = pl.BlockSpec((1, 1, ws, wp, c),
                          lambda i, nhw=nh_w: (i // nhw, i % nhw, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((1, 1, ws, wp, c),
                          lambda i, nhw=nh_w: (i // nhw, i % nhw + 1,
                                               0, 0, 0),
                          memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, nw_w, n, c), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, nw_w=nw_w, ws=ws, ows=ows, nh=nh, scale=scale),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        grid=(b * nh_w,),
        in_specs=[q_spec, spec_a, spec_b, spec_a, spec_b,
                  const_spec(bias_st)],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b * nh_w, nw_w, n, c), q.dtype),
        interpret=interpret,
    )(q4, kb, kb, vb, vb, bias_st)
    return out.reshape(b * nh_w * nw_w, n, c)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_oca_gathered(q, k_map, v_map, bias, num_heads, ws, ows,
                       interpret=False):
    """Overlapping cross-attention with the kv gather in-kernel.

    q:            [B*nH*nW, ws*ws, C] windowed queries (post q-dense)
    k_map, v_map: [B, H+(ows-ws), W+(ows-ws), C] padded key/value maps
                  (the map extract_overlapping_windows would consume)
    bias:         [nh, ws*ws, ows*ows] f32 rel-pos bias (zeros if none)
    Returns [B*nH*nW, ws*ws, C] in q.dtype — equal to the
    extract_overlapping_windows + flash_window_attention composition.
    """
    return _fwd_impl(q, k_map, v_map, bias, num_heads, ws, ows, interpret)


def _reference(q, k_map, v_map, bias, num_heads, ws, ows):
    from superresolution_tpu.ops.pallas_attn import (
        reference_window_attention)
    from superresolution_tpu.ops.unfold import extract_overlapping_windows

    b, hp0, wp0, c = k_map.shape
    h, w = hp0 - (ows - ws), wp0 - (ows - ws)
    nh_w, nw_w = h // ws, w // ws
    kw = extract_overlapping_windows(k_map, ws, ows, nh_w, nw_w)
    vw = extract_overlapping_windows(v_map, ws, ows, nh_w, nw_w)
    return reference_window_attention(q, kw, vw, bias)


def _fwd(q, k_map, v_map, bias, num_heads, ws, ows, interpret):
    out = _fwd_impl(q, k_map, v_map, bias, num_heads, ws, ows, interpret)
    return out, (q, k_map, v_map, bias)


def _bwd(num_heads, ws, ows, interpret, residuals, g):
    q, k_map, v_map, bias = residuals
    ref = partial(_reference, num_heads=num_heads, ws=ws, ows=ows)
    _, vjp = jax.vjp(lambda a, b_, c_, d: ref(a, b_, c_, d), q, k_map,
                     v_map, bias)
    return vjp(g)


flash_oca_gathered.defvjp(_fwd, _bwd)
