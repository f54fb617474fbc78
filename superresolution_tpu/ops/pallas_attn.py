"""Flash window attention — production Pallas kernel for HATLite.

The XLA window-attention path materializes the [nb, nh, n, n] logits
tensor in HBM between the two attention einsums; on this chip 64-lane
tensors move at ~110-130 GB/s effective, which makes that tensor the
dominant cost of every HAT block (BENCHMARKS.md "Reference headline
workload"). This kernel computes logits -> bias/mask -> softmax -> @V
entirely in VMEM, so the logits never touch HBM, and reads/writes only
the packed [nb, n, C] q/k/v/out tensors at full lane width.

Mosaic constraint driving the design (probed on this libtpu, see
BENCHMARKS.md): lane-dim slices must be 128-aligned, so a 96-lane tensor
cannot be sliced into 16-lane heads. Heads therefore stay packed on the
lane dim end-to-end:

  * per-head logits use the masked-K trick — logits_h = Q @ (K .* m_h)^T
    where m_h zeroes lanes outside head h, so contracting over all C
    lanes equals the head-dim contraction;
  * the packed output is rebuilt as sum_h A_h @ (V .* m_h) — masked V
    zeroes the other heads' lanes, so the sum is the concatenation.

This spends num_heads x the minimal attention FLOPs, but the workload is
HBM-bound, not FLOP-bound: measured on the hybrid workload (nb=4096
windows, n=64, C=96) the kernel replaces a ~4 ms XLA attention inner
with sub-ms compute (benchmarks/exp_r3_flash_attn.py).

Shifted (Swin) windows: instead of streaming the [nW, n, n] additive
mask (which would re-read a logits-sized tensor and defeat the purpose),
the kernel takes per-window REGION IDS ([nW_img, n] int32, the Swin
region labels) in sublane and lane layouts and rebuilds the 0/-1e9 mask
in VMEM with one compare per window.

Autodiff: custom_vjp — forward runs the kernel; backward recomputes the
attention with the jnp reference path and differentiates that (correct
gradients at XLA-path cost). Training defaults keep the jnp path anyway
(attn_f32=True); the kernel is the inference fast path.

Capability parity target: reference src/architecture.py:51-61 (HAT
window attention, window 8) — same math, TPU-native execution.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def reference_window_attention(q, k, v, bias, region_ids=None,
                               acc_t=jnp.float32):
    """jnp reference: packed q [nb, n, C], k/v [nb, m, C] (m == n for
    self-attention, m > n for OCAB cross-attention), bias [nh, n, m] f32,
    region_ids [nW_img, n] int32 or None. Matches WindowAttention's
    einsum path (models/hat_lite.py) up to fp reassociation."""
    nb, n, c = q.shape
    m = k.shape[1]
    nh = bias.shape[0]
    hd = c // nh
    qh = q.reshape(nb, n, nh, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(nb, m, nh, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(nb, m, nh, hd).transpose(0, 2, 1, 3)
    scale = jnp.asarray(hd, jnp.float32) ** -0.5
    attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh,
                      preferred_element_type=acc_t) * scale.astype(acc_t)
    attn = attn + bias[None].astype(acc_t)
    if region_ids is not None:
        nw_img = region_ids.shape[0]
        madd = jnp.where(
            region_ids[:, :, None] == region_ids[:, None, :], 0.0, _NEG)
        attn = (attn.reshape(nb // nw_img, nw_img, nh, n, n)
                + madd[None, :, None].astype(acc_t)).reshape(nb, nh, n, n)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
    return out.transpose(0, 2, 1, 3).reshape(nb, n, c)


def _attn_window(qw, kw, vw, bias, madd, *, nh, scale, stacked, hm3,
                 lane, hd):
    """One window's packed-head attention on VMEM values.

    qw [n, c], kw/vw [m, c]; bias is bias_ref[h]-indexable [nh, n, m]
    when stacked=False, or the pre-stacked TRANSPOSED [nh*m, n] layout
    (block h = bias[h].T, see _stack_bias) when stacked=True.

    stacked=False: 2 dots per head (masked-K / masked-V trick).
    stacked=True: 2 dots per WINDOW — K' = stack_h(kw*hm_h) [nh*m, c]
    contracted with qw over c gives transposed per-head logits
    [nh*m, n] in one dot; out = A'^T-contract V' with V' = stack_h
    (vw*hm_h), which is exactly the masked-V head sum. Same layout as
    ops/pallas_hab._body(stacked=True) — exp_r26/r27 measured it 17%
    faster per kernel, +8.2% e2e hybrid. The region mask is symmetric
    (only used when m == n) so madd needs no transpose."""
    m_len = kw.shape[0]
    if stacked:
        kst = (kw[None] * hm3).reshape(nh * m_len, -1)
        vst = (vw[None] * hm3).reshape(nh * m_len, -1)
        lt = jax.lax.dot_general(
            kst, qw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        lt = lt + bias  # pre-transposed [nh*m, n]
        lt3 = lt.reshape(nh, m_len, qw.shape[0])
        if madd is not None:
            lt3 = lt3 + madd[None]
        lt3 = lt3 - jnp.max(lt3, axis=1, keepdims=True)
        e = jnp.exp(lt3)
        a = (e / jnp.sum(e, axis=1, keepdims=True)).reshape(
            nh * m_len, qw.shape[0])
        return jax.lax.dot_general(
            a.astype(vw.dtype), vst, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc = None
    for h in range(nh):
        hm = (lane == h).astype(kw.dtype)
        logits = jax.lax.dot_general(
            qw, kw * hm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        logits = logits + bias[h]
        if madd is not None:
            logits = logits + madd
        a = jax.nn.softmax(logits, axis=-1)
        part = jax.lax.dot_general(
            a.astype(vw.dtype), vw * hm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def _head_masks(nh, c, hd, dtype, stacked):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1) // hd
    hm3 = None
    if stacked:
        hm3 = (jax.lax.broadcasted_iota(jnp.int32, (nh, 1, c), 2) // hd
               == jax.lax.broadcasted_iota(jnp.int32, (nh, 1, c), 0)
               ).astype(dtype)
    return lane, hm3


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, nw, nh, scale,
            stacked=False):
    c = q_ref.shape[2]
    hd = c // nh
    lane, hm3 = _head_masks(nh, c, hd, k_ref.dtype, stacked)
    bias = bias_ref[:] if stacked else bias_ref
    for w in range(nw):
        acc = _attn_window(q_ref[w], k_ref[w], v_ref[w], bias, None,
                           nh=nh, scale=scale, stacked=stacked, hm3=hm3,
                           lane=lane, hd=hd)
        out_ref[w] = acc.astype(out_ref.dtype)


def _kernel_masked(q_ref, k_ref, v_ref, bias_ref, ids_s_ref, ids_l_ref,
                   out_ref, *, nw, nh, scale, stacked=False):
    c = q_ref.shape[2]
    hd = c // nh
    lane, hm3 = _head_masks(nh, c, hd, k_ref.dtype, stacked)
    bias = bias_ref[:] if stacked else bias_ref
    for w in range(nw):
        # Swin shift mask rebuilt in VMEM: [n,1] ids vs [1,n] ids.
        # Symmetric, so valid in both the plain and transposed layouts.
        madd = jnp.where(ids_s_ref[w] == ids_l_ref[w],
                         jnp.float32(0.0), jnp.float32(_NEG))
        acc = _attn_window(q_ref[w], k_ref[w], v_ref[w], bias, madd,
                           nh=nh, scale=scale, stacked=stacked, hm3=hm3,
                           lane=lane, hd=hd)
        out_ref[w] = acc.astype(out_ref.dtype)


def _stack_bias(bias, nh, n, m):
    """[nh, n, m] bias -> the stacked transposed [nh*m, n] layout
    (block h = bias[h].T)."""
    return jnp.transpose(jnp.asarray(bias, jnp.float32),
                         (0, 2, 1)).reshape(nh * m, n)


def stacked_flash_default() -> bool:
    """Stacked-head layout for the flash (OCAB / flash-attn) kernel.
    MEASURED WASH e2e (exp_r28, two runs: 219.8/219.6 loop vs
    218.9/220.4 stacked ms/batch on the flagship hybrid — the OCAB's
    cost is dominated by the kv gather + XLA glue, not the attention
    dots, so the HAB kernel's stacked win does not transfer). Stays
    off by default; SRTPU_STACKED_FLASH=1 enables (chip-equivalent,
    chipeq `flash_oca_stacked`)."""
    import os

    return os.environ.get("SRTPU_STACKED_FLASH", "0") == "1"


def _pick_block(n_windows: int, prefer: int = 16) -> int:
    for nw in (prefer, 8, 4, 2, 1):
        if n_windows % nw == 0:
            return nw
    return 1


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_window_attention(q, k, v, bias, num_heads, interpret=False,
                           region_ids=None):
    """Packed flash window attention.

    q, k, v: [nb, n, C] (bf16 or f32), heads packed on C = nh * hd.
    bias:    [nh, n, n] f32 relative-position bias (post-gather).
    region_ids: optional [nW_img, n] int32 Swin region labels; nW_img
        must divide nb (windows of one image are contiguous).
    Returns [nb, n, C] in q.dtype.
    """
    return _flash_fwd_impl(q, k, v, bias, num_heads, interpret, region_ids)


def _flash_fwd_impl(q, k, v, bias, num_heads, interpret, region_ids):
    nb, n, c = q.shape
    m = k.shape[1]  # key/value length: n (self) or larger (OCAB cross)
    nh = num_heads
    if c % nh:
        raise ValueError(f"C={c} not divisible by num_heads={nh}")
    scale = float(c // nh) ** -0.5
    if region_ids is not None:
        nw_img = region_ids.shape[0]
        if nb % nw_img:
            raise ValueError(f"nb={nb} not a multiple of nW_img={nw_img}")
        nw = _pick_block(nw_img)
    else:
        nw = _pick_block(nb)
    q_spec = pl.BlockSpec((nw, n, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((nw, m, c), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    stacked = stacked_flash_default()
    if stacked:
        bias = _stack_bias(bias, nh, n, m)
        bias_spec = pl.BlockSpec((nh * m, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        bias_spec = pl.BlockSpec((nh, n, m), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    if region_ids is None:
        return pl.pallas_call(
            partial(_kernel, nw=nw, nh=nh, scale=scale, stacked=stacked),
            grid=(nb // nw,),
            in_specs=[q_spec, kv_spec, kv_spec, bias_spec],
            out_specs=q_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(q, k, v, bias.astype(jnp.float32))
    if m != n:
        raise ValueError("region_ids only supported for self-attention")
    nw_img = region_ids.shape[0]
    ids_s = region_ids.reshape(nw_img, n, 1)
    ids_l = region_ids.reshape(nw_img, 1, n)
    blocks = nw_img // nw
    ids_s_spec = pl.BlockSpec((nw, n, 1), lambda i: (i % blocks, 0, 0),
                              memory_space=pltpu.VMEM)
    ids_l_spec = pl.BlockSpec((nw, 1, n), lambda i: (i % blocks, 0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel_masked, nw=nw, nh=nh, scale=scale,
                stacked=stacked),
        grid=(nb // nw,),
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec, ids_s_spec,
                  ids_l_spec],
        out_specs=q_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(q, k, v, bias.astype(jnp.float32), ids_s, ids_l)


def _flash_fwd(q, k, v, bias, num_heads, interpret, region_ids):
    out = _flash_fwd_impl(q, k, v, bias, num_heads, interpret, region_ids)
    return out, (q, k, v, bias, region_ids)


def _flash_bwd(num_heads, interpret, residuals, g):
    q, k, v, bias, region_ids = residuals
    ref = partial(reference_window_attention, region_ids=region_ids)
    _, vjp = jax.vjp(ref, q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, dbias, None


flash_window_attention.defvjp(_flash_fwd, _flash_bwd)
