"""Flash window attention prototype: can a Pallas kernel that keeps the
attention logits in VMEM beat the XLA einsum path for HAT's window
attention (seq 64, heads 6, head dim 16, embed 96)?

Why the XLA path is slow (BENCHMARKS.md): the [nb, nh, 64, 64] logits
tensor round-trips HBM between the two einsums, and 64-lane tensors move
at ~110-130 GB/s effective on this chip; bf16 logits (attn_f32=False)
already bought +42% end-to-end — this kernel removes the traffic
entirely.

Design constraint (Mosaic probes, BENCHMARKS.md): lane-dim slices must be
128-aligned, so per-head slices of a 96-lane tensor (offset 16) are
unavailable. Instead:
  * heads stay PACKED on the 96-lane dim for all DMA (full-lane traffic);
  * per-head logits use the masked-K trick: logits_h = Q @ (K .* m_h)^T
    where m_h zeroes lanes outside head h — contraction over all 96 lanes
    equals the 16-lane head contraction;
  * the packed output is rebuilt as sum_h A_h @ (V .* m_h): masked V
    zeroes the other heads' lanes, so the sum IS the concatenation.
FLOP cost: 6x the minimal attention FLOPs, but at K=96/64 MXU rates
(vs the HBM-bound status quo) that trade wins if rates exceed ~8 TF/s.

Usage (on the TPU chip): python benchmarks/exp_r3_flash_attn.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

NH, HD, N = 6, 16, 64  # heads, head dim, window seq len (ws=8)
C = NH * HD  # 96


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def timeit(fn, q, *args, iters=20, warmup=1):
    """Device-side dependency-chained loop: the only reliable way to time
    individual ops through the dev tunnel (see BENCHMARKS.md)."""

    @jax.jit
    def chained(q):
        def body(_, x):
            y = fn(x, *args)
            return y.reshape(x.shape).astype(x.dtype)

        return jax.lax.fori_loop(0, iters, body, q)

    for _ in range(warmup):
        out = chained(q)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chained(q)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------- reference
def xla_attn(q, k, v, bias, acc_t=jnp.bfloat16):
    """Current WindowAttention inner path: [nb, n, C] packed qkv."""
    nb = q.shape[0]
    qh = q.reshape(nb, N, NH, HD).transpose(0, 2, 1, 3)
    kh = k.reshape(nb, N, NH, HD).transpose(0, 2, 1, 3)
    vh = v.reshape(nb, N, NH, HD).transpose(0, 2, 1, 3)
    scale = jnp.asarray(HD, jnp.float32) ** -0.5
    attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh,
                      preferred_element_type=acc_t) * scale.astype(acc_t)
    attn = attn + bias[None].astype(acc_t)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
    return out.transpose(0, 2, 1, 3).reshape(nb, N, C)


# ------------------------------------------------- kernel A: masked-K packed
def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, nw, scale,
                  stable=True):
    # head-select masks on the 96-lane dim, materialized once per program
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, C), 1) // HD
    for w in range(nw):
        qw = q_ref[w]  # [N, C] bf16
        kw = k_ref[w]
        vw = v_ref[w]
        acc = jnp.zeros((N, C), jnp.float32)
        for h in range(NH):
            m = (lane == h).astype(kw.dtype)
            logits = jax.lax.dot_general(
                qw, kw * m, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = logits + bias_ref[h]
            if stable:
                a = jax.nn.softmax(logits, axis=-1)
            else:
                e = jnp.exp(logits)
                a = e / jnp.sum(e, axis=-1, keepdims=True)
            acc = acc + jax.lax.dot_general(
                a.astype(vw.dtype), vw * m, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[w] = acc.astype(out_ref.dtype)


def flash_attn_packed(q, k, v, bias, nw=8, stable=True):
    nb = q.shape[0]
    scale = float(HD) ** -0.5
    spec = pl.BlockSpec((nw, N, C), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((NH, N, N), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_flash_kernel, nw=nw, scale=scale, stable=stable),
        grid=(nb // nw,),
        in_specs=[spec, spec, spec, bias_spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v, bias)


# ------------------- kernel C: prescaled q, no-max softmax, concat A@V dot
def _flash_kernel_c(q_ref, k_ref, v_ref, bias_ref, out_ref, *, nw, scale,
                    stable):
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, C), 1) // HD
    masks = [(lane == h).astype(q_ref.dtype) for h in range(NH)]
    for w in range(nw):
        qw = q_ref[w] * jnp.asarray(scale, q_ref.dtype)
        kw = k_ref[w]
        vw = v_ref[w]
        a_parts = []
        for h in range(NH):
            logits = jax.lax.dot_general(
                qw, kw * masks[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            logits = logits + bias_ref[h]
            if stable:
                logits = logits - jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits)
            a = e / jnp.sum(e, axis=-1, keepdims=True)
            a_parts.append(a.astype(vw.dtype))
        a_all = jnp.concatenate(a_parts, axis=1)  # [N, NH*N]
        v_stack = jnp.concatenate([vw * m for m in masks], axis=0)
        out_ref[w] = jnp.dot(a_all, v_stack,
                             preferred_element_type=jnp.float32
                             ).astype(out_ref.dtype)


def flash_attn_c(q, k, v, bias, nw=16, stable=False):
    nb = q.shape[0]
    scale = float(HD) ** -0.5
    spec = pl.BlockSpec((nw, N, C), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((NH, N, N), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_flash_kernel_c, nw=nw, scale=scale, stable=stable),
        grid=(nb // nw,),
        in_specs=[spec, spec, spec, bias_spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v, bias)


# --------------------------------------- kernel B: per-head grid, [64,16] dots
def _flash_kernel_headgrid(q_ref, k_ref, v_ref, bias_ref, out_ref, *, nw,
                           scale):
    for w in range(nw):
        qw = q_ref[w, 0]  # [N, HD]
        kw = k_ref[w, 0]
        logits = jax.lax.dot_general(
            qw, kw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        logits = logits + bias_ref[0]
        a = jax.nn.softmax(logits, axis=-1)
        out_ref[w, 0] = jnp.dot(a.astype(qw.dtype), v_ref[w, 0],
                                preferred_element_type=jnp.float32
                                ).astype(out_ref.dtype)


def flash_attn_headgrid(qh, kh, vh, bias, nw=8):
    # qh: [nb, nh, N, HD]
    nb = qh.shape[0]
    scale = float(HD) ** -0.5
    spec = pl.BlockSpec((nw, 1, N, HD), lambda h, i: (i, h, 0, 0),
                        memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, N, N), lambda h, i: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_flash_kernel_headgrid, nw=nw, scale=scale),
        grid=(NH, nb // nw),
        in_specs=[spec, spec, spec, bias_spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qh.shape, qh.dtype),
    )(qh, kh, vh, bias)


def main():
    nb = 4096  # batch-4 hybrid workload: 4 * (256/8)^2 windows
    key = jax.random.key(0)
    kq, kk, kv, kb = jax.random.split(key, 4)
    q = jax.random.normal(kq, (nb, N, C), jnp.bfloat16)
    k = jax.random.normal(kk, (nb, N, C), jnp.bfloat16)
    v = jax.random.normal(kv, (nb, N, C), jnp.bfloat16)
    bias = jax.random.normal(kb, (NH, N, N), jnp.float32) * 0.1

    ref32 = xla_attn(q, k, v, bias, acc_t=jnp.float32)

    # useful attention flops (2 einsums)
    flops = 2 * 2 * nb * NH * N * N * HD

    for nw in (16,):
        try:
            got = flash_attn_packed(q, k, v, bias, nw=nw, stable=False)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref32)))
            dt = timeit(partial(flash_attn_packed, nw=nw, stable=False),
                        q, k, v, bias)
            record(f"flash_a_nomax_nw{nw}",
                   {"ms": round(dt * 1e3, 3),
                    "tf_s": round(flops / dt / 1e12, 2),
                    "max_err": round(err, 5)})
        except Exception as e:
            record(f"flash_a_nomax_nw{nw}",
                   f"FAILED {type(e).__name__}: {str(e)[:200]}")
    if os.environ.get("EXP_C") != "1":
        return

    for nw, stable in ((16, False), (16, True), (8, False)):
        try:
            got = flash_attn_c(q, k, v, bias, nw=nw, stable=stable)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref32)))
            dt = timeit(partial(flash_attn_c, nw=nw, stable=stable),
                        q, k, v, bias)
            record(f"flash_c_nw{nw}_stable{int(stable)}",
                   {"ms": round(dt * 1e3, 3),
                    "tf_s": round(flops / dt / 1e12, 2),
                    "max_err": round(err, 5)})
        except Exception as e:
            record(f"flash_c_nw{nw}_stable{int(stable)}",
                   f"FAILED {type(e).__name__}: {str(e)[:200]}")
    if os.environ.get("EXP_ALL") != "1":
        return

    dt = timeit(partial(xla_attn, acc_t=jnp.float32), q, k, v, bias)
    record("xla_f32_logits", {"ms": round(dt * 1e3, 3),
                              "tf_s": round(flops / dt / 1e12, 2)})
    dt = timeit(partial(xla_attn, acc_t=jnp.bfloat16), q, k, v, bias)
    record("xla_bf16_logits", {"ms": round(dt * 1e3, 3),
                               "tf_s": round(flops / dt / 1e12, 2)})

    for nw in (8, 16, 32):
        try:
            got = flash_attn_packed(q, k, v, bias, nw=nw)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref32)))
            dt = timeit(partial(flash_attn_packed, nw=nw), q, k, v, bias)
            record(f"flash_packed_nw{nw}",
                   {"ms": round(dt * 1e3, 3),
                    "tf_s": round(flops / dt / 1e12, 2),
                    "max_err": round(err, 5)})
        except Exception as e:
            record(f"flash_packed_nw{nw}",
                   f"FAILED {type(e).__name__}: {str(e)[:200]}")

    qh = q.reshape(nb, N, NH, HD).transpose(0, 2, 1, 3)
    kh = k.reshape(nb, N, NH, HD).transpose(0, 2, 1, 3)
    vh = v.reshape(nb, N, NH, HD).transpose(0, 2, 1, 3)
    refh = ref32.reshape(nb, N, NH, HD).transpose(0, 2, 1, 3)
    for nw in (32,):
        try:
            got = flash_attn_headgrid(qh, kh, vh, bias, nw=nw)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - refh)))
            dt = timeit(partial(flash_attn_headgrid, nw=nw), qh, kh, vh,
                        bias)
            record(f"flash_headgrid_nw{nw}",
                   {"ms": round(dt * 1e3, 3),
                    "tf_s": round(flops / dt / 1e12, 2),
                    "max_err": round(err, 5)})
        except Exception as e:
            record(f"flash_headgrid_nw{nw}",
                   f"FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
