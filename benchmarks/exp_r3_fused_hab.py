"""Fused HAB transformer-block kernel prototype.

The HAT stage's K=96 dense layers (qkv/proj/MLP) measure 9-20 TF/s under
XLA — not an MXU limit (bf16 K=96 should stream at ~148 TF/s) but a
traffic one: each HABlock makes ~8 HBM round-trips of [tokens, 96]-ish
activations (LN out, qkv, attention out, proj, MLP hidden, residuals) on
tensors whose 96-lane layout moves at reduced effective bandwidth.

This kernel computes the WHOLE block body in VMEM per window-block:
  LN1 -> q/k/v dots -> per-window masked-K flash attention -> proj ->
  (+x +cab residual) -> LN2 -> MLP(gelu) -> (+residual)
with all weights VMEM-resident; HBM sees one read of x (+ the
XLA-computed CAB branch) and one write of the output.

Mosaic constraints respected: qkv is computed as three separate [96,96]
dots (lane-slicing a [M,288] at 96-offsets is forbidden), heads stay
packed via the masked-K trick (see ops/pallas_attn.py).

Usage (on the TPU chip): python benchmarks/exp_r3_fused_hab.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

NH, HD, N, C = 6, 16, 64, 96
MLP = 192  # mlp_ratio 2.0
EPS = 1e-5


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def timeit(fn, x, *args, iters=20, warmup=1):
    @jax.jit
    def chained(x):
        def body(_, v):
            return fn(v, *args).astype(v.dtype)

        return jax.lax.fori_loop(0, iters, body, x)

    for _ in range(warmup):
        out = chained(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chained(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def make_weights(key):
    ks = jax.random.split(key, 12)
    w = {
        "ln1_s": jax.random.normal(ks[0], (1, C), jnp.float32) * 0.1 + 1.0,
        "ln1_b": jax.random.normal(ks[1], (1, C), jnp.float32) * 0.1,
        "wq": jax.random.normal(ks[2], (C, C), jnp.bfloat16) * 0.05,
        "wk": jax.random.normal(ks[3], (C, C), jnp.bfloat16) * 0.05,
        "wv": jax.random.normal(ks[4], (C, C), jnp.bfloat16) * 0.05,
        "bq": jax.random.normal(ks[5], (1, C), jnp.float32) * 0.02,
        "bk": jax.random.normal(ks[5], (1, C), jnp.float32) * 0.02,
        "bv": jax.random.normal(ks[5], (1, C), jnp.float32) * 0.02,
        "rpb": jax.random.normal(ks[6], (NH, N, N), jnp.float32) * 0.1,
        "wp": jax.random.normal(ks[7], (C, C), jnp.bfloat16) * 0.05,
        "bp": jax.random.normal(ks[7], (1, C), jnp.float32) * 0.02,
        "ln2_s": jax.random.normal(ks[8], (1, C), jnp.float32) * 0.1 + 1.0,
        "ln2_b": jax.random.normal(ks[8], (1, C), jnp.float32) * 0.1,
        "w1": jax.random.normal(ks[9], (C, MLP), jnp.bfloat16) * 0.05,
        "b1": jax.random.normal(ks[9], (1, MLP), jnp.float32) * 0.02,
        "w2": jax.random.normal(ks[10], (MLP, C), jnp.bfloat16) * 0.05,
        "b2": jax.random.normal(ks[10], (1, C), jnp.float32) * 0.02,
    }
    return w


def _ln(xf, s, b):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    return (xf - mu) * jax.lax.rsqrt(var + EPS) * s + b


def _erf_poly(z):
    """Abramowitz & Stegun 7.1.26 erf (max abs err 1.5e-7) — Mosaic has
    no erf/erfc primitive on this libtpu; 1.5e-7 is far below bf16
    resolution so GELU built on this is exact at block IO precision."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    az = jnp.abs(z)
    t = 1.0 / (1.0 + p * az)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-az * az)
    return jnp.sign(z) * y


def _gelu_exact(x):
    """Exact (erf-based) GELU via the polynomial erf, f32 in, f32 out."""
    return 0.5 * x * (1.0 + _erf_poly(x * 0.7071067811865476))


def ref_block(x, cab, w):
    """jnp reference of the fused region: x, cab [nb, N, C] bf16."""
    nb = x.shape[0]
    xf = x.astype(jnp.float32)
    y = _ln(xf, w["ln1_s"], w["ln1_b"]).astype(x.dtype)
    toks = y.reshape(nb * N, C)
    q = (jnp.dot(toks, w["wq"], preferred_element_type=jnp.float32)
         + w["bq"]).astype(x.dtype)
    k = (jnp.dot(toks, w["wk"], preferred_element_type=jnp.float32)
         + w["bk"]).astype(x.dtype)
    v = (jnp.dot(toks, w["wv"], preferred_element_type=jnp.float32)
         + w["bv"]).astype(x.dtype)
    from superresolution_tpu.ops.pallas_attn import (
        reference_window_attention)

    attn = reference_window_attention(
        q.reshape(nb, N, C), k.reshape(nb, N, C), v.reshape(nb, N, C),
        w["rpb"])
    proj = (jnp.dot(attn.reshape(nb * N, C), w["wp"],
                    preferred_element_type=jnp.float32)
            + w["bp"]).astype(x.dtype).reshape(nb, N, C)
    x1 = x + proj + cab
    zf = x1.astype(jnp.float32)
    z = _ln(zf, w["ln2_s"], w["ln2_b"]).astype(x.dtype)
    h = jnp.dot(z.reshape(nb * N, C), w["w1"],
                preferred_element_type=jnp.float32) + w["b1"]
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    o = (jnp.dot(h, w["w2"], preferred_element_type=jnp.float32)
         + w["b2"]).astype(x.dtype).reshape(nb, N, C)
    return x1 + o


def _fused_kernel(x_ref, cab_ref, wq_ref, wk_ref, wv_ref,
                  bq_ref, bk_ref, bv_ref,
                  rpb_ref, wp_ref, bp_ref, ln1s_ref, ln1b_ref, ln2s_ref,
                  ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                  attn_scratch, *, nw, scale):
    m_tok = nw * N
    x = x_ref[:].reshape(m_tok, C)
    xf = x.astype(jnp.float32)
    y = _ln(xf, ln1s_ref[:], ln1b_ref[:]).astype(x.dtype)
    q = (jnp.dot(y, wq_ref[:], preferred_element_type=jnp.float32)
         + bq_ref[:]).astype(x.dtype)
    k = (jnp.dot(y, wk_ref[:], preferred_element_type=jnp.float32)
         + bk_ref[:]).astype(x.dtype)
    v = (jnp.dot(y, wv_ref[:], preferred_element_type=jnp.float32)
         + bv_ref[:]).astype(x.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) // HD
    for w in range(nw):
        qw = q[w * N:(w + 1) * N]
        kw = k[w * N:(w + 1) * N]
        vw = v[w * N:(w + 1) * N]
        acc = None
        for h in range(NH):
            hm = (lane == h).astype(kw.dtype)
            logits = jax.lax.dot_general(
                qw, kw * hm, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = logits + rpb_ref[h]
            a = jax.nn.softmax(logits, axis=-1)
            part = jax.lax.dot_general(
                a.astype(vw.dtype), vw * hm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        attn_scratch[w * N:(w + 1) * N] = acc.astype(x.dtype)
    proj = (jnp.dot(attn_scratch[:], wp_ref[:],
                    preferred_element_type=jnp.float32)
            + bp_ref[:]).astype(x.dtype)
    x1 = x + proj + cab_ref[:].reshape(m_tok, C)
    z = _ln(x1.astype(jnp.float32), ln2s_ref[:], ln2b_ref[:]).astype(x.dtype)
    h = jnp.dot(z, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h = _gelu_exact(h).astype(x.dtype)
    o = (jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
         + b2_ref[:]).astype(x.dtype)
    out_ref[:] = (x1 + o).reshape(nw, N, C)


def fused_block(x, cab, w, nw=8):
    nb = x.shape[0]
    scale = float(HD) ** -0.5
    xspec = pl.BlockSpec((nw, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_fused_kernel, nw=nw, scale=scale),
        grid=(nb // nw,),
        in_specs=[xspec, xspec,
                  const((C, C)), const((C, C)), const((C, C)),
                  const((1, C)), const((1, C)), const((1, C)),
                  const((NH, N, N)),
                  const((C, C)), const((1, C)),
                  const((1, C)), const((1, C)), const((1, C)),
                  const((1, C)),
                  const((C, MLP)), const((1, MLP)),
                  const((MLP, C)), const((1, C))],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((nw * N, C), x.dtype)],
    )(x, cab, w["wq"], w["wk"], w["wv"], w["bq"], w["bk"], w["bv"], w["rpb"], w["wp"],
      w["bp"], w["ln1_s"], w["ln1_b"], w["ln2_s"], w["ln2_b"], w["w1"],
      w["b1"], w["w2"], w["b2"])


def main():
    nb = 4096
    ks = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(ks[0], (nb, N, C), jnp.bfloat16)
    cab = jax.random.normal(ks[1], (nb, N, C), jnp.bfloat16) * 0.01
    w = make_weights(ks[2])

    ref = jax.jit(ref_block)(x, cab, w)
    jax.block_until_ready(ref)

    for nw in (8, 16):
        try:
            got = fused_block(x, cab, w, nw=nw)
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32))))
            rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
            dt = timeit(partial(fused_block, nw=nw), x, cab, w)
            record(f"fused_hab_nw{nw}", {"ms": round(dt * 1e3, 3),
                                         "max_err": round(err, 5),
                                         "rel_err": round(rel, 5)})
        except Exception as e:
            record(f"fused_hab_nw{nw}",
                   f"FAILED {type(e).__name__}: {str(e)[:300]}")

    dt = timeit(ref_block, x, cab, w)
    record("xla_block", {"ms": round(dt * 1e3, 3)})


if __name__ == "__main__":
    main()
