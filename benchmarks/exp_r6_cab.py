"""Fused CAB conv-stack kernel vs the XLA conv path.

The HAB block's CAB branch (LN -> conv3x3 96->32 -> GELU -> conv3x3
32->96) is the last XLA-resident piece of the fused-HAT block region:
K=288/864 convs at N=32/96 sit in the slow shape class (sub-128 lanes,
per-conv HBM round trips). ops/pallas_hab.py::fused_cab_convs keeps the
stack VMEM-resident (roll-conv formulation of pallas_dense_trunk).

This experiment times, at the hybrid stage-2 shape [B,256,256,96] bf16:
  a) XLA LN + conv + gelu + conv (pre-SE tensor)
  b) fused_cab_convs
using the data-dependent chained-iterations methodology (exp_r4d).

Usage (on the TPU chip): python benchmarks/exp_r6_cab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from superresolution_tpu.infer.fused_hat import _conv, _ln
from superresolution_tpu.models.hat_lite import ChannelAttentionBlock
from superresolution_tpu.ops.pallas_hab import cab_weights, fused_cab_convs
from superresolution_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

B, H, W, C = 4, 256, 256, 96


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def timeit(fn, x, iters=20, warmup=1):
    @jax.jit
    def chained(x):
        def body(_, v):
            return fn(v).astype(v.dtype)

        return jax.lax.fori_loop(0, iters, body, x)

    for _ in range(warmup):
        out = chained(x)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    jax.block_until_ready(chained(x))
    return (time.perf_counter() - t0) / iters


def main():
    ks = jax.random.split(jax.random.key(0), 4)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    block = ChannelAttentionBlock(C)
    cp = block.init(ks[1], x)["params"]
    hp = {
        "LayerNorm_0": {
            "scale": jax.random.normal(ks[2], (C,)) * 0.1 + 1.0,
            "bias": jax.random.normal(ks[3], (C,)) * 0.1,
        },
        "ChannelAttentionBlock_0": cp,
    }
    xb = x.astype(jnp.bfloat16)
    w = cab_weights(hp, jnp.bfloat16)

    def xla_path(v):
        y = _ln(v, hp["LayerNorm_0"])
        y = _conv(y, cp["Conv_0"]["Conv_0"])
        y = jax.nn.gelu(y, approximate=False)
        return _conv(y, cp["Conv_1"]["Conv_0"])

    def fused_path(v):
        return fused_cab_convs(v, w)

    ref = xla_path(xb)
    got = fused_path(xb)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    record("max_abs_err_bf16", err)

    t_xla = timeit(xla_path, xb)
    record("xla_ms", round(t_xla * 1e3, 3))
    t_fused = timeit(fused_path, xb)
    record("fused_ms", round(t_fused * 1e3, 3))
    record("speedup", round(t_xla / t_fused, 2))

    w9 = cab_weights9(hp, jnp.bfloat16)

    def fused9_path(v):
        return fused_cab_convs9(v, w9)

    got9 = fused9_path(xb)
    err9 = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                 - got9.astype(jnp.float32))))
    record("v2_max_abs_err_bf16", err9)
    t_9 = timeit(fused9_path, xb)
    record("v2_fused_ms", round(t_9 * 1e3, 3))
    record("v2_speedup_vs_xla", round(t_xla / t_9, 2))


# ---------------------------------------------------------------------------
# v2: im2col-9 formulation — ONE dot per conv (K=9*cin), the exp_r7
# sublane-concat pre-shift trick for phase alignment. conv1 K=864 N=32,
# conv2 K=288 N=96 (vs v1's 3 dots each at K=288/96).
# ---------------------------------------------------------------------------

from functools import partial as _partial

from jax.experimental import pallas as _pl
from jax.experimental.pallas import tpu as _pltpu

from superresolution_tpu.ops.pallas_hab import (
    _CAB_PAD,
    _ln as _hab_ln,
    cab_pack_width,
    gelu_exact,
)

_TH, _BH = 4, 2  # 2 top rows/stage (1 junk + 1 halo), 1 bottom/stage


def cab_weights9(hp, dtype=jnp.bfloat16):
    """[ln_s, ln_b, W9_1 (9*cin,32), bias1, W9_2 (9*32,c), bias2]."""
    cab = hp["ChannelAttentionBlock_0"]
    out = [jnp.asarray(hp["LayerNorm_0"]["scale"],
                       jnp.float32).reshape(1, -1),
           jnp.asarray(hp["LayerNorm_0"]["bias"],
                       jnp.float32).reshape(1, -1)]
    for name in ("Conv_0", "Conv_1"):
        cp = cab[name]["Conv_0"]
        w = jnp.asarray(cp["kernel"], jnp.float32)
        cin, n = w.shape[2], w.shape[3]
        out.append(w.reshape(9 * cin, n).astype(dtype))
        out.append(jnp.asarray(cp["bias"], jnp.float32).reshape(1, n))
    return out


def _cab_kernel9(top_ref, mid_ref, bot_ref, ln_s, ln_b,
                 w1, bias1, w2, bias2, out_ref,
                 *, rb, w_img, wp, nb, h_img, c):
    row_start = (_pl.program_id(0) % nb) * rb
    pad_r = wp - w_img - _CAB_PAD

    def padw(t, rows):
        z = jnp.zeros((rows, _CAB_PAD, c), t.dtype)
        zr = jnp.zeros((rows, pad_r, c), t.dtype)
        return jnp.concatenate([z, t, zr], axis=1).reshape(rows * wp, c)

    xf = jnp.concatenate([
        padw(top_ref[0], _TH), padw(mid_ref[0], rb),
        padw(bot_ref[0], _BH)], axis=0)

    def mask(t, k):
        m = t.shape[0]
        idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        cp_i = idx % wp
        r_img = row_start - _TH + k + idx // wp
        ok = ((cp_i >= _CAB_PAD) & (cp_i < _CAB_PAD + w_img)
              & (r_img >= 0) & (r_img < h_img))
        return jnp.where(ok, t, jnp.asarray(0, t.dtype))

    def rconv9(u, w, bias, k):
        mu = u.shape[0]
        mo = mu - 3 * wp
        u_p = jnp.concatenate([u[mu - 1:], u[:mu - 1]], axis=0)
        u_m = jnp.concatenate([u[1:], u[:1]], axis=0)
        slices = []
        for kk in range(3):
            base = (kk + 1) * wp
            for src in (u_p, u, u_m):
                slices.append(src[base:base + mo])
        lhs = jnp.concatenate(slices, axis=1)
        acc = jnp.dot(lhs, w[:], preferred_element_type=jnp.float32)
        acc = acc + bias[:]
        return mask(acc, k)

    ln = _hab_ln(xf.astype(jnp.float32), ln_s[:], ln_b[:])
    ln = mask(ln, 0).astype(xf.dtype)
    h1 = rconv9(ln, w1, bias1, 2)
    h1 = gelu_exact(h1).astype(xf.dtype)
    h2 = rconv9(h1, w2, bias2, 4).astype(xf.dtype)
    out_ref[0] = h2.reshape(rb, wp, c)


def fused_cab_convs9(x, weights, interpret=False, rb=None):
    b, h, w_img, c = x.shape
    wp = cab_pack_width(w_img)
    if rb is None:
        rb = 1
        for r in range(1, h + 1):
            if h % r == 0 and (r + _TH + _BH) * wp <= 9000:
                rb = r
    nb = h // rb
    xh = jnp.pad(x, ((0, 0), (_TH, _BH), (0, 0), (0, 0)))
    mid = xh[:, _TH:_TH + h].reshape(b * nb, rb, w_img, c)
    tops = jnp.stack([xh[:, i * rb:i * rb + _TH] for i in range(nb)],
                     axis=1).reshape(b * nb, _TH, w_img, c)
    bots = jnp.stack(
        [xh[:, _TH + (i + 1) * rb:_TH + _BH + (i + 1) * rb]
         for i in range(nb)], axis=1).reshape(b * nb, _BH, w_img, c)
    spec_mid = _pl.BlockSpec((1, rb, w_img, c), lambda i: (i, 0, 0, 0),
                             memory_space=_pltpu.VMEM)
    spec_top = _pl.BlockSpec((1, _TH, w_img, c), lambda i: (i, 0, 0, 0),
                             memory_space=_pltpu.VMEM)
    spec_bot = _pl.BlockSpec((1, _BH, w_img, c), lambda i: (i, 0, 0, 0),
                             memory_space=_pltpu.VMEM)

    def cw(t):
        return _pl.BlockSpec(t.shape, lambda i: (0,) * t.ndim,
                             memory_space=_pltpu.VMEM)

    out = _pl.pallas_call(
        _partial(_cab_kernel9, rb=rb, w_img=w_img, wp=wp, nb=nb,
                 h_img=h, c=c),
        compiler_params=_pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        grid=(b * nb,),
        in_specs=[spec_top, spec_mid, spec_bot]
        + [cw(t) for t in weights],
        out_specs=_pl.BlockSpec((1, rb, wp, c), lambda i: (i, 0, 0, 0),
                                memory_space=_pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp, c), x.dtype),
        interpret=interpret,
    )(tops, mid, bots, *weights)
    return out.reshape(b, h, wp, c)[:, :, _CAB_PAD:_CAB_PAD + w_img]


if __name__ == "__main__":
    main()
