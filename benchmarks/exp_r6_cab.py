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


if __name__ == "__main__":
    main()
