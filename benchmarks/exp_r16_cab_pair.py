"""Pair-packed fused CAB vs XLA vs the r2 roll-conv CAB kernel.

exp_r6_cab measured the roll-conv CAB a WASH vs XLA (2.91 vs 2.97 ms at
[4,256,256,96]) — its dots sit in the slow MXU class (K=288 N=32 /
K=96 N=96). The pair-packed variant (ops/pallas_hab.fused_cab_convs_pair,
exp_r9 formulation) turns each conv into one full-fill dot
([m,1152]@[1152,64], [m,384]@[384,192]). CAB is ~2.9 ms of each
~7.4 ms HAB block region x 24 blocks (~70 ms of the 298 ms hybrid
frame) — the VERDICT r2 item-4 lever.

Usage (on the TPU chip): python benchmarks/exp_r16_cab_pair.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from superresolution_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

from superresolution_tpu.infer.fused_hat import _conv, _ln  # noqa: E402
from superresolution_tpu.models.hat_lite import (  # noqa: E402
    ChannelAttentionBlock)
from superresolution_tpu.ops.pallas_hab import (  # noqa: E402
    cab_pair_weights,
    cab_weights,
    fused_cab_convs,
    fused_cab_convs_pair,
)

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

    def xla_path(v):
        y = _ln(v, hp["LayerNorm_0"])
        y = _conv(y, cp["Conv_0"]["Conv_0"])
        y = jax.nn.gelu(y, approximate=False)
        return _conv(y, cp["Conv_1"]["Conv_0"])

    w_roll = cab_weights(hp, jnp.bfloat16)
    w_pair = cab_pair_weights(hp, jnp.bfloat16)

    ref = xla_path(xb)
    got = fused_cab_convs_pair(xb, w_pair)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    record("pair_max_abs_err_bf16", err)

    t_xla = timeit(xla_path, xb)
    record("xla_ms", round(t_xla * 1e3, 3))
    t_roll = timeit(lambda v: fused_cab_convs(v, w_roll), xb)
    record("roll_ms", round(t_roll * 1e3, 3))
    t_pair = timeit(lambda v: fused_cab_convs_pair(v, w_pair), xb)
    record("pair_ms", round(t_pair * 1e3, 3))
    record("pair_speedup_vs_xla", round(t_xla / t_pair, 2))


if __name__ == "__main__":
    main()
