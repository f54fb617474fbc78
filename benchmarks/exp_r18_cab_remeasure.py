"""Re-measure the CAB conv-stack A/B with the TRUSTED methodology.

Every earlier CAB timing (exp_r6, exp_r16, exp_r16b — XLA 2.807 ms,
roll 2.831, pair 3.681, 'passthrough floor 2.633') used the
fori_loop + block_until_ready pattern that exp_r15/exp_r16c proved
untrustworthy through the axon tunnel (113 MB r+w 'measured' at
0.004 ms). exp_r16c's corrected floor at the CAB operand class is
~0.45 ms — 6x below the old 'floor' — so the 'no standalone CAB kernel
can win' closure needs re-derivation from clean numbers.

House rule: marginal ms/step between a K-step and a 2K-step
data-dependent fori_loop chain inside one jit whose result is
device_get'ed (dispatch cancels in the margin).

Usage (on the TPU chip): python benchmarks/exp_r18_cab_remeasure.py
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


def timeit(fn, x, iters=10):
    def make(n):
        @jax.jit
        def run(v):
            def body(_, u):
                return fn(u).astype(u.dtype)

            out = jax.lax.fori_loop(0, n, body, v)
            return jnp.sum(out.astype(jnp.float32))

        return run

    r1, r2 = make(iters), make(2 * iters)
    jax.device_get(r1(x))
    jax.device_get(r2(x))
    t0 = time.perf_counter()
    jax.device_get(r1(x))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(r2(x))
    t2 = time.perf_counter() - t0
    return (t2 - t1) / iters


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

    record("xla_ms", round(timeit(xla_path, xb) * 1e3, 3))
    record("roll_ms", round(
        timeit(lambda v: fused_cab_convs(v, w_roll), xb) * 1e3, 3))
    record("pair_ms", round(
        timeit(lambda v: fused_cab_convs_pair(v, w_pair), xb) * 1e3, 3))


if __name__ == "__main__":
    main()
