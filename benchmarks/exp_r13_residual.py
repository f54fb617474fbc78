"""exp r13 — cost of the RRDB-level residual adds between fused blocks.

The fused trunk runs 69 dense-block Pallas calls with 23 XLA
elementwise residual passes (carry + y*0.2) between them
(infer/fused_trunk.py scan body). Each pass moves ~3x the packed
tensor through HBM; at the measured 64-lane effective bandwidth
(~110-130 GB/s for XLA layout ops) that could be ~8 ms/RRDB = ~180 ms
of the 1255 ms trunk — or ~1 ms/RRDB at peak DMA rates. This measures
it directly: one RRDB group (3 fused blocks) WITH vs WITHOUT the
residual add, chained; the difference x23 is the frame-level cost and
bounds what folding the residual into the third kernel could save.

Usage (on the TPU chip): python benchmarks/exp_r13_residual.py
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

from superresolution_tpu.ops.pallas_dense_trunk import (  # noqa: E402
    fused_dense_block,
    pack,
    proj_weights,
)


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def make_params(key, c, g):
    ks = jax.random.split(key, 6)
    dp = {"Conv_0": {"Conv_0": {
        "kernel": jax.random.normal(ks[0], (3, 3, c, 4 * g + c)) * 0.1,
        "bias": jax.random.normal(ks[5], (4 * g + c,)) * 0.1}}}
    for i in range(1, 5):
        dp[f"proj_y{i}"] = {"kernel": jax.random.normal(
            ks[i], (3, 3, g, (4 - i) * g + c)) * 0.1}
    return dp


def main():
    c, g = 64, 32
    w = proj_weights(make_params(jax.random.key(7), c, g), jnp.bfloat16)
    b, h, width, rb = 24, 376, 256, 94
    x = jax.random.normal(jax.random.key(1), (b, h, width, c),
                          jnp.bfloat16) * 0.5
    xp = pack(x)

    def group(u, with_residual):
        y = fused_dense_block(u, w, width=width, rb=rb)
        y = fused_dense_block(y, w, width=width, rb=rb)
        y = fused_dense_block(y, w, width=width, rb=rb)
        if with_residual:
            return u + y * jnp.asarray(0.2, y.dtype)
        return y

    for name, wr in (("with_residual", True), ("no_residual", False)):
        @jax.jit
        def chained(m0, iters=8, wr=wr):
            def body(_, u):
                return group(u, wr)
            return jax.lax.fori_loop(0, iters, body, m0)

        jax.block_until_ready(chained(xp))
        t0 = time.perf_counter()
        jax.block_until_ready(chained(xp))
        dt = (time.perf_counter() - t0) / 8
        record(name, {"ms_per_group": round(dt * 1e3, 3)})


if __name__ == "__main__":
    main()
