"""SUPERSEDED (r15): timings in this file used per-call chaining +
block_until_ready, which exp_r15_timing_probe proved does not sync
real compute through the axon tunnel. Kept for the record; trust only
benchmarks/exp_r15b_fused_train_ab.py / train_bench.py numbers.

Train-kernel split: fused dense-block fwd+bwd vs the XLA block
fwd+bwd, per geometry — where does train-step time go?

Round-3 finding this explains: the full fused train STEP at the
esrgan_x4_tiled preset geometry (batch 8, LR 48x48, wp=64) measured
3.4x SLOWER than plain XLA, while chip equivalence passes. Candidate
costs: f32 transposed-conv dots, dim-0-contraction wgrad dots (Mosaic
transposes), per-call machinery at tiny token counts.

Times, per geometry (data-dependent chained iterations, exp_r4d
methodology):
  a) XLA fwd (jax.vjp of the packed-block oracle)   — fwd only
  b) XLA fwd+bwd
  c) fused fwd (fused_dense_block, production kernel)
  d) fused fwd+bwd (fused_dense_block_train)

Usage (on the TPU chip): python benchmarks/exp_r14_train_kernel.py
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

from superresolution_tpu.models.rrdbnet import FusedDenseBlock  # noqa: E402
from superresolution_tpu.ops.pallas_dense_trunk import (  # noqa: E402
    fused_dense_block,
    pack,
    proj_weights,
)
from superresolution_tpu.ops.pallas_dense_trunk_vjp import (  # noqa: E402
    fused_dense_block_train,
    xla_reference_packed_block,
)

GEOMETRIES = [
    ("esrgan_train_48", 8, 48, 48),    # esrgan presets: LR 48x48
    ("hybrid_trunk_256", 4, 256, 256),  # hybrid stage1: LR 256x256
]


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def timeit(fn, x, iters=8, warmup=1):
    @jax.jit
    def chained(v):
        def body(_, u):
            return fn(u).astype(u.dtype)

        return jax.lax.fori_loop(0, iters, body, v)

    for _ in range(warmup):
        jax.block_until_ready(chained(x))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(x))
    return (time.perf_counter() - t0) / iters


def main():
    blk = FusedDenseBlock(features=64, growth=32)
    for name, b, h, w in GEOMETRIES:
        x = jax.random.normal(jax.random.key(1), (b, h, w, 64),
                              jnp.bfloat16) * 0.5
        dp = blk.init(jax.random.key(0), x)["params"]
        ws = tuple(proj_weights(dp, jnp.bfloat16))
        xp = pack(x)
        wp = xp.shape[2]

        def xla_fwd(v):
            return xla_reference_packed_block(v, ws, w)

        def xla_fwdbwd(v):
            out, vjp = jax.vjp(xla_fwd, v)
            return vjp(out)[0]

        def fused_fwd(v):
            return fused_dense_block(v, list(ws), width=w)

        def fused_fwdbwd(v):
            out, vjp = jax.vjp(
                lambda u: fused_dense_block_train(u, ws, None, w, None,
                                                  False), v)
            return vjp(out)[0]

        record(f"{name}_xla_fwd_ms", round(timeit(xla_fwd, xp) * 1e3, 3))
        record(f"{name}_xla_fwdbwd_ms",
               round(timeit(xla_fwdbwd, xp) * 1e3, 3))
        record(f"{name}_fused_fwd_ms",
               round(timeit(fused_fwd, xp) * 1e3, 3))
        record(f"{name}_fused_fwdbwd_ms",
               round(timeit(fused_fwdbwd, xp) * 1e3, 3))
        record(f"{name}_geom", {"batch": b, "h": h, "w": w, "wp": wp})


if __name__ == "__main__":
    main()
