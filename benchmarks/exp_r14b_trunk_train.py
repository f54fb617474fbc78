"""SUPERSEDED (r15): timings in this file used per-call chaining +
block_until_ready, which exp_r15_timing_probe proved does not sync
real compute through the axon tunnel. Kept for the record; trust only
benchmarks/exp_r15b_fused_train_ab.py / train_bench.py numbers.

Trunk-level train split: exp_r14 showed the fused dense-block
fwd+bwd BEATS XLA per kernel call (3.98 vs 4.39 ms at the esrgan train
geometry), yet the full fused train step is 3.4x slower. This isolates
the composed 23-RRDB trunk under jax.vjp:

  a) XLA trunk fwd+bwd       — model.apply(method='trunk') via nn.scan
  b) fused trunk fwd+bwd     — train/fused_apply's scan of
                               fused_dense_block_train calls
  c) fused trunk fwd only

Usage (on the TPU chip): python benchmarks/exp_r14b_trunk_train.py
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

from superresolution_tpu.models import RRDBNet  # noqa: E402
from superresolution_tpu.train.fused_apply import (  # noqa: E402
    make_fused_train_apply)

GEOMETRIES = [("esrgan_train_48", 8, 48, 48)]


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
    model = RRDBNet(scale=4, in_channels=3, out_channels=3, features=64,
                    num_blocks=23, growth=32, upsampler="pixelshuffle")
    for name, b, h, w in GEOMETRIES:
        x0 = jax.random.normal(jax.random.key(1), (b, h, w, 3),
                               jnp.bfloat16)
        params = jax.jit(model.init)(jax.random.key(0),
                                     jnp.zeros((1, 16, 16, 3)))
        pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
        fused = make_fused_train_apply(model, interpret=False)

        def xla_trunk(v):
            return model.apply(pb, v, method="trunk")

        def xla_trunk_fwdbwd(v):
            out, vjp = jax.vjp(xla_trunk, v)
            return vjp(out)[0]

        # fused apply includes the tail; time the full apply for both
        # paths so tail cost cancels in the comparison
        def xla_full_fwdbwd(v):
            out, vjp = jax.vjp(lambda u: model.apply(pb, u), v)
            return vjp(out)[0].astype(v.dtype)

        def fused_full(v):
            # carry must stay input-shaped: fold a data-dependent slice
            # of the SR output back into the carry
            out = fused(pb, v)
            return v + out[:, :v.shape[1], :v.shape[2], :].astype(v.dtype)

        def fused_full_fwdbwd(v):
            out, vjp = jax.vjp(lambda u: fused(pb, u), v)
            return vjp(out)[0].astype(v.dtype)

        record(f"{name}_xla_trunk_fwdbwd_ms",
               round(timeit(xla_trunk_fwdbwd, x0) * 1e3, 3))
        record(f"{name}_xla_full_fwdbwd_ms",
               round(timeit(xla_full_fwdbwd, x0) * 1e3, 3))
        record(f"{name}_fused_full_fwd_ms",
               round(timeit(fused_full, x0) * 1e3, 3))
        record(f"{name}_fused_full_fwdbwd_ms",
               round(timeit(fused_full_fwdbwd, x0) * 1e3, 3))


if __name__ == "__main__":
    main()
