"""Folded tail vs phase-space tail at the bench chunk shape.

[6, 376, 256, 64] bf16, times scaled x4 chunks = one 2K frame.
Usage (on the TPU chip): python benchmarks/exp_r8c_phase_tail.py
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

from superresolution_tpu.infer.folded_tail import make_folded_tail
from superresolution_tpu.infer.phase_tail import make_phase_tail
from superresolution_tpu.models import RRDBNet
from superresolution_tpu.utils.precision import get_policy

B, H, W, C = 6, 376, 256, 64
CHUNKS = 4


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def timeit(fn, x, iters=8, warmup=1):
    @jax.jit
    def chained(x):
        def body(_, v):
            o = fn(v)
            return v + (o.mean() * 1e-6).astype(v.dtype)

        return jax.lax.fori_loop(0, iters, body, x)

    for _ in range(warmup):
        jax.block_until_ready(chained(x))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(x))
    return (time.perf_counter() - t0) / iters


def main():
    model = RRDBNet(scale=4, in_channels=3, out_channels=3, features=64,
                    num_blocks=1, growth=32, upsampler="pixelshuffle")
    policy = get_policy("bf16")
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 32, 32, 3)))
    params = policy.cast_to_compute(params)
    feat = jax.random.normal(jax.random.key(1), (B, H, W, C),
                             jnp.bfloat16) * 0.1

    folded = make_folded_tail(params)
    phased = make_phase_tail(params)

    ref = folded(feat)
    got = phased(feat)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    record("max_abs_err_vs_folded_bf16", err)

    t_f = timeit(folded, feat)
    record("folded_ms_frame", round(t_f * 1e3 * CHUNKS, 1))
    t_p = timeit(phased, feat)
    record("phase_ms_frame", round(t_p * 1e3 * CHUNKS, 1))
    record("speedup", round(t_f / t_p, 2))


if __name__ == "__main__":
    main()
