"""Tail A/B under the TRUSTED methodology: phase-space tail vs folded
tail vs the plain XLA tail, at the headline bench tile batch.

The 'phase tail 61 vs folded 70 ms per 6-tile chunk' decision that put
make_phase_tail into bench.py predates the timing house rule
(exp_r15); like the CAB verdict it could rank wrong. Marginal-chain
timing on [24, 376, 256, 64] bf16 trunk features (the 24-tile bench
batch), x4 pixelshuffle tail to [24, 1504, 1024, 3].

Usage (on the TPU chip): python benchmarks/exp_r21_tail_ab.py
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

from superresolution_tpu.infer.folded_tail import make_folded_tail  # noqa: E402
from superresolution_tpu.infer.phase_tail import make_phase_tail  # noqa: E402
from superresolution_tpu.models import RRDBNet  # noqa: E402
from superresolution_tpu.utils.precision import get_policy  # noqa: E402


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def timeit(fn, x, iters=5):
    def make(n):
        @jax.jit
        def run(v):
            def body(_, u):
                out = fn(u)
                return (u + jnp.mean(out.astype(jnp.float32))
                        .astype(u.dtype))

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
    model = RRDBNet(scale=4, in_channels=3, out_channels=3, features=64,
                    num_blocks=1, growth=32, upsampler="pixelshuffle")
    policy = get_policy("bf16")
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 16, 16, 3)))
    params = policy.cast_to_compute(params)
    feat = jax.random.normal(jax.random.key(1), (24, 376, 256, 64),
                             jnp.bfloat16) * 0.3

    phase = make_phase_tail(params, clip=False)
    folded = make_folded_tail(params, clip=False)

    def xla_tail(v):
        return model.apply(params, v, method="tail")

    record("phase_tail_ms", round(timeit(phase, feat) * 1e3, 2))
    record("folded_tail_ms", round(timeit(folded, feat) * 1e3, 2))
    record("xla_tail_ms", round(timeit(xla_tail, feat) * 1e3, 2))


if __name__ == "__main__":
    main()
