"""Re-measure the closed in-kernel trunk variants under the TRUSTED
methodology: roll (production) vs lhs-shift (exp_r10) vs f32-cascade
(exp_r12), at the bench geometry.

The r5/r6-era verdicts ('lhs-shift 21% slower', 'f32 cascade a wash')
used the fori_loop + block_until_ready pattern later proved
untrustworthy (exp_r15/r16c) — the CAB and ws=8 flash-OCAB verdicts
from the same era both flipped when re-measured clean, so these two
OFF-decisions get one clean pass before staying closed.

Usage (on the TPU chip): python benchmarks/exp_r22_kernel_abs.py
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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from exp_r10_lhs_shift import (  # noqa: E402
    fused_dense_block_lhs,
    make_params,
)
from exp_r12_f32cascade import fused_dense_block_f32  # noqa: E402


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
    c, g = 64, 32
    dp = make_params(jax.random.key(7), c=c, g=g)
    w = proj_weights(dp, jnp.bfloat16)
    b, h, width = 24, 376, 256
    x = jax.random.normal(jax.random.key(1), (b, h, width, c),
                          jnp.bfloat16) * 0.5
    xp = pack(x)
    rb = 94
    for name, fn in (
            ("roll", lambda v: fused_dense_block(v, w, width=width,
                                                 rb=rb)),
            ("lhs_shift", lambda v: fused_dense_block_lhs(
                v, w, width=width, rb=rb)),
            ("f32_cascade", lambda v: fused_dense_block_f32(
                v, w, width=width, rb=rb))):
        try:
            t = timeit(fn, xp)
            record(f"{name}_rb{rb}_ms", round(t * 1e3, 3))
        except Exception as e:
            record(f"{name}_rb{rb}_err", repr(e)[-200:])


if __name__ == "__main__":
    main()
