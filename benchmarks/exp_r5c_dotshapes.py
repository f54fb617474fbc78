"""Mosaic in-VMEM dot rates for the dense-block shape classes.

The exp_r5b ablation put the fused kernel's dots at ~22 TF/s useful —
far under the 198 TF/s seen at [1728,384]@[384,384]. Hypothesis: thin
outputs (N=32) and K<128 starve the MXU. This measures [m,k]@[k,n] for
the candidate layouts:
  gather:  (192,192) (96,32) (192,32) (288,32) (384,64)
  proj:    (192,192) (96,160) (96,128) (96,96) (96,64)
Each step re-runs the SAME dot with a perturbed lhs (dependency via a
broadcast column add), depth-16 in-kernel chain, marginal-free.

Usage (on the TPU chip): python benchmarks/exp_r5c_dotshapes.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def _kernel(x_ref, w_ref, o_ref, *, inner, n):
    x = x_ref[:]
    acc = None
    for i in range(inner):
        # independent weights: no CSE, no serializing dependency
        y = jnp.dot(x, w_ref[i], preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    o_ref[:] = acc.astype(o_ref.dtype)


def rate(m, k, n, blocks=16):
    x = jax.random.normal(jax.random.key(0), (blocks * m, k),
                          jnp.bfloat16) * 0.1

    def timed(inner):
        w = jax.random.normal(jax.random.key(1), (inner, k, n),
                              jnp.bfloat16) * 0.1

        def call(x):
            return pl.pallas_call(
                partial(_kernel, inner=inner, n=n),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                grid=(blocks,),
                in_specs=[pl.BlockSpec((m, k), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((inner, k, n), lambda i: (0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((m, n), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((blocks * m, n),
                                               jnp.bfloat16),
            )(x, w)

        @jax.jit
        def chained(x, iters=6):
            def body(_, v):
                y = call(v)
                return v + y[:, 0:1] * jnp.asarray(1e-6, v.dtype)
            return jax.lax.fori_loop(0, iters, body, x)

        jax.block_until_ready(chained(x))
        t0 = time.perf_counter()
        jax.block_until_ready(chained(x))
        return (time.perf_counter() - t0) / 6

    try:
        t_lo, t_hi = timed(8), timed(40)
    except Exception as e:
        record(f"dot_{m}x{k}x{n}", f"FAILED ...{str(e)[-200:]}")
        return
    per_dot = (t_hi - t_lo) / 32
    tf = 2 * blocks * m * k * n / per_dot / 1e12
    record(f"dot_{m}x{k}x{n}", {"us_per_dot": round(per_dot * 1e6, 2),
                                "tf_s": round(tf, 1)})


def main():
    m = 4096
    for k, n in ((192, 192), (96, 32), (192, 32), (288, 32), (384, 64),
                 (96, 160), (96, 128), (96, 96), (96, 64), (384, 384),
                 (96, 256), (192, 128)):
        rate(m, k, n)


if __name__ == "__main__":
    main()
