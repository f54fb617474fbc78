"""What is the REAL memory-bandwidth floor and the REAL Mosaic MXU rate
on this chip?

Timing methodology note (important): repeated identical dispatches
through the axon tunnel produce impossible numbers (hundreds of TB/s) —
only DATA-DEPENDENT chains inside one jit are trustworthy here. Every
probe below carries the tensor through a fori_loop (one dispatch, one
block_until_ready) and is run at two depths; a probe is valid only if
time scales ~linearly with depth (the 'scale' field ~2.0).

Probes:
  bw_pallas  — chained passthrough kernel: pipelined HBM GB/s
  mxu_chain  — chained kernel, each invocation doing `inner` VMEM-resident
               dots: pure Mosaic MXU TF/s at [m,k]@[k,k]
  xla_matmul — chained square jnp.dot for reference

Usage (on the TPU chip): python benchmarks/exp_r4d_floor.py
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


def time_chain(step_fn, v0, depth, reps=2):
    """One jit dispatch: v = step(v) x depth, data-dependent; min of reps."""

    @jax.jit
    def run(v):
        return jax.lax.fori_loop(0, depth, lambda i, v: step_fn(v), v)

    best = float("inf")
    jax.block_until_ready(run(v0))
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(v0))
        best = min(best, time.perf_counter() - t0)
    return best


def probe(name, step_fn, v0, unit_work, d_lo=8, d_hi=64):
    """Marginal time between a short and a long chain — the ~30 ms
    per-dispatch tunnel jitter cancels; (d_hi - d_lo) steps must be
    seconds-scale for a clean signal."""
    try:
        t1 = time_chain(step_fn, v0, d_lo)
        t2 = time_chain(step_fn, v0, d_hi)
    except Exception as e:
        record(name, f"FAILED {type(e).__name__}: {str(e)[:250]}")
        return
    per = (t2 - t1) / (d_hi - d_lo)
    flops, nbytes = unit_work
    out = {"ms_lo": round(t1 * 1e3, 1), "ms_hi": round(t2 * 1e3, 1),
           "ms_per_step": round(per * 1e3, 3)}
    if flops:
        out["tf_s"] = round(flops / per / 1e12, 1)
    if nbytes:
        out["GB_s"] = round(nbytes / per / 1e9, 1)
    record(name, out)


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1


def make_pallas_copy(rows, cols, blocks):
    def step(v):
        return pl.pallas_call(
            _copy_kernel,
            grid=(blocks,),
            in_specs=[pl.BlockSpec((rows, cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((blocks * rows, cols),
                                           jnp.bfloat16),
        )(v)
    return step


def _chain_kernel(x_ref, w_ref, o_ref, *, inner):
    y = x_ref[:]
    for i in range(inner):
        y = jnp.dot(y, w_ref[i], preferred_element_type=jnp.float32
                    ).astype(y.dtype)
    o_ref[:] = y


def make_mxu(m, k, inner, blocks, w):
    def step(v):
        return pl.pallas_call(
            partial(_chain_kernel, inner=inner),
            grid=(blocks,),
            in_specs=[pl.BlockSpec((m, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((inner, k, k), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((m, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((blocks * m, k), jnp.bfloat16),
        )(v, w)
    return step


def main():
    key = jax.random.key(0)

    # HBM bandwidth: 2 MB blocks, 512 MB array
    rows, cols, blocks = 2048, 512, 256
    v0 = jax.random.normal(key, (blocks * rows, cols), jnp.bfloat16)
    nbytes = 2 * blocks * rows * cols * 2
    probe("bw_pallas_2048x512", make_pallas_copy(rows, cols, blocks),
          v0, (0, nbytes))

    # XLA elementwise bandwidth
    probe("bw_xla_add", lambda v: v * 1.0009765625 + 0.001, v0,
          (0, nbytes))

    # XLA big matmul: v [4096,4096] @ w [4096,4096]
    w = jax.random.normal(key, (4096, 4096), jnp.bfloat16) * 0.01
    v0m = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    probe("xla_matmul_4096sq",
          lambda v: jnp.dot(v, w, preferred_element_type=jnp.bfloat16),
          v0m, (2 * 4096 ** 3, 0), d_lo=4, d_hi=32)

    # Mosaic MXU: VMEM-resident dot chains
    for m, k, inner, blocks in ((1728, 384, 8, 16), (1728, 128, 8, 16),
                                (512, 96, 8, 16), (2048, 512, 4, 16)):
        wk = jax.random.normal(key, (inner, k, k), jnp.bfloat16) * 0.02
        v0k = jax.random.normal(key, (blocks * m, k), jnp.bfloat16)
        flops = 2 * blocks * inner * m * k * k
        probe(f"mxu_chain_m{m}_k{k}_i{inner}",
              make_mxu(m, k, inner, blocks, wk), v0k, (flops, 0),
              d_lo=4, d_hi=32)


if __name__ == "__main__":
    main()
