"""Pallas-call floor anatomy: what makes a passthrough kernel cost
2.6 ms at [4,256,256,96]-class operands (exp_r16b)?

Variants (all timed as data-dependent fori_loop chains in one jit):

  xla_add1        x + 1 on the same operand — XLA's read+write reference
  pt_mid          passthrough pallas, mid windows only (no edge_windows
                  halo gathers), grid G
  pt_halo         passthrough with edge_windows halo tiles (exp_r16b's
                  pattern), grid G
  ... each at grid sizes {32, 16, 8, 4} (rb 32..256) to separate
  per-program overhead from per-byte cost.

Usage (on the TPU chip): python benchmarks/exp_r16c_call_floor.py
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

from superresolution_tpu.ops.pallas_windows import (  # noqa: E402
    edge_windows,
    window_specs,
)

B, H, W2, C2 = 4, 256, 144, 192  # the packed pair view of [4,256,256,96]


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


def make_pt_mid(rb):
    nb = H // rb

    def kernel(mid_ref, out_ref):
        out_ref[0] = mid_ref[0]

    def apply(x):
        mid = x.reshape(B * nb, rb, W2, C2)
        out = pl.pallas_call(
            kernel,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            grid=(B * nb,),
            in_specs=[pl.BlockSpec((1, rb, W2, C2),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, rb, W2, C2),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * nb, rb, W2, C2),
                                           x.dtype),
        )(mid)
        return out.reshape(B, H, W2, C2)

    return apply


def make_pt_halo(rb):
    nb = H // rb
    halo = 2

    def kernel(top_ref, mid_ref, bot_ref, out_ref):
        t = top_ref[0].reshape(halo * W2, C2)
        m = mid_ref[0].reshape(rb * W2, C2)
        b_ = bot_ref[0].reshape(halo * W2, C2)
        xf = jnp.concatenate([t, m, b_], axis=0)
        out_ref[0] = xf[halo * W2:(rb + halo) * W2].reshape(rb, W2, C2)

    def apply(x):
        tops, mid, bots = edge_windows(x, rb, nb, halo=halo)
        spec_edge, spec_mid, _ = window_specs(rb, W2, C2, halo=halo)
        out = pl.pallas_call(
            kernel,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            grid=(B * nb,),
            in_specs=[spec_edge, spec_mid, spec_edge],
            out_specs=pl.BlockSpec((1, rb, W2, C2),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * nb, rb, W2, C2),
                                           x.dtype),
        )(tops, mid, bots)
        return out.reshape(B, H, W2, C2)

    return apply


def main():
    x = jax.random.normal(jax.random.key(0), (B, H, W2, C2),
                          jnp.float32).astype(jnp.bfloat16)
    mb = 2 * B * H * W2 * C2 * 2 / 1e6
    record("tensor_mb_rw", round(mb, 1))
    record("xla_add1_ms", round(timeit(lambda v: v + 1, x) * 1e3, 3))
    for rb in (8, 16, 32, 64, 128, 256):
        if H % rb:
            continue
        t = timeit(make_pt_mid(rb), x)
        record(f"pt_mid_rb{rb}_g{B * (H // rb)}_ms", round(t * 1e3, 3))
    for rb in (32, 64, 128):
        t = timeit(make_pt_halo(rb), x)
        record(f"pt_halo_rb{rb}_g{B * (H // rb)}_ms", round(t * 1e3, 3))


if __name__ == "__main__":
    main()
