"""Pallas-call floor anatomy: what makes a passthrough kernel cost
~2.6 ms at [4,256,256,96]-class operands (exp_r16b's ablation), and
how much of the production dense-block call is the same floor?

Variants, each timed with the HOUSE RULE (exp_r15: block_until_ready
does NOT sync through the axon tunnel — time a fori_loop chain of K
data-dependent steps inside ONE jit that returns a device_get'able
scalar, and report the MARGINAL ms/step between K and 2K chains):

  xla_add1        x + 1 on the same operand — XLA's read+write reference
  pt_mid          passthrough pallas, mid windows only (no edge_windows
                  halo gathers), rb sweep to separate per-program
                  overhead from per-byte cost
  pt_halo         passthrough with edge_windows halo tiles + in-kernel
                  concat (the production window pattern)

at TWO operand classes:
  cab:   [4, 256, 144, 192]  (the packed pair view of [4,256,256,96])
  trunk: [24, 376, 272, 64]  (the headline bench tile batch, halo 5)

Usage (on the TPU chip): python benchmarks/exp_r16c_call_floor.py
"""

from __future__ import annotations

import json
import os
import sys
import time

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


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def timeit(fn, x, iters=10):
    """Marginal ms/step between an `iters` and a `2*iters` chain."""
    def make(n):
        @jax.jit
        def run(v):
            def body(_, u):
                return fn(u).astype(u.dtype)

            out = jax.lax.fori_loop(0, n, body, v)
            return jnp.sum(out.astype(jnp.float32))

        return run

    r1, r2 = make(iters), make(2 * iters)
    jax.device_get(r1(x))  # compile + warm
    jax.device_get(r2(x))
    t0 = time.perf_counter()
    jax.device_get(r1(x))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(r2(x))
    t2 = time.perf_counter() - t0
    return (t2 - t1) / iters


def make_pt_mid(shape, rb):
    b, h, w2, c2 = shape
    nb = h // rb

    def kernel(mid_ref, out_ref):
        out_ref[0] = mid_ref[0]

    def apply(x):
        mid = x.reshape(b * nb, rb, w2, c2)
        out = pl.pallas_call(
            kernel,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            grid=(b * nb,),
            in_specs=[pl.BlockSpec((1, rb, w2, c2),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, rb, w2, c2),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * nb, rb, w2, c2),
                                           x.dtype),
        )(mid)
        return out.reshape(b, h, w2, c2)

    return apply


def make_pt_halo(shape, rb, halo):
    b, h, w2, c2 = shape
    nb = h // rb

    def kernel(top_ref, mid_ref, bot_ref, out_ref):
        t = top_ref[0].reshape(halo * w2, c2)
        m = mid_ref[0].reshape(rb * w2, c2)
        b_ = bot_ref[0].reshape(halo * w2, c2)
        xf = jnp.concatenate([t, m, b_], axis=0)
        out_ref[0] = xf[halo * w2:(rb + halo) * w2].reshape(rb, w2, c2)

    def apply(x):
        tops, mid, bots = edge_windows(x, rb, nb, halo=halo)
        spec_edge, spec_mid, _ = window_specs(rb, w2, c2, halo=halo)
        out = pl.pallas_call(
            kernel,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            grid=(b * nb,),
            in_specs=[spec_edge, spec_mid, spec_edge],
            out_specs=pl.BlockSpec((1, rb, w2, c2),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * nb, rb, w2, c2),
                                           x.dtype),
        )(tops, mid, bots)
        return out.reshape(b, h, w2, c2)

    return apply


def sweep(tag, shape, halo, rbs):
    b, h, w2, c2 = shape
    x = jax.random.normal(jax.random.key(0), shape,
                          jnp.float32).astype(jnp.bfloat16)
    mb = 2 * b * h * w2 * c2 * 2 / 1e6
    record(f"{tag}_tensor_mb_rw", round(mb, 1))
    record(f"{tag}_xla_add1_ms",
           round(timeit(lambda v: v + 1, x) * 1e3, 3))
    for rb in rbs:
        if h % rb:
            continue
        t = timeit(make_pt_mid(shape, rb), x)
        record(f"{tag}_pt_mid_rb{rb}_g{b * (h // rb)}_ms",
               round(t * 1e3, 3))
        t = timeit(make_pt_halo(shape, rb, halo), x)
        record(f"{tag}_pt_halo_rb{rb}_g{b * (h // rb)}_ms",
               round(t * 1e3, 3))


def main():
    sweep("cab", (4, 256, 144, 192), 2, (16, 32, 64, 128, 256))
    sweep("trunk", (24, 376, 272, 64), 5, (47, 94, 188))
    # SAME bytes as the trunk class, 128-lane channels (the pair view):
    # if this runs ~2x faster, the production kernel's 64-lane IO
    # layout wastes half of every VMEM tile in the DMA
    sweep("trunk128", (24, 376, 136, 128), 5, (47, 94, 188))
    # and the wider-image control (2x bytes, 128 lanes)
    sweep("wide128", (24, 376, 272, 128), 5, (94,))


if __name__ == "__main__":
    main()
