"""Pack-GEMM conv ablation: where do the 28us/block go?

Variants on the c64->192 p=2 rb8 shape (full conv is 'full'):
  pipe   — passthrough kernel (out = cast(mid)): pipeline/DMA floor
  dot1   — one dot mid@A0 (no halo concat, no cross taps)
  dot3   — lhs3 halo concat + A3 dot (no cross taps / rolls / mask)
  full   — the v2 two-dot conv
Also reproduces the v2 c64n192 Mosaic failure with the full error.

Usage (on the TPU chip): python benchmarks/exp_r4c_pairconv_ablate.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

B, H, W = 15, 392, 416
C, N, P, RB = 64, 192, 2, 8


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def timeit(fn, *args, iters=10, warmup=2):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _kernel(top_ref, mid_ref, bot_ref, a3_ref, d3_ref, out_ref,
            *, rb, w2, pc, pn, n, variant):
    mo = rb * w2
    mid = mid_ref[0].reshape(mo, pc)
    if variant == "pipe":
        out = mid[:, :1] * jnp.ones((pn,), jnp.float32)
        out_ref[0] = out.astype(out_ref.dtype).reshape(rb, w2, pn)
        return
    if variant == "dot1":
        acc = jnp.dot(mid, a3_ref[0:pc], preferred_element_type=jnp.float32)
        out_ref[0] = acc.astype(out_ref.dtype).reshape(rb, w2, pn)
        return
    top = top_ref[0].reshape(w2, pc)
    bot = bot_ref[0].reshape(w2, pc)
    xf = jnp.concatenate([top, mid, bot], axis=0)
    lhs3 = jnp.concatenate(
        [xf[0:mo], xf[w2:w2 + mo], xf[2 * w2:2 * w2 + mo]], axis=1)
    acc = jnp.dot(lhs3, a3_ref[:], preferred_element_type=jnp.float32)
    if variant == "dot3":
        out_ref[0] = acc.astype(out_ref.dtype).reshape(rb, w2, pn)
        return
    bc = jnp.dot(lhs3, d3_ref[:], preferred_element_type=jnp.float32)
    up = pltpu.roll(bc, 1, 0)
    dn = pltpu.roll(bc, mo - 1, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * n), 1)
    sel = jnp.where(col < n, up, dn)
    out = acc + sel
    out_ref[0] = out.astype(out_ref.dtype).reshape(rb, w2, pn)


def run_variant(variant, rb=RB):
    c, n, p = C, N, P
    pc, pn = p * c, p * n
    w2 = -(-(W // p + 2) // 8) * 8
    x = jax.random.normal(jax.random.key(0), (B, H, W, c), jnp.bfloat16)
    a3 = jax.random.normal(jax.random.key(1), (3 * pc, pn),
                           jnp.bfloat16) * 0.05
    d3 = jax.random.normal(jax.random.key(2), (3 * pc, 2 * n),
                           jnp.bfloat16) * 0.05

    def f(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (p, w2 * p - W - p), (0, 0)))
        xp = xp.reshape(B, H + 2, w2, pc)
        nb = H // rb
        mid = xp[:, 1:H + 1].reshape(B * nb, rb, w2, pc)
        top = xp[:, 0:H:rb].reshape(B * nb, 1, w2, pc)
        bot = xp[:, rb + 1::rb].reshape(B * nb, 1, w2, pc)
        spec_mid = pl.BlockSpec((1, rb, w2, pc), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        spec_edge = pl.BlockSpec((1, 1, w2, pc), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        sw = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            partial(_kernel, rb=rb, w2=w2, pc=pc, pn=pn, n=n,
                    variant=variant),
            grid=(B * nb,),
            in_specs=[spec_edge, spec_mid, spec_edge,
                      sw((3 * pc, pn)), sw((3 * pc, 2 * n))],
            out_specs=pl.BlockSpec((1, rb, w2, pn),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * nb, rb, w2, pn),
                                           jnp.bfloat16),
        )(top, mid, bot, a3, d3)
        return out[..., :c] + 0.0

    try:
        dt = timeit(f, x)
    except Exception as e:
        tb = traceback.format_exc()
        # surface the mosaic MLIR line if present
        lines = [ln for ln in tb.splitlines()
                 if "tpu." in ln or "vector" in ln or "Mosaic" in ln
                 or "NotImplemented" in ln or "error" in ln.lower()]
        record(f"ablate_{variant}_rb{rb}",
               "FAILED " + " | ".join(lines[-8:])[:900])
        return
    nblocks = B * (H // rb)
    us = dt * 1e6 / nblocks
    conv_tf = 2 * B * H * W * 9 * C * N / dt / 1e12
    record(f"ablate_{variant}_rb{rb}",
           {"ms": round(dt * 1e3, 3), "us_per_block": round(us, 2),
            "conv_equiv_tf": round(conv_tf, 1)})


def main():
    for v in ("pipe", "dot1", "dot3", "full"):
        run_variant(v)
    for v in ("pipe", "dot3", "full"):
        run_variant(v, rb=28)


if __name__ == "__main__":
    main()
