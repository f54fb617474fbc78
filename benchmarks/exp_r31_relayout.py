"""Mosaic relayout probe: can the fused kernels take their window
blocks as 128-lane rows and repack in-register?

A [64, 96] window (row-major) is byte-identical to [48, 128]: reading
the SAME HBM bytes as 48 full-lane rows instead of 64 sub-128 rows
saves 25% of the transfer slots (exp_r29/r30: sub-128 lanes are a
per-row SLOT cost — GB/s scales as lanes/128). The open question is
what the in-kernel [48,128]->[64,96] reshape (a cross-lane-boundary
relayout) costs on real Mosaic, or whether it even compiles.

Arms (same 50 MB payload, [4096 windows] bf16, marginal timing):
  pt96      passthrough, blocks [16, 64, 96]   (status-quo I/O)
  pt128     passthrough, blocks [16, 48, 128]  (pure-I/O upper bound)
  relayout  blocks [16, 48, 128], in-kernel reshape -> [16*64, 96],
            +1.0, reshape back, write [16, 48, 128]

Usage (on the TPU chip): python benchmarks/exp_r31_relayout.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

import bench  # noqa: E402  (for _marginal_ms, the trusted timer)

NW, NB = 4096, 16


def make_pt(n, c):
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + jnp.asarray(1.0, x_ref.dtype)

    def apply(x):
        return pl.pallas_call(
            kernel,
            grid=(NW // NB,),
            in_specs=[pl.BlockSpec((NB, n, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NB, n, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NW, n, c), x.dtype),
        )(x)

    return apply


def make_relayout():
    def kernel(x_ref, o_ref):
        y = x_ref[:].reshape(NB * 64, 96)
        y = y + jnp.asarray(1.0, y.dtype)
        o_ref[:] = y.reshape(NB, 48, 128)

    def apply(x):
        return pl.pallas_call(
            kernel,
            grid=(NW // NB,),
            in_specs=[pl.BlockSpec((NB, 48, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NB, 48, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NW, 48, 128), x.dtype),
        )(x)

    return apply


def main():
    x96 = jax.random.normal(jax.random.key(0), (NW, 64, 96),
                            jnp.float32).astype(jnp.bfloat16)
    x128 = x96.reshape(NW, 48, 128)
    gb = 2 * NW * 64 * 96 * 2 / 1e9  # read+write bf16

    for tag, fn, x in (("pt96", make_pt(64, 96), x96),
                       ("pt128", make_pt(48, 128), x128),
                       ("relayout", make_relayout(), x128)):
        try:
            ms = bench._marginal_ms(fn, x, iters=10)
        except Exception as e:
            print(json.dumps({f"{tag}_error": repr(e)[:300]}), flush=True)
            continue
        print(json.dumps({f"{tag}_ms": round(ms, 3),
                          f"{tag}_gbps": round(gb / (ms / 1e3), 1)}),
              flush=True)
    # correctness of the relayout arm (bytes must round-trip)
    got = make_relayout()(x128)
    want = (x96.astype(jnp.float32) + 1.0).astype(jnp.bfloat16)
    ok = bool(jnp.all(got.reshape(NW, 64, 96) == want))
    print(json.dumps({"relayout_exact": ok}), flush=True)


if __name__ == "__main__":
    main()
