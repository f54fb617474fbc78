"""Can a Pallas 9-tap-dot conv beat XLA's conv at the dense block's
shapes? XLA reference: 64->192 conv3x3 at [15,392,416] runs 37.7 TF/s
(honest, outputs consumed); square c128 runs 107 — the gap is XLA's
scheduling of small-K convs, which this kernel attacks by keeping the
activation tile VMEM-resident across all 9 taps.

Usage: python benchmarks/exp_r2_pallas_conv.py
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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def timeit(fn, *args, iters=5, warmup=2):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _kernel(x0_ref, x1_ref, x2_ref, w_ref, out_ref, *, rows, w_out, cin,
            cout):
    acc = jnp.zeros((rows * w_out, cout), jnp.float32)
    for dy, xr in enumerate((x0_ref, x1_ref, x2_ref)):
        for dx in range(3):
            a = xr[0, :, dx:dx + w_out, :].reshape(rows * w_out, cin)
            acc = acc + jnp.dot(a, w_ref[dy * 3 + dx],
                                preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(rows, w_out, cout).astype(out_ref.dtype)


def pallas_conv(x, w, rows=8):
    """x: [B,H,W,Cin] bf16; w: [3,3,Cin,Cout] -> SAME conv via 9 taps."""
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x0, x1, x2 = xp[:, 0:h], xp[:, 1:h + 1], xp[:, 2:h + 2]
    w9 = w.reshape(9, cin, cout)
    grid = (b, h // rows)
    spec_x = pl.BlockSpec((1, rows, wd + 2, cin), lambda bi, i: (bi, i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel, rows=rows, w_out=wd, cin=cin, cout=cout),
        grid=grid,
        in_specs=[spec_x, spec_x, spec_x,
                  pl.BlockSpec((9, cin, cout), lambda bi, i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows, wd, cout),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype),
    )(x0, x1, x2, w9)


def main():
    B, H, W = 15, 392, 416
    for cin, cout, rows in ((64, 192, 8), (64, 192, 16), (32, 160, 16),
                            (64, 64, 16)):
        x = jax.random.normal(jax.random.key(0), (B, H, W, cin),
                              jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (3, 3, cin, cout),
                              jnp.bfloat16) * 0.05

        # correctness vs XLA conv
        ref = jax.lax.conv_general_dilated(
            x[:1, :32], k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        try:
            got = pallas_conv(x[:1, :32], k, rows=8).astype(jnp.float32)
            err = float(jnp.max(jnp.abs(ref - got)))
        except Exception as e:
            record(f"pallas_conv_{cin}to{cout}_r{rows}",
                   f"FAILED {type(e).__name__}: {str(e)[:200]}")
            continue

        def run(x):
            y = pallas_conv(x, k, rows=rows)
            # consume all outputs so nothing is DCE'd
            return y.reshape(B, H, W, cout // min(cin, cout),
                             min(cin, cout)).sum(3)

        dt = timeit(run, x, iters=5)
        tf = 2 * B * H * W * 9 * cin * cout / dt / 1e12
        record(f"pallas_conv_{cin}to{cout}_r{rows}",
               {"tf_s": round(tf, 1), "max_err": round(err, 5)})


if __name__ == "__main__":
    main()
