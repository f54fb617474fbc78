"""Round-2 trunk experiments: where does the RRDB trunk lose the factor-2
between its measured 42 TF/s and the ~100 TF/s its conv shapes support?

  E5  honest per-conv-shape rates (outputs fully consumed — no DCE)
  E6  one FusedDenseBlock / plain DenseBlock chained (isolates block glue)
  E7  full trunk at different tile geometries + scan unroll
  E8  matmul ceiling re-calibration (round-1 said 102; E1 convs hit 171)

Usage: python benchmarks/exp_r2_trunk.py
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


def conv_rate_honest(b, h, w, cin, cout, chain=8):
    """All cout outputs are consumed (segment-summed back to cin) so XLA
    cannot shrink the conv."""
    assert cout % cin == 0
    k = jax.random.normal(jax.random.key(0), (3, 3, cin, cout), jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), (b, h, w, cin), jnp.bfloat16)

    def f(x):
        for _ in range(chain):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)
            x = y.reshape(b, h, w, cout // cin, cin).sum(3) * jnp.bfloat16(0.1)
        return x

    dt = timeit(f, x)
    return round(chain * 2 * b * h * w * 9 * cin * cout / dt / 1e12, 1)


def main():
    B, H, W = 15, 392, 416  # the bench trunk tile geometry

    # E5: the five fused-dense-block conv shapes, honestly measured
    for cin, cout in ((64, 192), (32, 160), (32, 128), (32, 96), (32, 64)):
        record(f"E5_conv_{cin}to{cout}", conv_rate_honest(B, H, W, cin, cout))

    # E6: one dense block chained x8 (no RRDB residual, no scan)
    from superresolution_tpu.models.rrdbnet import DenseBlock, FusedDenseBlock

    x = jax.random.normal(jax.random.key(2), (B, H, W, 64), jnp.bfloat16)
    macs_px = 9 * (64 * 32 + 96 * 32 + 128 * 32 + 160 * 32 + 192 * 64)
    for name, cls in (("fused", FusedDenseBlock), ("plain", DenseBlock)):
        blk = cls(features=64, growth=32)
        p = jax.jit(blk.init)(jax.random.key(0), x[:1, :16, :16])
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)

        def f(x):
            for _ in range(8):
                x = blk.apply(p, x)
            return x

        dt = timeit(f, x)
        tf = 8 * 2 * macs_px * B * H * W / dt / 1e12
        record(f"E6_denseblock_{name}", round(tf, 1))

    # E7: full trunk, geometry + unroll sweep
    from superresolution_tpu.models import RRDBNet

    trunk_macs_px = 23 * 3 * macs_px + 9 * 3 * 64 + 9 * 64 * 64
    geoms = {
        "b15_392x416": (15, 392, 416),   # current bench (3x5 grid, halo 16)
        "b6_572x672": (6, 572, 672),     # 2x3 grid of 540x640, halo 16
        "b45_232x256": (45, 232, 256),   # 9x5? finer grid: more halo waste
    }
    for unroll in (1, 2):
        model = RRDBNet(scale=4, in_channels=3, out_channels=3, features=64,
                        num_blocks=23, growth=32, upsampler="pixelshuffle",
                        scan_unroll=unroll)
        params = jax.jit(model.init)(jax.random.key(0),
                                     jnp.zeros((1, 32, 32, 3)))
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

        def trunk(t):
            return model.apply(params, t.astype(jnp.bfloat16), method="trunk")

        for gname, (b, h, w) in geoms.items():
            if unroll == 2 and gname != "b15_392x416":
                continue
            xt = jax.random.normal(jax.random.key(3), (b, h, w, 3),
                                   jnp.bfloat16)
            dt = timeit(trunk, xt, iters=3)
            tf = 2 * trunk_macs_px * b * h * w / dt / 1e12
            record(f"E7_trunk_{gname}_u{unroll}",
                   {"ms": round(dt * 1e3, 1), "tf_s": round(tf, 1)})

    # E8: matmul ceiling recalibration
    a = jax.random.normal(jax.random.key(4), (4096, 4096), jnp.bfloat16)

    def mm(a):
        x = a
        for _ in range(8):
            x = (x @ a) * jnp.bfloat16(1e-3)
        return x

    dt = timeit(mm, a)
    record("E8_matmul_4096", round(8 * 2 * 4096**3 / dt / 1e12, 1))


if __name__ == "__main__":
    main()
