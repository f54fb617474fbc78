"""Round-2 perf experiments (single TPU chip, batched into one process).

Questions:
  E1  conv3x3 TF/s vs channel width — where is the real plateau?
  E2  grouped conv: does stacking 2/4 tiles into the channel dim with
      feature_group_count beat separate 64-ch convs?
  E3  trunk rate on the WHOLE 2K image (no tiles, no halo) vs the round-1
      15-tile batch — is the 1.18x halo waste free to remove?
  E4  tail cost: current conv+d2s tail at whole-image vs row-banded vs
      deferred-interleave variants.

Usage: python benchmarks/exp_r2_conv_rates.py > /tmp/exp_r2.json
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

RESULTS = {}


def record(key, value):
    RESULTS[key] = value
    print(json.dumps({key: value}), flush=True)


def timeit(fn, *args, iters=6, warmup=2):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    for _ in range(warmup - 1):
        jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def conv_rate(b, h, w, cin, cout, groups=1, iters=6):
    k = jax.random.normal(jax.random.key(0),
                          (3, 3, cin // groups, cout), jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), (b, h, w, cin), jnp.bfloat16)

    def f(x):
        # chain 8 convs to amortize dispatch
        for _ in range(8):
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
                preferred_element_type=jnp.bfloat16)[..., :cin]
        return x

    dt = timeit(f, x, iters=iters)
    flops = 8 * 2 * b * h * w * 9 * (cin // groups) * cout
    return flops / dt / 1e12


def main():
    # E1: channel-width sweep (constant total pixel count ~1M)
    for c in (64, 128, 192, 256, 384, 512):
        px = 1_000_000 // 1
        h = w = int(px ** 0.5) // 8 * 8
        tf = conv_rate(1, h, w, c, c)
        record(f"E1_conv3x3_c{c}", round(tf, 1))

    # E2: grouped conv — 2 and 4 stacked 64-ch problems
    record("E2_conv_c64_n192", round(conv_rate(4, 512, 512, 64, 192), 1))
    record("E2_group2_c128_n384",
           round(conv_rate(2, 512, 512, 128, 384, groups=2), 1))
    record("E2_group4_c256_n768",
           round(conv_rate(1, 512, 512, 256, 768, groups=4), 1))

    # E3: fused-dense RRDB trunk, whole-image vs tiled-with-halo
    from superresolution_tpu.models import RRDBNet

    model = RRDBNet(scale=4, in_channels=3, out_channels=3, features=64,
                    num_blocks=23, growth=32, upsampler="pixelshuffle")
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 32, 32, 3)))
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    def trunk(x):
        return model.apply(params, x.astype(jnp.bfloat16), method="trunk")

    def tail(f):
        return model.apply(params, f, method="tail")

    # dense-block MACs per pixel (23 blocks x 3 x 5 convs) + head/trunk conv
    macs_px = 23 * 3 * 9 * (64 * 32 + 96 * 32 + 128 * 32 + 160 * 32
                            + 192 * 64) + 9 * 3 * 64 + 9 * 64 * 64

    x_tiles = jax.random.normal(jax.random.key(2), (15, 392, 416, 3),
                                jnp.bfloat16)
    dt = timeit(trunk, x_tiles, iters=3)
    tf = 2 * macs_px * 15 * 392 * 416 / dt / 1e12
    record("E3_trunk_15tiles_halo",
           {"ms": round(dt * 1e3, 1), "tf_s": round(tf, 1)})

    x_full = jax.random.normal(jax.random.key(3), (1, 1080, 1920, 3),
                               jnp.bfloat16)
    dt = timeit(trunk, x_full, iters=3)
    tf = 2 * macs_px * 1080 * 1920 / dt / 1e12
    record("E3_trunk_whole_2k",
           {"ms": round(dt * 1e3, 1), "tf_s": round(tf, 1)})

    # E4: tail variants on the whole-image feature map
    feat = jax.random.normal(jax.random.key(4), (1, 1080, 1920, 64),
                             jnp.bfloat16)

    try:
        dt = timeit(lambda f: jnp.clip(tail(f), 0, 1), feat, iters=3)
        record("E4_tail_whole", {"ms": round(dt * 1e3, 1)})
    except Exception as e:  # whole-image x4 tail OOMs HBM (measured r2)
        record("E4_tail_whole", f"OOM/{type(e).__name__}")

    # row-banded tail via lax.map (12 bands of 90 rows + 2 halo rows)
    def tail_banded(f):
        band, halo = 90, 4
        padded = jnp.pad(f, ((0, 0), (halo, halo), (0, 0), (0, 0)))
        nb = 1080 // band

        def one(i):
            sl = jax.lax.dynamic_slice(
                padded, (0, i * band, 0, 0), (1, band + 2 * halo, 1920, 64))
            out = jnp.clip(tail(sl), 0, 1)
            return out[:, 4 * halo:-4 * halo]

        outs = jax.lax.map(one, jnp.arange(nb))
        return outs.transpose(1, 0, 2, 3, 4).reshape(1, 4320, 7680, 3)

    dt = timeit(tail_banded, feat, iters=3)
    record("E4_tail_banded90", {"ms": round(dt * 1e3, 1)})


if __name__ == "__main__":
    main()
