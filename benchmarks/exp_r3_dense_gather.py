"""Dense-block re-layout probe: 'gather' layout vs the fused-projection
layout.

The FusedDenseBlock (models/rrdbnet.py) spends 54% of its MACs in
K=9*32=288 projection convs that run at 12-21 TF/s on this stack
(BENCHMARKS.md envelope). The mathematically-identical 'gather' layout
computes each step's input contribution from the CONCAT of all ready
sources instead:

    A: x              -> px[4g+c]   K=576,  N=192
    B: y1             -> y2seg      K=288,  N=32
    C: [y1,y2]        -> y3seg      K=576,  N=32
    D: [y1,y2,y3]     -> y4seg      K=864,  N=32
    E: [y1,y2,y3,y4]  -> outseg     K=1152, N=64

Same MAC count; K>=576 carries 87% of MACs instead of 46%. Whether that
wins depends on conv rates at SMALL output-channel counts (N=32/64),
which the round-2 envelope didn't probe. This script measures the raw
per-shape rates, then the full block both ways.

Usage (on the TPU chip): python benchmarks/exp_r3_dense_gather.py
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

B, H, W = 15, 392, 416
G, C = 32, 64


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def timeit_chained(fn, x, iters=20, warmup=1):
    @jax.jit
    def chained(x):
        def body(_, v):
            return fn(v)

        return jax.lax.fori_loop(0, iters, body, x)

    for _ in range(warmup):
        out = chained(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chained(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def rate_probe():
    shapes = [(96, 32), (128, 64), (64, 32), (32, 32), (32, 160),
              (96, 96), (128, 128)]
    for cin, cout in shapes:
        x = jax.random.normal(jax.random.key(0), (B, H, W, cin),
                              jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (3, 3, cin, cout),
                              jnp.bfloat16) * 0.05

        def f(x, k=k, cin=cin, cout=cout):
            y = conv(x, k)
            # keep shapes chained: project back to cin channels cheaply
            if cout != cin:
                y = y[..., :1] * jnp.ones((cin,), jnp.bfloat16)
            return y

        dt = timeit_chained(f, x)
        tf = 2 * B * H * W * 9 * cin * cout / dt / 1e12
        record(f"conv_{cin}to{cout}", {"ms": round(dt * 1e3, 3),
                                       "tf_s": round(tf, 1)})


def lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def make_params(key, layout):
    ks = jax.random.split(key, 8)
    p = {}
    if layout == "proj":
        p["px"] = jax.random.normal(ks[0], (3, 3, C, 4 * G + C),
                                    jnp.bfloat16) * 0.03
        for i, n in ((1, 3 * G + C), (2, 2 * G + C), (3, G + C), (4, C)):
            p[f"p{i}"] = jax.random.normal(ks[i], (3, 3, G, n),
                                           jnp.bfloat16) * 0.03
    else:
        p["px"] = jax.random.normal(ks[0], (3, 3, C, 4 * G + C),
                                    jnp.bfloat16) * 0.03
        p["b"] = jax.random.normal(ks[1], (3, 3, G, G), jnp.bfloat16) * 0.03
        p["c"] = jax.random.normal(ks[2], (3, 3, 2 * G, G),
                                   jnp.bfloat16) * 0.03
        p["d"] = jax.random.normal(ks[3], (3, 3, 3 * G, G),
                                   jnp.bfloat16) * 0.03
        p["e"] = jax.random.normal(ks[4], (3, 3, 4 * G, C),
                                   jnp.bfloat16) * 0.03
    return p


def block_proj(x, p):
    px = conv(x, p["px"])
    acc = px[..., 4 * G:]
    y1 = lrelu(px[..., :G])
    p1 = conv(y1, p["p1"])
    acc = acc + p1[..., 3 * G:]
    y2 = lrelu(px[..., G:2 * G] + p1[..., :G])
    p2 = conv(y2, p["p2"])
    acc = acc + p2[..., 2 * G:]
    y3 = lrelu(px[..., 2 * G:3 * G] + p1[..., G:2 * G] + p2[..., :G])
    p3 = conv(y3, p["p3"])
    acc = acc + p3[..., G:]
    y4 = lrelu(px[..., 3 * G:4 * G] + p1[..., 2 * G:3 * G]
               + p2[..., G:2 * G] + p3[..., :G])
    p4 = conv(y4, p["p4"])
    return x + (acc + p4) * jnp.asarray(0.2, x.dtype)


def block_gather(x, p):
    px = conv(x, p["px"])
    y1 = lrelu(px[..., :G])
    y2 = lrelu(px[..., G:2 * G] + conv(y1, p["b"]))
    y12 = jnp.concatenate([y1, y2], axis=-1)
    y3 = lrelu(px[..., 2 * G:3 * G] + conv(y12, p["c"]))
    y123 = jnp.concatenate([y12, y3], axis=-1)
    y4 = lrelu(px[..., 3 * G:4 * G] + conv(y123, p["d"]))
    y_all = jnp.concatenate([y123, y4], axis=-1)
    out = px[..., 4 * G:] + conv(y_all, p["e"])
    return x + out * jnp.asarray(0.2, x.dtype)


def block_bench():
    x = jax.random.normal(jax.random.key(0), (B, H, W, C), jnp.bfloat16)
    macs = B * H * W * 9 * (C * (4 * G + C) + G * (3 * G + C)
                            + G * (2 * G + C) + G * (G + C) + G * C)
    for layout, fn in (("proj", block_proj), ("gather", block_gather)):
        p = make_params(jax.random.key(7), layout)

        def f(x, p=p, fn=fn):
            return fn(x, p)

        dt = timeit_chained(f, x)
        record(f"dense_block_{layout}",
               {"ms": round(dt * 1e3, 3),
                "tf_s": round(2 * macs / dt / 1e12, 1)})


if __name__ == "__main__":
    rate_probe()
    block_bench()
