"""Round-2 experiments, part 3: does zero-padding conv input channels to
128 lanes raise MXU K-utilization enough to beat the unpadded conv?

  E9   px-conv shapes with cin zero-padded to 128
  E10  tail stage honest breakdown (up1 / up2@2x / conv_hr@4x / d2s cost)
  E11  fused dense block with all conv inputs padded to 128 lanes

Usage: python benchmarks/exp_r2_padk.py
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


def conv(x, k, cout):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def rate_padded(b, h, w, cin, cout, pad_to, chain=8):
    """conv with cin zero-padded to pad_to; useful-FLOPs rate reported."""
    assert cout % cin == 0
    k = jax.random.normal(jax.random.key(0), (3, 3, pad_to, cout),
                          jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), (b, h, w, cin), jnp.bfloat16)

    def f(x):
        for _ in range(chain):
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_to - cin)))
            y = conv(xp, k, cout)
            x = y.reshape(b, h, w, cout // cin, cin).sum(3) * jnp.bfloat16(0.1)
        return x

    dt = timeit(f, x)
    return round(chain * 2 * b * h * w * 9 * cin * cout / dt / 1e12, 1)


def main():
    B, H, W = 15, 392, 416

    # E9: padded-K variants of the dense-block conv shapes
    record("E9_pad128_64to192", rate_padded(B, H, W, 64, 192, 128))
    record("E9_pad128_32to160", rate_padded(B, H, W, 32, 160, 128))
    record("E9_pad64_32to160", rate_padded(B, H, W, 32, 160, 64))

    # E10: tail stages, honest
    from superresolution_tpu.ops.pixel_shuffle import depth_to_space

    feat = jax.random.normal(jax.random.key(2), (B, H, W, 64), jnp.bfloat16)
    k1 = jax.random.normal(jax.random.key(3), (3, 3, 64, 256), jnp.bfloat16)

    def up1(f):
        return conv(f, k1, 256)

    dt = timeit(up1, feat, iters=3)
    record("E10_up1_ms", round(dt * 1e3, 1))

    z1 = up1(feat)

    def d2s_only(z):
        return depth_to_space(z, 2) * jnp.bfloat16(1.0001)

    dt = timeit(d2s_only, z1, iters=3)
    record("E10_d2s2_ms", round(dt * 1e3, 1))

    y1 = depth_to_space(z1, 2)  # [B, 2H, 2W, 64]

    def up2(y):
        return conv(y, k1, 256)

    dt = timeit(up2, y1, iters=3)
    record("E10_up2_at2x_ms", round(dt * 1e3, 1))

    z2 = up2(y1)
    dt = timeit(d2s_only, z2, iters=3)
    record("E10_d2s2_at2x_ms", round(dt * 1e3, 1))

    y2 = depth_to_space(z2, 2)  # [B, 4H, 4W, 64]
    khr = jax.random.normal(jax.random.key(4), (3, 3, 64, 64), jnp.bfloat16)

    def hr(y):
        return conv(y, khr, 64)

    dt = timeit(hr, y2, iters=3)
    record("E10_convhr_at4x_ms", round(dt * 1e3, 1))

    # phase-folded up2: 4 convs of 2x2 over the 256-lane phase layout
    k2x2 = jax.random.normal(jax.random.key(5), (2, 2, 256, 256),
                             jnp.bfloat16)

    def up2_folded(z):
        outs = []
        for a in (0, 1):
            for b2 in (0, 1):
                pad = ((0, 0), (1 - a, a), (1 - b2, b2), (0, 0))
                zp = jnp.pad(z, pad)
                y = jax.lax.conv_general_dilated(
                    zp, k2x2, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16)
                outs.append(y)
        return jnp.concatenate(outs, axis=-1)  # [B,H,W,1024]

    dt = timeit(up2_folded, z1, iters=3)
    record("E10_up2_folded_ms", round(dt * 1e3, 1))

    # E11: fused dense block with pad-128 conv inputs
    from superresolution_tpu.models.rrdbnet import FusedDenseBlock

    macs_px = 9 * (64 * 32 + 96 * 32 + 128 * 32 + 160 * 32 + 192 * 64)
    ks = {n: jax.random.normal(jax.random.key(10 + i), (3, 3, 128, n),
                               jnp.bfloat16)
          for i, n in enumerate((192, 160, 128, 96, 64))}

    def fused_pad(x):
        def pconv(v, n):
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, 128 - v.shape[-1])))
            return conv(vp, ks[n], n)

        g, c = 32, 64
        lr = lambda v: jnp.where(v >= 0, v, 0.2 * v)
        px = pconv(x, 192)
        acc = px[..., 4 * g:]
        y1 = lr(px[..., :g])
        p1 = pconv(y1, 160)
        acc = acc + p1[..., 3 * g:]
        y2 = lr(px[..., g:2 * g] + p1[..., :g])
        p2 = pconv(y2, 128)
        acc = acc + p2[..., 2 * g:]
        y3 = lr(px[..., 2 * g:3 * g] + p1[..., g:2 * g] + p2[..., :g])
        p3 = pconv(y3, 96)
        acc = acc + p3[..., g:]
        y4 = lr(px[..., 3 * g:4 * g] + p1[..., 2 * g:3 * g]
                + p2[..., g:2 * g] + p3[..., :g])
        p4 = pconv(y4, 64)
        return x + (acc + p4) * jnp.bfloat16(0.2)

    def f(x):
        for _ in range(8):
            x = fused_pad(x)
        return x

    dt = timeit(f, feat)
    record("E11_fused_pad128", round(8 * 2 * macs_px * B * H * W / dt / 1e12, 1))


if __name__ == "__main__":
    main()
