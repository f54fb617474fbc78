"""Headline bench stage split at the v10 geometry (360x240, rb=94).

Times the staged tiler's trunk and tail as separate jitted programs
(split_stages=True) to locate the remaining non-trunk time:
  trunk = conv_first + 69 fused dense blocks + trunk residual
  tail  = folded x4 tail (upconvs at LR + one interleave + final convs)
plus the full fused runner for reference.

Usage (on the TPU chip): python benchmarks/exp_r8_stages.py
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

from superresolution_tpu.infer import make_tiled_infer_staged
from superresolution_tpu.infer.folded_tail import make_folded_tail
from superresolution_tpu.infer.fused_trunk import make_fused_trunk
from superresolution_tpu.models import RRDBNet
from superresolution_tpu.utils.precision import get_policy


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def main():
    model = RRDBNet(scale=4, in_channels=3, out_channels=3, features=64,
                    num_blocks=23, growth=32, upsampler="pixelshuffle")
    policy = get_policy("bf16")
    tile, halo, batch = (360, 240), 8, 6
    h, w = 1080, 1920
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 32, 32, 3)))
    params = policy.cast_to_compute(params)
    fused_trunk = make_fused_trunk(params, model)

    def trunk_fn(x):
        return fused_trunk(x.astype(policy.compute_dtype))

    tail_fn = make_folded_tail(params)
    run_trunk, run_tail = make_tiled_infer_staged(
        trunk_fn, tail_fn, scale=4, tile=tile, halo=halo,
        tail_batch=batch, h=h, w=w, channels=3, split_stages=True)
    img = jax.random.uniform(jax.random.key(1), (h, w, 3), jnp.float32)

    feats = run_trunk(img)
    jax.block_until_ready(feats)
    out = run_tail(feats)
    jax.block_until_ready(out)

    runs = 3
    t0 = time.perf_counter()
    for _ in range(runs):
        feats = run_trunk(img)
        jax.block_until_ready(feats)
    t_trunk = (time.perf_counter() - t0) / runs
    record("trunk_ms", round(t_trunk * 1e3, 1))
    t0 = time.perf_counter()
    for _ in range(runs):
        out = run_tail(feats)
        jax.block_until_ready(out)
    t_tail = (time.perf_counter() - t0) / runs
    record("tail_ms", round(t_tail * 1e3, 1))
    record("trunk_ms_per_block", round(t_trunk * 1e3 / 69, 2))
    mp = h * w / 1e6
    record("sum_mps", round(mp / (t_trunk + t_tail), 3))


if __name__ == "__main__":
    main()
