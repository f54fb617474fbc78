"""Crosscheck bench.py's headline timing against the house rule.

bench.py times `runner(img); out.block_until_ready()` per frame —
the very sync exp_r15 showed can return early through the axon dev
tunnel for some dispatch paths. The headline has always been
internally consistent with marginal-chain kernel sums (69 x 17.4 ms
trunk + tail ~= the 1.31 s frame wall), but the driver metric should
not rest on an unverified sync: this times the SAME staged runner both
ways and prints the ratio.

Usage (on the TPU chip): python benchmarks/exp_r20_headline_check.py
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

from superresolution_tpu.infer import make_tiled_infer_staged  # noqa: E402
from superresolution_tpu.infer.fused_trunk import make_fused_trunk  # noqa: E402
from superresolution_tpu.infer.phase_tail import make_phase_tail  # noqa: E402
from superresolution_tpu.models import RRDBNet  # noqa: E402
from superresolution_tpu.utils.precision import get_policy  # noqa: E402


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def main():
    model = RRDBNet(scale=4, in_channels=3, out_channels=3, features=64,
                    num_blocks=23, growth=32, upsampler="pixelshuffle")
    policy = get_policy("bf16")
    tile, halo, batch = (360, 240), 8, 24
    h, w = 1080, 1920
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 32, 32, 3)))
    params = policy.cast_to_compute(params)
    fused_trunk = make_fused_trunk(params, model)

    def trunk_fn(x):
        return fused_trunk(x.astype(policy.compute_dtype))

    tail_fn = make_phase_tail(params)
    runner = make_tiled_infer_staged(
        trunk_fn, tail_fn, scale=4, tile=tile, halo=halo,
        tail_batch=batch, h=h, w=w, channels=3)
    img = jax.random.uniform(jax.random.key(1), (h, w, 3), jnp.float32)

    # --- bench.py's method: per-frame dispatch + block_until_ready
    out = runner(img)
    out.block_until_ready()
    runs = 3
    t0 = time.perf_counter()
    for _ in range(runs):
        out = runner(img)
        out.block_until_ready()
    dt_bench = (time.perf_counter() - t0) / runs
    record("frame_ms_block_until_ready", round(dt_bench * 1e3, 1))

    # --- house rule: data-dependent frame chain, device_get'ed scalar.
    # The staged runner is a jitted callable; chain at the frame level
    # (fold the output mean back into the input so frames serialize)
    # and take the marginal between 2- and 4-frame chains so any
    # constant setup cost cancels.
    def chain(n):
        def step(u):
            out = runner(u)
            return u + jnp.mean(out.astype(jnp.float32)).astype(u.dtype)

        v = img
        for _ in range(n):
            v = step(v)
        return jnp.sum(v.astype(jnp.float32))

    jax.device_get(chain(2))
    t0 = time.perf_counter()
    jax.device_get(chain(2))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(chain(4))
    t2 = time.perf_counter() - t0
    dt_chain = (t2 - t1) / 2
    record("frame_ms_marginal_chain", round(dt_chain * 1e3, 1))
    record("ratio_chain_over_bench", round(dt_chain / dt_bench, 3))
    record("mp_per_s_chain", round(h * w / 1e6 / dt_chain, 4))


if __name__ == "__main__":
    main()
