"""Folded-tail internals at the v10 bench chunk shape [6,376,256,64].

The tail is 305.7 ms of the 1552 ms headline frame (exp_r8_stages).
This splits it: up1+phase-conv2 (LR), the d2s(4) interleave (64-lane
layout move at 16x pixels), conv_hr (64ch at 4x — the 10.6 TF/s class),
conv_last (64->3 at 4x). Times are per 4-chunk frame equivalent
(24 tiles / 6 per chunk).

Usage (on the TPU chip): python benchmarks/exp_r8b_tail.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from superresolution_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

from superresolution_tpu.infer.folded_tail import (
    _conv,
    _lrelu,
    fold_stage2_kernel,
)
from superresolution_tpu.models import RRDBNet
from superresolution_tpu.ops.pixel_shuffle import depth_to_space
from superresolution_tpu.utils.precision import get_policy

B, H, W, C = 6, 376, 256, 64
CHUNKS = 4  # 24 tiles / 6


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def timeit(fn, x, iters=8, warmup=1):
    @jax.jit
    def chained(x):
        def body(_, v):
            o = fn(v)
            # fold a scalar of the output back into the input to chain
            return v + (o.mean() * 1e-6).astype(v.dtype)

        return jax.lax.fori_loop(0, iters, body, x)

    for _ in range(warmup):
        jax.block_until_ready(chained(x))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(x))
    return (time.perf_counter() - t0) / iters


def main():
    model = RRDBNet(scale=4, in_channels=3, out_channels=3, features=64,
                    num_blocks=1, growth=32, upsampler="pixelshuffle")
    policy = get_policy("bf16")
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 32, 32, 3)))
    params = policy.cast_to_compute(params)
    p = params["params"]
    up1 = p["up"]["Conv_0"]["Conv_0"]
    up2 = p["up"]["Conv_1"]["Conv_0"]
    hr = p["conv_hr"]["Conv_0"]
    last = p["conv_last"]["Conv_0"]
    kf = jnp.asarray(fold_stage2_kernel(np.asarray(up2["kernel"],
                                                   np.float32)))

    feat = jax.random.normal(jax.random.key(1), (B, H, W, C),
                             jnp.bfloat16) * 0.1

    def phase_part(v):
        z1 = _lrelu(_conv(v, jnp.asarray(up1["kernel"]),
                          jnp.asarray(up1["bias"])))
        phases = []
        for a in (0, 1):
            for b in (0, 1):
                zp = jnp.pad(z1, ((0, 0), (1 - a, a), (1 - b, b), (0, 0)))
                y = _conv(zp, kf[a, b], jnp.asarray(up2["bias"]),
                          padding="VALID")
                phases.append(_lrelu(y))
        return jnp.concatenate(phases, axis=-1)

    z2 = phase_part(feat)

    def interleave(v):
        bsz, h, w, _ = v.shape
        z = v.reshape(bsz, h, w, 2, 2, C, 2, 2)
        z = z.transpose(0, 1, 2, 5, 3, 6, 4, 7)
        return depth_to_space(z.reshape(bsz, h, w, 16 * C), 4)

    y4 = interleave(z2)

    def hr_conv(v):
        return _lrelu(_conv(v, jnp.asarray(hr["kernel"]),
                            jnp.asarray(hr["bias"])))

    y5 = hr_conv(y4)

    def last_conv(v):
        return _conv(v, jnp.asarray(last["kernel"]),
                     jnp.asarray(last["bias"]))

    for name, fn, x in [("up1_phase_conv2", phase_part, feat),
                        ("interleave_d2s4", interleave, z2),
                        ("conv_hr_4x", hr_conv, y4),
                        ("conv_last_4x", last_conv, y5)]:
        t = timeit(fn, x)
        record(f"{name}_ms_frame", round(t * 1e3 * CHUNKS, 1))


if __name__ == "__main__":
    main()
