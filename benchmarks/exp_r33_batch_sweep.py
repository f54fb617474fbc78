"""Deploy-batch sweep for the hybrid flagship (VERDICT r4 item 3a).

The bench hybrid line has always run at batch 4 — the TRAINING geometry
(reference batch-3-accum-20 class) — but inference batch is free, and
every measured per-call floor (the ~2.6 ms pipeline floor per CAB-class
Pallas call, kernel dispatch, XLA glue between kernels) amortizes
linearly in batch. No b8/b16 number existed anywhere in the 56 prior
harnesses.

Sweeps b in {2, 4, 8, 16} over the UNCHANGED fused deploy path
(infer/fused_hat.fused_hybrid_model: fused RRDB trunk + phase tail ->
smoothing -> fused HAT stage 2 with stacked-head attention default ->
smoothing, 128^2 -> 512^2) under the trusted marginal-chain timing.
Prints input-MP/s per batch size; the winner becomes bench.py's deploy
batch (SRTPU_HYBRID_BATCH overrides).

Usage (on the TPU chip):
    python benchmarks/exp_r33_batch_sweep.py
    SRTPU_BATCHES="4,8" python benchmarks/exp_r33_batch_sweep.py
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

from superresolution_tpu.infer.fused_hat import fused_hybrid_model  # noqa: E402
from superresolution_tpu.models import HATLite, HybridSR, RRDBNet  # noqa: E402
from superresolution_tpu.utils.precision import get_policy  # noqa: E402


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def timeit(fn, x, iters=5):
    """House-rule marginal timing (BENCHMARKS.md round 3)."""
    def make(n):
        @jax.jit
        def run(v):
            def body(_, u):
                out = fn(u)
                return (u + jnp.mean(out.astype(jnp.float32))
                        .astype(u.dtype))

            out = jax.lax.fori_loop(0, n, body, v)
            return jnp.sum(out.astype(jnp.float32))

        return run

    r1, r2 = make(iters), make(2 * iters)
    jax.device_get(r1(x))
    jax.device_get(r2(x))
    t0 = time.perf_counter()
    jax.device_get(r1(x))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(r2(x))
    t2 = time.perf_counter() - t0
    return (t2 - t1) / iters


def main():
    batches = [int(b) for b in os.environ.get(
        "SRTPU_BATCHES", "2,4,8,16").split(",")]
    policy = get_policy("bf16")
    model = HybridSR(
        stage1=RRDBNet(scale=2, in_channels=1, out_channels=1,
                       features=64, num_blocks=23, growth=32,
                       upsampler="pixelshuffle"),
        stage2=HATLite(scale=2, in_channels=1, out_channels=1,
                       embed_dim=96, depths=(6,) * 4,
                       num_heads=(6,) * 4, window_size=8,
                       attn_f32=False, flash_attn=True),
        smoothing="balanced", output_size=512)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 128, 128, 1)))
    params = policy.cast_to_compute(params)
    wrapped = fused_hybrid_model(params, model)
    best = (None, 0.0)
    for b in batches:
        x = jax.random.normal(jax.random.key(1), (b, 128, 128, 1),
                              jnp.bfloat16)
        # fewer chain iters at large batch: same total work per timing
        iters = max(2, 20 // b)
        t = timeit(lambda v: wrapped.apply(None, v), x, iters=iters)
        mps = b * 128 * 128 / 1e6 / t
        record(f"hybrid_b{b}_ms_per_batch", round(t * 1e3, 1))
        record(f"hybrid_b{b}_input_mp_per_s", round(mps, 4))
        if mps > best[1]:
            best = (b, mps)
    record("winner_batch", best[0])
    record("winner_mp_per_s", round(best[1], 4))


if __name__ == "__main__":
    main()
