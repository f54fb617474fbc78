"""Hybrid end-to-end re-measure under the TRUSTED methodology, with
the CAB-kernel A/B.

Every earlier hybrid e2e number (0.214/0.216/0.2199/0.221 MP/s — the
296-350 ms/batch walls in BENCHMARKS.md) was taken with the
fori_loop + block_until_ready pattern that exp_r15/r16c proved
under-reports through the axon tunnel. This harness times the flagship
hybrid deploy rewrite (fused RRDB trunk + phase tail -> smoothing ->
fused HAT stage 2 -> smoothing, 128^2 -> 512^2, batch 4) as the
marginal ms/step between a K-step and a 2K-step in-jit chain whose
result is device_get'ed, with SRTPU_XLA_CAB=1 selecting the XLA CAB
branch inside the fused HAB path (exp_r18: kernel 1.377 vs XLA
1.545 ms at [4,256,256,96]).

Usage (on the TPU chip):
    python benchmarks/exp_r19_hybrid_e2e.py            # CAB kernel
    SRTPU_XLA_CAB=1 python benchmarks/exp_r19_hybrid_e2e.py
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
    def make(n):
        @jax.jit
        def run(v):
            def body(_, u):
                # chain through the LR input: fold the HR output back
                # to LR size so every step depends on the last
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
    batch = 4
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
    x = jax.random.normal(jax.random.key(1), (batch, 128, 128, 1),
                          jnp.bfloat16)
    t = timeit(lambda v: wrapped.apply(None, v), x)
    mp_in = batch * 128 * 128 / 1e6
    tag = "xla_cab" if os.environ.get("SRTPU_XLA_CAB") else "cab_kernel"
    record(f"hybrid_ms_per_batch_{tag}", round(t * 1e3, 1))
    record(f"hybrid_input_mp_per_s_{tag}", round(mp_in / t, 4))


if __name__ == "__main__":
    main()
