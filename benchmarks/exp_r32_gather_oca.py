"""In-kernel OCAB kv gather (ops/pallas_flash_oca.py) — e2e A/B on
the flagship hybrid geometry (bench.py bench_hybrid: batch 4,
128^2 -> 512^2, fused deploy path).

The deployed OCAB spends ~3.9 of its ~12.5 ms on
extract_overlapping_windows (exp_r23) and the flash kernel re-reads the
~226 MB gathered kv tensor from HBM. The gather-in-kernel path streams
the padded k/v MAPS as paired row blocks and slices each window's patch
in VMEM:

  base     deployed path (XLA cell gather + flash_window_attention)
  gather   SRTPU_GATHER_OCA=1 (flash_oca_gathered)

House-rule marginal chains (3 vs 6 reps inside one jit, scalar fold).

Usage (on the TPU chip): python benchmarks/exp_r32_gather_oca.py
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


def build():
    from superresolution_tpu.infer.fused_hat import fused_hybrid_model
    from superresolution_tpu.models import HATLite, HybridSR, RRDBNet
    from superresolution_tpu.utils.precision import get_policy

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
    return fused_hybrid_model(params, model)


def chain_ms(fn, x, k):
    @jax.jit
    def run(u):
        def body(_, v):
            y = fn(v)
            return u + jnp.float32(1e-6).astype(u.dtype) * jnp.mean(
                y).astype(u.dtype)
        return jax.lax.fori_loop(0, k, body, x)

    jax.device_get(run(x))
    t0 = time.perf_counter()
    jax.device_get(run(x))
    return (time.perf_counter() - t0) * 1e3


CONFIGS = {
    "base": {"SRTPU_GATHER_OCA": ""},
    "gather": {"SRTPU_GATHER_OCA": "1"},
}


def main():
    names = sys.argv[1:] or list(CONFIGS)
    batch = int(os.environ.get("SRTPU_HYBRID_BATCH", "1"))
    x = jax.random.normal(jax.random.key(1), (batch, 128, 128, 1),
                          jnp.bfloat16)
    for name in names:
        for k, v in CONFIGS[name].items():
            if v:
                os.environ[k] = v
            else:
                os.environ.pop(k, None)
        wrapped = build()

        def fn(v):
            return wrapped.apply(None, v)

        t3, t6 = chain_ms(fn, x, 3), chain_ms(fn, x, 6)
        ms = (t6 - t3) / 3
        record(f"hybrid_{name}_ms_per_batch", round(ms, 1))
        record(f"hybrid_{name}_mps", round(batch * 128 * 128 / 1e6
                                           / (ms / 1e3), 4))


if __name__ == "__main__":
    main()
