"""Hybrid (reference headline) workload with flash window attention.

Measures the full hybrid_astro inference step (RRDB-23 x2 -> HAT-96 x2 ->
smoothing, 128^2 -> 512^2, batch 4, bf16) in three attention modes:
  * f32 logits   (training/parity mode — r1 baseline 0.127 MP/s)
  * bf16 logits  (attn_f32=False — r2 result 0.18 MP/s)
  * flash kernel (ops/pallas_attn.py — logits never leave VMEM)

Usage (on the TPU chip): python benchmarks/exp_r3_hybrid_flash.py
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

from superresolution_tpu.models import HATLite, HybridSR, RRDBNet  # noqa: E402
from superresolution_tpu.utils.precision import get_policy  # noqa: E402


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def build(attn_f32, flash):
    stage1 = RRDBNet(scale=2, in_channels=1, out_channels=1, features=64,
                     num_blocks=23, growth=32)
    stage2 = HATLite(scale=2, in_channels=1, out_channels=1, embed_dim=96,
                     depths=(6, 6, 6, 6), num_heads=(6, 6, 6, 6),
                     window_size=8, attn_f32=attn_f32, flash_attn=flash)
    return HybridSR(stage1=stage1, stage2=stage2, output_size=512,
                    smoothing="balanced")


def main():
    batch = 4
    policy = get_policy("bf16")
    x = jax.random.normal(jax.random.key(0), (batch, 128, 128, 1),
                          jnp.bfloat16)
    base = build(True, False)
    params = jax.jit(base.init)(jax.random.key(1),
                                jnp.zeros((1, 128, 128, 1)))
    params = policy.cast_to_compute(params)
    mp_in = batch * 128 * 128 / 1e6

    # fused mode: the full deploy rewrite (infer/fused_hat.py) — fused
    # dense-block stage-1 trunk + fused HAB stage 2
    from superresolution_tpu.infer.fused_hat import fused_hybrid_model

    base_flash = build(False, True)
    fused_model = fused_hybrid_model(params, base_flash)

    def fused_apply(v):
        return fused_model.apply(None, v)

    modes = [("fused", None, None), ("flash", False, True),
             ("bf16_logits", False, False)]
    for name, attn_f32, flash in modes:
        if name == "fused":
            apply_fn = fused_apply
        else:
            model = build(attn_f32, flash)
            apply_fn = (lambda v, model=model:
                        model.apply(params, v))

        @jax.jit
        def step(x, apply_fn=apply_fn):
            return apply_fn(x.astype(jnp.bfloat16))

        @jax.jit
        def chained(x, iters=10, apply_fn=apply_fn):
            def body(_, v):
                y = apply_fn(v.astype(jnp.bfloat16))
                # chain: fold the 512^2 output back to a 128^2 input
                v2 = y[:, ::4, ::4, :].astype(v.dtype)
                return v2

            return jax.lax.fori_loop(0, iters, body, x)

        out = step(x)
        jax.block_until_ready(out)
        out = chained(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = chained(x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        record(f"hybrid_{name}", {"ms_per_batch": round(dt * 1e3, 1),
                                  "mp_s": round(mp_in / dt, 3)})


if __name__ == "__main__":
    main()
