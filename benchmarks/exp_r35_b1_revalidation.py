"""Re-validate the deploy-path A/B decisions at the b1 geometry.

Every fused-vs-XLA decision on the hybrid deploy path (fused CAB
exp_r19, flash OCAB exp_r21, stacked-head attention exp_r26) was made
at the OLD batch-4 bench geometry. Round 5 flipped the deploy default
to batch 1 (exp_r33), where the relative cost of kernels vs XLA glue
is different (exp_r34: glue is zero at b1). This harness re-runs each
decision as a one-flag A/B on the full fused deploy path at b1, plus
the un-fused flax model path as the overall control:

  default       round-5 deploy defaults (fused, stacked, gather-OCA)
  no_gather     SRTPU_GATHER_OCA=0  (windowed-gather flash OCA)
  einsum_oca    SRTPU_EINSUM_OCA=1  (XLA einsum OCA reference path)
  xla_cab       SRTPU_XLA_CAB=1     (XLA CAB instead of fused kernel)
  perhead_attn  SRTPU_STACKED_ATTN=0 (per-head attention loop)
  plain_model   flax model.apply, no fused deploy transforms at all

House-rule marginal chains (3 vs 6 reps inside one jit, scalar fold).
A default-beating arm here would mean a b4-era decision inverted at b1.

Usage (on the TPU chip): python benchmarks/exp_r35_b1_revalidation.py
  [arm ...]   (default: all arms)
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


def build(plain=False):
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
    if plain:
        return lambda v: model.apply(params, v)
    wrapped = fused_hybrid_model(params, model)
    return lambda v: wrapped.apply(None, v)


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


# env deltas vs the round-5 deploy defaults
ARMS = {
    "default": {},
    "no_gather": {"SRTPU_GATHER_OCA": "0"},
    "einsum_oca": {"SRTPU_EINSUM_OCA": "1"},
    "xla_cab": {"SRTPU_XLA_CAB": "1"},
    "perhead_attn": {"SRTPU_STACKED_ATTN": "0"},
    "plain_model": {},
}

TOGGLES = ("SRTPU_GATHER_OCA", "SRTPU_EINSUM_OCA", "SRTPU_XLA_CAB",
           "SRTPU_STACKED_ATTN")


def main():
    names = sys.argv[1:] or list(ARMS)
    batch = int(os.environ.get("SRTPU_HYBRID_BATCH", "1"))
    x = jax.random.normal(jax.random.key(1), (batch, 128, 128, 1),
                          jnp.bfloat16)
    for name in names:
        for k in TOGGLES:
            os.environ.pop(k, None)
        os.environ.update(ARMS[name])
        fn = build(plain=(name == "plain_model"))
        t3, t6 = chain_ms(fn, x, 3), chain_ms(fn, x, 6)
        ms = (t6 - t3) / 3
        record(f"{name}_ms_per_batch", round(ms, 1))
        record(f"{name}_mps",
               round(batch * 128 * 128 / 1e6 / (ms / 1e3), 4))


if __name__ == "__main__":
    main()
