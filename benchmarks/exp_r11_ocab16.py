"""exp r11 — flash OCAB at window 16 (the 'H200' HAT variant).

exp_r3_hybrid_flash measured the flash cross-attention kernel a LOSS on
the ws=8 hybrid workload (350.7 vs 343.2 ms/batch): at m=144 the
kernel's N-padding + masked-K overhead exceeds its logits-traffic
savings. The recorded prediction: at ws=16 the OCA logits tensor is 4x
larger ([nb, nh, 256, 576] vs [nb, nh, 64, 144]) and the flash form
should win. This measures it on the reference Backup 'H200' stage-2
config (embed 120, 6 groups of depth 6, heads 6, window 16 — reference
Backup/src/architecture.py:48-68): HATLite x2 on the 256^2 stage-2
input, batch 4, bf16, flash_attn=True, OCAB einsum vs flash
(HATLite.flash_oca False/True).

Usage (on the TPU chip): python benchmarks/exp_r11_ocab16.py
       --e2e adds the full h200 hybrid (RRDB-23 x2 -> HAT-120 x2 ->
       smoothing, 128^2 -> 512^2, batch 4) through the fused deploy
       rewrite (infer/fused_hat.fused_hybrid_model).
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

from superresolution_tpu.models import HATLite  # noqa: E402
from superresolution_tpu.utils.precision import get_policy  # noqa: E402


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def build(flash_oca):
    return HATLite(scale=2, in_channels=1, out_channels=1, embed_dim=120,
                   depths=(6,) * 6, num_heads=(6,) * 6, window_size=16,
                   attn_f32=False, flash_attn=True, flash_oca=flash_oca)


def main():
    batch = 4
    policy = get_policy("bf16")
    x = jax.random.normal(jax.random.key(0), (batch, 256, 256, 1),
                          jnp.bfloat16)
    base = build(False)
    params = jax.jit(base.init)(jax.random.key(1),
                                jnp.zeros((1, 256, 256, 1)))
    params = policy.cast_to_compute(params)
    mp_in = batch * 256 * 256 / 1e6

    from superresolution_tpu.infer.fused_hat import make_fused_hat

    fused_fn = make_fused_hat(params, build(True))
    modes = [("oca_einsum", False), ("oca_flash", True), ("fused", None)]
    for name, flash_oca in modes:
        if name == "fused":
            apply_fn = lambda v: fused_fn(v)  # noqa: E731
        else:
            model = build(flash_oca)
            apply_fn = (lambda v, model=model:
                        model.apply(params, v))

        @jax.jit
        def chained(x, iters=8, apply_fn=apply_fn):
            def body(_, v):
                y = apply_fn(v.astype(jnp.bfloat16))
                return y[:, ::2, ::2, :].astype(v.dtype)  # chain x2 back

            return jax.lax.fori_loop(0, iters, body, x)

        try:
            jax.block_until_ready(chained(x))
            t0 = time.perf_counter()
            jax.block_until_ready(chained(x))
            dt = (time.perf_counter() - t0) / 8
            record(f"h200_stage2_{name}",
                   {"ms_per_batch": round(dt * 1e3, 1),
                    "mp_s": round(mp_in / dt, 4)})
        except Exception as e:  # noqa: BLE001
            record(f"h200_stage2_{name}", f"FAILED ...{str(e)[-200:]}")


def e2e():
    from superresolution_tpu.infer.fused_hat import fused_hybrid_model
    from superresolution_tpu.models import HybridSR, RRDBNet

    batch = 4
    policy = get_policy("bf16")
    stage1 = RRDBNet(scale=2, in_channels=1, out_channels=1, features=64,
                     num_blocks=23, growth=32)
    hybrid = HybridSR(stage1=stage1, stage2=build(True), output_size=512,
                      smoothing="balanced")
    params = jax.jit(hybrid.init)(jax.random.key(1),
                                  jnp.zeros((1, 128, 128, 1)))
    params = policy.cast_to_compute(params)
    fused = fused_hybrid_model(params, hybrid)
    x = jax.random.normal(jax.random.key(0), (batch, 128, 128, 1),
                          jnp.bfloat16)
    mp_in = batch * 128 * 128 / 1e6

    @jax.jit
    def chained(x, iters=8):
        def body(_, v):
            y = fused.apply(None, v.astype(jnp.bfloat16))
            return y[:, ::4, ::4, :].astype(v.dtype)

        return jax.lax.fori_loop(0, iters, body, x)

    jax.block_until_ready(chained(x))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(x))
    dt = (time.perf_counter() - t0) / 8
    record("h200_hybrid_fused_e2e", {"ms_per_batch": round(dt * 1e3, 1),
                                     "mp_s": round(mp_in / dt, 4)})


if __name__ == "__main__":
    if "--e2e" in sys.argv:
        e2e()
    else:
        main()
