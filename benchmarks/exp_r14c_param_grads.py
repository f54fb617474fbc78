"""SUPERSEDED (r15): timings in this file used per-call chaining +
block_until_ready, which exp_r15_timing_probe proved does not sync
real compute through the axon tunnel. Kept for the record; trust only
benchmarks/exp_r15b_fused_train_ab.py / train_bench.py numbers.

Param-grad split: exp_r14b showed the fused trunk fwd+bwd (input
grads) costs 69.7 vs XLA 31.6 ms at the esrgan train geometry — only
+38 ms of the +2379 ms full-step gap. This times jax.grad w.r.t.
PARAMS (the train step's actual backward), first bare, then with the
AdamW update, to find where the remaining ~2.3 s/step hides.

Usage (on the TPU chip): python benchmarks/exp_r14c_param_grads.py
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

from superresolution_tpu.models import RRDBNet  # noqa: E402
from superresolution_tpu.train.fused_apply import (  # noqa: E402
    make_fused_train_apply)

B, H, W = 8, 48, 48


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def time_steps(fn, *args, iters=10):
    out = fn(*args)  # compile + warmup
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    model = RRDBNet(scale=4, in_channels=3, out_channels=3, features=64,
                    num_blocks=23, growth=32, upsampler="pixelshuffle")
    x = jax.random.normal(jax.random.key(1), (B, H, W, 3), jnp.float32)
    tgt = jax.random.uniform(jax.random.key(2), (B, H * 4, W * 4, 3),
                             jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 16, 16, 3)))
    fused = make_fused_train_apply(model, interpret=False)

    def mk_loss(apply):
        def loss(p, v):
            pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
            pred = apply(pb, v.astype(jnp.bfloat16))
            return jnp.mean(jnp.abs(pred.astype(jnp.float32) - tgt))

        return loss

    g_xla = jax.jit(jax.grad(mk_loss(
        lambda p, v: model.apply(p, v))))
    g_fused = jax.jit(jax.grad(mk_loss(fused)))

    record("xla_param_grads_ms", round(time_steps(g_xla, params, x) * 1e3, 2))
    record("fused_param_grads_ms",
           round(time_steps(g_fused, params, x) * 1e3, 2))

    import optax

    tx = optax.adamw(1e-4)
    opt_state = jax.jit(tx.init)(params)

    def mk_step(loss):
        def step(p, s, v):
            g = jax.grad(loss)(p, v)
            u, s2 = tx.update(g, s, p)
            return jax.tree.map(lambda a, b: a + b, p, u), s2

        return jax.jit(step)

    s_xla = mk_step(mk_loss(lambda p, v: model.apply(p, v)))
    s_fused = mk_step(mk_loss(fused))

    def run_xla(p, s, v):
        return s_xla(p, s, v)

    record("xla_step_ms",
           round(time_steps(s_xla, params, opt_state, x) * 1e3, 2))
    record("fused_step_ms",
           round(time_steps(s_fused, params, opt_state, x) * 1e3, 2))


if __name__ == "__main__":
    main()
