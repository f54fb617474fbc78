"""SUPERSEDED (r15): timings in this file used per-call chaining +
block_until_ready, which exp_r15_timing_probe proved does not sync
real compute through the axon tunnel. Kept for the record; trust only
benchmarks/exp_r15b_fused_train_ab.py / train_bench.py numbers.

Bisect the fused-train-step blowup: a bare grad+adamw step with the
fused apply costs 72 ms (exp_r14c) but the Trainer's jitted step via
train_bench costs ~4.3 s at the same geometry (XLA path: 44 -> 730 ms).
Time make_train_step variants to find the multiplier:

  v0: exp14c-style bare step (control)
  v1: make_train_step, real LR given (no degradation), augment off
  v2: + on-device bicubic degradation
  v3: + augment
  v4: v3 + donate_argnums=0 (the Trainer's exact jit)

Usage (on the TPU chip): python benchmarks/exp_r14d_step_bisect.py [fused]
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

from superresolution_tpu.losses.combined import CombinedLoss  # noqa: E402
from superresolution_tpu.models import RRDBNet  # noqa: E402
from superresolution_tpu.train.fused_apply import (  # noqa: E402
    make_fused_train_apply)
from superresolution_tpu.train.state import (  # noqa: E402
    create_train_state, make_optimizer)
from superresolution_tpu.train.steps import (  # noqa: E402
    make_device_input, make_train_step)
from superresolution_tpu.utils.config import (  # noqa: E402
    DataConfig, LossConfig, TrainConfig)
from superresolution_tpu.utils.precision import get_policy  # noqa: E402

B, HR = 8, 192


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def time_step(step, state, batch, keys, iters=10):
    state, logs = step(state, batch, keys[0])
    jax.block_until_ready(logs)
    t0 = time.perf_counter()
    for i in range(iters):
        state, logs = step(state, batch, keys[1 + i])
    jax.block_until_ready(logs)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    fused = len(sys.argv) > 1 and sys.argv[1] == "1"
    model = RRDBNet(scale=4, in_channels=3, out_channels=3, features=64,
                    num_blocks=23, growth=32, upsampler="pixelshuffle")
    tcfg = TrainConfig(lr=2e-4, precision="bf16")
    tx, _ = make_optimizer(tcfg, 10_000)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 16, 16, 3)))
    policy = get_policy("bf16")
    loss_fn = CombinedLoss(LossConfig(terms={"l1": 1.0}))
    apply_fn = make_fused_train_apply(model) if fused else None
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.random((B, HR, HR, 3), dtype=np.float32))
    lr = jnp.asarray(rng.random((B, HR // 4, HR // 4, 3),
                                dtype=np.float32))
    keys = [jax.random.key(2 + i) for i in range(16)]
    jax.block_until_ready([hr, lr, keys])
    tag = "fused" if fused else "xla"

    variants = {
        "v1_real_lr_noaug": (
            {"hr": hr, "lr": lr},
            make_device_input(DataConfig(degradation="none",
                                         augment=False), 4)),
        "v2_degrade": (
            {"hr": hr},
            make_device_input(DataConfig(degradation="bicubic",
                                         augment=False), 4)),
        "v3_degrade_aug": (
            {"hr": hr},
            make_device_input(DataConfig(degradation="bicubic",
                                         augment=True), 4)),
    }
    for name, (batch, input_fn) in variants.items():
        step = jax.jit(make_train_step(model, loss_fn, tx, policy,
                                       input_fn, apply_fn=apply_fn))
        state = create_train_state(params, tx)
        record(f"{tag}_{name}_ms",
               round(time_step(step, state, batch, keys), 2))

    # v4: the Trainer's exact jit (donated state)
    batch, input_fn = variants["v3_degrade_aug"]
    step = jax.jit(make_train_step(model, loss_fn, tx, policy, input_fn,
                                   apply_fn=apply_fn), donate_argnums=0)
    state = create_train_state(params, tx)
    state, logs = step(state, batch, keys[0])
    jax.block_until_ready(logs)
    t0 = time.perf_counter()
    for i in range(10):
        state, logs = step(state, batch, keys[1 + i])
    jax.block_until_ready(logs)
    record(f"{tag}_v4_donated_ms",
           round((time.perf_counter() - t0) / 10 * 1e3, 2))


if __name__ == "__main__":
    main()
