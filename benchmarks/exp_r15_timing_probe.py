"""Timing-methodology probe for TRAIN STEPS through the axon tunnel.

exp_r14d measured an impossible 0.76 ms/step for the XLA RRDBNet train
step (b8, LR 48^2: >=1.8 TFLOP fwd+bwd -> >=9 ms at chip peak), so
cross-call chaining + block_until_ready does NOT sync real compute on
this backend. This probe times the SAME step three ways:

  a) chained calls + block_until_ready(logs)     (exp_r14d's way)
  b) chained calls + jax.device_get(logs) each N (forced host pull)
  c) lax.scan of K steps inside ONE jit + device_get (house rule)

Usage (on the TPU chip): python benchmarks/exp_r15_timing_probe.py
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


def main():
    model = RRDBNet(scale=4, in_channels=3, out_channels=3, features=64,
                    num_blocks=23, growth=32, upsampler="pixelshuffle")
    tcfg = TrainConfig(lr=2e-4, precision="bf16")
    tx, _ = make_optimizer(tcfg, 10_000)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 16, 16, 3)))
    policy = get_policy("bf16")
    loss_fn = CombinedLoss(LossConfig(terms={"l1": 1.0}))
    input_fn = make_device_input(
        DataConfig(degradation="bicubic", augment=False), 4)
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.random((B, HR, HR, 3), dtype=np.float32))
    keys = [jax.random.key(2 + i) for i in range(32)]
    jax.block_until_ready([hr, keys])

    step = jax.jit(make_train_step(model, loss_fn, tx, policy, input_fn))
    state = create_train_state(params, tx)

    # a) exp_r14d's methodology
    state_a, logs = step(state, {"hr": hr}, keys[0])
    jax.block_until_ready(logs)
    t0 = time.perf_counter()
    s = state_a
    for i in range(10):
        s, logs = step(s, {"hr": hr}, keys[1 + i])
    jax.block_until_ready(logs)
    record("a_chain_block_ms", round((time.perf_counter() - t0) / 10 * 1e3, 2))

    # b) forced host pull per batch of 10
    t0 = time.perf_counter()
    s = state_a
    for i in range(10):
        s, logs = step(s, {"hr": hr}, keys[1 + i])
    _ = jax.device_get(logs)
    record("b_chain_get_ms", round((time.perf_counter() - t0) / 10 * 1e3, 2))

    # c) scan of K steps in one jit
    kvec = jax.random.split(jax.random.key(99), 10)

    @jax.jit
    def ten_steps(state, hr, kvec):
        def body(st, k):
            st, logs = step.__wrapped__(st, {"hr": hr}, k)
            return st, logs["total"]
        return jax.lax.scan(body, state, kvec)

    st, tot = ten_steps(state_a, hr, kvec)
    _ = jax.device_get(tot)
    t0 = time.perf_counter()
    st, tot = ten_steps(state_a, hr, kvec)
    _ = jax.device_get(tot)
    record("c_scan10_get_ms", round((time.perf_counter() - t0) / 10 * 1e3, 2))

    # marginal: 1 more scan length to subtract dispatch overhead
    @jax.jit
    def twenty_steps(state, hr, kvec):
        def body(st, k):
            st, logs = step.__wrapped__(st, {"hr": hr}, k)
            return st, logs["total"]
        return jax.lax.scan(body, state, kvec)

    kvec20 = jax.random.split(jax.random.key(98), 20)
    st, tot = twenty_steps(state_a, hr, kvec20)
    _ = jax.device_get(tot)
    t0 = time.perf_counter()
    st, tot = twenty_steps(state_a, hr, kvec20)
    _ = jax.device_get(tot)
    record("d_scan20_get_ms", round((time.perf_counter() - t0) / 20 * 1e3, 2))


if __name__ == "__main__":
    main()
