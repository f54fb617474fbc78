"""Fused vs XLA TRAIN STEP A/B with trustworthy timing.

exp_r15 established that through the axon tunnel (a) block_until_ready
does not sync compute (0.35 ms/step "measurements") and (b) every
dispatched call pays ~2 s of tunnel overhead (the whole round-3
"fused step 3.4x slower" mystery was dispatch artifact). House rule
from here: time train steps as a lax.scan chain of K steps inside ONE
jit, device_get the per-step losses, and report the MARGINAL cost
between two scan lengths.

A/B at two geometries:
  - esrgan train:  b8, HR 192 (LR 48)  — esrgan_x4 preset patch size
  - reference prod: b4, HR 512 (LR 128) — the reference patch geometry
    (scripts/Dataset_step3_extractpatches.py:31-32, batch 3-4)

Usage (on the TPU chip):
  python benchmarks/exp_r15b_fused_train_ab.py [geom] [fused01]
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

GEOMS = {"esrgan48": (8, 192), "prod128": (4, 512),
         "mid64": (8, 256), "mid96": (4, 384)}


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def scan_steps(step, state, hr, n, seed):
    kvec = jax.random.split(jax.random.key(seed), n)

    @jax.jit
    def run(state, hr, kvec):
        def body(st, k):
            st, logs = step(st, {"hr": hr}, k)
            return st, logs["total"]
        return jax.lax.scan(body, state, kvec)

    st, tot = run(state, hr, kvec)          # compile + warmup
    _ = jax.device_get(tot)
    t0 = time.perf_counter()
    st, tot = run(state, hr, kvec)
    _ = jax.device_get(tot)
    return (time.perf_counter() - t0) * 1e3


def main():
    geom = sys.argv[1] if len(sys.argv) > 1 else "esrgan48"
    fused = len(sys.argv) > 2 and sys.argv[2] == "1"
    B, HR = GEOMS[geom]
    model = RRDBNet(scale=4, in_channels=3, out_channels=3, features=64,
                    num_blocks=23, growth=32, upsampler="pixelshuffle")
    tcfg = TrainConfig(lr=2e-4, precision="bf16")
    tx, _ = make_optimizer(tcfg, 10_000)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 16, 16, 3)))
    policy = get_policy("bf16")
    loss_fn = CombinedLoss(LossConfig(terms={"l1": 1.0}))
    input_fn = make_device_input(
        DataConfig(degradation="bicubic", augment=True), 4)
    apply_fn = make_fused_train_apply(model) if fused else None
    step = make_train_step(model, loss_fn, tx, policy, input_fn,
                           apply_fn=apply_fn)
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.random((B, HR, HR, 3), dtype=np.float32))
    state = create_train_state(params, tx)
    jax.block_until_ready([hr, state.params])
    tag = f"{'fused' if fused else 'xla'}_{geom}"

    w5 = scan_steps(step, state, hr, 5, 7)
    w10 = scan_steps(step, state, hr, 10, 8)
    record(f"{tag}_scan5_total_ms", round(w5, 1))
    record(f"{tag}_scan10_total_ms", round(w10, 1))
    record(f"{tag}_marginal_ms_per_step", round((w10 - w5) / 5, 2))
    mp = B * HR * HR / 1e6
    record(f"{tag}_input_mp_per_s",
           round(mp / ((w10 - w5) / 5 / 1e3) / 16, 3))


if __name__ == "__main__":
    main()
