"""Row-packed fused train step below LR 96^2 — the VERDICT r3 item-4
A/B. exp_r15b measured the fused train path 1.64x SLOWER than XLA at
LR 48^2 (too few rows per image to amortize the recompute halo + kernel
machinery); the row-pack lever (train/fused_apply.pack_batch_rows)
stacks the batch along H with one seg-masked zero spacer row per image,
so b16 x 32 rows ride ONE 528-row block grid instead of 16 blocks of
32+10 halo rows.

Timing: house-rule marginal scan chain (BENCHMARKS.md round 3) — the
marginal ms/step between a 5-step and a 10-step lax.scan of REAL train
steps (Trainer-built: bf16 policy, AdamW, combined loss) inside one
jit, device_get'ed.

Modes per geometry: xla (plain), fused (per-image fused kernels, the
r15b loser at small patches), packed (fused + row_pack).

Geometries (training presets, utils/config.py):
  esrgan32: b16, HR 128 (LR 32)  — esrgan_gan
  edsr48:   b16, HR 192 (LR 48)  — edsr_baseline_x4
  esrgan48: b8,  HR 192 (LR 48)  — exp_r15b comparison point

Usage (on the TPU chip):
  python benchmarks/exp_r24_packed_train.py [geom] [xla|fused|packed]
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

GEOMS = {"esrgan32": (16, 128), "edsr48": (16, 192), "esrgan48": (8, 192)}


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
    geom = sys.argv[1] if len(sys.argv) > 1 else "esrgan32"
    mode = sys.argv[2] if len(sys.argv) > 2 else "packed"
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
    apply_fn = None
    if mode in ("fused", "packed"):
        apply_fn = make_fused_train_apply(model,
                                          row_pack=(mode == "packed"))
    step = make_train_step(model, loss_fn, tx, policy, input_fn,
                           apply_fn=apply_fn)
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.random((B, HR, HR, 3), dtype=np.float32))
    state = create_train_state(params, tx)
    jax.block_until_ready([hr, state.params])
    tag = f"{mode}_{geom}"

    w5 = scan_steps(step, state, hr, 5, 7)
    w10 = scan_steps(step, state, hr, 10, 8)
    record(f"{tag}_scan5_total_ms", round(w5, 1))
    record(f"{tag}_scan10_total_ms", round(w10, 1))
    record(f"{tag}_marginal_ms_per_step", round((w10 - w5) / 5, 2))
    record(f"{tag}_samples_per_s",
           round(B / ((w10 - w5) / 5 / 1e3), 2))


if __name__ == "__main__":
    main()
