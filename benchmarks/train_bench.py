"""Training-throughput harness: steps/sec and samples/sec for a preset.

Not the driver benchmark (that is bench.py at the repo root); this measures
the jitted train step in isolation — useful for tuning batch size, accum,
and mesh layout. Usage:

    python benchmarks/train_bench.py [preset] [batch]
"""

from __future__ import annotations

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
from superresolution_tpu.models.factory import build_from_config, total_scale  # noqa: E402
from superresolution_tpu.parallel.mesh import create_mesh, shard_batch  # noqa: E402
from superresolution_tpu.train.state import create_train_state, make_optimizer  # noqa: E402
from superresolution_tpu.train.steps import make_device_input, make_train_step  # noqa: E402
from superresolution_tpu.utils.config import get_preset  # noqa: E402
from superresolution_tpu.utils.precision import get_policy  # noqa: E402


def main() -> None:
    preset = sys.argv[1] if len(sys.argv) > 1 else "edsr_baseline_x4"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else None
    cfg = get_preset(preset)
    bs = batch or cfg.data.batch_size
    scale = total_scale(cfg.model)
    hr = cfg.data.hr_patch
    mesh = create_mesh(cfg.mesh)

    model = build_from_config(cfg.model, output_size=hr if cfg.model.refiner
                              else None)
    tx, _ = make_optimizer(cfg.train, 10_000)
    lr_patch = hr // scale
    params = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, lr_patch, lr_patch, cfg.model.in_channels)))
    state = create_train_state(params, tx)
    dcfg = cfg.data
    if dcfg.degradation == "none":
        dcfg = dcfg.__class__(**{**dcfg.__dict__, "degradation": "bicubic"})
    step = jax.jit(make_train_step(
        model, CombinedLoss(cfg.loss), tx, get_policy(cfg.train.precision),
        make_device_input(dcfg, scale), accum_steps=cfg.train.accum_steps),
        donate_argnums=0)

    batch_data = {"hr": np.random.default_rng(0).random(
        (bs, hr, hr, cfg.model.in_channels)).astype(np.float32)}
    batch_data = shard_batch(mesh, batch_data)

    state, logs = step(state, batch_data, jax.random.key(1))  # compile
    jax.block_until_ready(logs)
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        state, logs = step(state, batch_data, jax.random.key(2 + i))
    jax.block_until_ready(logs)
    dt = (time.perf_counter() - t0) / n
    print(f"{preset}: batch {bs}, {dt * 1e3:.1f} ms/step, "
          f"{bs / dt:.1f} samples/s, "
          f"{bs * hr * hr / scale**2 / dt / 1e6:.3f} input MP/s, "
          f"loss {float(logs['total']):.4f}")


if __name__ == "__main__":
    main()
