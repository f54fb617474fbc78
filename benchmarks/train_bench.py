"""Training-throughput harness: ms/step, samples/sec, input MP/s and
peak HBM for any preset's REAL train step — the exact step the Trainer
builds (fused Pallas trunk wiring, GAN alternation, accumulation, bf16
policy included), not a re-derivation.

Not the driver benchmark (that is bench.py at the repo root). Usage:

    python benchmarks/train_bench.py [preset] [batch] [fused]

fused: 'auto' (default: TrainConfig.fused_trunk=None semantics),
'1' (force fused kernels), '0' (plain XLA) — the before/after lever for
the VERDICT r2 item-1 comparison table in BENCHMARKS.md.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from superresolution_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

from superresolution_tpu.models.factory import total_scale  # noqa: E402
from superresolution_tpu.parallel.mesh import batch_sharding  # noqa: E402
from superresolution_tpu.train.trainer import Trainer  # noqa: E402
from superresolution_tpu.utils.config import get_preset  # noqa: E402


def peak_hbm_gb() -> float:
    stats = jax.local_devices()[0].memory_stats() or {}
    return stats.get("peak_bytes_in_use", 0) / 2**30


def bench_preset(preset: str, batch: int | None = None,
                 fused: str = "auto", steps: int = 10) -> dict:
    cfg = get_preset(preset)
    bs = batch or cfg.data.batch_size
    data = dataclasses.replace(cfg.data, batch_size=bs, num_workers=0,
                               synthetic_len=max(2 * bs, 8),
                               train_manifest=None, val_manifest=None)
    train = dataclasses.replace(
        cfg.train, resume=False,
        fused_trunk={"auto": None, "1": True, "0": False}[fused])
    cfg = cfg.replace(data=data, train=train)
    with tempfile.TemporaryDirectory() as wd:
        tr = Trainer(cfg, workdir=wd)
        scale, hr = tr.scale, cfg.data.hr_patch
        batch_np = {"hr": np.random.default_rng(0).random(
            (tr.batch_size, hr, hr, cfg.model.in_channels)
        ).astype(np.float32)}
        if cfg.data.degradation == "none":
            lr_hw = hr // scale
            batch_np["lr"] = np.random.default_rng(1).random(
                (tr.batch_size, lr_hw, lr_hw, cfg.model.in_channels)
            ).astype(np.float32)
        sharding = batch_sharding(tr.mesh)
        batch_dev = jax.tree.map(
            lambda a: jax.device_put(a, sharding), batch_np)

        def run(i):
            key = jax.random.key(2 + i)
            if tr.is_gan:
                s, d, logs = tr._gan_step(tr.state, tr.d_state,
                                          batch_dev, key)
                tr.state, tr.d_state = s, d
            else:
                tr.state, logs = tr._train_step(tr.state, batch_dev, key)
            return logs

        logs = run(0)  # compile + warmup
        jax.block_until_ready(logs)
        t0 = time.perf_counter()
        for i in range(steps):
            logs = run(1 + i)
        jax.block_until_ready(logs)
        dt = (time.perf_counter() - t0) / steps
        loss_key = "g_total" if tr.is_gan else "total"
        return {
            "preset": preset, "batch": tr.batch_size, "fused": fused,
            "ms_per_step": dt * 1e3,
            "samples_per_s": tr.batch_size / dt,
            "input_mp_per_s": tr.batch_size * (hr // scale) ** 2 / dt / 1e6,
            "peak_hbm_gb": peak_hbm_gb(),
            "loss": float(logs[loss_key]),
        }


def main() -> None:
    preset = sys.argv[1] if len(sys.argv) > 1 else "edsr_baseline_x4"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else None
    fused = sys.argv[3] if len(sys.argv) > 3 else "auto"
    r = bench_preset(preset, batch, fused)
    print(f"{r['preset']}: batch {r['batch']} fused={r['fused']}, "
          f"{r['ms_per_step']:.1f} ms/step, "
          f"{r['samples_per_s']:.2f} samples/s, "
          f"{r['input_mp_per_s']:.3f} input MP/s, "
          f"peak HBM {r['peak_hbm_gb']:.2f} GB, loss {r['loss']:.4f}")


if __name__ == "__main__":
    main()
