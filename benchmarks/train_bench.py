"""Training-throughput harness: ms/step, samples/sec, input MP/s and
peak HBM for any preset's REAL train step — the exact step the Trainer
builds (fused Pallas trunk wiring, GAN alternation, accumulation, bf16
policy included), not a re-derivation.

Timing methodology (exp_r15_timing_probe): through the axon dev tunnel,
`block_until_ready` does NOT sync real compute and every dispatched
call pays ~2 s of tunnel overhead, so per-call timing is untrustworthy
in BOTH directions. Steps are therefore timed as a lax.scan chain of K
steps inside ONE jit (device_get forces the sync), and the reported
ms/step is the MARGINAL cost between a K-step and a 2K-step chain —
dispatch/transfer overhead cancels. On a local (non-tunneled) runtime
the same harness is simply exact.

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

from superresolution_tpu.parallel.mesh import batch_sharding  # noqa: E402
from superresolution_tpu.train.trainer import Trainer  # noqa: E402
from superresolution_tpu.utils.config import get_preset  # noqa: E402


def peak_hbm_gb() -> float | None:
    """None when the backend exposes no memory stats (e.g. the tunneled
    dev chip) — 0.00 would read as a measurement."""
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    return None if peak is None else peak / 2**30


def _scan_wall_ms(tr, batch_dev, n: int, seed: int) -> tuple[float, float]:
    """Wall ms for a jitted chain of n Trainer steps; also returns the
    chain's final loss (a real number — proves the steps ran)."""
    kvec = jax.random.split(jax.random.key(seed), n)
    if tr.is_gan:
        step = tr._gan_step.__wrapped__

        @jax.jit
        def run(s, d, batch, kvec):
            def body(carry, k):
                s, d = carry
                s, d, logs = step(s, d, batch, k)
                return (s, d), logs["g_total"]

            return jax.lax.scan(body, (s, d), kvec)

        _, tot = run(tr.state, tr.d_state, batch_dev, kvec)  # compile
        jax.device_get(tot)
        t0 = time.perf_counter()
        _, tot = run(tr.state, tr.d_state, batch_dev, kvec)
        tot = jax.device_get(tot)
    else:
        step = tr._train_step.__wrapped__

        @jax.jit
        def run(s, batch, kvec):
            def body(s, k):
                s, logs = step(s, batch, k)
                return s, logs["total"]

            return jax.lax.scan(body, s, kvec)

        _, tot = run(tr.state, batch_dev, kvec)  # compile + warmup
        jax.device_get(tot)
        t0 = time.perf_counter()
        _, tot = run(tr.state, batch_dev, kvec)
        tot = jax.device_get(tot)
    return (time.perf_counter() - t0) * 1e3, float(tot[-1])


def bench_preset(preset: str, batch: int | None = None,
                 fused: str = "auto", steps: int = 5) -> dict:
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

        w1, loss = _scan_wall_ms(tr, batch_dev, steps, seed=7)
        w2, loss = _scan_wall_ms(tr, batch_dev, 2 * steps, seed=8)
        dt = max((w2 - w1) / steps, 1e-6) / 1e3
        return {
            "preset": preset, "batch": tr.batch_size, "fused": fused,
            "ms_per_step": dt * 1e3,
            "samples_per_s": tr.batch_size / dt,
            "input_mp_per_s": tr.batch_size * (hr // scale) ** 2 / dt / 1e6,
            "peak_hbm_gb": peak_hbm_gb(),
            "loss": loss,
        }


def main() -> None:
    preset = sys.argv[1] if len(sys.argv) > 1 else "edsr_baseline_x4"
    barg = sys.argv[2] if len(sys.argv) > 2 else ""
    batch = int(barg) if barg.isdigit() else None  # '-' = preset default
    fused = sys.argv[3] if len(sys.argv) > 3 else "auto"
    r = bench_preset(preset, batch, fused)
    hbm = ("n/a" if r["peak_hbm_gb"] is None
           else f"{r['peak_hbm_gb']:.2f} GB")
    print(f"{r['preset']}: batch {r['batch']} fused={r['fused']}, "
          f"{r['ms_per_step']:.1f} ms/step, "
          f"{r['samples_per_s']:.2f} samples/s, "
          f"{r['input_mp_per_s']:.3f} input MP/s, "
          f"peak HBM {hbm}, loss {r['loss']:.4f}")


if __name__ == "__main__":
    main()
