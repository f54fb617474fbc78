"""Trainer — the end-to-end training workload (the re-design of reference
scripts/Modello_supporto.py:41-196).

Wires config -> model/data/loss/optimizer/mesh -> jitted steps, and runs
the epoch loop with: validation every `eval_every` epochs (fp32 metrics),
best-PSNR/last checkpointing WITH resume, preview strips every
`preview_every` epochs, TB/JSONL logging, and optional GAN mode.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from superresolution_tpu.data.dataset import PairedDataset, SyntheticHRDataset
from superresolution_tpu.data.io import save_png
from superresolution_tpu.data.loader import Loader, prefetch_to_device
from superresolution_tpu.losses.combined import CombinedLoss
from superresolution_tpu.metrics.psnr_ssim import Metrics
from superresolution_tpu.models.discriminator import VGGStyleDiscriminator
from superresolution_tpu.models.factory import build_from_config, total_scale
from superresolution_tpu.ops.resize import resize_nearest
from superresolution_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
)
from superresolution_tpu.train.checkpoint import CheckpointManager
from superresolution_tpu.train.gan import make_gan_steps
from superresolution_tpu.train.logging import MetricsLogger
from superresolution_tpu.train.state import (
    create_train_state,
    make_optimizer,
)
from superresolution_tpu.train.steps import (
    make_device_input,
    make_eval_step,
    make_train_step,
)
from superresolution_tpu.utils.config import Config
from superresolution_tpu.utils.precision import get_policy


# Smallest LR-patch size at which fused_trunk=None (auto) turns the
# fused Pallas train path on; measured crossover in
# benchmarks/exp_r15b_fused_train_ab.py (BENCHMARKS.md round-3 training)
FUSED_TRUNK_AUTO_MIN_PATCH = 96


class Trainer:
    def __init__(self, config: Config, workdir: str | None = None,
                 mesh=None):
        self.cfg = config
        self.workdir = workdir or os.path.join("outputs", config.name)
        os.makedirs(self.workdir, exist_ok=True)
        self.policy = get_policy(config.train.precision)
        if config.train.debug_nans:
            jax.config.update("jax_debug_nans", True)
        self.mesh = mesh if mesh is not None else create_mesh(config.mesh)
        self.scale = total_scale(config.model)
        self.is_gan = "gan" in config.loss.terms

        # --- data ---
        dc = config.data
        self.train_ds, self.val_ds = self._build_datasets()
        bs = dc.batch_size
        ndata = self.mesh.shape["data"]
        bs = max(ndata, (bs // ndata) * ndata)
        if len(self.train_ds) < bs:  # smart shrink (reference :80-85)
            bs = max(ndata, (len(self.train_ds) // ndata) * ndata)
        self.batch_size = bs
        if bs < ndata or len(self.train_ds) < ndata:
            raise ValueError(
                f"dataset ({len(self.train_ds)}) / batch ({dc.batch_size}) too"
                f" small for the {ndata}-way data mesh; shrink mesh.data")
        self.train_loader = Loader(self.train_ds, bs, shuffle=True,
                                   seed=config.train.seed,
                                   num_workers=dc.num_workers)
        # drop_last=False + pad_to_batch: every val image enters PSNR/SSIM;
        # padded rows are masked out via `_valid` inside the eval step
        val_bs = max(ndata, (min(bs, len(self.val_ds)) // ndata) * ndata)
        self.val_loader = Loader(self.val_ds, val_bs,
                                 shuffle=False, num_workers=dc.num_workers,
                                 drop_last=False, pad_to_batch=True)

        # --- model/loss/opt ---
        output_size = dc.hr_patch if config.model.refiner else None
        self.model = build_from_config(config.model, output_size=output_size)
        self.loss_fn = CombinedLoss(config.loss)
        steps_per_epoch = max(1, len(self.train_loader))
        if config.train.steps_per_epoch is not None:
            # explicit cap: epochs become fixed-length step budgets (the
            # loop breaks after this many batches) and the cosine
            # schedule's total_steps follows suit
            steps_per_epoch = min(steps_per_epoch,
                                  max(1, config.train.steps_per_epoch))
        total_steps = config.train.epochs * steps_per_epoch
        self.tx, self.schedule = make_optimizer(config.train, total_steps)

        lr_patch = dc.hr_patch // self.scale
        init_x = jnp.zeros((1, lr_patch, lr_patch, config.model.in_channels),
                           jnp.float32)
        params = self.model.init(jax.random.key(config.train.seed), init_x)
        self.state = create_train_state(
            params, self.tx, ema=config.train.ema_decay is not None)

        self.input_fn = make_device_input(dc, self.scale)
        self.eval_input_fn = make_device_input(dc, self.scale, augment=False)

        # pipeline-parallel trunk forward (mesh.pipe > 1): same math,
        # body blocks sharded over the 'pipe' axis (parallel/pipeline.py)
        pp_apply = None
        npipe = dict(self.mesh.shape).get("pipe", 1)
        if npipe > 1:
            from superresolution_tpu.models.rrdbnet import RRDBNet
            from superresolution_tpu.parallel.pipeline import (
                make_pipeline_forward)

            if self.is_gan:
                raise ValueError(
                    "mesh.pipe > 1 does not support GAN training")
            if not isinstance(self.model, RRDBNet) or \
                    not self.model.scan_blocks:
                raise ValueError(
                    "mesh.pipe > 1 requires an RRDBNet arch with"
                    " scan_blocks (the pipelined trunk body)")
            n_micro = config.mesh.pipe_microbatches or npipe
            # clamp like make_train_step does, so accum_steps > batch
            # fails here with the real divisibility message instead of a
            # confusing 'batch 1' trace-time error
            accum = max(1, min(config.train.accum_steps, self.batch_size))
            per_call = self.batch_size // accum
            if per_call % n_micro:
                raise ValueError(
                    f"per-step batch {per_call} not divisible by"
                    f" pipe_microbatches {n_micro}")
            pp_apply = make_pipeline_forward(self.mesh, self.model,
                                             n_micro)

        # fused Pallas dense-block kernels for the train step (fwd+bwd,
        # train/fused_apply.py) — the RRDB-family trunk at the fused
        # envelope instead of the per-conv HBM round-trip XLA envelope
        fused_apply = None
        if npipe == 1 and config.train.fused_trunk is not False:
            from superresolution_tpu.train.fused_apply import (
                make_fused_train_apply,
                make_fused_train_apply_dp,
                supports_fused_train,
            )

            # geometry gate (benchmarks/exp_r15b_fused_train_ab.py +
            # exp_r24_packed_train.py, on chip): the fused train path
            # wins 1.36x at LR 128^2 (the reference production patch)
            # per image; below FUSED_TRUNK_AUTO_MIN_PATCH the per-image
            # form LOSES (1.64x at 48^2 — too few rows to amortize the
            # recompute halo), so auto switches to ROW-PACKED fused
            # (batch stacked along H with seg-masked spacer rows,
            # train/fused_apply.pack_batch_rows) when the per-step
            # batch is big enough to make one tall grid.
            accum = max(1, min(config.train.accum_steps,
                               self.batch_size))
            micro = self.batch_size // accum  # images per apply call
            on_tpu = jax.default_backend() == "tpu"
            big_patch = lr_patch >= FUSED_TRUNK_AUTO_MIN_PATCH
            row_pack = not big_patch and micro > 1
            auto = (config.train.fused_trunk is None and on_tpu
                    and big_patch)
            if config.train.fused_trunk is None and row_pack and on_tpu:
                # packed auto-crossover pending exp_r24 measurement:
                # opt-in below the measured-win floor until then
                auto = bool(os.environ.get("SRTPU_PACKED_TRAIN"))
            if ((config.train.fused_trunk or auto)
                    and supports_fused_train(self.model)):
                if self.mesh.devices.size > 1:
                    # pallas_call has no GSPMD partitioning rule: on a
                    # multi-device mesh the fused forward runs under
                    # shard_map (batch on 'data', params replicated —
                    # their cotangents psum in shard_map's transpose)
                    fused_apply = make_fused_train_apply_dp(
                        self.model, self.mesh, row_pack=row_pack)
                else:
                    fused_apply = make_fused_train_apply(
                        self.model, row_pack=row_pack)

        if self.is_gan:
            self.disc = VGGStyleDiscriminator(
                in_channels=config.model.out_channels,
                input_size=dc.hr_patch)
            d_params = self.disc.init(
                jax.random.key(config.train.seed + 1),
                jnp.zeros((1, dc.hr_patch, dc.hr_patch,
                           config.model.out_channels), jnp.float32))
            self.d_tx, _ = make_optimizer(
                config.train, total_steps,
                lr=config.train.disc_lr or config.train.lr)
            self.d_state = create_train_state(d_params, self.d_tx)
            self._gan_step = jax.jit(make_gan_steps(
                self.model, self.disc, self.loss_fn, self.tx, self.d_tx,
                self.policy, self.input_fn,
                gan_weight=config.loss.terms.get("gan", 0.005),
                ema_decay=config.train.ema_decay,
                gan_start_step=config.train.gan_start_step,
                accum_steps=config.train.accum_steps,
                gen_apply_fn=fused_apply))
        else:
            self._train_step = jax.jit(make_train_step(
                self.model, self.loss_fn, self.tx, self.policy,
                self.input_fn, accum_steps=config.train.accum_steps,
                ema_decay=config.train.ema_decay,
                apply_fn=pp_apply or fused_apply),
                donate_argnums=0)
        self._eval_step = jax.jit(make_eval_step(
            self.model, self.policy, self.eval_input_fn,
            use_ema=config.train.ema_decay is not None))

        # --- ckpt/logging ---
        import dataclasses as _dc

        model_cfg = dict(_dc.asdict(config.model), output_size=output_size)
        self.ckpt = CheckpointManager(
            os.path.join(self.workdir, "checkpoints"),
            keep=config.train.keep_checkpoints,
            model_config=model_cfg)
        self.logger = MetricsLogger(os.path.join(self.workdir, "logs"))
        # GAN: the discriminator state (params + opt moments) must resume
        # too, or a trained G gets paired with a fresh random D
        self.d_ckpt = (CheckpointManager(
            os.path.join(self.workdir, "checkpoints_disc"),
            keep=config.train.keep_checkpoints) if self.is_gan else None)
        self.start_epoch = 0
        if config.train.resume:
            restored = self.ckpt.restore(self.state)
            if restored is not None:
                self.state = restored
                steps_done = int(self.state.step)
                self.start_epoch = steps_done // steps_per_epoch
                if self.d_ckpt is not None:
                    d_restored = self.d_ckpt.restore(self.d_state)
                    if d_restored is not None:
                        self.d_state = d_restored
                    else:
                        import logging

                        logging.getLogger(__name__).warning(
                            "resuming GAN generator without a saved"
                            " discriminator state (fresh D)")
        self.steps_per_epoch = steps_per_epoch
        self._base_key = jax.random.key(config.train.seed + 7)

    @property
    def test_ds(self):
        """Test split for run_test: the test manifest when configured
        (reference contract: Modello_5 evaluates test.json), else val."""
        dc = self.cfg.data
        if dc.test_manifest:
            lr_size = (dc.hr_patch // self.scale
                       if dc.degradation == "none" else None)
            return PairedDataset(dc.test_manifest, dc.base_path,
                                 lr_size=lr_size)
        return self.val_ds

    def _build_datasets(self):
        dc = self.cfg.data
        c = self.cfg.model.in_channels
        if dc.train_manifest:
            lr_size = dc.hr_patch // self.scale if dc.degradation == "none" else None
            if dc.degradation != "none":
                import logging

                logging.getLogger(__name__).info(
                    "manifest provides real LR pairs; the configured"
                    " degradation %r is unused (real LR always wins —"
                    " train/steps.py::make_device_input)", dc.degradation)
            train = PairedDataset(dc.train_manifest, dc.base_path,
                                  lr_size=lr_size)
            val = PairedDataset(dc.val_manifest or dc.train_manifest,
                                dc.base_path, lr_size=lr_size)
            return train, val
        n = dc.synthetic_len or 64
        # degradation='none' means "real LR" — with no manifest, emit a
        # co-registered synthetic-telescope LR so the preset still runs
        # (the reference's real-LR regime; data/dataset.py).
        lr_scale = self.scale if dc.degradation == "none" else None
        train = SyntheticHRDataset(n, dc.hr_patch, c, seed=1,
                                   lr_scale=lr_scale)
        val = SyntheticHRDataset(max(4, n // 8), dc.hr_patch, c, seed=2,
                                 lr_scale=lr_scale)
        return train, val

    # ------------------------------------------------------------------
    def fit(self, epochs: int | None = None) -> dict:
        cfg = self.cfg.train
        epochs = epochs if epochs is not None else cfg.epochs
        best = {"psnr": float("-inf"), "ssim": 0.0}
        t_start = time.time()
        # host-side step counter: reading int(self.state.step) every
        # iteration would force a device sync per step — through a
        # high-latency link that serializes the whole pipeline (measured:
        # the same jitted step runs 4.9 ms pipelined vs ~600 ms when
        # synced each iteration on the dev tunnel)
        step = int(self.state.step)
        for epoch in range(self.start_epoch, epochs):
            self.train_loader.set_epoch(epoch)
            epoch_logs = None
            nb = 0
            t_epoch = time.time()
            # double-buffered host->HBM prefetch: the next batch transfers
            # (sharded over the data axis) while the current step runs
            batches = prefetch_to_device(self.train_loader,
                                         size=self.cfg.data.prefetch,
                                         sharding=batch_sharding(self.mesh))
            for batch in batches:
                key = jax.random.fold_in(self._base_key, step)
                if self.is_gan:
                    self.state, self.d_state, logs = self._gan_step(
                        self.state, self.d_state, batch, key)
                else:
                    self.state, logs = self._train_step(self.state, batch, key)
                step += 1
                nb += 1
                if nb >= self.steps_per_epoch:
                    break  # explicit TrainConfig.steps_per_epoch cap
                if epoch_logs is None:
                    epoch_logs = logs
                else:
                    epoch_logs = jax.tree.map(jnp.add, epoch_logs, logs)
            if epoch_logs is not None:
                mean_logs = {k: float(v) / nb for k, v in epoch_logs.items()}
                # the float() above synced the device, so the epoch wall
                # time is an honest throughput denominator
                wall = max(time.time() - t_epoch, 1e-9)
                mean_logs["lr"] = float(self.schedule(step))
                mean_logs["samples_per_sec"] = nb * self.batch_size / wall
                self.logger.scalars(step, mean_logs, prefix="train/")
            if (epoch + 1) % cfg.eval_every == 0 or epoch == epochs - 1:
                val = self.evaluate()
                self.logger.scalars(step, val, prefix="val/")
                # async: the disk write overlaps the next training epoch
                is_best = self.ckpt.save(self.state, step,
                                         psnr=val["psnr"], block=False)
                if self.d_ckpt is not None:
                    self.d_ckpt.save(self.d_state, step, block=False)
                if is_best:
                    best = dict(val)
            # previews follow their own cadence (not nested in the eval
            # branch, which would silently stretch it to the LCM)
            if (epoch + 1) % cfg.preview_every == 0:
                self._save_preview(epoch)
        self.ckpt.wait()  # commit any in-flight async save before returning
        if self.d_ckpt is not None:
            self.d_ckpt.wait()
        return {"best": best, "epochs": epochs,
                "wall_s": time.time() - t_start,
                "final_step": int(self.state.step)}

    def evaluate(self) -> dict:
        m = Metrics()
        batches = prefetch_to_device(self.val_loader,
                                     size=self.cfg.data.prefetch,
                                     sharding=batch_sharding(self.mesh))
        sums = None
        for i, batch in enumerate(batches):
            key = jax.random.fold_in(self._base_key, 2**30 + i)
            out = self._eval_step(self.state, batch, key)
            cur = (out["psnr_sum"], out["ssim_sum"], out["n"])
            # accumulate on device; a float() per batch would force a
            # device sync each iteration (high-latency on tunneled links)
            sums = cur if sums is None else jax.tree.map(jnp.add, sums, cur)
        if sums is not None:
            m.update_sums(float(sums[0]), float(sums[1]), float(sums[2]))
        return m.compute()

    def _save_preview(self, epoch: int) -> None:
        """[LR-nearest-up | SR | HR] strip (reference
        scripts/Modello_supporto.py:187-190, scripts/Modello_5.py:83-85)."""
        # one sample read directly (a val_loader batch would decode +
        # prefetch whole batches to keep one image), replicated rather
        # than data-sharded (a size-1 batch does not divide a data>1 axis)
        batch = jax.tree.map(lambda x: np.asarray(x)[None],
                             self.val_ds[0])
        batch = jax.tree.map(
            lambda x: jax.device_put(x, replicated_sharding(self.mesh)),
            batch)
        key = jax.random.fold_in(self._base_key, 2**31 - 1)
        out = self._eval_step(self.state, batch, key)
        sr = np.asarray(out["pred"][0])
        hr0 = np.asarray(out["hr"][0])
        lr_up = np.asarray(resize_nearest(out["lr"][0], hr0.shape[:2]))
        strip = np.concatenate([lr_up, sr, hr0], axis=1)
        path = os.path.join(self.workdir, "previews",
                            f"epoch_{epoch + 1:05d}.png")
        save_png(strip, path)
        self.logger.image(int(self.state.step), "preview", strip)

    def finalize(self) -> str:
        """Promote best weights (reference scripts/Modello_4.py contract)."""
        return self.ckpt.finalize(os.path.join(self.workdir, "final_weights"))

    def close(self) -> None:
        """Release background resources deterministically: waits out any
        in-flight async checkpoint save and closes the TB/JSONL writers
        (each SummaryWriter owns threads; leaking dozens across a pytest
        process contributed to the round-4 full-suite SIGABRT)."""
        self.ckpt.wait()
        if self.d_ckpt is not None:
            self.d_ckpt.wait()
        self.logger.close()

    def __enter__(self) -> "Trainer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
