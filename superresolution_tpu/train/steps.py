"""Jitted train/eval steps: device input stage, grad accumulation, bf16.

One jit region per step (the whole hot loop of reference
scripts/Modello_supporto.py:124-148 fuses into a single XLA program):
degradation + augmentation + forward + loss + backward + all-reduce +
AdamW update. Gradient accumulation is a lax.scan over micro-batches
(the analog of the reference's ACCUM_STEPS loop, :131-148) so memory stays
at micro-batch scale while the optimizer sees the full effective batch.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from superresolution_tpu.data.augment import paired_augment
from superresolution_tpu.metrics.psnr_ssim import psnr, ssim
from superresolution_tpu.ops.degradation import degradation_pipeline
from superresolution_tpu.utils.config import DataConfig
from superresolution_tpu.utils.precision import Policy


def make_device_input(data_cfg: DataConfig, scale: int,
                      augment: bool | None = None) -> Callable:
    """Returns input_fn(key, batch) -> (lr, hr), fully on-device."""
    do_augment = data_cfg.augment if augment is None else augment
    mode = data_cfg.degradation

    degrade = None
    if mode != "none":
        degrade = partial(
            degradation_pipeline, scale=scale, mode=mode,
            blur_sigma=data_cfg.blur_sigma, noise_sigma=data_cfg.noise_sigma,
            jpeg_quality=data_cfg.jpeg_quality)

    def input_fn(key: jax.Array, batch):
        hr = batch["hr"]
        b = hr.shape[0]
        if "lr" in batch:
            lr = batch["lr"]
        else:
            if degrade is None:
                raise ValueError("degradation 'none' requires real LR data")
            keys = jax.random.split(jax.random.fold_in(key, 0), b)
            lr = jax.vmap(degrade)(keys, hr)
        if do_augment:
            keys = jax.random.split(jax.random.fold_in(key, 1), b)
            lr, hr = jax.vmap(paired_augment)(keys, lr, hr)
        return lr, hr

    return input_fn


def make_train_step(model, loss_fn, tx, policy: Policy,
                    input_fn: Callable, accum_steps: int = 1,
                    ema_decay: float | None = None,
                    apply_fn: Callable | None = None) -> Callable:
    """Returns train_step(state, batch, key) -> (state, logs).

    apply_fn(params, lr) -> pred overrides the plain model.apply forward
    — e.g. parallel.pipeline.make_pipeline_forward for mesh.pipe > 1
    (same math, pipelined over the mesh; grads flow through it).
    """
    apply = apply_fn if apply_fn is not None else (
        lambda p, x: model.apply(p, x))

    def forward_loss(params, lr, hr):
        params_c = policy.cast_to_compute(params)
        pred = apply(params_c, lr.astype(policy.compute_dtype))
        total, logs = loss_fn(pred.astype(jnp.float32),
                              hr.astype(jnp.float32))
        return total, logs

    grad_fn = jax.grad(forward_loss, has_aux=True)

    def train_step(state, batch, key):
        lr, hr = input_fn(key, batch)
        # clamp like train/gan.py::_accum: accum_steps > batch would give
        # zero-length micro-batches whose mean-loss is NaN (the reference
        # accumulates over LOADER batches, so its ACCUM_STEPS can exceed
        # one batch; here micro-batches split ONE batch)
        k = max(1, min(accum_steps, lr.shape[0]))
        if lr.shape[0] % k:
            # shapes are static under jit, so this raises at trace time
            raise ValueError(
                f"batch {lr.shape[0]} is not divisible by accum_steps {k}:"
                f" {lr.shape[0] % k} samples per step would be silently"
                " dropped — pick accum_steps that divides the batch")
        if k <= 1:
            grads, logs = grad_fn(state.params, lr, hr)
        else:
            b = lr.shape[0]
            micro = b // k
            lr_m = lr[: micro * k].reshape(k, micro, *lr.shape[1:])
            hr_m = hr[: micro * k].reshape(k, micro, *hr.shape[1:])

            def scan_body(carry, mb):
                g_acc, l_acc = carry
                g, logs = grad_fn(state.params, mb[0], mb[1])
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                l_acc = jax.tree.map(jnp.add, l_acc, logs)
                return (g_acc, l_acc), None

            zeros = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                jax.eval_shape(lambda a, c: grad_fn(state.params, a, c),
                               lr_m[0], hr_m[0]))
            (grads, logs), _ = jax.lax.scan(scan_body, zeros, (lr_m, hr_m))
            inv = 1.0 / k
            grads = jax.tree.map(lambda g: g * inv, grads)
            logs = jax.tree.map(lambda v: v * inv, logs)
        new_state = state.apply_gradients(grads, tx, ema_decay)
        logs = dict(logs)
        logs["grad_norm"] = optax_global_norm(grads)
        return new_state, logs

    return train_step


def optax_global_norm(tree) -> jnp.ndarray:
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in jax.tree.leaves(tree)))


def make_eval_step(model, policy: Policy, input_fn: Callable | None = None,
                   use_ema: bool = False) -> Callable:
    """Returns eval_step(state, batch, key) -> metrics dict (fp32).

    Everything — degradation, forward, metric math — runs in ONE jit
    region; callers accumulate the returned masked sums host-side. Batches
    padded by the loader (pad_to_batch) carry a `_valid` mask; padded rows
    contribute nothing, so metrics are exact over datasets whose length is
    not a batch multiple. `lr`/`hr` (post input_fn) are returned so callers
    never re-run the input stage host-side.
    """

    def eval_step(state, batch, key):
        if input_fn is not None:
            lr, hr = input_fn(key, batch)
        else:
            lr, hr = batch["lr"], batch["hr"]
        params = state.ema_params if (use_ema and state.ema_params
                                      is not None) else state.params
        params_c = policy.cast_to_compute(params)
        pred = model.apply(params_c, lr.astype(policy.compute_dtype))
        pred = jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
        hrf = hr.astype(jnp.float32)
        valid = batch.get("_valid")
        valid = (jnp.ones(hrf.shape[0], jnp.float32) if valid is None
                 else valid.astype(jnp.float32))
        psnr_i = psnr(pred, hrf)                       # [B]
        ssim_i = ssim(pred, jnp.clip(hrf, 0.0, 1.0))   # [B]
        n = jnp.sum(valid)
        return {
            "psnr_sum": jnp.sum(psnr_i * valid),
            "ssim_sum": jnp.sum(ssim_i * valid),
            "n": n,
            # batch means kept for direct callers (exact when unpadded:
            # per-image SSIM means average to the reference's batch mean)
            "psnr": jnp.sum(psnr_i * valid) / jnp.maximum(n, 1.0),
            "ssim": jnp.sum(ssim_i * valid) / jnp.maximum(n, 1.0),
            "pred": pred,
            "lr": lr,
            "hr": hrf,
        }

    return eval_step
