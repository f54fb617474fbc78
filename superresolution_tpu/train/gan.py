"""ESRGAN-style adversarial training steps (BASELINE config 5).

Generator loss = pixel (l1/charbonnier) + perceptual + gan_weight *
relativistic-G; discriminator trains on relativistic-D. Both steps are
independently jittable; the Trainer alternates them on the same batch
(one D update per G update, the ESRGAN schedule).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from superresolution_tpu.losses.gan import (
    relativistic_gan_d_loss,
    relativistic_gan_g_loss,
)
from superresolution_tpu.utils.precision import Policy


def make_gan_steps(gen_model, disc_model, pixel_loss_fn, gen_tx, disc_tx,
                   policy: Policy, input_fn: Callable, gan_weight: float,
                   ema_decay: float | None = None, gan_start_step: int = 0,
                   accum_steps: int = 1,
                   gen_apply_fn: Callable | None = None):
    """`gan_start_step` implements the ESRGAN two-phase schedule: before it,
    the generator trains pixel-only and the discriminator receives zero
    gradients (stays at init); after it, the adversarial terms switch on.
    `accum_steps` scans micro-batches like the non-GAN train step.
    `gen_apply_fn(params, lr) -> pred` overrides the plain generator
    forward (e.g. train/fused_apply.py's fused-kernel trunk)."""
    gen_apply = gen_apply_fn if gen_apply_fn is not None else (
        lambda p, x: gen_model.apply(p, x))

    def _gen_forward(g_params, lr):
        params_c = policy.cast_to_compute(g_params)
        return gen_apply(params_c, lr.astype(policy.compute_dtype))

    def _disc_forward(d_params, img):
        params_c = policy.cast_to_compute(d_params)
        return disc_model.apply(params_c, img.astype(policy.compute_dtype))

    def g_loss_fn(g_params, d_params, adv_on, lr, hr):
        pred = _gen_forward(g_params, lr).astype(jnp.float32)
        hrf = hr.astype(jnp.float32)
        pixel, logs = pixel_loss_fn(pred, hrf)
        real_logits = jax.lax.stop_gradient(
            _disc_forward(d_params, hrf)).astype(jnp.float32)
        fake_logits = _disc_forward(d_params, pred).astype(jnp.float32)
        g_adv = relativistic_gan_g_loss(real_logits, fake_logits)
        total = pixel + gan_weight * adv_on * g_adv
        logs = dict(logs)
        logs.update({"g_adv": g_adv, "g_total": total})
        return total, logs

    def d_loss_fn(d_params, g_params, lr, hr):
        pred = jax.lax.stop_gradient(_gen_forward(g_params, lr)).astype(jnp.float32)
        hrf = hr.astype(jnp.float32)
        real_logits = _disc_forward(d_params, hrf).astype(jnp.float32)
        fake_logits = _disc_forward(d_params, pred).astype(jnp.float32)
        loss = relativistic_gan_d_loss(real_logits, fake_logits)
        return loss, {"d_loss": loss}

    g_grad = jax.grad(g_loss_fn, has_aux=True)
    d_grad = jax.grad(d_loss_fn, has_aux=True)

    def _accum(grad_fn, lr, hr):
        """Mean (grads, logs) of grad_fn(lr_micro, hr_micro) over
        accum_steps micro-batches via lax.scan."""
        b = lr.shape[0]
        k = max(1, min(accum_steps, b))
        if b % k:
            # static shapes: trace-time error, same contract as
            # train/steps.py::make_train_step
            raise ValueError(
                f"batch {b} is not divisible by accum_steps {k}:"
                f" {b % k} samples per step would be silently dropped"
                " — pick accum_steps that divides the batch")
        if k == 1:
            return grad_fn(lr, hr)
        micro = b // k
        lr_m = lr[: micro * k].reshape(k, micro, *lr.shape[1:])
        hr_m = hr[: micro * k].reshape(k, micro, *hr.shape[1:])

        def body(carry, mb):
            g, logs = grad_fn(mb[0], mb[1])
            return jax.tree.map(jnp.add, carry, (g, logs)), None

        zeros = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(grad_fn, lr_m[0], hr_m[0]))
        (grads, logs), _ = jax.lax.scan(body, zeros, (lr_m, hr_m))
        return jax.tree.map(lambda v: v / k, (grads, logs))

    def gan_train_step(g_state, d_state, batch, key):
        lr, hr = input_fn(key, batch)
        adv_on = (g_state.step >= gan_start_step).astype(jnp.float32)
        d_grads, d_logs = _accum(
            lambda a, b: d_grad(d_state.params, g_state.params, a, b), lr, hr)
        # pixel-only warmup: the whole discriminator state (params, opt
        # moments, step) holds at init until the adversarial phase starts —
        # zeroing grads is not enough, AdamW weight decay would still move it
        new_d = d_state.apply_gradients(d_grads, disc_tx)
        d_state = jax.tree.map(
            lambda n, o: jnp.where(adv_on > 0, n, o), new_d, d_state)
        g_grads, g_logs = _accum(
            lambda a, b: g_grad(g_state.params, d_state.params, adv_on, a, b),
            lr, hr)
        g_state = g_state.apply_gradients(g_grads, gen_tx, ema_decay)
        logs = {**d_logs, **g_logs, "adv_on": adv_on}
        return g_state, d_state, logs

    return gan_train_step
