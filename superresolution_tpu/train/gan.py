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
                   ema_decay: float | None = None):
    def _gen_forward(g_params, lr):
        params_c = policy.cast_to_compute(g_params)
        return gen_model.apply(params_c, lr.astype(policy.compute_dtype))

    def _disc_forward(d_params, img):
        params_c = policy.cast_to_compute(d_params)
        return disc_model.apply(params_c, img.astype(policy.compute_dtype))

    def g_loss_fn(g_params, d_params, lr, hr):
        pred = _gen_forward(g_params, lr).astype(jnp.float32)
        hrf = hr.astype(jnp.float32)
        pixel, logs = pixel_loss_fn(pred, hrf)
        real_logits = jax.lax.stop_gradient(
            _disc_forward(d_params, hrf)).astype(jnp.float32)
        fake_logits = _disc_forward(d_params, pred).astype(jnp.float32)
        g_adv = relativistic_gan_g_loss(real_logits, fake_logits)
        total = pixel + gan_weight * g_adv
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

    def gan_train_step(g_state, d_state, batch, key):
        lr, hr = input_fn(key, batch)
        d_grads, d_logs = d_grad(d_state.params, g_state.params, lr, hr)
        d_state = d_state.apply_gradients(d_grads, disc_tx)
        g_grads, g_logs = g_grad(g_state.params, d_state.params, lr, hr)
        g_state = g_state.apply_gradients(g_grads, gen_tx, ema_decay)
        logs = {**d_logs, **g_logs}
        return g_state, d_state, logs

    return gan_train_step
