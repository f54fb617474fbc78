"""Relativistic average GAN losses (the ESRGAN formulation).

D learns E[real] > E[fake] relatively; G gets symmetric gradients through
both real and fake logits. Logits are [B, 1] from the discriminator.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bce_with_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    # numerically stable BCE-with-logits, target is 0.0 or 1.0
    x = logits.astype(jnp.float32)
    return jnp.mean(jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x))))


def relativistic_gan_d_loss(real_logits: jnp.ndarray,
                            fake_logits: jnp.ndarray) -> jnp.ndarray:
    rl = real_logits.astype(jnp.float32)
    fl = fake_logits.astype(jnp.float32)
    loss_real = _bce_with_logits(rl - jnp.mean(fl), 1.0)
    loss_fake = _bce_with_logits(fl - jnp.mean(rl), 0.0)
    return 0.5 * (loss_real + loss_fake)


def relativistic_gan_g_loss(real_logits: jnp.ndarray,
                            fake_logits: jnp.ndarray) -> jnp.ndarray:
    rl = real_logits.astype(jnp.float32)
    fl = fake_logits.astype(jnp.float32)
    loss_real = _bce_with_logits(rl - jnp.mean(fl), 0.0)
    loss_fake = _bce_with_logits(fl - jnp.mean(rl), 1.0)
    return 0.5 * (loss_real + loss_fake)
