"""Loss golden tests vs torch-cpu reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from superresolution_tpu.losses import (
    CombinedLoss,
    astro_loss,
    charbonnier_loss,
    l1_loss,
    perceptual_loss,
    relativistic_gan_d_loss,
    relativistic_gan_g_loss,
    star_weighted_l1,
)
from superresolution_tpu.utils.config import LossConfig


def _pair(rng, shape=(2, 8, 8, 1)):
    a = rng.random(shape, dtype=np.float32)
    b = rng.random(shape, dtype=np.float32)
    return a, b


def test_star_weighted_l1_matches_reference(rng):
    # reference src/losses.py:9-19
    p, t = _pair(rng)
    ours = float(star_weighted_l1(jnp.asarray(p), jnp.asarray(t)))
    pt, tt = torch.from_numpy(p), torch.from_numpy(t)
    diff = torch.abs(pt - tt)
    w = torch.ones_like(diff)
    w[tt > 0.02] = 500.0
    theirs = float(torch.mean(diff * w))
    assert abs(ours - theirs) < 1e-4 * max(1.0, abs(theirs))


def test_charbonnier_matches_reference(rng):
    p, t = _pair(rng)
    ours = float(charbonnier_loss(jnp.asarray(p), jnp.asarray(t)))
    d = torch.from_numpy(p) - torch.from_numpy(t)
    theirs = float(torch.mean(torch.sqrt(d * d + 1e-6)))
    assert abs(ours - theirs) < 1e-6


def test_astro_matches_reference(rng):
    # reference Backup/src/losses.py:44-48
    p, t = _pair(rng)
    ours = float(astro_loss(jnp.asarray(p), jnp.asarray(t)))
    pt, tt = torch.from_numpy(p), torch.from_numpy(t)
    diff = torch.abs(pt - tt)
    theirs = float(torch.mean(torch.sqrt(diff * diff + 1e-6) * (1.0 + 5.0 * tt)))
    assert abs(ours - theirs) < 1e-6


def test_l1(rng):
    p, t = _pair(rng)
    assert abs(float(l1_loss(jnp.asarray(p), jnp.asarray(t)))
               - np.abs(p - t).mean()) < 1e-6


def test_relativistic_gan_losses(rng):
    real = jnp.asarray(rng.standard_normal((4, 1), dtype=np.float32))
    fake = jnp.asarray(rng.standard_normal((4, 1), dtype=np.float32))
    d = float(relativistic_gan_d_loss(real, fake))
    g = float(relativistic_gan_g_loss(real, fake))
    assert np.isfinite(d) and np.isfinite(g)
    # perfectly separated logits -> low D loss
    sep_d = float(relativistic_gan_d_loss(jnp.full((4, 1), 10.0),
                                          jnp.full((4, 1), -10.0)))
    assert sep_d < 0.01


def test_gan_d_loss_gradient_direction():
    # D loss should fall as real logits rise above fake ones
    f = lambda r: relativistic_gan_d_loss(jnp.full((2, 1), r), jnp.zeros((2, 1)))
    assert float(f(2.0)) < float(f(0.0))


def test_perceptual_loss_runs_and_zero_for_identical(rng):
    x = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))
    assert float(perceptual_loss(x, x)) < 1e-6
    y = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))
    assert float(perceptual_loss(x, y)) > 0.0


def test_combined_loss_star_config(rng):
    p, t = _pair(rng)
    loss_fn = CombinedLoss(LossConfig(terms={"star_l1": 1.0}))
    total, logs = loss_fn(jnp.asarray(p), jnp.asarray(t))
    assert float(total) == float(logs["star_l1"]) == float(logs["total"])


def test_combined_loss_backup_config(rng):
    p, t = _pair(rng)
    loss_fn = CombinedLoss(LossConfig(
        terms={"charbonnier": 1.0, "perceptual": 0.05, "astro": 0.05}))
    total, logs = loss_fn(jnp.asarray(p), jnp.asarray(t))
    expect = (float(logs["charbonnier"]) + 0.05 * float(logs["perceptual"])
              + 0.05 * float(logs["astro"]))
    assert abs(float(total) - expect) < 1e-5


def test_combined_loss_is_differentiable(rng):
    p, t = _pair(rng)
    loss_fn = CombinedLoss(LossConfig(terms={"charbonnier": 1.0, "astro": 0.5}))
    g = jax.grad(lambda x: loss_fn(x, jnp.asarray(t))[0])(jnp.asarray(p))
    assert np.isfinite(np.asarray(g)).all()


def test_perceptual_loss_inside_jit(rng):
    """The VGG param cache must not leak tracers when first populated
    inside a jit trace (regression: GAN preset with perceptual term)."""
    import superresolution_tpu.losses.perceptual as perc

    perc._load_cached.cache_clear()
    x = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))
    y = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))
    v1 = float(jax.jit(perceptual_loss)(x, y))
    v2 = float(jax.jit(perceptual_loss)(x, y))  # cached params reused
    assert np.isfinite(v1) and abs(v1 - v2) < 1e-6
