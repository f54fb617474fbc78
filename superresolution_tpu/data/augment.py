"""Paired geometric augmentation, on-device and jit/vmap-friendly.

Semantics of the reference's CPU-side paired augmentation (reference:
src/dataset.py:66-81): independent 50% H-flip, 50% V-flip, uniform k*90deg
rotation, applied with the SAME draw to LR and HR. Here it runs inside the
jitted input stage: flips are static-shape reverses; rot90 is a
transpose+reverse selected by lax.switch. Requires square patches (the
reference's patches are square: 128 LR / 512 HR).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rot90_k(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """HWC rot by k*90deg, k traced int in [0,4)."""
    return jax.lax.switch(
        k,
        [lambda a: a,
         lambda a: jnp.transpose(a, (1, 0, 2))[::-1, :, :],
         lambda a: a[::-1, ::-1, :],
         lambda a: jnp.transpose(a, (1, 0, 2))[:, ::-1, :]],
        x,
    )


def _apply(x: jnp.ndarray, hflip, vflip, k) -> jnp.ndarray:
    x = jax.lax.cond(hflip, lambda a: a[:, ::-1, :], lambda a: a, x)
    x = jax.lax.cond(vflip, lambda a: a[::-1, :, :], lambda a: a, x)
    return _rot90_k(x, k)


def paired_augment(key: jax.Array, lr: jnp.ndarray, hr: jnp.ndarray):
    """Augment one HWC LR/HR pair with a shared random draw."""
    k1, k2, k3 = jax.random.split(key, 3)
    hflip = jax.random.bernoulli(k1)
    vflip = jax.random.bernoulli(k2)
    k = jax.random.randint(k3, (), 0, 4)
    return _apply(lr, hflip, vflip, k), _apply(hr, hflip, vflip, k)
