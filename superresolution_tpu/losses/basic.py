"""Pixel-space SR losses. All take NHWC pred/target in [0,1], return scalar
float32 (loss math always runs fp32 even under the bf16 compute policy)."""

from __future__ import annotations

import jax.numpy as jnp


def _f32(pred, target):
    return pred.astype(jnp.float32), target.astype(jnp.float32)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    p, t = _f32(pred, target)
    return jnp.mean(jnp.abs(p - t))


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    p, t = _f32(pred, target)
    return jnp.mean((p - t) ** 2)


def charbonnier_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     eps: float = 1e-6) -> jnp.ndarray:
    """sqrt(diff^2 + eps) — the reference's robust L1
    (reference: Backup/src/losses.py:6-15; note eps is inside the sqrt,
    not squared)."""
    p, t = _f32(pred, target)
    d = p - t
    return jnp.mean(jnp.sqrt(d * d + eps))


def star_weighted_l1(pred: jnp.ndarray, target: jnp.ndarray,
                     threshold: float = 0.02,
                     weight: float = 500.0) -> jnp.ndarray:
    """Weighted L1 where pixels with target > threshold (stars) weigh
    `weight`x (reference: src/losses.py:9-19)."""
    p, t = _f32(pred, target)
    diff = jnp.abs(p - t)
    w = jnp.where(t > threshold, weight, 1.0)
    return jnp.mean(diff * w)


def astro_loss(pred: jnp.ndarray, target: jnp.ndarray,
               scale: float = 5.0, eps: float = 1e-6) -> jnp.ndarray:
    """Brightness-weighted Charbonnier: weight map 1 + scale*target
    (reference: Backup/src/losses.py:44-48)."""
    p, t = _f32(pred, target)
    d = jnp.abs(p - t)
    w = 1.0 + scale * t
    return jnp.mean(jnp.sqrt(d * d + eps) * w)
