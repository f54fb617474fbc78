"""Shared helpers for the deploy-time fused inference rewrites
(infer/fused_trunk.py, infer/fused_hat.py, infer/folded_tail.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv_nhwc(x, k, b=None, padding="SAME"):
    """3x3-style NHWC conv on a raw kernel (+ optional bias) array."""
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(k, x.dtype), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + jnp.asarray(b, x.dtype)
    return y


def param_conv(x, cp, padding="SAME"):
    """conv_nhwc on a flax Conv param subtree {'kernel', 'bias'}."""
    return conv_nhwc(x, cp["kernel"], cp["bias"], padding)


class PreboundModel:
    """Duck-typed 'model' for infer.upscale: .apply ignores the passed
    variables (weights are pre-bound and cast per input dtype)."""

    def __init__(self, apply_fn):
        self._fn = apply_fn

    def apply(self, _variables, x):
        return self._fn(x)
