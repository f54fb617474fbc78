"""Pallas star-weighted L1: value and gradient parity with the jnp version."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.losses.basic import star_weighted_l1
from superresolution_tpu.ops.pallas_loss import star_weighted_l1_pallas


def test_value_matches_jnp(rng):
    p = jnp.asarray(rng.random((2, 33, 37, 1), dtype=np.float32))
    t = jnp.asarray(rng.random((2, 33, 37, 1), dtype=np.float32))
    ref = float(star_weighted_l1(p, t))
    with pltpu.force_tpu_interpret_mode():
        out = float(star_weighted_l1_pallas(p, t))
    assert abs(out - ref) < 1e-4 * max(1.0, ref)


def test_gradient_matches_jnp(rng):
    p = jnp.asarray(rng.random((1, 16, 16, 1), dtype=np.float32))
    t = jnp.asarray(rng.random((1, 16, 16, 1), dtype=np.float32))
    g_ref = jax.grad(lambda a: star_weighted_l1(a, t))(p)
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(lambda a: star_weighted_l1_pallas(a, t))(p)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)


def test_custom_threshold_weight(rng):
    p = jnp.asarray(rng.random((64,), dtype=np.float32))
    t = jnp.asarray(rng.random((64,), dtype=np.float32))
    ref = float(star_weighted_l1(p[None, :, None, None],
                                 t[None, :, None, None],
                                 threshold=0.5, weight=10.0))
    with pltpu.force_tpu_interpret_mode():
        out = float(star_weighted_l1_pallas(p, t, 0.5, 10.0))
    assert abs(out - ref) < 1e-5 * max(1.0, ref)
