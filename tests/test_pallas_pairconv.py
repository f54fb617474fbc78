"""Pack-GEMM conv3x3 (ops/pallas_pairconv.py) must match
lax.conv_general_dilated SAME semantics, chain without relayout, and
expose correct gradients. Interpreter-mode Pallas on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_tpu.ops.pallas_pairconv import (
    pack_conv3x3,
    pack_input,
    unpack_output,
)


def _ref(x, w, bias, act="none"):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + bias.reshape(1, 1, 1, -1)
    if act == "lrelu":
        y = jnp.where(y >= 0, y, 0.2 * y)
    return y.astype(x.dtype)


@pytest.mark.parametrize("c,n,p", [(64, 192, 2), (32, 160, 4), (32, 96, 4),
                                   (64, 64, 2), (32, 160, 2)])
def test_pack_conv_matches_lax(c, n, p):
    ks = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(ks[0], (2, 16, 48, c), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, c, n), jnp.float32) * 0.05
    bias = jax.random.normal(ks[2], (n,)) * 0.1
    xp = pack_input(x, p)
    got = unpack_output(pack_conv3x3(xp, w, bias, p, 48, "none", True),
                        p, 48)
    ref = _ref(x, w, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_pack_conv_chains_with_lrelu():
    """Two chained packed convs (fused lrelu) == two XLA convs: proves the
    pad packs are re-zeroed in-kernel."""
    ks = jax.random.split(jax.random.key(1), 5)
    x = jax.random.normal(ks[0], (1, 8, 32, 64), jnp.float32)
    w1 = jax.random.normal(ks[1], (3, 3, 64, 128), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[2], (128,)) * 0.1
    w2 = jax.random.normal(ks[3], (3, 3, 128, 64), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[4], (64,)) * 0.1
    xp = pack_input(x, 2)
    y1 = pack_conv3x3(xp, w1, b1, 2, 32, "lrelu", True)
    y2 = pack_conv3x3(y1, w2, b2, 2, 32, "none", True)
    got = unpack_output(y2, 2, 32)
    ref = _ref(_ref(x, w1, b1, act="lrelu"), w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_pack_conv_gradients_match_xla():
    ks = jax.random.split(jax.random.key(2), 3)
    x = jax.random.normal(ks[0], (1, 8, 16, 32), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, 32, 64), jnp.float32) * 0.05
    bias = jax.random.normal(ks[2], (64,)) * 0.1

    def loss_pack(w, bias):
        y = pack_conv3x3(pack_input(x, 2), w, bias, 2, 16, "lrelu", True)
        return jnp.sum(unpack_output(y, 2, 16) ** 2)

    def loss_ref(w, bias):
        return jnp.sum(_ref(x, w, bias, act="lrelu") ** 2)

    gw, gb = jax.grad(loss_pack, argnums=(0, 1))(w, bias)
    rw, rb = jax.grad(loss_ref, argnums=(0, 1))(w, bias)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                               atol=1e-3, rtol=1e-3)


def test_pack_geometry_odd_height_rb_fallback():
    """H not divisible by 8 falls back to a smaller row band."""
    x = jax.random.normal(jax.random.key(3), (1, 4, 16, 32), jnp.float32)
    w = jax.random.normal(jax.random.key(4), (3, 3, 32, 32),
                          jnp.float32) * 0.05
    bias = jnp.zeros((32,))
    got = unpack_output(
        pack_conv3x3(pack_input(x, 2), w, bias, 2, 16, "none", True), 2, 16)
    ref = _ref(x, w, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
