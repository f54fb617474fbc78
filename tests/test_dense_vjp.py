"""Fused dense-block TRAINING kernel (ops/pallas_dense_trunk_vjp.py):
gradients from the fused Pallas backward must match jax.grad of an XLA
re-expression of the same packed-block function. Interpret mode on the
CPU conftest mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_tpu.models.rrdbnet import FusedDenseBlock
from superresolution_tpu.ops.pallas_dense_trunk import (
    PAD,
    pack,
    proj_weights,
    unpack,
)
from superresolution_tpu.ops.pallas_dense_trunk_vjp import (
    fused_dense_block_train,
    xla_reference_packed_block as _ref_packed_block,
)


def _setup(c=16, g=8, h=16, w=20, b=1, seed=0):
    block = FusedDenseBlock(features=c, growth=g)
    x = jax.random.normal(jax.random.key(seed), (b, h, w, c),
                          jnp.float32) * 0.5
    dp = block.init(jax.random.key(seed + 1), x)["params"]
    ws = tuple(proj_weights(dp, jnp.float32))
    return x, ws


def test_fwd_matches_ref_and_flax():
    x, ws = _setup()
    xp = pack(x)
    ref = _ref_packed_block(xp, ws, 20)
    got = fused_dense_block_train(xp, ws, None, 20, 8, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("rb", [None, 4])
def test_grads_match_ref(rb):
    """dx and every dW from the fused backward kernel match jax.grad of
    the XLA reference — including multi-row-block grids (rb=4: the
    halo-extended recompute + own-rows wgrad partition)."""
    x, ws = _setup(h=16, w=20)
    xp = pack(x)
    cot = jax.random.normal(jax.random.key(7), xp.shape, jnp.float32)

    def loss_ref(xp_, ws_):
        return jnp.sum(_ref_packed_block(xp_, ws_, 20) * cot)

    def loss_fused(xp_, ws_):
        return jnp.sum(
            fused_dense_block_train(xp_, ws_, None, 20, rb, True) * cot)

    ref_dx, ref_dws = jax.grad(loss_ref, argnums=(0, 1))(xp, ws)
    got_dx, got_dws = jax.grad(loss_fused, argnums=(0, 1))(xp, ws)
    # dx compared on real columns only: pad-column cotangents are
    # dropped by pack^T in the chain (documented non-contract surface)
    np.testing.assert_allclose(np.asarray(got_dx)[:, :, PAD:PAD + 20],
                               np.asarray(ref_dx)[:, :, PAD:PAD + 20],
                               atol=2e-4, rtol=2e-4)
    for i, (gw, rw) in enumerate(zip(got_dws, ref_dws)):
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=f"dW[{i}]")


def test_grads_with_residual_fold():
    """The folded-residual variant: gradients to xp, weights AND the
    residual carry."""
    x, ws = _setup(h=8, w=12, seed=3)
    xp = pack(x)
    res = jax.random.normal(jax.random.key(9), xp.shape, jnp.float32)
    cot = jax.random.normal(jax.random.key(11), xp.shape, jnp.float32)

    def loss_ref(xp_, ws_, r_):
        return jnp.sum(_ref_packed_block(xp_, ws_, 12, r_) * cot)

    def loss_fused(xp_, ws_, r_):
        return jnp.sum(
            fused_dense_block_train(xp_, ws_, r_, 12, None, True) * cot)

    refs = jax.grad(loss_ref, argnums=(0, 1, 2))(xp, ws, res)
    gots = jax.grad(loss_fused, argnums=(0, 1, 2))(xp, ws, res)
    w = 12
    np.testing.assert_allclose(np.asarray(gots[0])[:, :, PAD:PAD + w],
                               np.asarray(refs[0])[:, :, PAD:PAD + w],
                               atol=2e-4, rtol=2e-4)
    for gw, rw in zip(gots[1], refs[1]):
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(gots[2]), np.asarray(refs[2]),
                               atol=1e-5, rtol=1e-5)


def test_chain_grads_match_two_xla_blocks():
    """Two CHAINED fused train blocks == two XLA blocks under jax.grad —
    the pad-column cotangent confinement argument, exercised end to end
    through pack/unpack."""
    x, ws = _setup(h=8, w=12, seed=5)
    cot = jax.random.normal(jax.random.key(13), x.shape, jnp.float32)

    def loss_ref(x_, ws_):
        xp_ = pack(x_)
        y = _ref_packed_block(xp_, ws_, 12)
        y = _ref_packed_block(y, ws_, 12)
        return jnp.sum(unpack(y, 12) * cot)

    def loss_fused(x_, ws_):
        xp_ = pack(x_)
        y = fused_dense_block_train(xp_, ws_, None, 12, None, True)
        y = fused_dense_block_train(y, ws_, None, 12, None, True)
        return jnp.sum(unpack(y, 12) * cot)

    ref_dx, ref_dws = jax.grad(loss_ref, argnums=(0, 1))(x, ws)
    got_dx, got_dws = jax.grad(loss_fused, argnums=(0, 1))(x, ws)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                               atol=5e-4, rtol=5e-4)
    for gw, rw in zip(got_dws, ref_dws):
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   atol=1e-3, rtol=1e-3)


def test_row_packed_fwd_and_grads_match_per_image():
    """Batch-packed rows (seg mask): B images stacked along H with one
    zero spacer row each == the per-image reference, in value, dx and
    dW (VERDICT r3 item 4 — the sub-96^2 fused-train lever)."""
    b, h, w = 3, 8, 12
    x, ws = _setup(h=h, w=w, b=b, seed=17)
    xp = pack(x)  # [b, h, wp, c]
    wp, c = xp.shape[2], xp.shape[3]
    seg = (h + 1, h)
    xpk = jnp.pad(xp, ((0, 0), (0, 1), (0, 0), (0, 0))).reshape(
        1, b * (h + 1), wp, c)
    cot = jax.random.normal(jax.random.key(19), xp.shape, jnp.float32)
    cotk = jnp.pad(cot, ((0, 0), (0, 1), (0, 0), (0, 0))).reshape(
        1, b * (h + 1), wp, c)

    def loss_ref(xp_, ws_):
        return jnp.sum(_ref_packed_block(xp_, ws_, w) * cot)

    def loss_packed(xp_, ws_):
        y = fused_dense_block_train(
            jnp.pad(xp_, ((0, 0), (0, 1), (0, 0), (0, 0))).reshape(
                1, b * (h + 1), wp, c),
            ws_, None, w, None, True, seg)
        return jnp.sum(y * cotk)

    # value: packed rows sliced back == per-image reference
    got = fused_dense_block_train(xpk, ws, None, w, None, True, seg)
    got_imgs = got.reshape(b, h + 1, wp, c)[:, :h]
    ref = _ref_packed_block(xp, ws, w)
    np.testing.assert_allclose(np.asarray(got_imgs), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # spacer rows stay exactly zero when the input's are
    spacers = np.asarray(got.reshape(b, h + 1, wp, c)[:, h:])
    np.testing.assert_array_equal(
        spacers, np.zeros_like(spacers))

    ref_dx, ref_dws = jax.grad(loss_ref, argnums=(0, 1))(xp, ws)
    got_dx, got_dws = jax.grad(loss_packed, argnums=(0, 1))(xp, ws)
    np.testing.assert_allclose(np.asarray(got_dx)[:, :, PAD:PAD + w],
                               np.asarray(ref_dx)[:, :, PAD:PAD + w],
                               atol=2e-4, rtol=2e-4)
    for i, (gw, rw) in enumerate(zip(got_dws, ref_dws)):
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=f"dW[{i}]")
