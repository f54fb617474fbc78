"""Deploy-time fused RRDB trunk (infer/fused_trunk.py +
ops/pallas_dense_trunk.py) must reproduce RRDBNet.trunk on the same
variables. Interpreter-mode Pallas on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_tpu.infer.fused_trunk import make_fused_trunk
from superresolution_tpu.models import RRDBNet
from superresolution_tpu.ops.pallas_dense_trunk import (
    fused_dense_block,
    pack,
    pick_rb,
    pack_width,
    proj_weights,
    unpack,
)


def _small_net(**kw):
    args = dict(scale=4, in_channels=3, out_channels=3, features=16,
                num_blocks=2, growth=8, upsampler="pixelshuffle",
                scan_blocks=True)
    args.update(kw)
    return RRDBNet(**args)


def test_fused_trunk_matches_apply():
    model = _small_net()
    x = jax.random.normal(jax.random.key(0), (2, 24, 20, 3), jnp.float32)
    variables = model.init(jax.random.key(1), x)
    ref = model.apply(variables, x, method="trunk")
    trunk = make_fused_trunk(variables, model, interpret=True)
    got = trunk(x)
    assert got.shape == ref.shape
    # fused path computes in bf16 (the deploy dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=0.05, rtol=0.05)


def test_fused_trunk_pixel_unshuffle():
    model = _small_net(scale=2, pixel_unshuffle_input=2, in_channels=1,
                       out_channels=1)
    x = jax.random.normal(jax.random.key(2), (1, 16, 16, 1), jnp.float32)
    variables = model.init(jax.random.key(3), x)
    ref = model.apply(variables, x, method="trunk")
    got = make_fused_trunk(variables, model, interpret=True)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=0.05, rtol=0.05)


def test_fused_dense_block_exact_and_chains():
    """Single dense block matches FusedDenseBlock bit-for-bit at f32
    tolerance, and TWO chained fused blocks equal two XLA blocks — the
    single-px-mask invariant (pad garbage never leaks into real pixels)."""
    from superresolution_tpu.models.rrdbnet import FusedDenseBlock

    block = FusedDenseBlock(features=16, growth=8)
    x = jax.random.normal(jax.random.key(4), (1, 16, 20, 16), jnp.float32)
    variables = block.init(jax.random.key(5), x)
    dp = variables["params"]
    w = proj_weights(dp, dtype=jnp.float32)
    ref1 = block.apply(variables, x)
    ref2 = block.apply(variables, ref1)
    xp = pack(x)
    got1 = fused_dense_block(xp, w, width=20, rb=8, interpret=True)
    got2 = fused_dense_block(got1, w, width=20, rb=8, interpret=True)
    np.testing.assert_allclose(np.asarray(unpack(got1, 20)),
                               np.asarray(ref1), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(unpack(got2, 20)),
                               np.asarray(ref2), atol=1e-4, rtol=1e-4)


def test_fused_rrdb_chained_matches_three_blocks():
    """The whole-RRDB chained kernel (ops fused_rrdb, halo 15) equals
    three fused_dense_block calls + the residual fold."""
    from superresolution_tpu.models.rrdbnet import FusedDenseBlock
    from superresolution_tpu.ops.pallas_dense_trunk import fused_rrdb

    blocks, ws = [], []
    x = jax.random.normal(jax.random.key(8), (2, 16, 20, 16),
                          jnp.float32) * 0.5
    for i in range(3):
        blk = FusedDenseBlock(features=16, growth=8)
        dp = blk.init(jax.random.key(10 + i), x)["params"]
        blocks.append((blk, dp))
        ws.append(proj_weights(dp, jnp.float32))
    xp = pack(x)
    a = fused_dense_block(xp, ws[0], width=20, rb=8, interpret=True)
    b = fused_dense_block(a, ws[1], width=20, rb=8, interpret=True)
    ref = fused_dense_block(b, ws[2], width=20, rb=8, interpret=True,
                            residual=xp)
    got = fused_rrdb(xp, ws[0], ws[1], ws[2], width=20, rb=8,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # multi-row-block grid too (the deep-halo window construction)
    got4 = fused_rrdb(xp, ws[0], ws[1], ws[2], width=20, rb=4,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pick_rb():
    assert pick_rb(376, pack_width(400)) == 47
    assert pick_rb(392, pack_width(416)) == 56
    assert 128 % pick_rb(128, pack_width(128)) == 0


def test_fused_trunk_rejects_unrolled_layout():
    model = _small_net(scan_blocks=False)
    x = jnp.zeros((1, 8, 8, 3))
    variables = _small_net().init(jax.random.key(0), x)
    with pytest.raises(ValueError):
        make_fused_trunk(variables, model)


def test_fused_rrdb_model_matches_apply():
    from superresolution_tpu.infer.fused_trunk import fused_rrdb_model

    model = _small_net()
    x = jax.random.normal(jax.random.key(6), (1, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.key(7), x)
    ref = model.apply(variables, x)
    wrapped = fused_rrdb_model(variables, model)
    # force interpret on CPU: make_fused_trunk auto-detects backend
    got = wrapped.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=0.05, rtol=0.08)



def test_fused_dense_block_residual_fold_matches_two_step(rng):
    """fused_dense_block(residual=carry) equals the two-step form
    (kernel then XLA `carry + out*0.2`) to FMA rounding — XLA emits a
    fused multiply-add for the separate pass, the kernel a mul+add."""
    from superresolution_tpu.models.rrdbnet import FusedDenseBlock

    key = jax.random.key(0)
    blk = FusedDenseBlock(features=16, growth=8)
    x = jax.random.normal(jax.random.key(1), (2, 12, 20, 16)) * 0.5
    dp = blk.init(key, x)["params"]
    w = proj_weights(dp, jnp.float32)
    xp = pack(x)
    carry = jax.random.normal(jax.random.key(2), xp.shape) * 0.5
    two_step = carry + fused_dense_block(
        xp, w, width=20, rb=4, interpret=True) * jnp.asarray(0.2, xp.dtype)
    folded = fused_dense_block(xp, w, width=20, rb=4, interpret=True,
                               residual=carry)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(two_step),
                               atol=1e-5, rtol=1e-5)


def test_fold_ends_matches_unfolded_trunk():
    """fold_ends=True (conv_first prologue + trunk_conv epilogue in the
    end kernels) equals the unfolded fused trunk AND the plain apply."""
    model = _small_net(num_blocks=3)
    x = jax.random.normal(jax.random.key(20), (2, 24, 20, 3),
                          jnp.float32)
    variables = model.init(jax.random.key(21), x)
    ref = model.apply(variables, x, method="trunk")
    plain = make_fused_trunk(variables, model, interpret=True,
                             fold_ends=False)(x)
    folded = make_fused_trunk(variables, model, interpret=True,
                              fold_ends=True)(x)
    assert folded.shape == ref.shape
    np.testing.assert_allclose(np.asarray(folded), np.asarray(ref),
                               atol=0.05, rtol=0.05)
    # folded vs unfolded differ only by f.p. reassociation of the two
    # end convs — much tighter than the bf16-vs-f32 apply tolerance
    np.testing.assert_allclose(np.asarray(folded), np.asarray(plain),
                               atol=2e-2, rtol=2e-2)


def test_fold_ends_two_blocks_no_scan():
    """num_blocks=2: both RRDBs are peeled, the scan is skipped."""
    model = _small_net(num_blocks=2)
    x = jax.random.normal(jax.random.key(22), (1, 16, 20, 3),
                          jnp.float32)
    variables = model.init(jax.random.key(23), x)
    ref = model.apply(variables, x, method="trunk")
    folded = make_fused_trunk(variables, model, interpret=True,
                              fold_ends=True)(x)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(ref),
                               atol=0.05, rtol=0.05)


def test_fold_ends_pixel_unshuffle():
    """The prologue's channel padding composes with space_to_depth
    (BasicSR scale-2 convention: cin = in_channels * 4)."""
    model = _small_net(scale=2, pixel_unshuffle_input=2, in_channels=1,
                       out_channels=1, num_blocks=2)
    x = jax.random.normal(jax.random.key(24), (1, 16, 16, 1),
                          jnp.float32)
    variables = model.init(jax.random.key(25), x)
    ref = model.apply(variables, x, method="trunk")
    folded = make_fused_trunk(variables, model, interpret=True,
                              fold_ends=True)(x)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(ref),
                               atol=0.05, rtol=0.05)
