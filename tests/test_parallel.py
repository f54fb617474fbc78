"""Mesh sharding on the 8-device virtual CPU mesh: data-parallel step
equivalence and spatial halo-exchange inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_tpu.losses.combined import CombinedLoss
from superresolution_tpu.models import ESPCN
from superresolution_tpu.parallel import (
    create_mesh,
    shard_batch,
    spatial_shard_apply,
)
from superresolution_tpu.train.state import create_train_state, make_optimizer
from superresolution_tpu.train.steps import make_device_input, make_train_step
from superresolution_tpu.utils.config import (
    DataConfig,
    LossConfig,
    MeshConfig,
    TrainConfig,
)
from superresolution_tpu.utils.precision import get_policy

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@requires_8
def test_mesh_shapes():
    mesh = create_mesh(MeshConfig(data=-1, spatial=1))
    assert mesh.shape["data"] == 8
    mesh2 = create_mesh(MeshConfig(data=2, spatial=4))
    assert mesh2.shape == {"data": 2, "spatial": 4}


@requires_8
def test_data_parallel_step_matches_single_device(rng):
    """The mesh-sharded train step must produce the same new params as the
    unsharded step: jit's partitioner inserts the grad all-reduce."""
    model = ESPCN(scale=2, in_channels=1, out_channels=1, f1=8, f2=8)
    tcfg = TrainConfig(lr=1e-3, precision="fp32")
    tx, _ = make_optimizer(tcfg, 100)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 1)))
    dcfg = DataConfig(degradation="bicubic", augment=False)
    step = make_train_step(model, CombinedLoss(LossConfig()), tx,
                           get_policy("fp32"),
                           make_device_input(dcfg, 2))
    batch = {"hr": jnp.asarray(rng.random((8, 16, 16, 1), dtype=np.float32))}
    key = jax.random.key(5)

    s0 = create_train_state(params, tx)
    ref_state, ref_logs = jax.jit(step)(s0, batch, key)

    mesh = create_mesh(MeshConfig(data=8, spatial=1))
    sharded_batch = shard_batch(mesh, jax.tree.map(np.asarray, batch))
    s1 = create_train_state(params, tx)
    dp_state, dp_logs = jax.jit(step)(s1, sharded_batch, key)

    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(dp_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert abs(float(ref_logs["total"]) - float(dp_logs["total"])) < 1e-5


@requires_8
def test_spatial_shard_apply_matches_single_device(rng):
    mesh = create_mesh(MeshConfig(data=1, spatial=8))
    model = ESPCN(scale=2, in_channels=1, out_channels=1, f1=8, f2=8)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)))

    def fn(x):
        return model.apply(params, x)

    img = jnp.asarray(rng.random((1, 128, 32, 1), dtype=np.float32))
    full = np.asarray(fn(img))
    sharded = np.asarray(spatial_shard_apply(mesh, fn, img, halo=8, scale=2))
    assert sharded.shape == full.shape
    # exact away from the true image border (same contract as tiling)
    b = 8 * 2
    np.testing.assert_allclose(sharded[:, b:-b], full[:, b:-b], atol=2e-5)


@requires_8
def test_hybrid_attention_dp_step_matches_single_device(rng):
    """The attention hybrid (RRDB -> HAT) must also be DP-exact on the
    mesh — windowed attention, rolls, LayerNorms and the CAB branch all
    shard over the batch axis without cross-device effects."""
    from superresolution_tpu.models.hat_lite import HATLite
    from superresolution_tpu.models.hybrid import HybridSR
    from superresolution_tpu.models.rrdbnet import RRDBNet

    model = HybridSR(
        stage1=RRDBNet(scale=2, in_channels=1, out_channels=1, features=8,
                       num_blocks=1, growth=4),
        stage2=HATLite(scale=2, in_channels=1, out_channels=1, embed_dim=8,
                       depths=(2,), num_heads=(2,), window_size=4),
        output_size=None, smoothing="balanced")
    tcfg = TrainConfig(lr=1e-3, precision="fp32")
    tx, _ = make_optimizer(tcfg, 100)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 1)))
    dcfg = DataConfig(degradation="bicubic", augment=False)
    step = make_train_step(model, CombinedLoss(LossConfig()), tx,
                           get_policy("fp32"),
                           make_device_input(dcfg, 4))
    batch = {"hr": jnp.asarray(rng.random((8, 32, 32, 1), dtype=np.float32))}
    key = jax.random.key(5)

    ref_state, ref_logs = jax.jit(step)(create_train_state(params, tx),
                                        batch, key)
    mesh = create_mesh(MeshConfig(data=8, spatial=1))
    dp_state, dp_logs = jax.jit(step)(
        create_train_state(params, tx),
        shard_batch(mesh, jax.tree.map(np.asarray, batch)), key)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(dp_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    assert abs(float(ref_logs["total"]) - float(dp_logs["total"])) < 1e-5


@requires_8
def test_spatial_train_grads_match_single(rng):
    """Spatial-parallel TRAINING (make_spatial_loss): loss and parameter
    gradients through the ICI halo exchange + psum must equal the
    single-device halo-zero-padded reference objective exactly (the
    interior coincides with plain training when half-RF <= halo)."""
    from superresolution_tpu.parallel import make_spatial_loss

    mesh = create_mesh(MeshConfig(data=1, spatial=8))
    model = ESPCN(scale=2, in_channels=1, out_channels=1, f1=8, f2=8)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)))
    halo, scale = 8, 2

    def apply_fn(p, x):
        return model.apply(p, x)

    def l1_sum(pred, hr):
        return jnp.sum(jnp.abs(pred - hr))

    lr = jnp.asarray(rng.random((1, 128, 32, 1), dtype=np.float32))
    hr = jnp.asarray(rng.random((1, 256, 64, 1), dtype=np.float32))

    loss_fn = make_spatial_loss(mesh, apply_fn, l1_sum, halo, scale)
    loss_s, grads_s = jax.value_and_grad(loss_fn)(params, lr, hr)

    def ref_loss(p, lr, hr):
        x = jnp.pad(lr, ((0, 0), (halo, halo), (0, 0), (0, 0)))
        out = apply_fn(p, x)[:, halo * scale:-halo * scale]
        return l1_sum(out, hr) / hr.size

    loss_r, grads_r = jax.value_and_grad(ref_loss)(params, lr, hr)
    np.testing.assert_allclose(float(loss_s), float(loss_r), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grads_s), jax.tree.leaves(grads_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    # the n==1 fast path computes the SAME objective (no dependence of
    # the training loss on the device count)
    mesh1 = create_mesh(MeshConfig(data=1, spatial=1))
    loss1_fn = make_spatial_loss(mesh1, apply_fn, l1_sum, halo, scale)
    np.testing.assert_allclose(float(loss1_fn(params, lr, hr)),
                               float(loss_r), rtol=1e-5)


@requires_8
def test_fused_trunk_dp_step_matches_single_device(rng):
    """The shard_map-wrapped FUSED train apply (train/fused_apply.py,
    pallas kernels fwd+bwd) under an 8-way data mesh produces the same
    params as the single-device fused step — grads psum over the data
    axis inside shard_map's transpose."""
    from superresolution_tpu.models import RRDBNet
    from superresolution_tpu.train.fused_apply import (
        make_fused_train_apply,
        make_fused_train_apply_dp,
    )

    model = RRDBNet(scale=2, in_channels=1, out_channels=1, features=16,
                    num_blocks=1, growth=8, upsampler="pixelshuffle")
    tcfg = TrainConfig(lr=1e-3, precision="fp32")
    tx, _ = make_optimizer(tcfg, 100)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 1)))
    dcfg = DataConfig(degradation="bicubic", augment=False)
    input_fn = make_device_input(dcfg, 2)
    loss_fn = CombinedLoss(LossConfig())
    batch = {"hr": jnp.asarray(rng.random((8, 16, 16, 1),
                                          dtype=np.float32))}
    key = jax.random.key(5)

    single = make_train_step(model, loss_fn, tx, get_policy("fp32"),
                             input_fn,
                             apply_fn=make_fused_train_apply(
                                 model, interpret=True))
    s0 = create_train_state(params, tx)
    ref_state, ref_logs = jax.jit(single)(s0, batch, key)

    mesh = create_mesh(MeshConfig(data=8, spatial=1))
    dp = make_train_step(model, loss_fn, tx, get_policy("fp32"),
                         input_fn,
                         apply_fn=make_fused_train_apply_dp(
                             model, mesh, interpret=True))
    sharded_batch = shard_batch(mesh, jax.tree.map(np.asarray, batch))
    s1 = create_train_state(params, tx)
    dp_state, dp_logs = jax.jit(dp)(s1, sharded_batch, key)

    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(dp_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert abs(float(ref_logs["total"]) - float(dp_logs["total"])) < 1e-5
