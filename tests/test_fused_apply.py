"""train/fused_apply.py: the fused-kernel TRAINING forward must match
model.apply in value and in parameter gradients (interpret mode), and
the Trainer must reach it via TrainConfig.fused_trunk."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_tpu.models import RRDBNet
from superresolution_tpu.models.factory import build_from_config
from superresolution_tpu.train.fused_apply import (
    make_fused_train_apply,
    supports_fused_train,
)
from superresolution_tpu.utils.config import (
    DataConfig,
    LossConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
    get_preset,
)


def _net(**kw):
    args = dict(scale=4, in_channels=3, out_channels=3, features=16,
                num_blocks=2, growth=8, upsampler="pixelshuffle",
                scan_blocks=True)
    args.update(kw)
    return RRDBNet(**args)


def test_fused_apply_matches_model_apply_and_grads():
    model = _net()
    x = jax.random.normal(jax.random.key(0), (1, 12, 12, 3), jnp.float32)
    params = model.init(jax.random.key(1), x)
    apply = make_fused_train_apply(model, interpret=True)
    ref = model.apply(params, x)
    got = apply(params, x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    cot = jax.random.normal(jax.random.key(2), ref.shape, jnp.float32)

    def loss_ref(p):
        return jnp.sum(model.apply(p, x) * cot)

    def loss_fused(p):
        return jnp.sum(apply(p, x) * cot)

    g_ref = jax.grad(loss_ref)(params)
    g_got = jax.grad(loss_fused)(params)
    flat_ref = jax.tree.leaves_with_path(g_ref)
    flat_got = jax.tree.leaves_with_path(g_got)
    assert len(flat_ref) == len(flat_got)
    for (kp, r), (_, g) in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-3, rtol=2e-3,
            err_msg=jax.tree_util.keystr(kp))


def test_fused_apply_hybrid_stage1():
    mc = ModelConfig(
        name="rrdbnet", scale=2, in_channels=1, out_channels=1,
        kwargs={"features": 16, "num_blocks": 2, "growth": 8},
        refiner="hat_lite",
        refiner_kwargs={"scale": 2, "embed_dim": 16, "depths": (2,),
                        "num_heads": (2,), "window_size": 4},
        smoothing="balanced")
    model = build_from_config(mc, output_size=32)
    assert supports_fused_train(model)
    x = jax.random.normal(jax.random.key(3), (1, 8, 8, 1), jnp.float32)
    params = model.init(jax.random.key(4), x)
    apply = make_fused_train_apply(model, interpret=True)
    ref = model.apply(params, x)
    got = apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_supports_fused_train_gates():
    assert supports_fused_train(_net())
    assert not supports_fused_train(_net(scan_blocks=False))
    assert not supports_fused_train(_net(fused_dense=False))
    from superresolution_tpu.models import ESPCN

    assert not supports_fused_train(
        ESPCN(scale=2, in_channels=1, out_channels=1))


def test_trainer_wires_fused_trunk(tmp_path):
    from superresolution_tpu.train.trainer import Trainer

    cfg = get_preset("esrgan_x4_tiled").replace(
        model=ModelConfig(
            name="rrdbnet", scale=4, in_channels=3, out_channels=3,
            kwargs={"features": 16, "num_blocks": 2, "growth": 8,
                    "upsampler": "pixelshuffle"}),
        data=DataConfig(hr_patch=48, batch_size=2, synthetic_len=4,
                        num_workers=0),
        loss=LossConfig(terms={"l1": 1.0}),
        train=TrainConfig(epochs=1, lr=1e-4, precision="fp32",
                          fused_trunk=True, eval_every=100,
                          preview_every=100),
        mesh=MeshConfig(data=1, spatial=1))
    tr = Trainer(cfg, workdir=str(tmp_path))
    out = tr.fit()
    assert out["final_step"] == tr.steps_per_epoch


def test_fused_apply_row_pack_matches_model_apply_and_grads():
    """row_pack=True (batch stacked along H with seg-masked spacer
    rows): same value and parameter gradients as model.apply at
    batch > 1 — the sub-96^2 amortization path (VERDICT r3 item 4)."""
    model = _net()
    x = jax.random.normal(jax.random.key(4), (3, 12, 12, 3), jnp.float32)
    params = model.init(jax.random.key(1), x)
    apply = make_fused_train_apply(model, interpret=True, row_pack=True)
    ref = model.apply(params, x)
    got = apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    cot = jax.random.normal(jax.random.key(5), ref.shape, jnp.float32)

    def loss_ref(p):
        return jnp.sum(model.apply(p, x) * cot)

    def loss_fused(p):
        return jnp.sum(apply(p, x) * cot)

    g_ref = jax.grad(loss_ref)(params)
    g_got = jax.grad(loss_fused)(params)
    for (kp, r), (_, g) in zip(jax.tree.leaves_with_path(g_ref),
                               jax.tree.leaves_with_path(g_got)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-3, rtol=2e-3,
            err_msg=jax.tree_util.keystr(kp))
