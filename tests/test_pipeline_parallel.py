"""Pipeline parallelism (parallel/pipeline.py) on the 8-device CPU mesh:
forward equivalence vs the sequential stage loop, backward-pipeline
gradients via plain jax.grad, and the RRDB-trunk mapping with masked
pad slots (23-is-prime case)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import Mesh

from superresolution_tpu.models.rrdbnet import RRDB, RRDBNet
from superresolution_tpu.parallel.pipeline import (
    make_pipeline_loss,
    make_trunk_pipeline,
    pipeline_apply,
    split_scan_params,
)

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def pipe_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("pipe",))


def dense_stage(sp, u):
    return jnp.tanh(u @ sp["w"] + sp["b"])


def make_dense_stages(key, n_stages, d):
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (n_stages, d, d)) * 0.3,
        "b": jax.random.normal(kb, (n_stages, d)) * 0.1,
    }


def sequential(stage_fn, sp, x):
    outs = []
    n = jax.tree.leaves(sp)[0].shape[0]
    for m in range(x.shape[0]):
        u = x[m]
        for s in range(n):
            u = stage_fn(jax.tree.map(lambda l: l[s], sp), u)
        outs.append(u)
    return jnp.stack(outs)


@requires_8
@pytest.mark.parametrize("n_stages,n_micro", [(8, 8), (4, 6), (2, 1)])
def test_pipeline_matches_sequential(rng, n_stages, n_micro):
    mesh = pipe_mesh(n_stages)
    sp = make_dense_stages(jax.random.key(0), n_stages, 16)
    x = jax.random.normal(jax.random.key(1), (n_micro, 3, 16))
    got = jax.jit(lambda s, u: pipeline_apply(mesh, dense_stage, s, u))(
        sp, x)
    ref = sequential(dense_stage, sp, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


@requires_8
def test_pipeline_stage_count_mismatch_raises(rng):
    mesh = pipe_mesh(4)
    sp = make_dense_stages(jax.random.key(0), 3, 8)
    with pytest.raises(ValueError, match="3 stages"):
        pipeline_apply(mesh, dense_stage, sp,
                       jnp.zeros((2, 1, 8)))


@requires_8
def test_pipeline_grads_match_sequential(rng):
    """jax.grad through the ring IS the backward pipeline; the stage-
    weight gradients must equal the sequential loop's."""
    n_stages, n_micro = 4, 5
    mesh = pipe_mesh(n_stages)
    sp = make_dense_stages(jax.random.key(2), n_stages, 8)
    x = jax.random.normal(jax.random.key(3), (n_micro, 2, 8))
    tgt = jax.random.normal(jax.random.key(4), (n_micro, 2, 8))

    def loss_pipe(s):
        out = pipeline_apply(mesh, dense_stage, s, x)
        return jnp.mean((out - tgt) ** 2)

    def loss_seq(s):
        return jnp.mean((sequential(dense_stage, s, x) - tgt) ** 2)

    g_pipe = jax.jit(jax.grad(loss_pipe))(sp)
    g_seq = jax.grad(loss_seq)(sp)
    for k in sp:
        np.testing.assert_allclose(np.asarray(g_pipe[k]),
                                   np.asarray(g_seq[k]),
                                   atol=1e-6, rtol=1e-5)


def test_split_scan_params_pads_and_masks():
    stacked = {"k": jnp.arange(5, dtype=jnp.float32).reshape(5, 1)}
    blocks, valid = split_scan_params(stacked, 5, 4)
    assert blocks["k"].shape == (4, 2, 1)
    np.testing.assert_array_equal(
        np.asarray(valid),
        [[True, True], [True, True], [True, False], [False, False]])
    # pad slots are zeros
    assert float(blocks["k"][2, 1, 0]) == 0.0
    assert float(blocks["k"][3, 0, 0]) == 0.0


@requires_8
def test_trunk_pipeline_matches_sequential_blocks(rng):
    """RRDBNet body (5 blocks, prime-ish over 4 stages -> masked pad
    slots) pipelined over 'pipe' equals the sequential block loop."""
    model = RRDBNet(scale=4, in_channels=3, features=8, num_blocks=5,
                    growth=4, scan_blocks=True, fused_dense=True)
    x_init = jnp.zeros((1, 8, 8, 3))
    params = model.init(jax.random.key(0), x_init)
    mesh = pipe_mesh(4)

    m, mb = 3, 2
    feats = jax.random.normal(jax.random.key(1), (m, mb, 8, 8, 8)) * 0.3
    apply = make_trunk_pipeline(mesh, model, params)
    got = jax.jit(apply)(feats)

    body = params["params"]["body"]
    rrdb = RRDB(model.features, model.growth, model.fused_dense)
    ref = []
    for i in range(m):
        u = feats[i]
        for b in range(model.num_blocks):
            w = jax.tree.map(lambda l: l[b], body)
            u = rrdb.apply({"params": w["RRDB_0"]}, u)
        ref.append(u)
    ref = jnp.stack(ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@requires_8
def test_trunk_pipeline_grads_match_sequential(rng):
    """Block-weight grads through the pipelined trunk equal the
    sequential loop's; pad-slot grads exist but carry zero signal."""
    from superresolution_tpu.parallel.pipeline import pipeline_apply

    model = RRDBNet(scale=4, in_channels=3, features=8, num_blocks=3,
                    growth=4, scan_blocks=True, fused_dense=True)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    body = params["params"]["body"]
    mesh = pipe_mesh(2)
    rrdb = RRDB(model.features, model.growth, model.fused_dense)
    feats = jax.random.normal(jax.random.key(1), (2, 1, 8, 8, 8)) * 0.3

    def loss_pipe(b):
        blocks, valid = split_scan_params(b, model.num_blocks, 2)

        def stage_fn(sp, u):
            def step(h, wv):
                w, v = wv
                y = rrdb.apply({"params": w["RRDB_0"]}, h)
                return jnp.where(v, y, h), None
            h, _ = jax.lax.scan(step, u, (sp["blocks"], sp["valid"]))
            return h

        out = pipeline_apply(mesh, stage_fn,
                             {"blocks": blocks, "valid": valid}, feats)
        return jnp.mean(out ** 2)

    def loss_seq(b):
        outs = []
        for i in range(feats.shape[0]):
            u = feats[i]
            for blk in range(model.num_blocks):
                w = jax.tree.map(lambda l: l[blk], b)
                u = rrdb.apply({"params": w["RRDB_0"]}, u)
            outs.append(u)
        return jnp.mean(jnp.stack(outs) ** 2)

    g_pipe = jax.jit(jax.grad(loss_pipe))(body)
    g_seq = jax.grad(loss_seq)(body)
    for gp, gs in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                                   atol=1e-6, rtol=1e-5)


@requires_8
def test_make_pipeline_loss_matches_plain(rng):
    """Full pipeline-parallel training objective (replicated head/tail,
    pipelined body) == plain model L1 loss, and so are ALL param grads
    — the ring only reorders where each sample's convs run."""
    model = RRDBNet(scale=2, in_channels=3, features=8, num_blocks=5,
                    growth=4, scan_blocks=True, fused_dense=True)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    mesh = pipe_mesh(4)
    lr = jax.random.uniform(jax.random.key(1), (4, 8, 8, 3))
    hr = jax.random.uniform(jax.random.key(2), (4, 16, 16, 3))
    l1_sum = lambda pred, t: jnp.sum(jnp.abs(pred - t))

    loss_fn = make_pipeline_loss(mesh, model, l1_sum, n_micro=2)
    loss_pp, g_pp = jax.jit(jax.value_and_grad(loss_fn))(params, lr, hr)

    def plain(p):
        return l1_sum(model.apply(p, lr), hr) / hr.size

    loss_ref, g_ref = jax.value_and_grad(plain)(params)
    np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=1e-6)
    for gp, gs in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                                   atol=1e-5, rtol=1e-4)

    with pytest.raises(ValueError, match="not divisible"):
        loss_fn(params, lr[:3], hr[:3])


@requires_8
def test_trainer_pipe_matches_single_device(tmp_path):
    """Trainer with mesh.pipe=4 must produce the same trained params as
    the single-device Trainer: the ring only moves where convs run."""
    from superresolution_tpu.train.trainer import Trainer
    from superresolution_tpu.utils.config import (
        Config, DataConfig, LossConfig, MeshConfig, ModelConfig,
        TrainConfig)

    def cfg(mesh):
        return Config(
            name="pp_equiv",
            model=ModelConfig(name="rrdbnet", scale=2, in_channels=1,
                              out_channels=1,
                              kwargs={"features": 8, "num_blocks": 3,
                                      "growth": 4}),
            data=DataConfig(hr_patch=16, batch_size=4, synthetic_len=4,
                            degradation="bicubic", augment=False),
            loss=LossConfig(terms={"l1": 1.0}),
            train=TrainConfig(epochs=1, lr=1e-3, eval_every=100,
                              preview_every=1000, precision="fp32",
                              resume=False),
            mesh=mesh,
        )

    tr_pp = Trainer(cfg(MeshConfig(data=1, pipe=4)),
                    workdir=str(tmp_path / "pp"))
    tr_1 = Trainer(cfg(MeshConfig(data=1, spatial=1)),
                   workdir=str(tmp_path / "one"))
    assert dict(tr_pp.mesh.shape) == {"data": 1, "pipe": 4}
    tr_pp.fit()
    tr_1.fit()
    for a, b in zip(jax.tree.leaves(tr_pp.state.params),
                    jax.tree.leaves(tr_1.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@requires_8
def test_trainer_pipe_rejects_unsupported_archs(tmp_path):
    from superresolution_tpu.train.trainer import Trainer
    from superresolution_tpu.utils.config import (
        Config, DataConfig, LossConfig, MeshConfig, ModelConfig,
        TrainConfig)

    cfg = Config(
        name="pp_bad",
        model=ModelConfig(name="espcn", scale=2, in_channels=1,
                          out_channels=1, kwargs={"f1": 8, "f2": 8}),
        data=DataConfig(hr_patch=16, batch_size=4, synthetic_len=4,
                        degradation="bicubic", augment=False),
        loss=LossConfig(terms={"l1": 1.0}),
        train=TrainConfig(epochs=1, precision="fp32", resume=False),
        mesh=MeshConfig(data=1, pipe=4),
    )
    with pytest.raises(ValueError, match="RRDBNet"):
        Trainer(cfg, workdir=str(tmp_path))


@requires_8
def test_hat_group_pipeline_matches_sequential(rng):
    """HATLite residual groups (3 groups over a 2-stage pipe -> masked
    pad slot) pipelined == the sequential group loop."""
    from superresolution_tpu.models.hat_lite import HATLite, ResidualGroup
    from superresolution_tpu.parallel.pipeline import (
        make_hat_group_pipeline)

    model = HATLite(scale=2, in_channels=1, out_channels=1, embed_dim=12,
                    depths=(2, 2, 2), num_heads=(3, 3, 3), window_size=4,
                    scan_blocks=True)
    x = jnp.zeros((1, 16, 16, 1))
    params = model.init(jax.random.key(0), x)
    mesh = pipe_mesh(2)

    feats = jax.random.normal(jax.random.key(1), (2, 1, 16, 16, 12)) * 0.3
    got = jax.jit(make_hat_group_pipeline(mesh, model, params))(feats)

    groups = params["params"]["groups"]
    rg = ResidualGroup(12, 2, 3, 4, mlp_ratio=model.mlp_ratio,
                       conv_scale=model.conv_scale,
                       overlap_ratio=model.overlap_ratio,
                       scan_blocks=True)
    ref = []
    for i in range(feats.shape[0]):
        u = feats[i]
        for g in range(3):
            w = jax.tree.map(lambda l: l[g], groups)
            u = rg.apply({"params": w["ResidualGroup_0"]}, u)
        ref.append(u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(jnp.stack(ref)),
                               atol=1e-5, rtol=1e-5)


@requires_8
def test_trainer_dp_pipe_composition_matches_single_device(tmp_path):
    """dp x pp on one mesh (data=2, pipe=4): the jit partitioner inserts
    the data-axis resharding around the pipe ring; trained params must
    still match the single-device Trainer."""
    from superresolution_tpu.train.trainer import Trainer
    from superresolution_tpu.utils.config import (
        Config, DataConfig, LossConfig, MeshConfig, ModelConfig,
        TrainConfig)

    def cfg(mesh):
        return Config(
            name="pp_dp_equiv",
            model=ModelConfig(name="rrdbnet", scale=2, in_channels=1,
                              out_channels=1,
                              kwargs={"features": 8, "num_blocks": 3,
                                      "growth": 4}),
            data=DataConfig(hr_patch=16, batch_size=4, synthetic_len=4,
                            degradation="bicubic", augment=False),
            loss=LossConfig(terms={"l1": 1.0}),
            train=TrainConfig(epochs=1, lr=1e-3, eval_every=100,
                              preview_every=1000, precision="fp32",
                              resume=False),
            mesh=mesh,
        )

    tr_pp = Trainer(cfg(MeshConfig(data=2, pipe=4)),
                    workdir=str(tmp_path / "ppdp"))
    assert dict(tr_pp.mesh.shape) == {"data": 2, "pipe": 4}
    tr_1 = Trainer(cfg(MeshConfig(data=1, spatial=1)),
                   workdir=str(tmp_path / "one"))
    tr_pp.fit()
    tr_1.fit()
    for a, b in zip(jax.tree.leaves(tr_pp.state.params),
                    jax.tree.leaves(tr_1.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
