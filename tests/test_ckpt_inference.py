"""Checkpoint -> inference pipeline: train a couple steps, load params
without the train-state structure, upscale via CLI."""

import jax
import jax.numpy as jnp
import numpy as np

from superresolution_tpu.models import ESPCN
from superresolution_tpu.train.checkpoint import (
    CheckpointManager,
    load_params_for_inference,
)
from superresolution_tpu.train.state import create_train_state, make_optimizer
from superresolution_tpu.utils.config import TrainConfig


def _make_ckpt(tmp_path, ema=False, f1=4, f2=4):
    model = ESPCN(scale=2, f1=f1, f2=f2)
    tx, _ = make_optimizer(TrainConfig(), 10)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4, 4, 1)))
    state = create_train_state(params, tx, ema=ema)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(state, 1, psnr=1.0)
    return model, params, mgr


def test_load_params_from_manager_dir(tmp_path):
    model, params, mgr = _make_ckpt(tmp_path)
    loaded = load_params_for_inference(str(tmp_path / "ck"))
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out = model.apply(loaded, jnp.ones((1, 8, 8, 1)))
    assert out.shape == (1, 16, 16, 1)


def test_load_params_from_finalized_dir(tmp_path):
    model, params, mgr = _make_ckpt(tmp_path)
    final = mgr.finalize(str(tmp_path / "final"))
    loaded = load_params_for_inference(final)
    out = model.apply(loaded, jnp.ones((1, 8, 8, 1)))
    assert np.isfinite(np.asarray(out)).all()


def test_load_params_relative_path(tmp_path, monkeypatch):
    # orbax rejects relative paths; the loader must absolutize them
    # (a relative --ckpt crashed the CLI before round 5)
    model, params, mgr = _make_ckpt(tmp_path)
    monkeypatch.chdir(tmp_path)
    loaded = load_params_for_inference("ck")
    out = model.apply(loaded, jnp.ones((1, 8, 8, 1)))
    assert out.shape == (1, 16, 16, 1)


def test_ema_preferred(tmp_path):
    model, params, mgr = _make_ckpt(tmp_path, ema=True)
    loaded = load_params_for_inference(str(tmp_path / "ck"))
    # ema initialized to fp32 copy of params
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_upscale_cli_with_ckpt(tmp_path, capsys, rng):
    from superresolution_tpu.cli.main import main
    from superresolution_tpu.data.io import save_png

    # the CLI builds the model at default sizes; checkpoint must match
    model, params, mgr = _make_ckpt(tmp_path, f1=64, f2=32)
    src = str(tmp_path / "in.png")
    save_png(rng.random((12, 12), dtype=np.float32), src)
    dst = str(tmp_path / "out.png")
    main(["upscale", "--input", src, "--output", dst, "--scale", "2",
          "--model", "espcn", "--tile", "8", "--halo", "4",
          "--ckpt", str(tmp_path / "ck")])
    import os

    assert os.path.exists(dst)
