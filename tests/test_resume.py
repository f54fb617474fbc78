"""Trainer resume: a new Trainer on the same workdir continues from the
saved step instead of restarting (the capability the reference lacks —
SURVEY.md section 5 'Checkpoint / resume')."""

import dataclasses

import numpy as np

from superresolution_tpu.train.trainer import Trainer
from superresolution_tpu.utils.config import (
    Config,
    DataConfig,
    LossConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)


def _cfg(epochs, resume):
    return Config(
        name="resume_test",
        model=ModelConfig(name="espcn", scale=2, in_channels=1,
                          out_channels=1, kwargs={"f1": 8, "f2": 8}),
        data=DataConfig(hr_patch=32, batch_size=2, synthetic_len=4,
                        degradation="bicubic", augment=False),
        loss=LossConfig(terms={"l1": 1.0}),
        train=TrainConfig(epochs=epochs, lr=1e-3, eval_every=1,
                          preview_every=100, precision="fp32",
                          resume=resume, seed=11),
        mesh=MeshConfig(data=1, spatial=1),
    )


def test_trainer_resumes_from_checkpoint(tmp_path):
    wd = str(tmp_path)
    tr1 = Trainer(_cfg(epochs=2, resume=False), workdir=wd)
    tr1.fit()
    steps_done = int(tr1.state.step)
    assert steps_done == 2 * tr1.steps_per_epoch

    # second trainer with a larger epoch budget picks up where we left off
    tr2 = Trainer(_cfg(epochs=4, resume=True), workdir=wd)
    assert tr2.start_epoch == 2
    assert int(tr2.state.step) == steps_done
    p1 = np.concatenate([np.asarray(l).ravel() for l in
                         __import__("jax").tree.leaves(tr1.state.params)])
    p2 = np.concatenate([np.asarray(l).ravel() for l in
                         __import__("jax").tree.leaves(tr2.state.params)])
    np.testing.assert_array_equal(p1, p2)

    out = tr2.fit()
    assert int(tr2.state.step) == 4 * tr2.steps_per_epoch
    assert np.isfinite(out["best"]["psnr"])


def test_resume_false_starts_fresh(tmp_path):
    wd = str(tmp_path)
    tr1 = Trainer(_cfg(epochs=1, resume=False), workdir=wd)
    tr1.fit()
    tr2 = Trainer(_cfg(epochs=1, resume=False), workdir=wd)
    assert tr2.start_epoch == 0
    assert int(tr2.state.step) == 0


def test_restore_falls_back_past_interrupted_save(tmp_path, rng):
    """A crash mid-async-save leaves an orbax tmp dir and a meta.json whose
    last_step never committed; restore must fall back to the newest
    COMMITTED step instead of returning None/failing."""
    import json
    import os

    import jax
    import jax.numpy as jnp

    from superresolution_tpu.models import ESPCN
    from superresolution_tpu.train.checkpoint import CheckpointManager
    from superresolution_tpu.train.state import (create_train_state,
                                                 make_optimizer)

    def _tiny_state():
        model = ESPCN(scale=2, in_channels=1, out_channels=1, f1=8, f2=8)
        tx, _ = make_optimizer(TrainConfig(lr=1e-3), 10)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 1)))
        return create_train_state(params, tx)

    state = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=3)
    mgr.save(state, 1, psnr=10.0, block=True)

    # simulate the interrupted step-2 save: uncommitted tmp dir + meta
    os.makedirs(tmp_path / "ck" / "step_0000000002.orbax-checkpoint-tmp-9")
    meta_path = tmp_path / "ck" / "meta.json"
    meta = json.loads(meta_path.read_text())
    meta["last_step"] = 2
    meta_path.write_text(json.dumps(meta))

    fresh = CheckpointManager(str(tmp_path / "ck"), keep=3)
    assert fresh.all_steps() == [1]  # tmp dir not counted
    restored = fresh.restore(_tiny_state())
    assert restored is not None
    assert int(restored.step) == int(state.step)
