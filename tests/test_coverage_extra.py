"""Extra coverage: QC overlay (ETL step 2), every preset constructs a
Trainer, finalize probe, FSRCNN/discriminator presets."""

import dataclasses
import os

import numpy as np
import pytest

from superresolution_tpu.astro import TanWCS, reproject_bilinear, write_fits
from superresolution_tpu.astro.pipeline import qc_overlay
from superresolution_tpu.train.checkpoint import CheckpointManager, params_probe
from superresolution_tpu.train.trainer import Trainer
from superresolution_tpu.utils.config import MeshConfig, presets


def test_qc_overlay_writes_png(tmp_path, rng):
    wcs = TanWCS(crval=(150.0, 2.0), crpix=(32.5, 32.5),
                 cd=((-3e-5, 0.0), (0.0, 3e-5)))
    master = rng.random((64, 64)).astype(np.float32)
    files = []
    for i in range(3):
        p = str(tmp_path / f"obs{i}.fits")
        write_fits(p, master + 0.01 * i, wcs.to_header())
        files.append(p)
    hub = str(tmp_path / "hub.fits")
    write_fits(hub, master, wcs.to_header())
    out = qc_overlay([hub], files, str(tmp_path / "qc.png"))
    assert os.path.exists(out)


@pytest.mark.parametrize("name", sorted(presets))
def test_every_preset_constructs_trainer(tmp_path, name):
    cfg = presets[name]
    small = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            kwargs={**cfg.model.kwargs,
                    **({"num_blocks": 1} if "num_blocks" in cfg.model.kwargs
                       or cfg.model.name in ("rrdbnet", "edsr") else {})},
            refiner_kwargs={**cfg.model.refiner_kwargs,
                            **({"embed_dim": 12, "depths": (2,),
                                "num_heads": (2,)}
                               if cfg.model.refiner else {})},
        ),
        data=dataclasses.replace(cfg.data, synthetic_len=2,
                                 hr_patch=32 if not cfg.model.refiner else 32,
                                 batch_size=2, train_manifest=None),
        train=dataclasses.replace(cfg.train, epochs=1, resume=False,
                                  precision="fp32"),
        mesh=MeshConfig(data=1, spatial=1),
    )
    tr = Trainer(small, workdir=str(tmp_path / name))
    assert tr.batch_size >= 1


def test_params_probe(tmp_path):
    import jax
    import jax.numpy as jnp

    from superresolution_tpu.models import ESPCN
    from superresolution_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )
    from superresolution_tpu.utils.config import TrainConfig

    model = ESPCN(scale=2, f1=4, f2=4)
    tx, _ = make_optimizer(TrainConfig(), 10)
    state = create_train_state(
        model.init(jax.random.key(0), jnp.zeros((1, 4, 4, 1))), tx)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(state, 1, psnr=1.0)
    out = mgr.finalize(str(tmp_path / "final"),
                       probe=params_probe("params/params/Conv_0/Conv_0"))
    assert os.path.isdir(out)
    with pytest.raises(KeyError):
        mgr.finalize(str(tmp_path / "final2"),
                     probe=params_probe("params/params/NoSuchLayer"))
