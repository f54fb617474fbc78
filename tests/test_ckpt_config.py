"""Model config persisted in checkpoints: CLI upscale rebuilds the exact
trained architecture from --ckpt alone."""

import dataclasses
import os

import numpy as np

from superresolution_tpu.cli.main import main
from superresolution_tpu.data.io import load_image, save_png
from superresolution_tpu.train.checkpoint import load_params_for_inference
from superresolution_tpu.train.trainer import Trainer
from superresolution_tpu.utils.config import (
    Config,
    DataConfig,
    LossConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)


def test_trainer_ckpt_carries_model_config_and_cli_upscales(tmp_path, rng):
    cfg = Config(
        name="cfgtest",
        model=ModelConfig(name="espcn", scale=2, in_channels=1,
                          out_channels=1, kwargs={"f1": 8, "f2": 8}),
        data=DataConfig(hr_patch=32, batch_size=2, synthetic_len=2,
                        degradation="bicubic", augment=False),
        loss=LossConfig(terms={"l1": 1.0}),
        train=TrainConfig(epochs=1, eval_every=1, preview_every=100,
                          precision="fp32", resume=False),
        mesh=MeshConfig(data=1, spatial=1),
    )
    tr = Trainer(cfg, workdir=str(tmp_path / "run"))
    tr.fit()
    ck = os.path.join(str(tmp_path / "run"), "checkpoints")
    params, mc = load_params_for_inference(ck, with_config=True)
    assert mc["name"] == "espcn" and mc["kwargs"]["f1"] == 8

    src = str(tmp_path / "in.png")
    save_png(rng.random((12, 12), dtype=np.float32), src)
    dst = str(tmp_path / "out.png")
    # note: NON-default f1/f2 — only works because the config travels with
    # the checkpoint
    main(["upscale", "--input", src, "--output", dst,
          "--tile", "8", "--halo", "4", "--ckpt", ck])
    assert load_image(dst).shape == (24, 24, 1)

    # finalized dir carries the config too
    final = tr.finalize()
    params2, mc2 = load_params_for_inference(final, with_config=True)
    assert mc2 == mc
