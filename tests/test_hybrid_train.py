"""End-to-end training of a scaled-down reference hybrid (RRDB -> HAT-lite
two-stage with star-weighted loss) — the astro workload wired through the
Trainer, including the refiner/output_size path."""

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


def test_tiny_hybrid_astro_trains(tmp_path):
    cfg = Config(
        name="hybrid_tiny",
        model=ModelConfig(
            name="rrdbnet", scale=2, in_channels=1, out_channels=1,
            kwargs={"features": 16, "num_blocks": 1, "growth": 8},
            refiner="hat_lite",
            refiner_kwargs={"scale": 2, "embed_dim": 16, "depths": (2,),
                            "num_heads": (2,), "window_size": 8},
            smoothing="balanced",
        ),
        data=DataConfig(hr_patch=32, batch_size=2, synthetic_len=2,
                        degradation="bicubic", augment=False),
        loss=LossConfig(terms={"star_l1": 1.0}),
        train=TrainConfig(epochs=2, lr=1e-3, eval_every=1,
                          preview_every=2, precision="fp32", resume=False),
        mesh=MeshConfig(data=1, spatial=1),
    )
    tr = Trainer(cfg, workdir=str(tmp_path))
    assert tr.scale == 4  # 2 (rrdb) x 2 (hat)
    out = tr.fit()
    assert np.isfinite(out["best"]["psnr"])
    # preview strip written (reference Modello_supporto preview contract)
    import os
    previews = os.listdir(os.path.join(str(tmp_path), "previews"))
    assert previews
