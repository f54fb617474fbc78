"""Test harness (run_test) and profiling utilities."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_tpu.infer.evaluate import run_test
from superresolution_tpu.train.trainer import Trainer
from superresolution_tpu.utils.config import (
    Config,
    DataConfig,
    LossConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
from superresolution_tpu.utils.profiling import StepTimer, finite_check


def _tiny_trainer(tmp_path, channels=1):
    cfg = Config(
        name="eval_test",
        model=ModelConfig(name="espcn", scale=2, in_channels=channels,
                          out_channels=channels, kwargs={"f1": 8, "f2": 8}),
        data=DataConfig(hr_patch=32, batch_size=2, synthetic_len=4,
                        degradation="bicubic", augment=False),
        loss=LossConfig(terms={"l1": 1.0}),
        train=TrainConfig(epochs=1, eval_every=1, preview_every=100,
                          precision="fp32", resume=False),
        mesh=MeshConfig(data=1, spatial=1),
    )
    return Trainer(cfg, workdir=str(tmp_path))


def test_run_test_writes_outputs(tmp_path):
    tr = _tiny_trainer(tmp_path)
    result = run_test(tr, labeled=True)
    assert np.isfinite(result["psnr"]) and 0 <= result["ssim"] <= 1
    out = os.path.join(str(tmp_path), "test_results")
    files = os.listdir(out)
    # 16-bit TIFF per image (1-channel), labeled comparison strips, metrics
    assert any(f.startswith("result_") and f.endswith(".tiff")
               for f in files)
    assert any(f.startswith("comparison_") for f in files)
    assert "metrics.txt" in files
    from superresolution_tpu.data.io import load_image

    tiff = sorted(f for f in files if f.endswith(".tiff"))[0]
    img = load_image(os.path.join(out, tiff))
    assert img.shape == (32, 32, 1)


def test_run_test_rgb_writes_png(tmp_path):
    tr = _tiny_trainer(tmp_path, channels=3)
    run_test(tr, labeled=False)
    files = os.listdir(os.path.join(str(tmp_path), "test_results"))
    assert any(f.startswith("result_") and f.endswith(".png") for f in files)


def test_step_timer():
    t = StepTimer(warmup=1)
    import time

    for _ in range(4):
        t.tick()
        time.sleep(0.01)
        t.tock()
    assert 0.005 < t.mean < 0.2
    assert t.throughput(10.0) > 0


def test_finite_check():
    finite_check({"a": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError):
        finite_check({"a": jnp.asarray([1.0, float("nan")])}, "bad")
