"""CLI smoke tests (in-process, CPU)."""

import json
import os

import numpy as np

from superresolution_tpu.cli.main import main
from superresolution_tpu.data.io import save_png, save_tiff16


def test_presets_listing(capsys):
    main(["presets"])
    out = capsys.readouterr().out
    assert "srcnn_x2" in out and "esrgan_gan" in out


def test_prepare_data_cli(tmp_path, capsys, rng):
    for i in range(3):
        d = tmp_path / "pairs" / f"pair_{i:06d}"
        os.makedirs(d)
        save_tiff16(rng.random((16, 16), dtype=np.float32),
                    str(d / "hubble.tiff"))
        save_tiff16(rng.random((4, 4), dtype=np.float32),
                    str(d / "observatory.tiff"))
    main(["prepare-data", "--root", str(tmp_path / "pairs"),
          "--out", str(tmp_path / "splits"), "--mode", "overfit"])
    out = json.loads(capsys.readouterr().out)
    assert os.path.exists(out["train"])


def test_upscale_cli(tmp_path, capsys, rng):
    src = str(tmp_path / "in.png")
    dst = str(tmp_path / "out.png")
    save_png(rng.random((12, 12), dtype=np.float32), src)
    main(["upscale", "--input", src, "--output", dst, "--scale", "2",
          "--model", "espcn", "--tile", "8", "--halo", "4"])
    assert os.path.exists(dst)
    from superresolution_tpu.data.io import load_image

    assert load_image(dst).shape == (24, 24, 1)


def test_train_cli_tiny(tmp_path, capsys):
    main(["train", "--preset", "srcnn_x2", "--workdir", str(tmp_path),
          "--epochs", "1", "--batch-size", "2", "--mesh-data", "1"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert result["epochs"] == 1
