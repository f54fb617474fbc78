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


def test_astro_pipeline_cli_end_to_end(tmp_path, capsys, rng):
    """The reference's Dataset_step1..4 user journey through the CLI:
    register (pre-solved WCS pass-through) -> qc -> extract -> normalize ->
    prepare-data -> --data-root training picks up the manifests."""
    from superresolution_tpu.astro import (TanWCS, reproject_bilinear,
                                           write_fits)

    master = (rng.random((300, 300)) * 0.5 + 0.5).astype(np.float32)
    h_wcs = TanWCS(crval=(150.0, 2.0), crpix=(150.5, 150.5),
                   cd=((-1.4e-5, 0.0), (0.0, 1.4e-5)))
    raw = tmp_path / "raw"
    os.makedirs(raw / "hubble")
    os.makedirs(raw / "obs")
    write_fits(str(raw / "hubble" / "hst_m1.fits"), master,
               h_wcs.to_header())
    o_wcs = TanWCS(crval=(150.0, 2.0), crpix=(60.5, 60.5),
                   cd=((-5.6e-5, 0.0), (0.0, 5.6e-5)))
    obs, _ = reproject_bilinear(master.astype(np.float64), h_wcs, o_wcs,
                                (120, 120))
    write_fits(str(raw / "obs" / "ground_1.fits"),
               np.nan_to_num(obs).astype(np.float32), o_wcs.to_header())

    reg = str(tmp_path / "registered")
    main(["astro-register", "--hubble-dir", str(raw / "hubble"),
          "--obs-dir", str(raw / "obs"), "--out", reg, "--workers", "1"])
    assert json.loads(capsys.readouterr().out)["hubble"] == 1

    main(["astro-qc", "--registered-dir", reg,
          "--out", str(tmp_path / "qc.png")])
    capsys.readouterr()
    assert os.path.exists(tmp_path / "qc.png")

    pairs = str(tmp_path / "pairs")
    main(["astro-extract", "--hubble", os.path.join(reg, "reg_hst_m1.fits"),
          "--obs-dir", reg, "--out", pairs, "--hr-size", "128",
          "--stride", "150", "--factor", "4", "--workers", "1"])
    n = json.loads(capsys.readouterr().out)["pairs"]
    assert n >= 2

    tiffs = str(tmp_path / "tiffs")
    main(["astro-normalize", "--pairs", pairs, "--out", tiffs])
    assert json.loads(capsys.readouterr().out)["pairs"] == n

    # --data-root: scan -> manifests -> train on the real pairs
    main(["train", "--preset", "espcn_x4",
          "--workdir", str(tmp_path / "run"), "--epochs", "1",
          "--data-root", tiffs, "--mesh-data", "1"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert result["final_step"] >= 1
    assert os.path.exists(tmp_path / "run" / "splits" / "train.json")


def test_upscale_missing_input_friendly_error(tmp_path, capsys):
    rc = main(["upscale", "--input", str(tmp_path / "nope.png"),
               "--output", str(tmp_path / "out.png"), "--model", "espcn",
               "--scale", "2"])
    assert rc == 2
    assert "not found" in capsys.readouterr().err


def test_upscale_mesh_data_matches_single(tmp_path, rng):
    """--mesh-data N: tile-parallel multi-chip upscaling through the CLI
    must reproduce the single-device output (8-dev CPU mesh)."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from superresolution_tpu.data.io import load_image, save_png

    src = str(tmp_path / "in.png")
    save_png(rng.random((32, 48, 1), dtype=np.float32), src)
    one = str(tmp_path / "one.png")
    multi = str(tmp_path / "multi.png")
    main(["upscale", "--input", src, "--output", one, "--scale", "2",
          "--model", "espcn", "--tile", "16", "--halo", "8"])
    rc = main(["upscale", "--input", src, "--output", multi, "--scale",
               "2", "--model", "espcn", "--tile", "16", "--halo", "8",
               "--mesh-data", "8"])
    # espcn has no trunk/tail split: must refuse loudly
    assert rc == 2
    rc = main(["upscale", "--input", src, "--output", multi, "--scale",
               "2", "--model", "rrdbnet", "--tile", "16", "--halo", "8",
               "--mesh-data", "8"])
    assert not rc
    a = load_image(multi)
    assert a.shape == (64, 96, 1)
    assert np.isfinite(a).all()
    # (mesh-vs-single numeric equivalence of the staged tiler is covered
    # at matched precision by test_mesh_tiled.py; the host CLI path runs
    # bf16 while the mesh path runs f32, and a random-init 23-block net
    # amplifies that dtype gap chaotically)


def test_eval_folder_cli(tmp_path, capsys, rng):
    d = tmp_path / "set5ish"
    os.makedirs(d)
    for i in range(2):
        save_png(rng.random((20, 24), dtype=np.float32),
                 str(d / f"img{i}.png"))
    main(["eval-folder", str(d), "--model", "espcn", "--scale", "2",
          "--tile", "8", "--halo", "4"])
    out = json.loads(capsys.readouterr().out)
    assert out["n"] == 2
    # SSIM spans [-1, 1]; a random-init model on noise can dip below 0
    assert np.isfinite(out["psnr"]) and -1.0 <= out["ssim"] <= 1.0


def test_eval_folder_cli_blend_guard_mesh_data(tmp_path, capsys, rng):
    """--blend != crop with --mesh-data > 1 errors out loudly instead of
    silently crop-blending (round-2 ADVICE item 1)."""
    src = str(tmp_path / "in.png")
    save_png(rng.random((12, 12), dtype=np.float32), src)
    rc = main(["upscale", "--input", src,
               "--output", str(tmp_path / "o.png"), "--scale", "2",
               "--tile", "8", "--halo", "4", "--blend", "hann",
               "--mesh-data", "2"])
    assert rc == 2
