"""Data pipeline: IO round-trips, manifests, augmentation, loader."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from superresolution_tpu.data import (
    Loader,
    PairedDataset,
    SyntheticHRDataset,
    load_image,
    make_synthetic_image,
    paired_augment,
    prepare_splits,
    save_png,
    save_tiff16,
)
from superresolution_tpu.data.manifest import load_manifest, scan_pairs


def test_tiff16_roundtrip(tmp_path, rng):
    x = rng.random((16, 16), dtype=np.float32)
    p = str(tmp_path / "img.tiff")
    save_tiff16(x, p)
    back = load_image(p)
    assert back.shape == (16, 16, 1)
    assert np.abs(back[..., 0] - x).max() < 1.0 / 65535.0 + 1e-6


def test_png_roundtrip_rgb(tmp_path, rng):
    x = rng.random((8, 8, 3), dtype=np.float32)
    p = str(tmp_path / "img.png")
    save_png(x, p)
    back = load_image(p)
    assert back.shape == (8, 8, 3)
    assert np.abs(back - x).max() < 1.0 / 255.0 + 1e-6


def _make_pairs(tmp_path, n=5, lr=8, hr=32):
    rng = np.random.default_rng(0)
    root = tmp_path / "pairs"
    for i in range(n):
        d = root / f"pair_{i:06d}"
        os.makedirs(d)
        save_tiff16(rng.random((hr, hr), dtype=np.float32),
                    str(d / "hubble.tiff"))
        save_tiff16(rng.random((lr, lr), dtype=np.float32),
                    str(d / "observatory.tiff"))
    return str(root)


def test_scan_and_split(tmp_path):
    root = _make_pairs(tmp_path)
    assert len(scan_pairs(root)) == 5
    paths = prepare_splits(root, str(tmp_path / "splits"), mode="split",
                           val_frac=0.2, seed=42)
    train = load_manifest(paths["train"])
    val = load_manifest(paths["val"])
    assert len(train) == 4 and len(val) == 1
    # test == val (reference Backup/scripts/Modello_2.py behavior)
    assert load_manifest(paths["test"]) == val


def test_overfit_split_mode(tmp_path):
    root = _make_pairs(tmp_path)
    paths = prepare_splits(root, str(tmp_path / "s2"), mode="overfit")
    for k in ("train", "val", "test"):
        assert len(load_manifest(paths[k])) == 1


def test_paired_dataset_and_black_fallback(tmp_path):
    root = _make_pairs(tmp_path)
    paths = prepare_splits(root, str(tmp_path / "s3"), mode="split")
    ds = PairedDataset(paths["train"])
    item = ds[0]
    assert item["hr"].shape == (32, 32, 1)
    assert item["lr"].shape == (8, 8, 1)
    # corrupt manifest entry -> black tensor fallback (src/dataset.py:45-48)
    bad = [{"patch_id": "x", "hubble_path": "/nope.tiff",
            "ground_path": "/nope.tiff"}]
    mpath = str(tmp_path / "bad.json")
    with open(mpath, "w") as f:
        json.dump(bad, f)
    ds2 = PairedDataset(mpath, lr_size=8, hr_size=32)
    item = ds2[0]
    assert item["lr"].sum() == 0 and item["lr"].shape == (8, 8, 1)


def test_synthetic_starfield_star_fraction():
    img = make_synthetic_image(0, 128, channels=1)
    frac = (img > 0.02).mean()
    assert 0.0 < frac < 0.5  # sparse stars, mostly dark sky
    img2 = make_synthetic_image(0, 128, channels=1)
    np.testing.assert_array_equal(img, img2)  # deterministic


def test_synthetic_rgb():
    img = make_synthetic_image(3, 64, channels=3)
    assert img.shape == (64, 64, 3)
    assert img.std() > 0.01


def test_loader_batching_and_shuffle():
    ds = SyntheticHRDataset(10, 16, 1)
    loader = Loader(ds, 4, shuffle=True, seed=0, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    assert batches[0]["hr"].shape == (4, 16, 16, 1)
    loader.set_epoch(1)
    b2 = list(loader)
    assert not np.array_equal(batches[0]["hr"], b2[0]["hr"])


def test_paired_augment_consistency(rng):
    lr = jnp.asarray(rng.random((8, 8, 1), dtype=np.float32))
    hr = jnp.asarray(np.kron(np.asarray(lr[..., 0]),
                             np.ones((4, 4)))[..., None].astype(np.float32))
    la, ha = paired_augment(jax.random.key(3), lr, hr)
    # the same geometric transform must apply to both: upscaling the
    # augmented LR by nearest must equal the augmented HR
    up = np.kron(np.asarray(la[..., 0]), np.ones((4, 4)))
    np.testing.assert_allclose(up, np.asarray(ha[..., 0]), atol=1e-6)


def test_paired_augment_covers_orientations():
    lr = jnp.arange(16, dtype=jnp.float32).reshape(4, 4, 1)
    seen = set()
    for i in range(40):
        la, _ = paired_augment(jax.random.key(i), lr, lr)
        seen.add(tuple(np.asarray(la).ravel().tolist()))
    assert len(seen) == 8  # full dihedral group


def test_black_fallback_matches_real_item_shapes(tmp_path):
    """A corrupt file mid-dataset must fall back to tensors shaped like
    the REAL items (any size/channels), or the loader's np.stack dies."""
    root = _make_pairs(tmp_path)  # 32x32 hr / 8x8 lr pairs
    paths = prepare_splits(root, str(tmp_path / "s4"), mode="split")
    ds = PairedDataset(paths["train"])
    good = ds[0]
    ds.entries.append({"patch_id": "bad", "hubble_path": "/nope.tiff",
                       "ground_path": "/nope.tiff"})
    bad = ds[len(ds) - 1]
    assert bad["hr"].shape == good["hr"].shape
    assert bad["lr"].shape == good["lr"].shape
    assert bad["hr"].sum() == 0
