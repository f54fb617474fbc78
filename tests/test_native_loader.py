"""Native C++ TIFF decoder: build, parity with PIL, batch threading."""

import numpy as np
import pytest

from superresolution_tpu.data.io import load_image, save_tiff16
from superresolution_tpu.data.native_io import (
    decode_batch,
    decode_tiff,
    get_lib,
)

needs_native = pytest.mark.skipif(get_lib() is None,
                                  reason="native loader unavailable")


@needs_native
def test_native_decode_matches_pil(tmp_path, rng):
    x = rng.random((24, 17), dtype=np.float32)
    p = str(tmp_path / "img.tiff")
    save_tiff16(x, p)
    pil = load_image(p)
    nat = decode_tiff(p)
    assert nat is not None
    assert nat.shape == pil.shape == (24, 17, 1)
    np.testing.assert_allclose(nat, pil, atol=1e-7)


@needs_native
def test_native_batch_decode(tmp_path, rng):
    paths = []
    imgs = []
    for i in range(8):
        x = rng.random((16, 16), dtype=np.float32)
        p = str(tmp_path / f"img{i}.tiff")
        save_tiff16(x, p)
        paths.append(p)
        imgs.append(load_image(p))
    batch = decode_batch(paths, (16, 16), num_threads=4)
    assert batch is not None and batch.shape == (8, 16, 16, 1)
    np.testing.assert_allclose(batch, np.stack(imgs), atol=1e-7)


@needs_native
def test_native_decode_bad_file_returns_none(tmp_path):
    p = str(tmp_path / "bad.tiff")
    with open(p, "wb") as f:
        f.write(b"not a tiff at all")
    assert decode_tiff(p) is None
