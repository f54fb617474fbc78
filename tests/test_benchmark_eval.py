"""Y-channel benchmark metrics: BT.601 conversion, shaving, folder eval."""

import jax.numpy as jnp
import numpy as np

from superresolution_tpu.data.io import save_png
from superresolution_tpu.metrics.benchmark_eval import (
    evaluate_folder,
    rgb_to_y,
    shave,
    sr_metrics,
)


def test_rgb_to_y_range_and_values():
    white = jnp.ones((1, 2, 2, 3))
    y = rgb_to_y(white)
    # BT.601 digital white: (16 + 219)/255
    np.testing.assert_allclose(np.asarray(y), 235.0 / 255.0, atol=1e-4)
    black = jnp.zeros((1, 2, 2, 3))
    np.testing.assert_allclose(np.asarray(rgb_to_y(black)), 16.0 / 255.0,
                               atol=1e-6)


def test_shave():
    x = jnp.ones((1, 10, 12, 1))
    assert shave(x, 2).shape == (1, 6, 8, 1)
    assert shave(x, 0).shape == x.shape


def test_sr_metrics_identical_is_high(rng):
    img = jnp.asarray(rng.random((24, 24, 3), dtype=np.float32))
    m = sr_metrics(img, img, scale=4)
    assert m["psnr"] > 60.0
    assert m["ssim"] > 0.999


def test_evaluate_folder_bicubic_baseline(tmp_path, rng):
    """Bicubic upscaling of smooth images should give a sane PSNR."""
    from superresolution_tpu.ops.resize import resize_bicubic

    for i in range(2):
        # smooth gradients: bicubic does well on them
        yy, xx = np.mgrid[0:32, 0:32] / 32.0
        img = np.stack([yy, xx, (yy + xx) / 2], -1).astype(np.float32)
        save_png(img, str(tmp_path / f"img{i}.png"))

    def upscale_fn(lr):
        h, w = lr.shape[0] * 2, lr.shape[1] * 2
        return np.asarray(resize_bicubic(jnp.asarray(lr), (h, w)))

    out = evaluate_folder(upscale_fn, str(tmp_path), scale=2)
    assert out["n"] == 2
    assert out["psnr"] > 30.0
