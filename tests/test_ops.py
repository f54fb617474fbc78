"""Ops layer: golden/parity tests against torch-CPU reference semantics."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from superresolution_tpu.ops import (
    anti_checkerboard,
    binomial_kernel,
    depth_to_space,
    depthwise_blur,
    jpeg_compress,
    resize_bicubic,
    resize_nearest,
    space_to_depth,
    degrade_bicubic,
)


def test_depth_to_space_matches_torch_pixel_shuffle(rng):
    x = rng.standard_normal((2, 4, 5, 3 * 9), dtype=np.float32)  # NHWC, r=3
    ours = np.asarray(depth_to_space(jnp.asarray(x), 3))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    theirs = F.pixel_shuffle(xt, 3).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)


def test_space_to_depth_roundtrip(rng):
    x = rng.standard_normal((1, 6, 8, 4), dtype=np.float32)
    y = space_to_depth(jnp.asarray(x), 2)
    back = np.asarray(depth_to_space(y, 2))
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("mode,size,norm", [
    ("light", 3, 16.0), ("balanced", 5, 256.0), ("strong", 7, 1600.0)])
def test_anti_checkerboard_matches_reference_conv(rng, mode, size, norm):
    # Reference semantics: depthwise conv2d with zero SAME padding
    # (reference src/architecture.py:9-27).
    x = rng.random((2, 16, 16, 3), dtype=np.float32)
    ours = np.asarray(anti_checkerboard(jnp.asarray(x), mode))
    k = torch.from_numpy(binomial_kernel(size, norm))[None, None]
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    theirs = F.conv2d(xt, k.expand(3, -1, -1, -1), padding=size // 2, groups=3)
    np.testing.assert_allclose(
        ours, theirs.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5)


def test_binomial_kernel_default_normalizes_to_one():
    assert abs(binomial_kernel(5).sum() - 1.0) < 1e-6
    # reference 'strong' deliberately over-unity: sum 4096/1600
    assert abs(binomial_kernel(7, 1600.0).sum() - 4096.0 / 1600.0) < 1e-5


def test_resize_bicubic_matches_torch_interpolate(rng):
    # a=-0.75, no antialias == F.interpolate(mode='bicubic',
    # align_corners=False) — the reference's resize path
    # (src/architecture.py:81).
    x = rng.random((2, 17, 23, 3), dtype=np.float32)
    ours = np.asarray(resize_bicubic(jnp.asarray(x), (34, 46), a=-0.75,
                                     antialias=False))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    theirs = F.interpolate(xt, size=(34, 46), mode="bicubic",
                           align_corners=False)
    np.testing.assert_allclose(
        ours, theirs.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5)


def test_resize_bicubic_downscale_matches_torch_antialias(rng):
    # torch antialias=True bicubic uses a=-0.5 with border renormalization
    # (the PIL convention).
    x = rng.random((1, 32, 32, 1), dtype=np.float32)
    ours = np.asarray(resize_bicubic(jnp.asarray(x), (8, 8), a=-0.5,
                                     antialias=True, border="renorm"))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    theirs = F.interpolate(xt, size=(8, 8), mode="bicubic",
                           align_corners=False, antialias=True)
    np.testing.assert_allclose(
        ours, theirs.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=2e-4)


def test_degrade_bicubic_matches_pil(rng):
    # degrade_bicubic follows the MATLAB/PIL convention (a=-0.5, antialias) —
    # the standard-SR degradation operator for Set5/Set14/DIV2K.
    from PIL import Image

    x = (rng.random((32, 32), dtype=np.float32) * 255).astype(np.uint8)
    ours = np.asarray(
        degrade_bicubic(jnp.asarray(x[..., None], dtype=jnp.float32) / 255.0, 4)
    )[..., 0]
    pil = np.asarray(
        Image.fromarray(x).resize((8, 8), Image.BICUBIC), dtype=np.float32
    ) / 255.0
    # PIL quantizes to uint8, so tolerance is ~1/255
    assert np.abs(ours - pil).max() < 2.5 / 255.0


def test_resize_identity_is_noop(rng):
    x = rng.random((1, 8, 8, 1), dtype=np.float32)
    np.testing.assert_array_equal(
        np.asarray(resize_bicubic(jnp.asarray(x), (8, 8))), x)


def test_resize_nearest_matches_torch(rng):
    x = rng.random((1, 7, 9, 2), dtype=np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), (21, 27)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    theirs = F.interpolate(xt, size=(21, 27), mode="nearest")
    np.testing.assert_array_equal(ours, theirs.permute(0, 2, 3, 1).numpy())


def test_depthwise_blur_valid_padding(rng):
    x = rng.random((1, 12, 12, 1), dtype=np.float32)
    out = depthwise_blur(jnp.asarray(x), binomial_kernel(5), padding="VALID")
    assert out.shape == (1, 8, 8, 1)


def test_jpeg_quality100_is_near_lossless(rng):
    x = rng.random((16, 16, 1), dtype=np.float32)
    out = np.asarray(jpeg_compress(jnp.asarray(x), jnp.float32(100.0)))
    # q=100 -> all-ones quant table; only rounding to integer DCT coefs
    assert np.abs(out - x).max() < 0.02


def test_jpeg_low_quality_destroys_detail(rng):
    x = rng.random((32, 32, 1), dtype=np.float32)
    hi = np.asarray(jpeg_compress(jnp.asarray(x), jnp.float32(95.0)))
    lo = np.asarray(jpeg_compress(jnp.asarray(x), jnp.float32(5.0)))
    assert np.abs(lo - x).mean() > np.abs(hi - x).mean()
