"""Metric parity against the reference torch implementation, re-expressed
with torch-CPU (reference: src/metrics.py)."""

import math

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from superresolution_tpu.metrics import Metrics, psnr, ssim_reference


def _torch_ssim(img1, img2, window_size=11):
    # verbatim semantics of reference src/metrics.py:5-19
    c = img1.size(1)
    gauss = torch.Tensor([
        math.exp(-((x - window_size // 2) ** 2) / float(2 * 1.5**2))
        for x in range(window_size)])
    win = ((gauss / gauss.sum()).unsqueeze(1)
           .mm((gauss / gauss.sum()).unsqueeze(0))
           .unsqueeze(0).unsqueeze(0)
           .expand(c, 1, window_size, window_size).type_as(img1))
    mu1, mu2 = F.conv2d(img1, win, groups=c), F.conv2d(img2, win, groups=c)
    s1 = F.conv2d(img1 * img1, win, groups=c) - mu1.pow(2)
    s2 = F.conv2d(img2 * img2, win, groups=c) - mu2.pow(2)
    s12 = F.conv2d(img1 * img2, win, groups=c) - mu1 * mu2
    return (((2 * mu1 * mu2 + 0.01**2) * (2 * s12 + 0.03**2)) /
            ((mu1.pow(2) + mu2.pow(2) + 0.01**2) * (s1 + s2 + 0.03**2))).mean()


def test_ssim_matches_reference(rng):
    a = rng.random((2, 24, 24, 1), dtype=np.float32)
    b = np.clip(a + 0.05 * rng.standard_normal(a.shape, dtype=np.float32), 0, 1)
    ours = float(ssim_reference(jnp.asarray(a), jnp.asarray(b)))
    at = torch.from_numpy(a).permute(0, 3, 1, 2)
    bt = torch.from_numpy(b).permute(0, 3, 1, 2)
    theirs = float(_torch_ssim(at, bt))
    assert abs(ours - theirs) < 1e-4


def test_ssim_identical_images_is_one(rng):
    a = rng.random((1, 16, 16, 1), dtype=np.float32)
    assert abs(float(ssim_reference(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-4


def test_psnr_matches_reference(rng):
    a = rng.random((3, 16, 16, 1), dtype=np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape, dtype=np.float32), 0, 1)
    ours = np.asarray(psnr(jnp.asarray(a), jnp.asarray(b)))
    at, bt = torch.from_numpy(a), torch.from_numpy(b)
    mse = F.mse_loss(at.clamp(0, 1), bt.clamp(0, 1),
                     reduction="none").mean(dim=[1, 2, 3])
    theirs = (10 * torch.log10(1.0 / (mse + 1e-8))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-4)


def test_metrics_accumulator(rng):
    m = Metrics()
    a = rng.random((2, 24, 24, 1), dtype=np.float32)
    b = np.clip(a + 0.02 * rng.standard_normal(a.shape, dtype=np.float32), 0, 1)
    m.update(jnp.asarray(a), jnp.asarray(b))
    m.update(jnp.asarray(a), jnp.asarray(b))
    out = m.compute()
    assert out["psnr"] > 25.0
    assert 0.8 < out["ssim"] <= 1.0
    m.reset()
    assert m.compute() == {"psnr": 0.0, "ssim": 0.0}
