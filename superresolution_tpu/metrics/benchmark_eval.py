"""Literature-convention SR benchmark evaluation (Set5/Set14/DIV2K).

Published SR numbers (SRCNN/EDSR/ESRGAN papers) are computed on the Y
channel of YCbCr (ITU-R BT.601 full-range digital form), after shaving a
`scale`-pixel border — different from the reference's full-image RGB/gray
metrics (src/metrics.py). Both conventions are provided so our numbers are
comparable to the literature AND to the reference.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from superresolution_tpu.metrics.psnr_ssim import psnr, ssim


def rgb_to_y(img: jnp.ndarray) -> jnp.ndarray:
    """HWC or NHWC RGB in [0,1] -> Y (luma) in [0,1], BT.601 digital.

    Y_255 = 16 + (65.481 R + 128.553 G + 24.966 B); single-channel input
    passes through unchanged.
    """
    if img.shape[-1] == 1:
        return img
    r, g, b = img[..., 0:1], img[..., 1:2], img[..., 2:3]
    y = (16.0 + 65.481 * r + 128.553 * g + 24.966 * b) / 255.0
    return y


def shave(img: jnp.ndarray, border: int) -> jnp.ndarray:
    if border <= 0:
        return img
    return img[..., border:-border, border:-border, :]


def sr_metrics(pred: jnp.ndarray, target: jnp.ndarray, scale: int,
               y_channel: bool = True) -> dict[str, float]:
    """Per-image-pair PSNR/SSIM with the standard convention: Y channel,
    shave `scale` border. Inputs NHWC (or HWC) in [0,1]."""
    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    p, t = jnp.asarray(pred), jnp.asarray(target)
    if y_channel:
        p, t = rgb_to_y(p), rgb_to_y(t)
    p, t = shave(p, scale), shave(t, scale)
    return {
        "psnr": float(jnp.mean(psnr(p, t))),
        "ssim": float(jnp.mean(ssim(p, t))),
    }


def evaluate_folder(upscale_fn, hr_dir: str, scale: int,
                    y_channel: bool = True,
                    degrade: bool = True) -> dict[str, float]:
    """Benchmark `upscale_fn(lr_hwc) -> sr_hwc` over every image in
    `hr_dir` (Set5-style: HR images; LR synthesized by MATLAB-convention
    bicubic). Images are center-cropped to a multiple of `scale`."""
    from superresolution_tpu.data.io import load_image
    from superresolution_tpu.ops.degradation import degrade_bicubic

    psnrs, ssims = [], []
    names = sorted(f for f in os.listdir(hr_dir)
                   if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp",
                                          ".tif", ".tiff")))
    if not names:
        raise FileNotFoundError(f"no images in {hr_dir}")
    for name in names:
        hr = load_image(os.path.join(hr_dir, name))
        h, w = (hr.shape[0] // scale) * scale, (hr.shape[1] // scale) * scale
        y0 = (hr.shape[0] - h) // 2  # center crop (the standard
        x0 = (hr.shape[1] - w) // 2  # benchmark convention)
        hr = hr[y0:y0 + h, x0:x0 + w]
        lr = np.asarray(degrade_bicubic(jnp.asarray(hr), scale)) if degrade \
            else hr
        sr = np.asarray(upscale_fn(lr))
        m = sr_metrics(jnp.asarray(sr), jnp.asarray(hr), scale, y_channel)
        psnrs.append(m["psnr"])
        ssims.append(m["ssim"])
    return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
            "n": len(psnrs)}
