"""Test/inference harness — the re-design of reference scripts/Modello_5.py.

Runs a trained model over a test split, accumulates PSNR/SSIM (fp32),
writes per-image 16-bit scientific TIFFs and [LR-nearest | SR | HR]
comparison strips (reference: scripts/Modello_5.py:71-91).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from superresolution_tpu.data.io import save_png, save_tiff16
from superresolution_tpu.data.loader import Loader
from superresolution_tpu.metrics.psnr_ssim import Metrics
from superresolution_tpu.ops.resize import resize_nearest
from superresolution_tpu.utils.collage import frame_and_label_collage


def run_test(trainer, out_dir: str | None = None,
             save_outputs: bool = True, labeled: bool = False) -> dict:
    """Evaluate `trainer`'s current params on its val/test split."""
    out_dir = out_dir or os.path.join(trainer.workdir, "test_results")
    os.makedirs(out_dir, exist_ok=True)
    m = Metrics()
    loader = Loader(trainer.test_ds, 1, shuffle=False, num_workers=2)
    for i, batch in enumerate(loader):
        key = jax.random.fold_in(trainer._base_key, 2**29 + i)
        out = trainer._eval_step(trainer.state,
                                 jax.tree.map(jax.numpy.asarray, batch), key)
        sr = np.asarray(out["pred"][0])
        hr0 = np.asarray(out["hr"][0])
        lr = np.asarray(out["lr"])
        m.update_sums(float(out["psnr_sum"]), float(out["ssim_sum"]),
                      float(out["n"]))
        if save_outputs:
            if sr.shape[-1] == 1:
                save_tiff16(sr, os.path.join(out_dir, f"result_{i:04d}.tiff"))
            else:
                save_png(sr, os.path.join(out_dir, f"result_{i:04d}.png"))
            lr_up = np.asarray(resize_nearest(np.asarray(lr[0]),
                                              hr0.shape[:2]))
            strip = np.concatenate([lr_up, sr, hr0], axis=1)
            spath = os.path.join(out_dir, f"comparison_{i:04d}.png")
            if labeled:
                frame_and_label_collage(strip, spath,
                                        labels=("Input", "Result", "Target"))
            else:
                save_png(strip, spath)
    result = m.compute()
    with open(os.path.join(out_dir, "metrics.txt"), "w") as f:
        f.write(f"PSNR: {result['psnr']:.4f} dB\nSSIM: {result['ssim']:.6f}\n")
    return result
