"""Train the committed quality-anchor checkpoint (VERDICT r4 item 6).

Trains a small RRDBNet x4 (the headline ESRGAN family, 2 blocks) to
convergence on the fixed-seed synthetic starfield set and finalizes the
best checkpoint into assets/quality/ — a few MB, committed to the repo.
bench.py's quality stage then evaluates it through the PRODUCTION fused
deploy path (fused dense trunk + phase tail, bf16) on the fixed-seed
val set every bench run: a kernel or numerics regression moves the
driver-visible PSNR, where the loose bf16 chipeq tolerances would not.

Usage (on the TPU chip, once):  python tools/train_quality_ckpt.py
Re-run only when the model/data recipe changes; bench.py only reads.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from superresolution_tpu.utils.config import get_preset  # noqa: E402
from superresolution_tpu.utils.runtime import setup_jax_cache  # noqa: E402

setup_jax_cache()

OUT_DIR = os.path.join(ROOT, "assets", "quality")

# The recipe bench.py's quality stage assumes: keep in sync with
# bench_quality() (same model family/seeds; eval set = SyntheticHRDataset
# seed 2 via the Trainer's val split).
EPOCHS = int(os.environ.get("SRTPU_QUALITY_EPOCHS", "400"))


def quality_config():
    cfg = get_preset("esrgan_x4_tiled")
    model = dataclasses.replace(
        cfg.model, kwargs={"features": 64, "num_blocks": 2, "growth": 32,
                           "upsampler": "pixelshuffle"})
    data = dataclasses.replace(
        cfg.data, hr_patch=128, batch_size=8, synthetic_len=64,
        num_workers=0)
    train = dataclasses.replace(
        cfg.train, epochs=EPOCHS, eval_every=20, preview_every=10**6,
        resume=False, keep_checkpoints=1)
    return cfg.replace(name="quality_anchor", model=model, data=data,
                       train=train)


def main() -> int:
    from superresolution_tpu.train.trainer import Trainer

    cfg = quality_config()
    with Trainer(cfg, workdir=OUT_DIR) as tr:
        result = tr.fit()
        final = tr.finalize()
    print(json.dumps({"best": result["best"], "final": final}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
