"""Benchmark: megapixels/sec/chip at x4 upscale (ESRGAN RRDB generator,
tiled inference on a 2K-resolution image — BASELINE config 4).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s/chip", "vs_baseline": N/REF}

Megapixels are INPUT megapixels (LR pixels consumed per second at x4; the
output rate is 16x this in pixels).

Baseline derivation (the reference publishes no throughput numbers —
BASELINE.md): the reference's fallback production GPU is an RTX 4090
(reference readme.md:91-95,415-421) running torch-eager AMP. The ESRGAN
RRDB x4 generator costs ~35.8 GFLOPs per LR-megapixel-row... precisely:
~17.9 MFLOPs-MAC x2 = 35.8 TFLOPs per input megapixel. Torch eager conv
stacks on a 4090 (165 TFLOPs bf16 dense) sustain roughly 30% MFU on this
kind of small-channel conv workload => ~50 TFLOP/s => ~1.4 input-MP/s.
REF_GPU_MPS_X4 = 1.4 is therefore the reference-on-GPU estimate this
harness compares against (north star: >= 4x => >= 5.6 MP/s/chip).
"""

from __future__ import annotations

import json
import time

import numpy as np

REF_GPU_MPS_X4 = 1.4  # estimated reference-on-GPU input MP/s (see docstring)


def main() -> None:
    import jax

    from superresolution_tpu.utils.runtime import setup_jax_cache

    setup_jax_cache()

    from superresolution_tpu.infer import tiled_apply
    from superresolution_tpu.models import RRDBNet
    from superresolution_tpu.utils.precision import get_policy

    model = RRDBNet(scale=4, in_channels=3, out_channels=3, features=64,
                    num_blocks=23, growth=32)
    policy = get_policy("bf16")
    tile, halo, batch = 192, 16, 4
    t_in = tile + 2 * halo

    import jax.numpy as jnp

    # init under jit: eager per-op dispatch through the TPU tunnel is slow
    params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    params = policy.cast_to_compute(params)  # weights resident in bf16

    @jax.jit
    def fn(x):
        out = model.apply(params, x.astype(policy.compute_dtype))
        return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)

    # 2K-resolution input (1920x1080 RGB)
    rng = np.random.default_rng(0)
    img = rng.random((1080, 1920, 3), dtype=np.float32)

    # warmup (compile)
    _ = tiled_apply(fn, img[:t_in - 2 * halo + 8, :t_in - 2 * halo + 8],
                    scale=4, tile=tile, halo=halo, batch=batch)
    _ = fn(jnp.zeros((batch, t_in, t_in, 3))).block_until_ready()

    runs = 3
    t0 = time.perf_counter()
    for _ in range(runs):
        out = tiled_apply(fn, img, scale=4, tile=tile, halo=halo, batch=batch)
    dt = (time.perf_counter() - t0) / runs
    assert out.shape == (1080 * 4, 1920 * 4, 3)

    mp = img.shape[0] * img.shape[1] / 1e6
    mps = mp / dt
    n_chips = 1  # tiled single-image inference runs on one chip here
    value = mps / n_chips
    print(json.dumps({
        "metric": "input megapixels/sec/chip, ESRGAN RRDB x4 tiled 2K inference",
        "value": round(value, 4),
        "unit": "MP/s/chip",
        "vs_baseline": round(value / REF_GPU_MPS_X4, 3),
    }))


if __name__ == "__main__":
    main()
