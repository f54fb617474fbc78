"""Benchmark: megapixels/sec/chip at x4 upscale (ESRGAN RRDB generator,
tiled inference on a 2K-resolution image — BASELINE config 4).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s/chip", "vs_baseline": N/REF}

Megapixels are INPUT megapixels (LR pixels consumed per second at x4; the
output rate is 16x this in pixels).

Baseline derivation (the reference publishes no throughput numbers —
BASELINE.md): the reference's fallback production GPU is an RTX 4090
(reference readme.md:91-95,415-421) running torch-eager AMP. The ESRGAN
RRDB x4 generator costs ~17.9 M MACs PER LR PIXEL, i.e. x2 =
35.8 TFLOPs per input megapixel. Torch eager conv
stacks on a 4090 (165 TFLOPs bf16 dense) sustain roughly 30% MFU on this
kind of small-channel conv workload => ~50 TFLOP/s => ~1.4 input-MP/s.
REF_GPU_MPS_X4 = 1.4 is therefore the reference-on-GPU estimate this
harness compares against (north star: >= 4x => >= 5.6 MP/s/chip).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_GPU_MPS_X4 = 1.4  # estimated reference-on-GPU input MP/s (see docstring)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from superresolution_tpu.utils.runtime import setup_jax_cache

    setup_jax_cache()

    from superresolution_tpu.infer import make_tiled_infer_staged
    from superresolution_tpu.models import RRDBNet
    from superresolution_tpu.utils.precision import get_policy

    # flagship: ESRGAN RRDB generator, fused-projection dense blocks,
    # sub-pixel upsampler (convs at LR resolution)
    model = RRDBNet(scale=4, in_channels=3, out_channels=3, features=64,
                    num_blocks=23, growth=32, upsampler="pixelshuffle")
    policy = get_policy("bf16")
    # tile geometry tuned for v5e: rectangular 360x240 tiles divide
    # 1920x1080 in a 3x8 grid with ZERO padding waste; trunk AND tail
    # run all 24 tiles in one batch — the phase-space tail keeps every
    # intermediate at LR resolution, so the x4 HBM pressure that forced
    # chunked tail mapping is gone (tb sweep: 6 -> 1.465, 12 -> 1.480,
    # 24 -> 1.490 MP/s). Narrower tiles raise the fused dense-block
    # kernel's row block to rb=94 (wp=272: 376 = 4x94 fits the VMEM row
    # budget) — per-block halo FLOP overhead 1+10/rb drops 1.213x ->
    # 1.106x, which beats the extra tile-halo area (1.088x -> 1.114x).
    # halo 8: BasicSR's own ESRGAN tiler uses tile_pad=10, and measured
    # seam error at halo 8 vs 48 is within bf16 noise (exp_r2 seam sweep).
    tile, halo, batch = (360, 240), 8, 24
    h, w = 1080, 1920  # 2K-resolution input

    # init under jit: eager per-op dispatch through the TPU tunnel is slow
    params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    params = policy.cast_to_compute(params)  # weights resident in bf16

    # fused dense-block trunk: every 5-conv RRDB dense block runs as ONE
    # Pallas program (ops/pallas_dense_trunk.py) — 1.17x the XLA trunk
    # (1495 ms vs 1746 ms on this tile batch; BENCHMARKS.md r3)
    from superresolution_tpu.infer.fused_trunk import make_fused_trunk

    # SRTPU_CHAIN_RRDB=1: whole-RRDB chained kernel (halo 15, one
    # pallas_call per RRDB) — the r3 A/B lever for the 2-of-3 HBM
    # boundary saving vs the deeper halo cascade
    # SRTPU_FOLD_ENDS=1: A/B lever for the r3 end folds (conv_first
    # prologue + trunk_conv epilogue kernels) — measured a wash
    # (1.5779 vs 1.5773 MP/s), default off (BENCHMARKS.md r3)
    fused_trunk = make_fused_trunk(
        params, model,
        chain_rrdb=bool(os.environ.get("SRTPU_CHAIN_RRDB")),
        fold_ends=bool(os.environ.get("SRTPU_FOLD_ENDS")))

    def trunk_fn(x):
        return fused_trunk(x.astype(policy.compute_dtype))

    # deploy-time phase-space tail: conv_hr and conv_last run as Pallas
    # phase-gathered dots at LR resolution (infer/phase_tail.py; exact on
    # the same weights up to bf16 reassociation, measured 61 vs 70 ms per
    # 6-tile chunk against the folded tail). Output stays bf16 on device
    # (quantized to uint16 at write-out).
    from superresolution_tpu.infer.phase_tail import make_phase_tail

    tail_fn = make_phase_tail(params)

    # Fully on-device two-stage tiled inference: the compute-bound trunk
    # runs over ALL tiles in one batch (best MXU utilization), the
    # memory-bound x4 tail is mapped in small chunks. In production the HR
    # output stays in HBM (metrics / uint16 quantize / collective
    # write-out). This dev harness's host link is a ~1.4 MB/s tunnel, so
    # host round-trips are excluded from the compute metric by construction.
    runner = make_tiled_infer_staged(
        trunk_fn, tail_fn, scale=4, tile=tile, halo=halo, tail_batch=batch,
        h=h, w=w, channels=3)
    img = jax.random.uniform(jax.random.key(1), (h, w, 3), jnp.float32)

    out = runner(img)  # compile + warmup
    out.block_until_ready()
    assert out.shape == (h * 4, w * 4, 3)

    runs = 3
    t0 = time.perf_counter()
    for _ in range(runs):
        out = runner(img)
        out.block_until_ready()
    dt = (time.perf_counter() - t0) / runs
    sanity = float(jnp.mean(out))
    assert np.isfinite(sanity)

    # On-hardware kernel equivalence as a driver-visible artifact
    # (VERDICT r2 item 5): every production Pallas kernel (incl. the r3
    # train-backward and chained-RRDB kernels) vs its XLA reference on
    # real Mosaic. Results land in CHIPEQ.json; the headline line
    # carries the verdict. SRTPU_SKIP_CHIPEQ=1 opts out (dev loops).
    chipeq_pass = None
    if not os.environ.get("SRTPU_SKIP_CHIPEQ"):
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "benchmarks"))
        try:
            import chip_equivalence

            chipeq = chip_equivalence.run_all()
            chipeq_pass = chipeq["pass"]
        except Exception as e:  # never lose the headline metric
            chipeq = {"pass": False, "error": repr(e)}
            chipeq_pass = False
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "CHIPEQ.json"), "w") as f:
            json.dump(chipeq, f, indent=2)

    mp = h * w / 1e6
    value = mp / dt  # single chip
    # model cost: ~35.8 TFLOPs per input MP (BENCHMARKS.md derivation);
    # MFU is reported against the chip's nominal 197 bf16 TF/s and
    # against the XLA-convolution trunk rate this bench used before the
    # fused dense-block kernel (42.4 TF/s, benchmarks/exp_r2_trunk.py —
    # a floor the r3 kernel now beats, not a ceiling: exp_r4c showed it
    # was a per-conv HBM round-trip bound, not an MXU limit).
    tflops_per_mp = 35.8
    print(json.dumps({
        "metric": "input megapixels/sec/chip, ESRGAN RRDB x4 tiled 2K inference",
        "value": round(value, 4),
        "unit": "MP/s/chip",
        "vs_baseline": round(value / REF_GPU_MPS_X4, 3),
        "mfu_vs_nominal_197tf": round(value * tflops_per_mp / 197.0, 3),
        "vs_r2_xla_conv_envelope_42tf": round(
            value * tflops_per_mp / 42.4, 3),
        "chipeq_pass": chipeq_pass,
    }))


if __name__ == "__main__":
    main()
