"""Benchmark: megapixels/sec/chip at x4 upscale.

Prints MULTIPLE JSON lines (each flushed immediately), in this order:

  1. headline   — ESRGAN RRDB x4 tiled 2K inference (BASELINE config 4)
  2. hybrid     — the reference's actual flagship two-stage model
                  (RRDBNet 23 + HAT, reference src/architecture.py:30-82),
                  fused deploy path, 128^2 -> 512^2
  3. training   — hybrid_astro REAL train step, samples/s (the H200
                  parity anchor, BENCHMARKS.md round-3 table)
  4. quality    — PSNR/SSIM of the committed quality-anchor checkpoint
                  through the fused deploy path, + bicubic delta
                  (absent until tools/train_quality_ckpt.py has run)
  5. headline again, annotated with chipeq/DMA-probe fields.

ORDER IS LOAD-BEARING: BENCH_r03 (rc 124) proved the driver kills slow
runs and parses the LAST JSON line it sees. The headline prints before
any optional stage, every optional stage prints a metric-shaped line or
nothing, and the final line re-prints the headline — so under ANY kill
point the last complete JSON line on stdout is a real throughput metric.
Optional stages (incl. the chip-equivalence suite, now stdout-quiet) run
under SRTPU_BENCH_BUDGET_S (default 420 s) and are skipped, not raced,
when the budget runs out.

Megapixels are INPUT megapixels (LR pixels consumed per second; at x4
the output rate is 16x this in pixels).

Baseline derivations (the reference publishes no throughput numbers —
BASELINE.md):

CEILING (BASELINE.md "Throughput ceiling analysis"): the 4x north star
(5.6 MP/s at 35.8 TF per input MP) equals ~200 TF/s effective = 101% of
v5e nominal bf16 — physically unreachable for a FLOP-exact model on one
chip. The measured XLA conv envelope at these shapes is 42.4 TF/s
(~1.18 MP/s); the fused-kernel headline runs 1.34x that envelope. The
`mfu_vs_nominal_197tf` and `vs_r2_xla_conv_envelope_42tf` fields on the
headline line exist so a reader can tell headroom from physics.

* ESRGAN x4 (REF_GPU_MPS_X4 = 1.4): the reference's fallback production
  GPU is an RTX 4090 (reference readme.md:91-95,415-421) running
  torch-eager AMP. The ESRGAN RRDB x4 generator costs ~17.9 M MACs per
  LR pixel = 35.8 TFLOPs per input MP. Torch-eager conv stacks on a
  4090 (165 TFLOPs bf16 dense) sustain roughly 30% MFU on this kind of
  small-channel conv workload => ~50 TFLOP/s => ~1.4 input-MP/s.
  North star: >= 4x => >= 5.6 MP/s/chip.

* Hybrid (REF_GPU_MPS_HYBRID = 0.47), derived the same way: stage 1
  (RRDBNet x2, 23 blocks at 128^2) costs ~16.9 M MACs/LR px
  (33.7 TF/MP); stage 2 (HAT embed 96, depths [6]*4, ws 8 at 256^2,
  incl. CAB 96->32->96, MLP ratio 2, OCAB with its MLP, tail) costs
  ~4.55 M MACs per mid pixel = ~18.2 M/LR px (36.4 TF/MP). Same 4090:
  30% MFU on the conv stage (50 TF/s), a GENEROUS 15% eager MFU on the
  windowed-attention stage (24.8 TF/s — 64-token windows, LNs, rolls
  and unfolds in eager AMP realistically run below this) =>
  33.7/50 + 36.4/24.8 = 2.14 s per input MP => ~0.47 MP/s.
  (Cross-check: the H200 *training* anchor below implies the real
  eager-torch rate is far lower, so 0.47 favors the reference.)

* Hybrid training (REF_H200_TRAIN_SAMPLES_S = 2.5): estimated
  reference-on-H200 rate for its production config (batch 3 accum 20,
  AMP, scripts/Modello_supporto.py:124-148; hardware readme.md:91-95)
  — the derivation and the one-v5e-chip match (2.49 samples/s) are in
  BENCHMARKS.md "training throughput" (round 3).

DMA probe fields (dma_gbps_lane64 / lane128 / ratio): round 3 measured
the Pallas grid pipeline moving 64-lane blocks at ~190 GB/s vs
~330 GB/s at 128 lanes (exp_r16c) — a toolchain ceiling worth
~145 ms/frame on the headline. The probe re-measures both rates every
bench run so a libtpu bump that fixes 64-lane DMA shows up in
BENCH_r*.json the round it lands (VERDICT r3 item 5).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_GPU_MPS_X4 = 1.4          # reference-on-4090 ESRGAN x4 (docstring)
REF_GPU_MPS_HYBRID = 0.47     # reference-on-4090 hybrid (docstring)
REF_H200_TRAIN_SAMPLES_S = 2.5  # reference-on-H200 hybrid training

T0 = time.monotonic()
BUDGET_S = float(os.environ.get("SRTPU_BENCH_BUDGET_S", "420"))


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - T0)


def _emit(obj) -> None:
    print(json.dumps(obj), flush=True)


def _marginal_ms(fn, x, iters):
    """House-rule timing (BENCHMARKS.md round 3): marginal ms/step
    between a K-step and a 2K-step data-dependent fori_loop chain
    inside one jit whose result is device_get'ed — the only per-step
    timing that syncs reliably through the axon tunnel."""
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def run(v):
            def body(_, u):
                out = fn(u)
                return (u + jnp.mean(out.astype(jnp.float32))
                        .astype(u.dtype))

            out = jax.lax.fori_loop(0, n, body, v)
            return jnp.sum(out.astype(jnp.float32))

        return run

    r1, r2 = make(iters), make(2 * iters)
    jax.device_get(r1(x))
    jax.device_get(r2(x))
    t0 = time.perf_counter()
    jax.device_get(r1(x))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(r2(x))
    t2 = time.perf_counter() - t0
    return (t2 - t1) / iters * 1e3


def bench_headline() -> dict:
    """ESRGAN RRDB x4, tiled 2K inference (BASELINE config 4)."""
    import jax
    import jax.numpy as jnp

    from superresolution_tpu.infer import make_tiled_infer_staged
    from superresolution_tpu.infer.fused_trunk import make_fused_trunk
    from superresolution_tpu.infer.phase_tail import make_phase_tail
    from superresolution_tpu.models import RRDBNet
    from superresolution_tpu.utils.precision import get_policy

    model = RRDBNet(scale=4, in_channels=3, out_channels=3, features=64,
                    num_blocks=23, growth=32, upsampler="pixelshuffle")
    policy = get_policy("bf16")
    # tile geometry tuned for v5e: rectangular 360x240 tiles divide
    # 1920x1080 in a 3x8 grid with ZERO padding waste; trunk AND tail
    # run all 24 tiles in one batch. Narrower tiles raise the fused
    # dense-block kernel's row block to rb=94 (wp=272: 376 = 4x94 fits
    # the VMEM row budget). halo 8: BasicSR's own ESRGAN tiler uses
    # tile_pad=10, and measured seam error at halo 8 vs 48 is within
    # bf16 noise (exp_r2 seam sweep). Full rationale: BENCHMARKS.md.
    tile, halo, batch = (360, 240), 8, 24
    h, w = 1080, 1920  # 2K-resolution input

    # init under jit: eager per-op dispatch through the tunnel is slow
    params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    params = policy.cast_to_compute(params)  # weights resident in bf16

    # fused dense-block trunk: every 5-conv RRDB dense block runs as ONE
    # Pallas program (ops/pallas_dense_trunk.py). SRTPU_CHAIN_RRDB /
    # SRTPU_FOLD_ENDS: measured-closed r3 A/B levers (BENCHMARKS.md).
    fused_trunk = make_fused_trunk(
        params, model,
        chain_rrdb=bool(os.environ.get("SRTPU_CHAIN_RRDB")),
        fold_ends=bool(os.environ.get("SRTPU_FOLD_ENDS")))

    def trunk_fn(x):
        return fused_trunk(x.astype(policy.compute_dtype))

    # deploy-time phase-space tail: conv_hr and conv_last as Pallas
    # phase-gathered dots at LR resolution (infer/phase_tail.py)
    tail_fn = make_phase_tail(params)

    # Fully on-device two-stage tiled inference. This dev harness's
    # host link is a ~1.4 MB/s tunnel, so host round-trips are excluded
    # from the compute metric by construction.
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

    mp = h * w / 1e6
    value = mp / dt  # single chip
    # model cost ~35.8 TFLOPs per input MP; MFU vs the chip's nominal
    # 197 bf16 TF/s and vs the round-2 XLA-conv envelope (42.4 TF/s,
    # benchmarks/exp_r2_trunk.py) — a floor the fused kernel beats.
    tflops_per_mp = 35.8
    return {
        "metric": "input megapixels/sec/chip, ESRGAN RRDB x4 tiled 2K inference",
        "value": round(value, 4),
        "unit": "MP/s/chip",
        "vs_baseline": round(value / REF_GPU_MPS_X4, 3),
        "mfu_vs_nominal_197tf": round(value * tflops_per_mp / 197.0, 3),
        "vs_r2_xla_conv_envelope_42tf": round(
            value * tflops_per_mp / 42.4, 3),
    }


def bench_hybrid() -> dict:
    """The reference's flagship hybrid (RRDBNet 23 + HAT stage 2),
    fused deploy path, 128^2 -> 512^2 (exp_r19 geometry). Deploy batch
    default set by the exp_r33 sweep (inference batch is free — the
    training geometry's b4 was never a constraint); SRTPU_HYBRID_BATCH
    overrides."""
    import jax
    import jax.numpy as jnp

    from superresolution_tpu.infer.fused_hat import fused_hybrid_model
    from superresolution_tpu.models import HATLite, HybridSR, RRDBNet
    from superresolution_tpu.utils.precision import get_policy

    batch = int(os.environ.get("SRTPU_HYBRID_BATCH", "1"))
    policy = get_policy("bf16")
    model = HybridSR(
        stage1=RRDBNet(scale=2, in_channels=1, out_channels=1,
                       features=64, num_blocks=23, growth=32,
                       upsampler="pixelshuffle"),
        stage2=HATLite(scale=2, in_channels=1, out_channels=1,
                       embed_dim=96, depths=(6,) * 4,
                       num_heads=(6,) * 4, window_size=8,
                       attn_f32=False, flash_attn=True),
        smoothing="balanced", output_size=512)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 128, 128, 1)))
    params = policy.cast_to_compute(params)
    wrapped = fused_hybrid_model(params, model)
    x = jax.random.normal(jax.random.key(1), (batch, 128, 128, 1),
                          jnp.bfloat16)
    ms = _marginal_ms(lambda v: wrapped.apply(None, v), x,
                      iters=max(2, 20 // batch))
    value = batch * 128 * 128 / 1e6 / (ms / 1e3)
    return {
        "metric": ("input megapixels/sec/chip, hybrid RRDB+HAT x4 "
                   f"(reference flagship), batch {batch}, 128^2->512^2"),
        "value": round(value, 4),
        "unit": "MP/s/chip",
        "vs_baseline": round(value / REF_GPU_MPS_HYBRID, 3),
        "ms_per_batch": round(ms, 1),
    }


def bench_training() -> dict:
    """hybrid_astro REAL train step (Trainer-built: fused Pallas trunk,
    remat, bf16 policy, AdamW) — the H200 training parity anchor."""
    import train_bench  # benchmarks/ (sys.path set up in main)

    r = train_bench.bench_preset("hybrid_astro", steps=5)
    return {
        "metric": ("training samples/sec/chip, hybrid RRDB+HAT "
                   "(reference prod config: LR 128^2 -> HR 512^2)"),
        "value": round(r["samples_per_s"], 3),
        "unit": "samples/s/chip",
        "vs_baseline": round(
            r["samples_per_s"] / REF_H200_TRAIN_SAMPLES_S, 3),
        "ms_per_step": round(r["ms_per_step"], 1),
        "batch": r["batch"],
    }


def bench_quality() -> dict | None:
    """Driver-visible QUALITY number (VERDICT r4 item 6): PSNR/SSIM of
    the committed quality-anchor checkpoint (assets/quality, trained
    once by tools/train_quality_ckpt.py) on the fixed-seed synthetic
    val set, evaluated through the PRODUCTION fused deploy path (fused
    dense trunk + phase tail, bf16). A kernel/numerics regression moves
    this PSNR; chipeq's loose bf16 tolerances would not catch it.
    Returns None (stage silently absent) if the checkpoint is missing.
    Also reports the bicubic-upscale baseline PSNR and the delta
    (reference quality frame: readme.md:536-539, model-over-bicubic)."""
    import jax
    import jax.numpy as jnp

    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "assets", "quality", "final_weights", "best")
    if not os.path.isdir(ckpt):
        return None

    from superresolution_tpu.data.dataset import SyntheticHRDataset
    from superresolution_tpu.infer.fused_trunk import fused_rrdb_model
    from superresolution_tpu.metrics.psnr_ssim import psnr, ssim
    from superresolution_tpu.models.factory import get_model
    from superresolution_tpu.ops.degradation import degrade_bicubic
    from superresolution_tpu.ops.resize import resize_bicubic
    from superresolution_tpu.train.checkpoint import (
        load_params_for_inference)
    from superresolution_tpu.utils.precision import get_policy

    params, mc = load_params_for_inference(ckpt, with_config=True)
    # the loader may return either the bare param tree or a full
    # variables dict ({"params": ...}) depending on how the trainer
    # saved it — normalize to the bare tree before wrapping below
    if isinstance(params, dict) and set(params.keys()) == {"params"}:
        params = params["params"]
    kwargs = dict(mc.get("kwargs", {}))
    model = get_model(mc["name"], scale=mc["scale"],
                      in_channels=mc["in_channels"],
                      out_channels=mc["out_channels"], **kwargs)
    policy = get_policy("bf16")
    variables = policy.cast_to_compute({"params": params})
    deploy = fused_rrdb_model(variables, model)

    scale = int(mc["scale"])
    ds = SyntheticHRDataset(8, 128, mc["out_channels"], seed=2)
    hr = jnp.stack([jnp.asarray(ds[i]["hr"]) for i in range(len(ds))])
    lr = jax.vmap(lambda im: degrade_bicubic(im, scale))(hr)

    @jax.jit
    def evaluate(lr_, hr_):
        sr = jnp.clip(deploy.apply(
            None, lr_.astype(jnp.bfloat16)).astype(jnp.float32), 0, 1)
        up = jnp.clip(resize_bicubic(
            lr_, (hr_.shape[1], hr_.shape[2])), 0, 1)
        return (jnp.mean(psnr(sr, hr_)), jnp.mean(ssim(sr, hr_)),
                jnp.mean(psnr(up, hr_)))

    p, s, pb = jax.device_get(evaluate(lr, hr))
    return {
        "metric": ("val PSNR dB, quality-anchor RRDB x4 (committed ckpt,"
                   " fused deploy path, fixed-seed synthetic val)"),
        "value": round(float(p), 3),
        "unit": "dB",
        "ssim": round(float(s), 4),
        "bicubic_psnr": round(float(pb), 3),
        "delta_vs_bicubic": round(float(p) - float(pb), 3),
    }


def dma_probe() -> dict:
    """64-lane vs 128-lane Pallas passthrough GB/s (grid-pipelined DMA
    both directions, same total bytes). Detects a libtpu fix of the
    64-lane rate penalty (~145 ms/frame on the headline, BENCHMARKS.md
    'call-floor anatomy CORRECTED')."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make_pt(shape, rb):
        b, h, w2, c2 = shape
        nb = h // rb

        def kernel(mid_ref, out_ref):
            out_ref[0] = mid_ref[0]

        def apply(x):
            mid = x.reshape(b * nb, rb, w2, c2)
            out = pl.pallas_call(
                kernel,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=110 * 1024 * 1024),
                grid=(b * nb,),
                in_specs=[pl.BlockSpec((1, rb, w2, c2),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, rb, w2, c2),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((b * nb, rb, w2, c2),
                                               x.dtype),
            )(mid)
            return out.reshape(b, h, w2, c2)

        return apply

    out = {}
    # the headline trunk's operand class: [24,376,272,64] bf16 at
    # rb=94 (64 lanes), vs the same bytes repacked to 128 lanes
    for tag, shape in (("lane64", (24, 376, 272, 64)),
                       ("lane128", (24, 376, 136, 128))):
        x = jax.random.normal(jax.random.key(0), shape,
                              jnp.float32).astype(jnp.bfloat16)
        ms = _marginal_ms(make_pt(shape, 94), x, iters=10)
        gb = 2 * int(np.prod(shape)) * 2 / 1e9  # read + write, bf16
        out[f"dma_gbps_{tag}"] = round(gb / (ms / 1e3), 1)
    out["dma_lane64_over_lane128"] = round(
        out["dma_gbps_lane64"] / max(out["dma_gbps_lane128"], 1e-9), 3)
    return out


def _merge_chipeq(path: str, new: dict) -> dict:
    """MERGE a chip-equivalence run into the existing CHIPEQ.json: keep
    the last green result (+ its run timestamp) for any kernel the new
    run deadline-skipped, so a budget-trimmed bench never SHRINKS the
    committed evidence (round 4 regressed 15 kernels -> 3 this way —
    VERDICT r4 item 2b). A kernel the new run actually re-ran always
    overwrites its carried entry; `pass` reflects the new run's own
    failures/errors, never a carried value."""
    now = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    for r in new.get("results", {}).values():
        r["run_at"] = now
    try:
        with open(path) as f:
            prev = json.load(f)
    except Exception:
        return new
    carried = {}
    for name, r in prev.get("results", {}).items():
        if name not in new.get("results", {}) and r.get("pass"):
            carried[name] = dict(r, carried_forward=True)
    if carried:
        new.setdefault("results", {}).update(carried)
        new["carried_forward"] = sorted(carried)
    return new


def main() -> None:
    from superresolution_tpu.utils.runtime import setup_jax_cache

    setup_jax_cache()
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmarks"))

    # 1. headline — ALWAYS first on stdout, before any optional stage
    headline = bench_headline()
    _emit(headline)

    annotations: dict = {}
    skipped: list = []

    # 2. DMA probe (fast; rides the final headline line)
    if _remaining() > 45:
        try:
            annotations.update(dma_probe())
        except Exception as e:
            annotations["dma_probe_error"] = repr(e)
    else:
        skipped.append("dma_probe")

    # 3. hybrid flagship line
    if _remaining() > 90:
        try:
            _emit(bench_hybrid())
        except Exception as e:
            annotations["hybrid_bench_error"] = repr(e)
    else:
        skipped.append("hybrid")

    # 4. training parity line
    if os.environ.get("SRTPU_SKIP_TRAINBENCH"):
        pass
    elif _remaining() > 150:
        try:
            _emit(bench_training())
        except Exception as e:
            annotations["train_bench_error"] = repr(e)
    else:
        skipped.append("training")

    # 5. quality line — PSNR from the committed quality-anchor ckpt
    # through the fused deploy path (absent until the ckpt is trained)
    if _remaining() > 60:
        try:
            q = bench_quality()
            if q is not None:
                _emit(q)
                annotations["quality_psnr_db"] = q["value"]
        except Exception as e:
            annotations["quality_bench_error"] = repr(e)
    else:
        skipped.append("quality")

    # 6. chip equivalence, stdout-quiet, under the remaining budget;
    # results land in CHIPEQ.json, the verdict rides the final line
    if os.environ.get("SRTPU_SKIP_CHIPEQ"):
        pass
    elif _remaining() <= 30:
        skipped.append("chipeq")
    else:
        try:
            import chip_equivalence

            chipeq = chip_equivalence.run_all(
                deadline=T0 + BUDGET_S, quiet=True)
        except Exception as e:  # never lose the headline metric
            chipeq = {"pass": False, "error": repr(e),
                      "failed": [], "skipped": [], "results": {}}
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "CHIPEQ.json")
        chipeq = _merge_chipeq(path, chipeq)
        with open(path, "w") as f:
            json.dump(chipeq, f, indent=2)
        annotations["chipeq_pass"] = chipeq["pass"]
        if chipeq.get("skipped"):
            annotations["chipeq_skipped"] = len(chipeq["skipped"])

    # 7. final line = the headline again, annotated — the driver's
    # last-JSON-line parse always lands on the headline metric
    if skipped:
        annotations["stages_skipped_on_budget"] = skipped
    headline.update(annotations)
    _emit(headline)


if __name__ == "__main__":
    main()
