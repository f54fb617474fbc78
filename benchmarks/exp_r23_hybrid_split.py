"""Trusted stage-split of the hybrid deploy batch (252.8 ms, exp_r19).

Every earlier hybrid stage split (exp_r8_stages era) predates the
house-rule timing (ROUND3_NOTES.md): marginal ms/step between a K-step
and a 2K-step data-dependent fori_loop chain inside one jit whose
result is device_get'ed. This harness re-derives the split under that
rule so the next stage-2 lever is chosen from clean numbers.

Pieces timed at the flagship hybrid geometry (128^2 -> 512^2, batch 4,
C=96, ws=8, depths (6,)*4):
  e2e            full fused_hybrid_model
  stage1         fused RRDB trunk + phase tail, [4,128,128,1]->256^2
  smooth256/512  anti_checkerboard 'balanced' at each resolution
  stage2         full fused HAT, [4,256,256,1]->512^2
  conv_first     stage-2 shallow conv, 1->96 ch at 256^2
  group          one ResidualGroup body (3 HAB pairs + OCAB + conv)
  hab_pair       one shift-0 + shift-4 HAB pair at [4,256,256,96]
  cab            the fused CAB branch alone (exp_r18: 1.377 ms)
  habk           fused_hab_block alone on [4096,64,96] windows
  ocab           the OverlappingCrossAttention block alone
  ocab_kv        OCAB's kv patch extraction, superseded 144-slice form
  ocab_kv_cell   same gather, deployed cell-decomposed form (ops/unfold)
  tail           Conv_1 + upsample + Conv_2, 96ch 256^2 -> 1ch 512^2

Usage (on the TPU chip):
    python benchmarks/exp_r23_hybrid_split.py [piece ...]
with pieces from: e2e stage1 smooth stage2 conv_first group hab_pair
cab habk ocab ocab_kv ocab_kv_cell tail (default: all — slow; each
piece compiles two chained jits).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from superresolution_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

from superresolution_tpu.infer.fused_hat import (  # noqa: E402
    _cab_fused,
    _conv,
    _dense,
    _hab,
    _ln,
    _ocab,
    _wa_weights,
    fused_hybrid_model,
    make_fused_hat,
)
from superresolution_tpu.models import HATLite, HybridSR, RRDBNet  # noqa: E402
from superresolution_tpu.models.hat_lite import (  # noqa: E402
    window_merge,
    window_partition,
)
from superresolution_tpu.ops.blur import anti_checkerboard  # noqa: E402
from superresolution_tpu.ops.pallas_hab import fused_hab_block  # noqa: E402
from superresolution_tpu.ops.pixel_shuffle import depth_to_space  # noqa: E402
from superresolution_tpu.utils.precision import get_policy  # noqa: E402


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def timeit(fn, x, iters=8):
    """House-rule marginal timing; fn may change shape (chained via a
    mean fold-back into the input)."""

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
    return (t2 - t1) / iters


def main():
    want = set(sys.argv[1:])

    def on(name):
        return not want or name in want

    batch = 4
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
    p = params["params"]
    wrapped = fused_hybrid_model(params, model)
    s2 = make_fused_hat({"params": p["stage2"]}, model.stage2)
    sp = p["stage2"]
    gp = jax.tree.map(lambda a: a[0], sp["groups"])["ResidualGroup_0"]
    hp = jax.tree.map(lambda a: a[0], gp["hab_pairs"])
    ws, nh = 8, 6
    cs = model.stage2.conv_scale
    interp = jax.default_backend() != "tpu"

    x_lr = jax.random.normal(jax.random.key(1), (batch, 128, 128, 1),
                             jnp.bfloat16)
    x_mid = jax.random.normal(jax.random.key(2), (batch, 256, 256, 1),
                              jnp.bfloat16)
    x_hr = jax.random.normal(jax.random.key(3), (batch, 512, 512, 1),
                             jnp.bfloat16)
    feat = jax.random.normal(jax.random.key(4), (batch, 256, 256, 96),
                             jnp.bfloat16)

    if on("e2e"):
        t = timeit(lambda v: wrapped.apply(None, v), x_lr)
        record("e2e_ms", round(t * 1e3, 2))

    from superresolution_tpu.infer.fused_trunk import fused_rrdb_model

    if on("stage1"):
        s1m = fused_rrdb_model({"params": p["stage1"]}, model.stage1)
        record("stage1_ms", round(
            timeit(lambda v: s1m.apply(None, v), x_lr) * 1e3, 2))
    if on("smooth"):
        record("smooth256_ms", round(timeit(
            lambda v: anti_checkerboard(v, "balanced"), x_mid) * 1e3, 2))
        record("smooth512_ms", round(timeit(
            lambda v: anti_checkerboard(v, "balanced"), x_hr) * 1e3, 2))
    if on("stage2"):
        record("stage2_ms", round(timeit(s2, x_mid) * 1e3, 2))
    if on("conv_first"):
        record("conv_first_ms", round(timeit(
            lambda v: _conv(v, sp["Conv_0"]["Conv_0"]), x_mid) * 1e3, 2))

    def group_fn(y):
        y0 = y

        def pair_body(y, pp):
            y = _hab(y, pp["HABlock_0"], shift=0, ws=ws, nh=nh,
                     conv_scale=cs, interpret=interp)
            y = _hab(y, pp["HABlock_1"], shift=ws // 2, ws=ws, nh=nh,
                     conv_scale=cs, interpret=interp)
            return y, None

        y, _ = jax.lax.scan(pair_body, y, gp["hab_pairs"])
        y = _ocab(y, gp["OverlappingCrossAttention_0"], ws=ws, nh=nh,
                  overlap_ratio=model.stage2.overlap_ratio, use_rpb=False)
        return y0 + _conv(y, gp["Conv_0"]["Conv_0"])

    if on("group"):
        record("group_ms", round(timeit(group_fn, feat) * 1e3, 2))

    def pair_fn(y):
        y = _hab(y, hp["HABlock_0"], shift=0, ws=ws, nh=nh,
                 conv_scale=cs, interpret=interp)
        return _hab(y, hp["HABlock_1"], shift=ws // 2, ws=ws, nh=nh,
                    conv_scale=cs, interpret=interp)

    if on("hab_pair"):
        record("hab_pair_ms", round(timeit(pair_fn, feat) * 1e3, 2))
    if on("cab"):
        record("cab_ms", round(timeit(
            lambda v: _cab_fused(v, hp["HABlock_0"], interp),
            feat) * 1e3, 2))

    if on("habk"):
        wa = _wa_weights(hp["HABlock_0"], nh, ws, jnp.bfloat16)
        wins = window_partition(feat, ws)
        record("habk_ms", round(timeit(
            lambda v: fused_hab_block(v, v, nh, interp, wa, None),
            wins) * 1e3, 2))

    op = gp["OverlappingCrossAttention_0"]
    if on("ocab"):
        record("ocab_ms", round(timeit(
            lambda v: _ocab(v, op, ws=ws, nh=nh,
                            overlap_ratio=model.stage2.overlap_ratio,
                            use_rpb=False), feat) * 1e3, 2))

    from superresolution_tpu.ops.unfold import (
        _extract_loop, extract_overlapping_windows)

    def make_ocab_kv_fn(gather):
        def ocab_kv_fn(y):
            b, h, w, c = y.shape
            ows = int(ws * 1.5)
            pad = (ows - ws) // 2
            kv = _dense(_ln(y, op["LayerNorm_0"]), op["Dense_0"])
            kv = jnp.pad(kv, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            return gather(kv, ws, ows, h // ws, w // ws)

        return ocab_kv_fn

    # ocab_kv: the superseded 144-strided-slice gather (the reference
    # construction, kept in ops/unfold.py as the odd-geometry fallback);
    # ocab_kv_cell: the deployed cell-decomposed gather.
    if on("ocab_kv"):
        record("ocab_kv_ms", round(timeit(
            make_ocab_kv_fn(_extract_loop), feat) * 1e3, 2))
    if on("ocab_kv_cell"):
        record("ocab_kv_cell_ms", round(timeit(
            make_ocab_kv_fn(extract_overlapping_windows), feat) * 1e3, 2))

    def tail_fn(y):
        y = _conv(y, sp["Conv_1"]["Conv_0"])
        up = sp["PixelShuffleUpsampler_0"]
        y = _conv(y, up["Conv_0"]["Conv_0"])
        y = depth_to_space(y, 2)
        return _conv(y, sp["Conv_2"]["Conv_0"])

    if on("tail"):
        record("tail_ms", round(timeit(tail_fn, feat) * 1e3, 2))


if __name__ == "__main__":
    main()
