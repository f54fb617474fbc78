"""Proj-layout fused dense block: machinery ablation + bf16 accumulate.

proj rb28 = 28.4 ms (41.3 TF/s useful) vs XLA 29.8 — dots should be
~13 ms, so ~15 ms is machinery. Variants:
  base      — exp_r5d kernel as-is (f32 accumulate)
  bf16acc   — dots emit bf16, adds/rolls/masks all bf16
  norolls   — bf16acc, rolls replaced by adds (wrong math)
  nomasks   — bf16acc, masks dropped (wrong at edges)
  dotsonly  — bf16acc, A-dots only
  noslice   — bf16acc, y_i = full first-32 slice of the PREVIOUS dot
              output without px-segment adds (wrong math; probes the
              sub-tile slice-add cost)

Usage (on the TPU chip): python benchmarks/exp_r5e_proj_ablate.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

import benchmarks.exp_r5_fused_dense as r5
import benchmarks.exp_r5d_proj as r5d

B, H, W = r5.B, r5.H, r5.W
G, C = r5.G, r5.C
HALO = 5


def record(key, value):
    print(json.dumps({key: value}), flush=True)


lrelu_k = r5d.lrelu_k


def _kernel(top_ref, mid_ref, bot_ref,
            a_px, b_px, c_px, bias_px,
            a_1, b_1, c_1, a_2, b_2, c_2, a_3, b_3, c_3, a_4, b_4, c_4,
            out_ref, *, rb, wp, pad_l, width, nb, h_img, variant):
    row_start = (pl.program_id(0) % nb) * rb
    # Mosaic rejects bf16-output tpu.matmul AND bf16 dynamic_rotate:
    # dots and rolls stay f32; only the ablation variants without rolls
    # can run the cast-early bf16 path
    bf16 = variant in ("norolls", "dotsonly")

    top = top_ref[0].reshape(HALO * wp, C)
    mid = mid_ref[0].reshape(rb * wp, C)
    bot = bot_ref[0].reshape(HALO * wp, C)
    xf = jnp.concatenate([top, mid, bot], axis=0)

    def valid(k, m):
        idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        cp = idx % wp
        r_img = row_start - HALO + k + idx // wp
        return ((cp >= pad_l) & (cp < pad_l + width)
                & (r_img >= 0) & (r_img < h_img))

    def rconv(u, a, b, cm, k, bias=None):
        mu = u.shape[0]
        mo = mu - 2 * wp
        lhs = jnp.concatenate(
            [u[0:mo], u[wp:wp + mo], u[2 * wp:2 * wp + mo]], axis=1)
        def dot(x, w):
            r = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return r.astype(jnp.bfloat16) if bf16 else r

        acc = dot(lhs, a)
        if bias is not None:
            acc = acc + bias.astype(acc.dtype)
        if variant != "dotsonly":
            pb = dot(lhs, b)
            pc = dot(lhs, cm)
            if variant == "norolls":
                acc = acc + pb + pc
            else:
                acc = acc + pltpu.roll(pb, 1, 0)
                acc = acc + pltpu.roll(pc, mo - 1, 0)
        if variant != "nomasks" and (k == 1 or variant == "base"):
            # single-mask invariant ('1mask' variants): only px carries a
            # bias, so masking px alone keeps pads/halo rows exactly zero
            # through the bias-free p-convs; roll-wrap garbage stays
            # confined to pad cols 0..4 (< pad_l=8) and never reaches a
            # real column even across chained blocks
            acc = jnp.where(valid(k, mo), acc, jnp.asarray(0, acc.dtype))
        return acc.astype(u.dtype)

    px = rconv(xf, a_px[:], b_px[:], c_px[:], 1, bias_px[:])
    y1 = lrelu_k(px[:, 0:G])

    p1 = rconv(y1, a_1[:], b_1[:], c_1[:], 2)
    m2 = p1.shape[0]
    if variant == "noslice":
        y2 = lrelu_k(p1[:, 0:G])
    else:
        y2 = lrelu_k(px[wp:wp + m2, G:2 * G] + p1[:, 0:G])

    p2 = rconv(y2, a_2[:], b_2[:], c_2[:], 3)
    m3 = p2.shape[0]
    if variant == "noslice":
        y3 = lrelu_k(p2[:, 0:G])
    else:
        y3 = lrelu_k(px[2 * wp:2 * wp + m3, 2 * G:3 * G]
                     + p1[wp:wp + m3, G:2 * G] + p2[:, 0:G])

    p3 = rconv(y3, a_3[:], b_3[:], c_3[:], 4)
    m4 = p3.shape[0]
    if variant == "noslice":
        y4 = lrelu_k(p3[:, 0:G])
    else:
        y4 = lrelu_k(px[3 * wp:3 * wp + m4, 3 * G:4 * G]
                     + p1[2 * wp:2 * wp + m4, 2 * G:3 * G]
                     + p2[wp:wp + m4, G:2 * G] + p3[:, 0:G])

    p4 = rconv(y4, a_4[:], b_4[:], c_4[:], 5)
    mo = p4.shape[0]

    if variant == "noslice":
        acc = p4
    else:
        acc = (px[4 * wp:4 * wp + mo, 4 * G:]
               + p1[3 * wp:3 * wp + mo, 3 * G:]
               + p2[2 * wp:2 * wp + mo, 2 * G:]
               + p3[wp:wp + mo, G:] + p4)
    xc = xf[HALO * wp:HALO * wp + mo]
    out = xc + acc * jnp.asarray(0.2, xc.dtype)
    out_ref[0] = out.reshape(rb, wp, C)


def run(variant, rb=28, shape=None):
    p = r5.make_proj_params(jax.random.key(7))
    pw = r5d.proj_weights(p)
    bb, hh, ww = shape or (B, H, W)
    xb = jax.random.normal(jax.random.key(1), (bb, hh, ww, C),
                           jnp.bfloat16) * 0.5
    wp2 = -(-(ww + 2) // 16) * 16
    xp = jnp.pad(xb, ((0, 0), (0, 0), (8, wp2 * 1 - ww - 8 + 0), (0, 0)))
    b, h, wp, c = xp.shape
    nb = h // rb
    xh = jnp.pad(xp, ((0, 0), (HALO, HALO), (0, 0), (0, 0)))
    mid = xh[:, HALO:HALO + h].reshape(b * nb, rb, wp, c)
    tops = jnp.stack([xh[:, i * rb:i * rb + HALO] for i in range(nb)],
                     axis=1).reshape(b * nb, HALO, wp, c)
    bots = jnp.stack(
        [xh[:, HALO + (i + 1) * rb:2 * HALO + (i + 1) * rb]
         for i in range(nb)], axis=1).reshape(b * nb, HALO, wp, c)
    spec_mid = pl.BlockSpec((1, rb, wp, c), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_edge = pl.BlockSpec((1, HALO, wp, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)

    def cw(t):
        return pl.BlockSpec(t.shape, lambda i: (0,) * t.ndim,
                            memory_space=pltpu.VMEM)

    weights = [pw["px"][0], pw["px"][1], pw["px"][2], pw["px_bias"],
               *pw["p1"], *pw["p2"], *pw["p3"], *pw["p4"]]

    def call(mid):
        return pl.pallas_call(
            partial(_kernel, rb=rb, wp=wp, pad_l=8, width=W, nb=nb,
                    h_img=h, variant=variant),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            grid=(b * nb,),
            in_specs=[spec_edge, spec_mid, spec_edge]
            + [cw(t) for t in weights],
            out_specs=spec_mid,
            out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp, c), xp.dtype),
        )(tops, mid, bots, *weights)

    try:
        @jax.jit
        def chained(m0, iters=12):
            def body(_, u):
                return call(u)
            return jax.lax.fori_loop(0, iters, body, m0)

        jax.block_until_ready(chained(mid))
        t0 = time.perf_counter()
        jax.block_until_ready(chained(mid))
        dt = (time.perf_counter() - t0) / 12
    except Exception as e:
        record(f"proj_{variant}_rb{rb}", f"FAILED ...{str(e)[-220:]}")
        return
    macs = bb * hh * ww * 9 * (C * (4 * G + C) + G * (3 * G + C)
                                + G * (2 * G + C) + G * (G + C) + G * C)
    record(f"proj_{variant}_rb{rb}_h{hh}",
           {"ms": round(dt * 1e3, 3),
            "tf_s_useful": round(2 * macs / dt / 1e12, 1)})


def chain_correct():
    """1mask invariant: TWO chained blocks must equal the XLA reference
    applied twice (pad garbage must never leak into real pixels)."""
    p = r5.make_proj_params(jax.random.key(7))
    pw = r5d.proj_weights(p)
    x = jax.random.normal(jax.random.key(3), (1, 24, W, C),
                          jnp.bfloat16) * 0.5
    xp = r5.pack(x)
    b, h, wp, c = xp.shape
    rb = 8
    nb = h // rb

    def one(xp):
        xh = jnp.pad(xp, ((0, 0), (HALO, HALO), (0, 0), (0, 0)))
        mid = xh[:, HALO:HALO + h].reshape(b * nb, rb, wp, c)
        tops = jnp.stack([xh[:, i * rb:i * rb + HALO] for i in range(nb)],
                         axis=1).reshape(b * nb, HALO, wp, c)
        bots = jnp.stack(
            [xh[:, HALO + (i + 1) * rb:2 * HALO + (i + 1) * rb]
             for i in range(nb)], axis=1).reshape(b * nb, HALO, wp, c)
        spec_mid = pl.BlockSpec((1, rb, wp, c), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        spec_edge = pl.BlockSpec((1, HALO, wp, c), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

        def cw(t):
            return pl.BlockSpec(t.shape, lambda i: (0,) * t.ndim,
                                memory_space=pltpu.VMEM)

        weights = [pw["px"][0], pw["px"][1], pw["px"][2], pw["px_bias"],
                   *pw["p1"], *pw["p2"], *pw["p3"], *pw["p4"]]
        out = pl.pallas_call(
            partial(_kernel, rb=rb, wp=wp, pad_l=8, width=W, nb=nb,
                    h_img=h, variant="1mask"),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            grid=(b * nb,),
            in_specs=[spec_edge, spec_mid, spec_edge]
            + [cw(t) for t in weights],
            out_specs=spec_mid,
            out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp, c), xp.dtype),
        )(tops, mid, bots, *weights)
        return out.reshape(b, h, wp, c)

    got = r5.unpack(one(one(xp)))
    ref = r5.block_proj_ref(r5.block_proj_ref(x, p), p)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    record("chain2_1mask_err", round(err, 5))


def main():
    chain_correct()
    run("1mask", rb=47, shape=(15, 376, 400))
    run("1mask", rb=94, shape=(15, 376, 400))
    run("1mask", rb=98)


if __name__ == "__main__":
    main()
