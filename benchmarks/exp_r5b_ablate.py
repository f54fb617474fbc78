"""Which op class makes the fused dense-block kernel slow?

exp_r5 whole-stage (rb=28): 33.0 ms vs XLA 29.8 — but the dots alone
should cost ~6 ms. ~130 us/block is machinery. Candidates: pltpu.roll,
iota %// masks (wp=432 is not a power of two), sub-tile (32-lane)
slices/concats, the 3-dy lane concat.

Variants (same IO pattern, rb=28; ms is what matters, math may be fake):
  base      — the real kernel body
  norolls   — rolls replaced by plain adds
  nomasks   — pad/row masks dropped
  nosubtile — all y-piece reads replaced by full-tile xf slices
  nodycat   — lhs = single dy slab (1/3 dot FLOPs): concat cost probe
  dotsonly  — 5 stages of A-dots only, no B/C/rolls/masks

Usage (on the TPU chip): python benchmarks/exp_r5b_ablate.py
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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

import benchmarks.exp_r5_fused_dense as r5

B, H, W = r5.B, r5.H, r5.W
G, C = r5.G, r5.C
HALO = 5


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def lrelu_k(x):
    return (jnp.maximum(x, jnp.asarray(0, x.dtype))
            + jnp.asarray(0.2, x.dtype)
            * jnp.minimum(x, jnp.asarray(0, x.dtype)))


def _kernel(top_ref, mid_ref, bot_ref,
            a_px, b_px, c_px, bias_px,
            a_b, b_b, c_b, a_c, b_c, c_c, a_d, b_d, c_d, a_e, b_e, c_e,
            out_ref, *, rb, wp, pad_l, width, nb, h_img, variant):
    row_start = (pl.program_id(0) % nb) * rb
    top = top_ref[0].reshape(HALO * wp, C)
    mid = mid_ref[0].reshape(rb * wp, C)
    bot = bot_ref[0].reshape(HALO * wp, C)
    xf = jnp.concatenate([top, mid, bot], axis=0)

    def mask_rows(t, k):
        if variant == "nomasks":
            return t
        m = t.shape[0]
        r_img = (row_start - HALO + k
                 + jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) // wp)
        valid = (r_img >= 0) & (r_img < h_img)
        return jnp.where(valid, t, jnp.asarray(0, t.dtype))

    def mask_pads(t):
        if variant == "nomasks":
            return t
        m = t.shape[0]
        cp = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % wp
        valid = (cp >= pad_l) & (cp < pad_l + width)
        return jnp.where(valid, t, jnp.asarray(0, t.dtype))

    def rconv(u, a, b, cm, bias=None):
        mu = u.shape[0]
        mo = mu - 2 * wp
        if variant == "nodycat":
            lhs = u[wp:wp + mo]
            a = a[:u.shape[1]]
            b = b[:u.shape[1]]
            cm = cm[:u.shape[1]]
        else:
            lhs = jnp.concatenate(
                [u[0:mo], u[wp:wp + mo], u[2 * wp:2 * wp + mo]], axis=1)
        acc = jnp.dot(lhs, a, preferred_element_type=jnp.float32)
        if bias is not None:
            acc = acc + bias
        if variant != "dotsonly":
            pb = jnp.dot(lhs, b, preferred_element_type=jnp.float32)
            pc = jnp.dot(lhs, cm, preferred_element_type=jnp.float32)
            if variant == "norolls":
                acc = acc + pb + pc
            else:
                acc = acc + pltpu.roll(pb, 1, 0)
                acc = acc + pltpu.roll(pc, mo - 1, 0)
        return mask_pads(acc.astype(u.dtype))

    px = rconv(xf, a_px[:], b_px[:], c_px[:], bias_px[:])

    if variant == "nosubtile":
        # all downstream inputs are full-tile xf slices (fake math)
        y1 = mask_rows(lrelu_k(xf[0:px.shape[0]]), 1)          # 64 ch
        y2s = rconv(y1, a_c[:], b_c[:], c_c[:])                # 64->32
        y2 = mask_rows(lrelu_k(y2s), 2)
        y12 = jnp.concatenate([xf[0:y2.shape[0]], xf[0:y2.shape[0]]],
                              axis=1)                          # 128 ch
        y3s = rconv(y12, a_e[:], b_e[:], c_e[:])               # 128->64
        m3 = y3s.shape[0]
        y3 = mask_rows(lrelu_k(y3s), 3)
        y123 = jnp.concatenate([xf[0:m3 - 2 * wp + 2 * wp], y3], axis=1)
        y4s = rconv(y123[0:m3], a_e[:], b_e[:], c_e[:])        # 128->64
        m4 = y4s.shape[0]
        y4 = mask_rows(lrelu_k(y4s), 4)
        yall = jnp.concatenate([xf[0:m4], y4], axis=1)         # 128 ch
        e = rconv(yall, a_e[:], b_e[:], c_e[:])
        mo = e.shape[0]
        acc = e
        xc = xf[HALO * wp:HALO * wp + mo]
        out = xc + acc * jnp.asarray(0.2, xc.dtype)
        out_ref[0] = out.reshape(rb, wp, C)
        return

    y1 = mask_rows(lrelu_k(px[:, 0:G]), 1)
    y2s = rconv(y1, a_b[:], b_b[:], c_b[:])
    y2 = mask_rows(lrelu_k(px[wp:wp + y2s.shape[0], G:2 * G] + y2s), 2)
    y12 = jnp.concatenate([y1[wp:wp + y2.shape[0]], y2], axis=1)
    y3s = rconv(y12, a_c[:], b_c[:], c_c[:])
    m3 = y3s.shape[0]
    y3 = mask_rows(lrelu_k(px[2 * wp:2 * wp + m3, 2 * G:3 * G] + y3s), 3)
    y123 = jnp.concatenate([y12[wp:wp + m3], y3], axis=1)
    y4s = rconv(y123, a_d[:], b_d[:], c_d[:])
    m4 = y4s.shape[0]
    y4 = mask_rows(lrelu_k(px[3 * wp:3 * wp + m4, 3 * G:4 * G] + y4s), 4)
    yall = jnp.concatenate([y123[wp:wp + m4], y4], axis=1)
    e = rconv(yall, a_e[:], b_e[:], c_e[:])
    mo = e.shape[0]
    acc = px[4 * wp:4 * wp + mo, 4 * G:] + e
    xc = xf[HALO * wp:HALO * wp + mo]
    out = xc + acc * jnp.asarray(0.2, xc.dtype)
    out_ref[0] = out.reshape(rb, wp, C)


def run_variant(variant, rb=28):
    p = r5.make_proj_params(jax.random.key(7))
    gw = r5.gather_weights(p)
    x = jax.random.normal(jax.random.key(1), (B, H, W, C),
                          jnp.bfloat16) * 0.5
    xp = r5.pack(x)
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

    weights = [gw["px"][0], gw["px"][1], gw["px"][2], gw["px_bias"],
               *gw["b"], *gw["c"], *gw["d"], *gw["e"]]

    def call(tops, mid, bots):
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
                return call(tops, u, bots)
            return jax.lax.fori_loop(0, iters, body, m0)

        jax.block_until_ready(chained(mid))
        t0 = time.perf_counter()
        jax.block_until_ready(chained(mid))
        dt = (time.perf_counter() - t0) / 12
    except Exception as e:
        record(f"ablate_{variant}_rb{rb}",
               f"FAILED {type(e).__name__}: ...{str(e)[-250:]}")
        return
    record(f"ablate_{variant}_rb{rb}",
           {"ms": round(dt * 1e3, 3),
            "us_per_block": round(dt * 1e6 / (b * nb), 1)})


def main():
    for v in ("base", "norolls", "nomasks", "dotsonly", "nodycat",
              "nosubtile"):
        run_variant(v)


if __name__ == "__main__":
    main()
