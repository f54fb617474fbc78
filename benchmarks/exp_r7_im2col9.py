"""Fused dense block, im2col-9 formulation: ONE dot per conv.

The shipped roll-conv kernel (ops/pallas_dense_trunk.py) runs each conv
as 3 dots of K=3*cin (A/B/C dx taps) + 2 f32 rolls on the dot outputs.
exp_r5c showed Mosaic dots hit 198 TF/s only at K>=384 — the px stage's
K=192 dots and the p_i stages' K=96 dots sit well below, and the two
[mo,N] f32 rolls per conv are pure traffic.

This prototype builds the FULL 9-tap im2col lhs in VMEM instead:

    lhs = lane-concat of 9 sublane-shifted slices       [mo, 9*cin]
    out = lhs @ W9 (+bias, pad mask)                    one dot, K=9cin

px: K=576 N=192 (the fast class); p_i: K=288 N=160/128/96/64.

The dx=-1 tap of the first output token lives one token BEFORE the
frame start (slice start -1). Fix: give each stage 2 top halo rows
(one junk row) so every slice start is >= wp-1: top halo 10 rows total,
bottom 5; each stage consumes 2 top + 1 bottom rows. FLOP overhead
(rb+12.5-avg)/(rb+7.5-avg) vs roll-conv — ~2% at rb=47 — for the shot
at 2-4x dot rate.

Wrap behavior: a d=+-1 slice crossing a row boundary reads the
neighbor row's opposite pad column, which is zero (masks re-zero pads
after every stage) — same confinement as the roll-conv kernel.

Variants:
  ship     — the shipped fused_dense_block (roll-conv, proj layout)
  im2col9  — this formulation, all 5 stages
  hybrid   — px as im2col9 (K=576), p_i as roll-conv (the 32-lane
             9-slice concat may price differently than the dot gain)

Usage (on the TPU chip): python benchmarks/exp_r7_im2col9.py
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
from superresolution_tpu.ops.pallas_dense_trunk import (
    PAD,
    fused_dense_block,
    pack,
    pick_rb,
    proj_weights,
    unpack,
)

G, C = r5.G, r5.C
B, H, W = 15, 376, 400  # the v8 bench tile batch (halo 8)
TH, BH = 10, 5


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def im2col_weights(p, dtype=jnp.bfloat16):
    """proj params -> [W9_px, bias_px, W9_1..W9_4]; W9 = [9*cin, n]."""
    out = []
    kernels = [np.asarray(p["px"], np.float32)]
    for i in range(1, 5):
        kernels.append(np.asarray(p[f"p{i}"], np.float32))
    for j, w in enumerate(kernels):
        cin, n = w.shape[2], w.shape[3]
        out.append(jnp.asarray(w.reshape(9 * cin, n), dtype))
        if j == 0:
            out.append(jnp.asarray(
                np.asarray(p["px_b"], np.float32).reshape(1, n),
                jnp.float32))
    return out


def _lrelu(x):
    return (jnp.maximum(x, jnp.asarray(0, x.dtype))
            + jnp.asarray(0.2, x.dtype)
            * jnp.minimum(x, jnp.asarray(0, x.dtype)))


def _kernel9(top_ref, mid_ref, bot_ref, *w_refs, out_ref=None,
             rb, wp, width, nb, h_img, g, c):
    (w_px, bias_px, w_1, w_2, w_3, w_4) = w_refs
    row_start = (pl.program_id(0) % nb) * rb

    top = top_ref[0].reshape(TH * wp, c)
    mid = mid_ref[0].reshape(rb * wp, c)
    bot = bot_ref[0].reshape(BH * wp, c)
    xf = jnp.concatenate([top, mid, bot], axis=0)

    def rconv9(u, w, stage, bias=None):
        mu = u.shape[0]
        mo = mu - 3 * wp  # 2 top rows (1 junk + 1 halo) + 1 bottom
        # Mosaic rejects lane-concat of slices with mismatched sublane
        # phase, and has no 16-bit rotate — materialize the +-1 token
        # shifts as sublane concats (canonical phase), then every slice
        # start is a multiple of wp (16-aligned).
        u_p = jnp.concatenate([u[mu - 1:], u[:mu - 1]], axis=0)  # u[i-1]
        u_m = jnp.concatenate([u[1:], u[:1]], axis=0)            # u[i+1]
        slices = []
        for k in range(3):
            base = (k + 1) * wp
            for src in (u_p, u, u_m):
                slices.append(src[base:base + mo])
        lhs = jnp.concatenate(slices, axis=1)
        acc = jnp.dot(lhs, w[:], preferred_element_type=jnp.float32)
        if bias is not None:
            acc = acc + bias[:]
        out = acc.astype(u.dtype)
        idx = jax.lax.broadcasted_iota(jnp.int32, (mo, 1), 0)
        cp = idx % wp
        r_img = row_start - TH + 2 * stage + idx // wp
        ok = ((cp >= PAD) & (cp < PAD + width)
              & (r_img >= 0) & (r_img < h_img))
        return jnp.where(ok, out, jnp.asarray(0, out.dtype))

    px = rconv9(xf, w_px, 1, bias_px)
    ps = []
    ys = [_lrelu(px[:, 0:g])]
    pw = [w_1, w_2, w_3, w_4]
    for i in range(1, 5):
        p_i = rconv9(ys[-1], pw[i - 1], i + 1)
        ps.append(p_i)
        m = p_i.shape[0]
        if i < 4:
            pre = px[2 * i * wp:2 * i * wp + m, i * g:(i + 1) * g]
            for j in range(1, i + 1):
                pre = pre + ps[j - 1][2 * (i - j) * wp:2 * (i - j) * wp + m,
                                      (i - j) * g:(i - j + 1) * g]
            ys.append(_lrelu(pre))
    mo = ps[-1].shape[0]
    acc = px[8 * wp:8 * wp + mo, 4 * g:]
    for j in range(1, 5):
        acc = acc + ps[j - 1][2 * (4 - j) * wp:2 * (4 - j) * wp + mo,
                              (4 - j) * g:]
    xc = xf[TH * wp:TH * wp + mo]
    out = xc + acc * jnp.asarray(0.2, xc.dtype)
    out_ref[0] = out.reshape(rb, wp, c)


def fused_dense_block9(xp, weights, *, width, rb, interpret=False):
    b, h, wp, c = xp.shape
    g = G
    nb = h // rb
    xh = jnp.pad(xp, ((0, 0), (TH, BH), (0, 0), (0, 0)))
    mid = xh[:, TH:TH + h].reshape(b * nb, rb, wp, c)
    tops = jnp.stack([xh[:, i * rb:i * rb + TH] for i in range(nb)],
                     axis=1).reshape(b * nb, TH, wp, c)
    bots = jnp.stack(
        [xh[:, TH + (i + 1) * rb:TH + BH + (i + 1) * rb]
         for i in range(nb)], axis=1).reshape(b * nb, BH, wp, c)
    spec_mid = pl.BlockSpec((1, rb, wp, c), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_top = pl.BlockSpec((1, TH, wp, c), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_bot = pl.BlockSpec((1, BH, wp, c), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def cw(t):
        return pl.BlockSpec(t.shape, lambda i: (0,) * t.ndim,
                            memory_space=pltpu.VMEM)

    def kernel(*refs):
        *ins, out = refs
        _kernel9(*ins, out_ref=out, rb=rb, wp=wp, width=width, nb=nb,
                 h_img=h, g=g, c=c)

    out = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        grid=(b * nb,),
        in_specs=[spec_top, spec_mid, spec_bot] + [cw(t) for t in weights],
        out_specs=spec_mid,
        out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp, c), xp.dtype),
        interpret=interpret,
    )(tops, mid, bots, *weights)
    return out.reshape(b, h, wp, c)


def timeit(fn, x, iters=8, warmup=1):
    @jax.jit
    def chained(x):
        def body(_, v):
            return fn(v).astype(v.dtype)

        return jax.lax.fori_loop(0, iters, body, x)

    for _ in range(warmup):
        jax.block_until_ready(chained(x))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(x))
    return (time.perf_counter() - t0) / iters


def main():
    p = r5.make_proj_params(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (B, H, W, C),
                          jnp.float32) * 0.1
    xb = pack(x.astype(jnp.bfloat16))
    wp = xb.shape[2]
    rb = pick_rb(H, wp)
    record("geometry", f"B{B} H{H} W{W} wp{wp} rb{rb}")

    w_ship = proj_weights({
        "Conv_0": {"Conv_0": {"kernel": p["px"], "bias": p["px_b"]}},
        **{f"proj_y{i}": {"kernel": p[f"p{i}"]} for i in range(1, 5)},
    })
    w_9 = im2col_weights(p)

    ref = r5.block_proj_ref(x.astype(jnp.bfloat16), p)

    def ship(v):
        return fused_dense_block(v, w_ship, width=W, rb=rb)

    def nine(v):
        return fused_dense_block9(v, w_9, width=W, rb=rb)

    got_ship = unpack(ship(xb), W)
    got_9 = unpack(nine(xb), W)
    err_ship = float(jnp.max(jnp.abs(
        got_ship.astype(jnp.float32) - ref.astype(jnp.float32))))
    err_9 = float(jnp.max(jnp.abs(
        got_9.astype(jnp.float32) - ref.astype(jnp.float32))))
    record("max_err_ship_vs_xla", err_ship)
    record("max_err_im2col9_vs_xla", err_9)
    diff = float(jnp.max(jnp.abs(
        got_ship.astype(jnp.float32) - got_9.astype(jnp.float32))))
    record("max_err_im2col9_vs_ship", diff)

    # useful TFLOPs of one dense block on this batch
    macs = B * H * W * 9 * (C * (4 * G + C) + G * (3 * G + C)
                            + G * (2 * G + C) + G * (G + C) + G * C)
    t_ship = timeit(ship, xb)
    record("ship_ms", round(t_ship * 1e3, 2))
    record("ship_tfs", round(2 * macs / t_ship / 1e12, 1))
    t_9 = timeit(nine, xb)
    record("im2col9_ms", round(t_9 * 1e3, 2))
    record("im2col9_tfs", round(2 * macs / t_9 / 1e12, 1))
    record("speedup", round(t_ship / t_9, 3))


if __name__ == "__main__":
    main()
