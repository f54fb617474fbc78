"""im2col9 dense-block kernel: machinery breakdown at rb=47/wp=416.

exp_r7 measured ship (roll-conv) == im2col9 == ~29.4 ms — both
formulations land at 36.8 TF/s useful, so the dots are NOT the binding
cost. This isolates the pieces:

  pure dot rates   — exp_r5c-style in-VMEM dot chains at the EXACT
                     im2col9 shapes (K=576 N=192; K=288 N=160..64)
  v9_dotsonly      — im2col9 kernel with the +-1 shifts dropped (all 9
                     slices from u; wrong math, isolates shift cost)
  v9_nomask        — masks dropped (wrong at edges; isolates mask cost)
  v9_mask2d        — masks via free [rows,wp,n] reshape + 2D iota
                     (no per-element mod/div by non-pow2 wp)

Usage (on the TPU chip): python benchmarks/exp_r7b_ablate.py
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
import benchmarks.exp_r7_im2col9 as r7
from superresolution_tpu.ops.pallas_dense_trunk import PAD, pack, pick_rb

G, C = r5.G, r5.C
B, H, W = 15, 376, 400
TH, BH = r7.TH, r7.BH


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def _lrelu(x):
    return (jnp.maximum(x, jnp.asarray(0, x.dtype))
            + jnp.asarray(0.2, x.dtype)
            * jnp.minimum(x, jnp.asarray(0, x.dtype)))


def make_kernel(mode):
    def _kernel(top_ref, mid_ref, bot_ref, *w_refs, out_ref=None,
                rb, wp, width, nb, h_img, g, c):
        (w_px, bias_px, w_1, w_2, w_3, w_4) = w_refs
        row_start = (pl.program_id(0) % nb) * rb
        top = top_ref[0].reshape(TH * wp, c)
        mid = mid_ref[0].reshape(rb * wp, c)
        bot = bot_ref[0].reshape(BH * wp, c)
        xf = jnp.concatenate([top, mid, bot], axis=0)

        def rconv9(u, w, stage, bias=None):
            mu = u.shape[0]
            mo = mu - 3 * wp
            if mode == "dotsonly":
                srcs = (u, u, u)
            elif mode == "rollshift":
                # +-1 token shifts via 32-bit pltpu.roll on an f32 view
                # (16-bit rotate unsupported; sublane-concat shifts may
                # lower badly) — cast once, roll twice, cast back.
                uf = u.astype(jnp.float32)
                u_p = pltpu.roll(uf, 1, 0).astype(u.dtype)
                u_m = pltpu.roll(uf, mu - 1, 0).astype(u.dtype)
                srcs = (u_p, u, u_m)
            else:
                u_p = jnp.concatenate([u[mu - 1:], u[:mu - 1]], axis=0)
                u_m = jnp.concatenate([u[1:], u[:1]], axis=0)
                srcs = (u_p, u, u_m)
            slices = []
            for kk in range(3):
                base = (kk + 1) * wp
                for src in srcs:
                    slices.append(src[base:base + mo])
            lhs = jnp.concatenate(slices, axis=1)
            acc = jnp.dot(lhs, w[:], preferred_element_type=jnp.float32)
            if bias is not None:
                acc = acc + bias[:]
            out = acc.astype(u.dtype)
            if mode == "nomask":
                return out
            if mode in ("mask2d", "rollshift"):
                rows = mo // wp
                o2 = out.reshape(rows, wp, out.shape[1])
                col = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
                row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
                r_img = row + (row_start - TH + 2 * stage)
                ok = ((col >= PAD) & (col < PAD + width)
                      & (r_img >= 0) & (r_img < h_img))
                o2 = jnp.where(ok, o2, jnp.asarray(0, o2.dtype))
                return o2.reshape(mo, out.shape[1])
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
                    pre = pre + ps[j - 1][
                        2 * (i - j) * wp:2 * (i - j) * wp + m,
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

    return _kernel


def run_variant(mode, xp, weights, width, rb):
    b, h, wp, c = xp.shape
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

    kern = make_kernel(mode)

    def kernel(*refs):
        *ins, out = refs
        kern(*ins, out_ref=out, rb=rb, wp=wp, width=width, nb=nb,
             h_img=h, g=G, c=c)

    return pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        grid=(b * nb,),
        in_specs=[spec_top, spec_mid, spec_bot] + [cw(t) for t in weights],
        out_specs=spec_mid,
        out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp, c), xp.dtype),
    )(tops, mid, bots, *weights)


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
    # pure dot rates at the exact im2col9 shapes
    import benchmarks.exp_r5c_dotshapes as r5c

    rb = pick_rb(H, 416)
    wp = 416
    shapes = [((rb + 12) * wp // 16, 576, 192),
              ((rb + 9) * wp // 16, 288, 160),
              ((rb + 6) * wp // 16, 288, 128),
              ((rb + 3) * wp // 16, 288, 96),
              (rb * wp // 16, 288, 64)]
    for m, k, n in shapes:
        m16 = -(-m // 16) * 16
        r5c.rate(m16, k, n)

    p = r5.make_proj_params(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (B, H, W, C),
                          jnp.float32) * 0.1
    xb = pack(x.astype(jnp.bfloat16))
    w_9 = r7.im2col_weights(p)
    macs = B * H * W * 9 * (C * (4 * G + C) + G * (3 * G + C)
                            + G * (2 * G + C) + G * (G + C) + G * C)
    for mode in ("mask2d", "dotsonly", "nomask", "rollshift"):
        fn = lambda v: run_variant(mode, v, w_9, W, rb).reshape(v.shape)
        t = timeit(fn, xb)
        record(f"{mode}_ms", round(t * 1e3, 2))
        record(f"{mode}_tfs", round(2 * macs / t / 1e12, 1))

    # production roll-conv kernel (now with 2D masks) on the same harness
    from superresolution_tpu.ops.pallas_dense_trunk import (
        fused_dense_block, proj_weights)

    w_ship = proj_weights({
        "Conv_0": {"Conv_0": {"kernel": p["px"], "bias": p["px_b"]}},
        **{f"proj_y{i}": {"kernel": p[f"p{i}"]} for i in range(1, 5)},
    })
    fn = lambda v: fused_dense_block(v, w_ship, width=W, rb=rb)
    t = timeit(fn, xb)
    record("ship2d_ms", round(t * 1e3, 2))
    record("ship2d_tfs", round(2 * macs / t / 1e12, 1))


if __name__ == "__main__":
    main()
