"""Fused dense-block kernel, PROJ layout — round 2 of the design.

exp_r5c measured the Mosaic dot classes: N=32 outputs cap at ~31 TF/s
(the gather layout's fatal flaw — 19% of MACs), while (192,192) runs
101.5 and (96,160) 71.8. The FusedDenseBlock's own projection layout
keeps every conv's N >= 64:

    px: K=192 N=192   p1: K=96 N=160   p2: K=96 N=128
    p3: K=96 N=96     p4: K=96 N=64

and the inter-conv glue touches only 32-wide segment tensors. One
combined (pad & image-row) mask per conv suffices: lrelu(0)=0 and the
zero-masked segments propagate zeros exactly like the reference's
SAME-pad intermediates.

Usage (on the TPU chip): python benchmarks/exp_r5d_proj.py
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


def proj_weights(p, dtype=jnp.bfloat16):
    """proj-layout params -> per-conv (A, B, C) [3*cin, n] dy-stacks."""
    out = {}
    for name in ("px", "p1", "p2", "p3", "p4"):
        w = np.asarray(p[name], np.float32)
        cin, n = w.shape[2], w.shape[3]
        out[name] = tuple(
            jnp.asarray(w[:, dx].reshape(3 * cin, n), dtype)
            for dx in (1, 0, 2))
    out["px_bias"] = jnp.asarray(np.asarray(p["px_b"]).reshape(1, -1),
                                 jnp.float32)
    return out


def _kernel(top_ref, mid_ref, bot_ref,
            a_px, b_px, c_px, bias_px,
            a_1, b_1, c_1, a_2, b_2, c_2, a_3, b_3, c_3, a_4, b_4, c_4,
            out_ref, *, rb, wp, pad_l, width, nb, h_img):
    row_start = (pl.program_id(0) % nb) * rb
    r0 = rb + 2 * HALO

    top = top_ref[0].reshape(HALO * wp, C)
    mid = mid_ref[0].reshape(rb * wp, C)
    bot = bot_ref[0].reshape(HALO * wp, C)
    xf = jnp.concatenate([top, mid, bot], axis=0)

    # one [r0*wp, 1] validity vector, sliced per stage k: combines the
    # W-pad mask with the image-row mask for rows starting at
    # (row_start - HALO + k)
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
        acc = jnp.dot(lhs, a, preferred_element_type=jnp.float32)
        if bias is not None:
            acc = acc + bias
        pb = jnp.dot(lhs, b, preferred_element_type=jnp.float32)
        acc = acc + pltpu.roll(pb, 1, 0)
        pc = jnp.dot(lhs, cm, preferred_element_type=jnp.float32)
        acc = acc + pltpu.roll(pc, mo - 1, 0)
        acc = jnp.where(valid(k, mo), acc, 0.0)
        return acc.astype(u.dtype)

    px = rconv(xf, a_px[:], b_px[:], c_px[:], 1, bias_px[:])
    y1 = lrelu_k(px[:, 0:G])

    p1 = rconv(y1, a_1[:], b_1[:], c_1[:], 2)
    m2 = p1.shape[0]
    y2 = lrelu_k(px[wp:wp + m2, G:2 * G] + p1[:, 0:G])

    p2 = rconv(y2, a_2[:], b_2[:], c_2[:], 3)
    m3 = p2.shape[0]
    y3 = lrelu_k(px[2 * wp:2 * wp + m3, 2 * G:3 * G]
                 + p1[wp:wp + m3, G:2 * G] + p2[:, 0:G])

    p3 = rconv(y3, a_3[:], b_3[:], c_3[:], 4)
    m4 = p3.shape[0]
    y4 = lrelu_k(px[3 * wp:3 * wp + m4, 3 * G:4 * G]
                 + p1[2 * wp:2 * wp + m4, 2 * G:3 * G]
                 + p2[wp:wp + m4, G:2 * G] + p3[:, 0:G])

    p4 = rconv(y4, a_4[:], b_4[:], c_4[:], 5)
    mo = p4.shape[0]

    acc = (px[4 * wp:4 * wp + mo, 4 * G:]
           + p1[3 * wp:3 * wp + mo, 3 * G:]
           + p2[2 * wp:2 * wp + mo, 2 * G:]
           + p3[wp:wp + mo, G:] + p4)
    xc = xf[HALO * wp:HALO * wp + mo]
    out = xc + acc * jnp.asarray(0.2, xc.dtype)
    out_ref[0] = out.reshape(rb, wp, C)


def fused_dense_proj(xp, pw, rb=28):
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
    out = pl.pallas_call(
        partial(_kernel, rb=rb, wp=wp, pad_l=8, width=W, nb=nb, h_img=h),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        grid=(b * nb,),
        in_specs=[spec_edge, spec_mid, spec_edge] + [cw(t) for t in weights],
        out_specs=spec_mid,
        out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp, c), xp.dtype),
    )(tops, mid, bots, *weights)
    return out.reshape(b, h, wp, c)


def main():
    p = r5.make_proj_params(jax.random.key(7))
    pw = proj_weights(p)
    x = jax.random.normal(jax.random.key(0), (1, 28, W, C),
                          jnp.bfloat16) * 0.5
    try:
        got = r5.unpack(fused_dense_proj(r5.pack(x), pw, rb=14))
        ref = r5.block_proj_ref(x, p)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        record("proj_correctness", {"max_err": round(err, 5),
                                    "rel_err": round(rel, 5)})
    except Exception as e:
        record("proj_correctness", f"FAILED ...{str(e)[-400:]}")
        return

    xb = jax.random.normal(jax.random.key(1), (B, H, W, C),
                           jnp.bfloat16) * 0.5
    xpb = r5.pack(xb)
    macs = B * H * W * 9 * (C * (4 * G + C) + G * (3 * G + C)
                            + G * (2 * G + C) + G * (G + C) + G * C)
    for rb in (28, 56, 14):
        try:
            @jax.jit
            def chained(v, iters=12, rb=rb):
                def body(_, u):
                    return fused_dense_proj(u, pw, rb=rb)
                return jax.lax.fori_loop(0, iters, body, v)

            jax.block_until_ready(chained(xpb))
            t0 = time.perf_counter()
            jax.block_until_ready(chained(xpb))
            dt = (time.perf_counter() - t0) / 12
        except Exception as e:
            record(f"proj_rb{rb}", f"FAILED ...{str(e)[-250:]}")
            continue
        record(f"proj_rb{rb}", {"ms": round(dt * 1e3, 3),
                                "tf_s_useful": round(2 * macs / dt / 1e12,
                                                     1)})


if __name__ == "__main__":
    main()
