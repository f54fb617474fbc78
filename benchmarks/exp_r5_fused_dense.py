"""Fused dense-block kernel — the whole 5-conv RRDB dense block in ONE
Pallas program ('roll-conv' formulation, zero FLOP overhead).

Rationale (exp_r4c/exp_r4d): per-conv kernels AND XLA's convs are bound
by the per-conv HBM round trip (~19.5us/block IO floor == XLA's 37.7
TF/s 'envelope'), while VMEM-resident Mosaic dots run at ~198 TF/s.
Fusing the block leaves ONE read of x and ONE write of the output.

Per conv (3x3 SAME), at p=1 (no pixel packing):
  lhs  = lane-concat of the 3 dy row-slices            [mo, 3c]
  A    = center (dx=0) taps stacked by dy              [3c, n]
  B/C  = dx=-1 / dx=+1 taps stacked by dy              [3c, n]
  out  = lhs@A + roll(lhs@B, +1) + roll(lhs@C, -1)     (+bias, pad mask)

Sub-128 lane slices/concats are legal on this Mosaic (probe T1-T4), so
the y1..y4 (32-lane) segment slices and gather-layout slabs need no
permutation tricks. Row offsets are multiples of Wp (W padded to a
16-multiple) so every dy slice is tile-aligned. The roll wrap garbage
lands only in W-pad columns, which are re-masked to zero after every
conv — the block output is pad-clean and chains.

The 5 convs cascade with a 5-row halo each side; each conv computes over
a 2-row-shrinking window ((rb+10) -> rb rows, FLOP overhead 1+20/(5*rb)).

Gather-layout weights are assembled host-side from the FusedDenseBlock
(proj-layout) params — same math, one reassociation.

Usage (on the TPU chip): python benchmarks/exp_r5_fused_dense.py
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

B, H, W = 15, 392, 416
G, C = 32, 64
HALO = 5  # 5 chained 3x3 convs


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def lrelu(x):
    return jnp.where(x >= 0, x, jnp.asarray(0.2, x.dtype) * x)


def lrelu_k(x):
    """In-kernel lrelu: max/min form — Mosaic cannot lower arith.cmpf on
    packed bf16 vectors (measured: 'cmpf vector<8x128x2xbf16>' rejects),
    while maximum/minimum lower fine."""
    return (jnp.maximum(x, jnp.asarray(0, x.dtype))
            + jnp.asarray(0.2, x.dtype) * jnp.minimum(x, jnp.asarray(0, x.dtype)))


def make_proj_params(key):
    ks = jax.random.split(key, 6)
    p = {
        "px": jax.random.normal(ks[0], (3, 3, C, 4 * G + C),
                                jnp.float32) * 0.05,
        "px_b": jax.random.normal(ks[5], (4 * G + C,), jnp.float32) * 0.02,
    }
    for i, n in ((1, 3 * G + C), (2, 2 * G + C), (3, G + C), (4, C)):
        p[f"p{i}"] = jax.random.normal(ks[i], (3, 3, G, n),
                                       jnp.float32) * 0.05
    return p


def block_proj_ref(x, p):
    """XLA reference: the FusedDenseBlock forward (models/rrdbnet.py)."""
    conv = lambda v, k: jax.lax.conv_general_dilated(
        v, k.astype(v.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(v.dtype)
    px = conv(x, p["px"]) + p["px_b"].astype(x.dtype)
    acc = px[..., 4 * G:]
    y1 = lrelu(px[..., :G])
    p1 = conv(y1, p["p1"])
    acc = acc + p1[..., 3 * G:]
    y2 = lrelu(px[..., G:2 * G] + p1[..., :G])
    p2 = conv(y2, p["p2"])
    acc = acc + p2[..., 2 * G:]
    y3 = lrelu(px[..., 2 * G:3 * G] + p1[..., G:2 * G] + p2[..., :G])
    p3 = conv(y3, p["p3"])
    acc = acc + p3[..., G:]
    y4 = lrelu(px[..., 3 * G:4 * G] + p1[..., 2 * G:3 * G]
               + p2[..., G:2 * G] + p3[..., :G])
    p4 = conv(y4, p["p4"])
    return x + (acc + p4) * jnp.asarray(0.2, x.dtype)


def gather_weights(p, dtype=jnp.bfloat16):
    """proj-layout params -> per-conv (A, B, C) [3c, n] gather stacks."""
    g, c = G, C
    w_conv = {
        "px": np.asarray(p["px"]),
        "b": np.asarray(p["p1"][..., :g]),
        "c": np.concatenate([p["p1"][..., g:2 * g], p["p2"][..., :g]],
                            axis=2),
        "d": np.concatenate([p["p1"][..., 2 * g:3 * g],
                             p["p2"][..., g:2 * g], p["p3"][..., :g]],
                            axis=2),
        "e": np.concatenate([p["p1"][..., 3 * g:], p["p2"][..., 2 * g:],
                             p["p3"][..., g:], p["p4"]], axis=2),
    }
    out = {}
    for name, w in w_conv.items():
        cin, n = w.shape[2], w.shape[3]
        # A/B/C: [3*cin, n], dy-major stacks of the dx=1/0/2 taps
        out[name] = tuple(
            jnp.asarray(w[:, dx].reshape(3 * cin, n), dtype)
            for dx in (1, 0, 2))
    out["px_bias"] = jnp.asarray(np.asarray(p["px_b"]).reshape(1, -1),
                                 jnp.float32)
    return out


def _kernel(top_ref, mid_ref, bot_ref,
            a_px, b_px, c_px, bias_px,
            a_b, b_b, c_b, a_c, b_c, c_c, a_d, b_d, c_d, a_e, b_e, c_e,
            out_ref, xf_ref, px_ref, y2_ref, y3_ref, y4_ref,
            *, rb, wp, pad_l, width, nb, h_img, chunk):
    """Chunked fused dense block. Each conv stage runs as a
    lax.fori_loop over row chunks — a REAL loop, because Mosaic's
    scoped-stack allocator does not reuse buffers across python-unrolled
    iterations (measured: unrolling chunks GREW the stack past 16 MB).
    px / y2..y4 live in bf16 VMEM scratch; y1 is recomputed from px on
    the fly. Chunk seams split whole image rows, so the pltpu.roll wrap
    garbage stays in the masked W-pad columns."""
    row_start = (pl.program_id(0) % nb) * rb
    r0 = rb + 2 * HALO

    xf_ref[0:HALO * wp] = top_ref[0].reshape(HALO * wp, C)
    xf_ref[HALO * wp:(HALO + rb) * wp] = mid_ref[0].reshape(rb * wp, C)
    xf_ref[(HALO + rb) * wp:] = bot_ref[0].reshape(HALO * wp, C)

    sz = chunk * wp

    def pad_mask():
        cp = jax.lax.broadcasted_iota(jnp.int32, (sz, 1), 0) % wp
        return (cp >= pad_l) & (cp < pad_l + width)

    def row_mask(k, off_rows):
        r_img = (row_start - HALO + k + off_rows
                 + jax.lax.broadcasted_iota(jnp.int32, (sz, 1), 0) // wp)
        return (r_img >= 0) & (r_img < h_img)

    def rd(ref):
        return lambda lo: ref[pl.ds(lo, sz)]

    def rd_y1(lo):
        y1 = lrelu_k(px_ref[pl.ds(lo, sz), 0:G])
        return jnp.where(row_mask(1, lo // wp), y1,
                         jnp.asarray(0, y1.dtype))

    def run_stage(k, reads, a, b, cm, bias, epilogue):
        out_rows = r0 - 2 * k
        pm = pad_mask()

        def body(i, _):
            off = i * sz
            slabs = []
            for dy in range(3):
                for read, kp in reads:
                    slabs.append(read((k - kp - 1) * wp + dy * wp + off))
            lhs = jnp.concatenate(slabs, axis=1) if len(slabs) > 1 \
                else slabs[0]
            acc = jnp.dot(lhs, a, preferred_element_type=jnp.float32)
            if bias is not None:
                acc = acc + bias
            pb = jnp.dot(lhs, b, preferred_element_type=jnp.float32)
            acc = acc + pltpu.roll(pb, 1, 0)
            pc = jnp.dot(lhs, cm, preferred_element_type=jnp.float32)
            acc = acc + pltpu.roll(pc, sz - 1, 0)
            acc = jnp.where(pm, acc, 0.0)
            epilogue(off, i, acc)
            return 0

        jax.lax.fori_loop(0, out_rows // chunk, body, 0)

    def ep_px(off, i, acc):
        px_ref[pl.ds(off, sz)] = acc.astype(jnp.bfloat16)

    run_stage(1, [(rd(xf_ref), 0)], a_px[:], b_px[:], c_px[:],
              bias_px[:], ep_px)

    def make_ep_y(ref, k, seg_lo):
        def ep(off, i, acc):
            seg = px_ref[pl.ds((k - 1) * wp + off, sz), seg_lo:seg_lo + G]
            y = lrelu_k(seg + acc.astype(jnp.bfloat16))
            ref[pl.ds(off, sz)] = jnp.where(
                row_mask(k, off // wp), y, jnp.asarray(0, y.dtype))
        return ep

    run_stage(2, [(rd_y1, 1)], a_b[:], b_b[:], c_b[:], None,
              make_ep_y(y2_ref, 2, G))
    run_stage(3, [(rd_y1, 1), (rd(y2_ref), 2)], a_c[:], b_c[:], c_c[:],
              None, make_ep_y(y3_ref, 3, 2 * G))
    run_stage(4, [(rd_y1, 1), (rd(y2_ref), 2), (rd(y3_ref), 3)],
              a_d[:], b_d[:], c_d[:], None, make_ep_y(y4_ref, 4, 3 * G))

    def ep_out(off, i, acc):
        seg = px_ref[pl.ds(4 * wp + off, sz), 4 * G:]
        xc = xf_ref[pl.ds(HALO * wp + off, sz)]
        out = xc + (seg + acc.astype(jnp.bfloat16)) * jnp.asarray(
            0.2, jnp.bfloat16)
        out_ref[0, pl.ds(i * chunk, chunk)] = out.reshape(chunk, wp, C)

    run_stage(5, [(rd_y1, 1), (rd(y2_ref), 2), (rd(y3_ref), 3),
                  (rd(y4_ref), 4)], a_e[:], b_e[:], c_e[:], None, ep_out)


def _kernel_simple(top_ref, mid_ref, bot_ref,
                   a_px, b_px, c_px, bias_px,
                   a_b, b_b, c_b, a_c, b_c, c_c, a_d, b_d, c_d,
                   a_e, b_e, c_e,
                   out_ref, *, rb, wp, pad_l, width, nb, h_img):
    """Whole-stage variant: each conv in one shot over its full rows —
    fewest ops, biggest dots; needs vmem_limit_bytes raised past the
    16 MB compiler default (fits in physical VMEM)."""
    row_start = (pl.program_id(0) % nb) * rb

    top = top_ref[0].reshape(HALO * wp, C)
    mid = mid_ref[0].reshape(rb * wp, C)
    bot = bot_ref[0].reshape(HALO * wp, C)
    xf = jnp.concatenate([top, mid, bot], axis=0)

    def mask_rows(t, k):
        m = t.shape[0]
        r_img = (row_start - HALO + k
                 + jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) // wp)
        valid = (r_img >= 0) & (r_img < h_img)
        return jnp.where(valid, t, jnp.asarray(0, t.dtype))

    def mask_pads(t):
        m = t.shape[0]
        cp = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % wp
        valid = (cp >= pad_l) & (cp < pad_l + width)
        return jnp.where(valid, t, jnp.asarray(0, t.dtype))

    def rconv(u, a, b, cm, bias=None):
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
        return mask_pads(acc.astype(u.dtype))

    px = rconv(xf, a_px[:], b_px[:], c_px[:], bias_px[:])
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


def fused_dense_block(xp, gw, rb=8, chunk=2):
    """xp: packed [B, H, Wp, C] bf16 (pad cols zero); -> same shape."""
    b, h, wp, c = xp.shape
    nb = h // rb
    r0 = rb + 2 * HALO
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
    bf = jnp.bfloat16
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    if chunk is None:
        out = pl.pallas_call(
            partial(_kernel_simple, rb=rb, wp=wp, pad_l=8, width=W,
                    nb=nb, h_img=h),
            compiler_params=cparams,
            grid=(b * nb,),
            in_specs=[spec_edge, spec_mid, spec_edge]
            + [cw(t) for t in weights],
            out_specs=spec_mid,
            out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp, c), xp.dtype),
        )(tops, mid, bots, *weights)
        return out.reshape(b, h, wp, c)
    out = pl.pallas_call(
        partial(_kernel, rb=rb, wp=wp, pad_l=8, width=W, nb=nb,
                h_img=h, chunk=chunk),
        compiler_params=cparams,
        grid=(b * nb,),
        in_specs=[spec_edge, spec_mid, spec_edge] + [cw(t) for t in weights],
        out_specs=spec_mid,
        out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp, c), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((r0 * wp, C), bf),                 # xf
            pltpu.VMEM(((r0 - 2) * wp, 4 * G + C), bf),   # px
            pltpu.VMEM(((r0 - 4) * wp, G), bf),           # y2
            pltpu.VMEM(((r0 - 6) * wp, G), bf),           # y3
            pltpu.VMEM(((r0 - 8) * wp, G), bf),           # y4
        ],
    )(tops, mid, bots, *weights)
    return out.reshape(b, h, wp, c)


def pack(x):
    """[B,H,W,C] -> [B,H,Wp,C] with 8 zero cols each side (Wp % 16 == 0)."""
    return jnp.pad(x, ((0, 0), (0, 0), (8, 8), (0, 0)))


def unpack(xp):
    return xp[:, :, 8:8 + W]


def main():
    p = make_proj_params(jax.random.key(7))
    gw = gather_weights(p)
    x = jax.random.normal(jax.random.key(0), (1, 24, W, C),
                          jnp.bfloat16) * 0.5

    # correctness
    try:
        got = unpack(fused_dense_block(pack(x), gw, rb=8))
        ref = block_proj_ref(x, p)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        record("fused_dense_correctness", {"max_err": round(err, 5),
                                           "rel_err": round(rel, 5)})
    except Exception as e:
        record("fused_dense_correctness",
               f"FAILED {type(e).__name__}: ...{str(e)[-400:]}")
        return

    xb = jax.random.normal(jax.random.key(1), (B, H, W, C),
                           jnp.bfloat16) * 0.5
    xpb = pack(xb)

    for rb, chunk in ((14, None), (28, None), (8, None), (28, 4)):
        try:
            @jax.jit
            def chained(v, iters=12, rb=rb, chunk=chunk):
                def body(_, u):
                    return fused_dense_block(u, gw, rb=rb, chunk=chunk)
                return jax.lax.fori_loop(0, iters, body, v)

            jax.block_until_ready(chained(xpb))
            t0 = time.perf_counter()
            jax.block_until_ready(chained(xpb))
            dt = (time.perf_counter() - t0) / 12
        except Exception as e:
            record(f"fused_dense_rb{rb}",
                   f"FAILED {type(e).__name__}: {str(e)[-400:]}")
            continue
        macs = B * H * W * 9 * (C * (4 * G + C) + G * (3 * G + C)
                                + G * (2 * G + C) + G * (G + C) + G * C)
        tf = 2 * macs / dt / 1e12
        record(f"fused_dense_rb{rb}_ck{chunk}_simple" if chunk is None else f"fused_dense_rb{rb}_ck{chunk}",
               {"ms": round(dt * 1e3, 3), "tf_s_useful": round(tf, 1)})

    # XLA reference timing (same chained harness)
    @jax.jit
    def chained_ref(v, iters=12):
        def body(_, u):
            return block_proj_ref(u, p)
        return jax.lax.fori_loop(0, iters, body, v)

    jax.block_until_ready(chained_ref(xb))
    t0 = time.perf_counter()
    jax.block_until_ready(chained_ref(xb))
    dt = (time.perf_counter() - t0) / 12
    macs = B * H * W * 9 * (C * (4 * G + C) + G * (3 * G + C)
                            + G * (2 * G + C) + G * (G + C) + G * C)
    record("xla_dense_block", {"ms": round(dt * 1e3, 3),
                               "tf_s_useful": round(2 * macs / dt / 1e12, 1)})


if __name__ == "__main__":
    main()
