"""Pair-packed GEMM conv: can a Pallas kernel beat XLA's 12-37 TF/s
conv3x3 envelope at the RRDB trunk's shapes?

Idea: XLA's conv schedule is K-starved (implicit-GEMM K = 9*Cin with
poor MXU filling at Cin 32/64). Re-express the conv as dense GEMMs whose
contraction is p adjacent W-pixels packed into lanes (K = p*Cin = 128):

  x [B,H,W,c] -> pairs [B,H,W/p,p*c]   (one reshape)
  out pair t = sum_dy  L_dy @ A_dy     (in-pack taps, DENSE [pc, pN])
             + roll(+1)(L_dy @ B_dy)   (left tap crossing the pack edge)
             + roll(-1)(L_dy @ C_dy)   (right tap crossing the pack edge)

where L_dy is the lhs slice at row offset dy*W2 (sublane-ALIGNED when
W2 % 8 == 0 — the key trick vs the r2 kernels whose per-tap W-slices
forced misaligned VMEM copies), and the +-1 pack shifts become
pltpu.roll on the dot OUTPUT, whose wrap garbage lands only in W-pad
pairs that are cropped afterwards.

FLOP overhead vs the conv: (p+2)/3 (p=2: 1.33x, p=4: 2x) — paid at
full-K MXU rates instead of XLA's K-starved schedule.

Usage (on the TPU chip): python benchmarks/exp_r4_pairconv.py
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


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def timeit(fn, *args, iters=10, warmup=2):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------- probe A
def _dot_kernel(x_ref, w_ref, out_ref):
    out_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def probe_streaming_dot(mo=1728, k=128, n=384, blocks=735):
    x = jax.random.normal(jax.random.key(0), (blocks * mo, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (k, n), jnp.bfloat16)

    def run(x, w):
        return pl.pallas_call(
            _dot_kernel,
            grid=(blocks,),
            in_specs=[pl.BlockSpec((mo, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((k, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((mo, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((blocks * mo, n), jnp.bfloat16),
        )(x, w)

    dt = timeit(run, x, w)
    tf = 2 * blocks * mo * k * n / dt / 1e12
    record(f"probeA_dot_{mo}x{k}x{n}", {"ms": round(dt * 1e3, 3),
                                        "tf_s": round(tf, 1)})


# ----------------------------------------------------- pair-packed conv
def _pack_weights(w, p, c, n):
    """w [3,3,c,n] -> per-dy A [pc, pn] (banded), B [pc, n], C [pc, n]."""
    a = np.zeros((3, p * c, p * n), np.float32)
    bm = np.zeros((3, p * c, n), np.float32)
    cm = np.zeros((3, p * c, n), np.float32)
    wn = np.asarray(w, np.float32)
    for dy in range(3):
        for src in range(p):       # in-pack source pixel
            for dst in range(p):   # in-pack output pixel
                dx = src - dst     # tap: x_{dst+dx} with dx in {-1,0,1}
                if abs(dx) <= 1:
                    a[dy, src * c:(src + 1) * c,
                      dst * n:(dst + 1) * n] = wn[dy, dx + 1]
        # B: last pack pixel -> first output of the NEXT pack (dx=-1 tap)
        bm[dy, (p - 1) * c:p * c, :] = wn[dy, 0]
        # C: first pack pixel -> last output of the PREVIOUS pack (dx=+1)
        cm[dy, 0:c, :] = wn[dy, 2]
    return (jnp.asarray(a, jnp.bfloat16), jnp.asarray(bm, jnp.bfloat16),
            jnp.asarray(cm, jnp.bfloat16))


def _pair_kernel(top_ref, mid_ref, bot_ref, a_ref, b_ref, c_ref, out_ref,
                 *, rb, w2, p, c, n):
    pc, pn = p * c, p * n
    mo = rb * w2
    top = top_ref[0].reshape(w2, pc)
    mid = mid_ref[0].reshape(mo, pc)
    bot = bot_ref[0].reshape(w2, pc)
    xf = jnp.concatenate([top, mid, bot], axis=0)
    acc = None
    pb = None
    pcc = None
    for dy in range(3):
        lhs = xf[dy * w2:dy * w2 + mo]
        da = jnp.dot(lhs, a_ref[dy], preferred_element_type=jnp.float32)
        db = jnp.dot(lhs, b_ref[dy], preferred_element_type=jnp.float32)
        dc = jnp.dot(lhs, c_ref[dy], preferred_element_type=jnp.float32)
        acc = da if acc is None else acc + da
        pb = db if pb is None else pb + db
        pcc = dc if pcc is None else pcc + dc
    # cross-pack taps: wrap garbage lands in W-pad packs (cropped outside)
    pb = pltpu.roll(pb, 1, 0)
    pcc = pltpu.roll(pcc, mo - 1, 0)  # roll(-1): shift must be >= 0
    if p == 2:
        cross = jnp.concatenate([pb, pcc], axis=1)
    else:
        zeros = jnp.zeros((mo, (p - 2) * n), jnp.float32)
        cross = jnp.concatenate([pb, zeros, pcc], axis=1)
    out_ref[0] = (acc + cross).astype(out_ref.dtype).reshape(rb, w2, pn)


def pair_conv(x, w, p, rb=8):
    """x [B,H,W,c] bf16, w [3,3,c,n] -> SAME conv3x3, pair-packed GEMM."""
    b, h, wd, c = x.shape
    n = w.shape[-1]
    # W padding: one full zero pack each side (the roll wrap garbage must
    # land in cropped packs), and W2 % 8 == 0 so the dy lhs offsets stay
    # sublane-aligned
    assert wd % p == 0
    w2 = -(-(wd // p + 2) // 8) * 8
    pad_l = p
    pad_r = w2 * p - wd - pad_l
    assert pad_r >= p
    xp = jnp.pad(x, ((0, 0), (1, 1), (pad_l, pad_r), (0, 0)))
    xp = xp.reshape(b, h + 2, w2, p * c)
    mid = xp[:, 1:h + 1]
    nb = h // rb
    top = xp[:, 0:h:rb]
    bot = xp[:, rb + 1::rb]
    av, bv, cv = _pack_weights(w, p, c, n)
    spec_mid = pl.BlockSpec((1, rb, w2, p * c), lambda bi, i: (bi, i, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_edge = pl.BlockSpec((1, 1, w2, p * c), lambda bi, i: (bi, i, 0, 0),
                             memory_space=pltpu.VMEM)
    spec_w = lambda nn: pl.BlockSpec((3, p * c, nn),
                                     lambda bi, i: (0, 0, 0),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_pair_kernel, rb=rb, w2=w2, p=p, c=c, n=n),
        grid=(b, nb),
        in_specs=[spec_edge, spec_mid, spec_edge,
                  spec_w(p * n), spec_w(n), spec_w(n)],
        out_specs=pl.BlockSpec((1, rb, w2, p * n),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w2, p * n), x.dtype),
    )(top, mid, bot, av, bv, cv)
    out = out.reshape(b, h, w2 * p, n)
    return out[:, :, pad_l:pad_l + wd]


def ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def probe_pair_conv(c, n, p, rb=8):
    x = jax.random.normal(jax.random.key(0), (B, H, W, c), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (3, 3, c, n),
                          jnp.bfloat16) * 0.05
    key = f"pairconv_c{c}n{n}_p{p}_rb{rb}"
    try:
        got = pair_conv(x[:1, :16], w, p, rb=rb).astype(jnp.float32)
        ref = ref_conv(x[:1, :16], w).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(got - ref)))
    except Exception as e:
        record(key, f"FAILED {type(e).__name__}: {str(e)[:300]}")
        return

    def run(x):
        y = pair_conv(x, w, p, rb=rb)
        # consume to block DCE
        return y[..., :c] + 0.0

    dt = timeit(run, x)
    tf = 2 * B * H * W * 9 * c * n / dt / 1e12
    record(key, {"ms": round(dt * 1e3, 3), "tf_s_useful": round(tf, 1),
                 "max_err": round(err, 5)})


def main():
    probe_streaming_dot()
    probe_streaming_dot(mo=1728, k=128, n=768, blocks=368)
    # the px conv (stage entry): c=64 -> 4g+c=192
    probe_pair_conv(64, 192, p=2)
    probe_pair_conv(64, 192, p=2, rb=16)
    # projection convs: c=32 (54% of trunk MACs)
    probe_pair_conv(32, 160, p=4)
    probe_pair_conv(32, 160, p=2)
    probe_pair_conv(32, 128, p=4)
    probe_pair_conv(32, 96, p=4)
    probe_pair_conv(32, 64, p=4)
    # trunk_conv c=64 -> 64
    probe_pair_conv(64, 64, p=2)


if __name__ == "__main__":
    main()
