"""Pack-GEMM conv v2: two-dot formulation.

v1 (exp_r4_pairconv.py) measured 25.9 TF/s useful on c64n192 — LOSES to
XLA's 37.7. Diagnosis: 9 small dots + ~6 VPU passes over f32 accs per
block; per-block time 28us vs ~5us of MXU work.

v2 collapses the block body to TWO dots:
  LHS3 [mo, 3*pc]: lane-concat of the three aligned dy slices
  A3   [3*pc, pn]: vstack of the banded A_dy  -> acc  = LHS3 @ A3
  D3   [3*pc, 2n]: vstack of [B_dy | C_dy]    -> bc   = LHS3 @ D3
  out  = acc + colselect(roll(bc,+1), roll(bc,-1)) [+ bias, mask, cast]

K=384 fills the MXU 3x deeper, the accumulation happens IN the MXU, and
the cross taps cost two rolls + one select instead of concats.

Also probes: 1-D grid, dimension_semantics, cost estimates.

Usage (on the TPU chip): python benchmarks/exp_r4b_pairconv2.py
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


def _pack_weights2(w, p, c, n):
    """w [3,3,c,n] -> A3 [3pc, pn] banded stack, D3 [3pc, 2n] = [B|C]."""
    pc = p * c
    a3 = np.zeros((3 * pc, p * n), np.float32)
    d3 = np.zeros((3 * pc, 2 * n), np.float32)
    wn = np.asarray(w, np.float32)
    for dy in range(3):
        for src in range(p):
            for dst in range(p):
                dx = src - dst
                if abs(dx) <= 1:
                    a3[dy * pc + src * c:dy * pc + (src + 1) * c,
                       dst * n:(dst + 1) * n] = wn[dy, dx + 1]
        d3[dy * pc + (p - 1) * c:dy * pc + p * c, 0:n] = wn[dy, 0]
        d3[dy * pc:dy * pc + c, n:2 * n] = wn[dy, 2]
    return jnp.asarray(a3, jnp.bfloat16), jnp.asarray(d3, jnp.bfloat16)


def _kernel2(top_ref, mid_ref, bot_ref, a_ref, d_ref, out_ref,
             *, rb, w2, p, c, n):
    pc, pn = p * c, p * n
    mo = rb * w2
    top = top_ref[0].reshape(w2, pc)
    mid = mid_ref[0].reshape(mo, pc)
    bot = bot_ref[0].reshape(w2, pc)
    xf = jnp.concatenate([top, mid, bot], axis=0)
    lhs3 = jnp.concatenate(
        [xf[0:mo], xf[w2:w2 + mo], xf[2 * w2:2 * w2 + mo]], axis=1)
    acc = jnp.dot(lhs3, a_ref[:], preferred_element_type=jnp.float32)
    bc = jnp.dot(lhs3, d_ref[:], preferred_element_type=jnp.float32)
    up = pltpu.roll(bc, 1, 0)
    dn = pltpu.roll(bc, mo - 1, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * n), 1)
    sel = jnp.where(col < n, up, dn)
    if p == 2:
        cross = sel
    else:
        # place [pb | pcc] into out columns [0:n] and [(p-1)n:pn]
        zeros = jnp.zeros((mo, (p - 2) * n), jnp.float32)
        cross = jnp.concatenate([sel[:, :n], zeros, sel[:, n:]], axis=1)
    out = acc + cross
    out_ref[0] = out.astype(out_ref.dtype).reshape(rb, w2, pn)


def pair_conv2(x, w, p, rb=8, grid1d=False, dimsem=None, cost=False):
    b, h, wd, c = x.shape
    n = w.shape[-1]
    assert wd % p == 0
    # bf16 VMEM tile is (16, 128): the dy slice offsets (multiples of w2)
    # must be 16-aligned or tpu.concatenate rejects the lane-concat
    w2 = -(-(wd // p + 2) // 16) * 16
    pad_l = p
    pad_r = w2 * p - wd - pad_l
    assert pad_r >= p
    xp = jnp.pad(x, ((0, 0), (1, 1), (pad_l, pad_r), (0, 0)))
    xp = xp.reshape(b, h + 2, w2, p * c)
    mid = xp[:, 1:h + 1]
    nb = h // rb
    top = xp[:, 0:h:rb]
    bot = xp[:, rb + 1::rb]
    a3, d3 = _pack_weights2(w, p, c, n)
    kw = {}
    if dimsem is not None:
        try:
            kw["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=dimsem)
        except TypeError:
            pass
    if cost:
        mo = rb * w2
        kw["cost_estimate"] = pl.CostEstimate(
            flops=2 * b * nb * mo * 3 * p * c * (p + 2) * n,
            bytes_accessed=b * h * w2 * p * (c + n) * 2,
            transcendentals=0)
    if grid1d:
        mid2 = mid.reshape(b * nb, rb, w2, p * c)
        top2 = top.reshape(b * nb, 1, w2, p * c)
        bot2 = bot.reshape(b * nb, 1, w2, p * c)
        spec_mid = pl.BlockSpec((1, rb, w2, p * c), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        spec_edge = pl.BlockSpec((1, 1, w2, p * c), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        spec_w = lambda shape: pl.BlockSpec(
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            partial(_kernel2, rb=rb, w2=w2, p=p, c=c, n=n),
            grid=(b * nb,),
            in_specs=[spec_edge, spec_mid, spec_edge,
                      spec_w((3 * p * c, p * n)), spec_w((3 * p * c, 2 * n))],
            out_specs=pl.BlockSpec((1, rb, w2, p * n),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * nb, rb, w2, p * n), x.dtype),
            **kw,
        )(top2, mid2, bot2, a3, d3)
        out = out.reshape(b, h, w2, p * n)
    else:
        spec_mid = pl.BlockSpec((1, rb, w2, p * c),
                                lambda bi, i: (bi, i, 0, 0),
                                memory_space=pltpu.VMEM)
        spec_edge = pl.BlockSpec((1, 1, w2, p * c),
                                 lambda bi, i: (bi, i, 0, 0),
                                 memory_space=pltpu.VMEM)
        spec_w = lambda shape: pl.BlockSpec(
            shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            partial(_kernel2, rb=rb, w2=w2, p=p, c=c, n=n),
            grid=(b, nb),
            in_specs=[spec_edge, spec_mid, spec_edge,
                      spec_w((3 * p * c, p * n)), spec_w((3 * p * c, 2 * n))],
            out_specs=pl.BlockSpec((1, rb, w2, p * n),
                                   lambda bi, i: (bi, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, h, w2, p * n), x.dtype),
            **kw,
        )(top, mid, bot, a3, d3)
    out = out.reshape(b, h, w2 * p, n)
    return out[:, :, pad_l:pad_l + wd]


def ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def probe(c, n, p, tag="", **kwargs):
    x = jax.random.normal(jax.random.key(0), (B, H, W, c), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (3, 3, c, n),
                          jnp.bfloat16) * 0.05
    key = f"pairconv2_c{c}n{n}_p{p}{tag}"
    try:
        got = pair_conv2(x[:1, :16], w, p, **kwargs).astype(jnp.float32)
        ref = ref_conv(x[:1, :16], w).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(got - ref)))
    except Exception as e:
        record(key, f"FAILED {type(e).__name__}: {str(e)[:200]}")
        return

    # data-dependent chain: repeated identical dispatches through the
    # axon tunnel are NOT reliably timed (see exp_r4d_floor.py docstring)
    @jax.jit
    def chained(x, iters=8):
        def body(_, v):
            y = pair_conv2(v, w, p, **kwargs)
            return y[..., :c].astype(v.dtype)

        return jax.lax.fori_loop(0, iters, body, x)

    out = chained(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chained(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 8
    tf = 2 * B * H * W * 9 * c * n / dt / 1e12
    record(key, {"ms": round(dt * 1e3, 3), "tf_s_useful": round(tf, 1),
                 "max_err": round(err, 5)})


def main():
    probe(64, 192, 2)
    probe(64, 192, 2, tag="_grid1d", grid1d=True)
    probe(64, 192, 2, tag="_dimsem", grid1d=True,
          dimsem=("arbitrary",))
    probe(64, 192, 2, tag="_cost", grid1d=True, cost=True)
    # H=392 = 2^3 * 7^2: valid row bands are 8, 14, 28
    probe(64, 192, 2, tag="_rb14", rb=14, grid1d=True)
    probe(64, 192, 2, tag="_rb28", rb=28, grid1d=True)
    probe(32, 160, 4, tag="_grid1d", grid1d=True)
    probe(32, 160, 4, tag="_rb28", rb=28, grid1d=True)
    probe(64, 64, 2, tag="_grid1d", grid1d=True)
    probe(32, 128, 4, tag="_grid1d", grid1d=True)


if __name__ == "__main__":
    main()
