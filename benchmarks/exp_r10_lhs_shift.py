"""exp r10 — bf16 input-shift taps vs f32 output rolls in the fused
dense block.

The shipped roll-conv kernel (ops/pallas_dense_trunk.py) computes each
conv as acc = lhs@A + roll(lhs@B, +1) + roll(lhs@C, -1) with the rolls
on the [mo, n] f32 dot outputs (Mosaic rejects bf16 dynamic_rotate, so
the rolls cannot be cast-early). exp_r7b measured the +-1 shift/concat
machinery at ~5 ms of the 29.4 ms block. A roll is a row permutation
and permutations commute with row-independent dots:

    roll(L @ B, +1) == roll(L, +1) @ B      (bit-identical per row)

so the SAME math can shift the [mo, 3c] bf16 lhs instead — via the
sublane-concat roll idiom exp_r7 proved Mosaic accepts
(concat([u[-1:], u[:-1]], 0)) — and the shifted traffic drops:

    px  : out-roll 2 x [mo,192] f32 (768 B/row) -> in-shift 2 x
          [mo,192] bf16 (384 B/row)
    p_i : out-roll 2 x [mo, 160/128/96/64] f32 (640..256 B/row) ->
          in-shift 2 x [mo, 96] bf16 (192 B/row)

Variants:
  roll  — the shipped production kernel (import, not copy)
  lhs   — input-shift taps (this experiment)

Usage: python benchmarks/exp_r10_lhs_shift.py          (interpret check)
       python benchmarks/exp_r10_lhs_shift.py --chip   (+ on-chip timing
       at the production bench geometry wp=272, rb=94, 24 tiles)

MEASURED (on chip, rb=94): roll 20.35 ms vs lhs 24.57 ms — the input
shift is 21% SLOWER despite halving the shifted bytes. The roll form
keeps ONE lhs live across all three dots (Mosaic can reuse the staged
operand); the shift form materialises three distinct [mo, 3c] operands,
which costs more than the two f32 output rolls it saves. Fourth
confirmation that the block is machinery/pipeline-bound, not
traffic-bound at the margins. The roll kernel stays production.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.ops.pallas_dense_trunk import (  # noqa: E402
    HALO,
    PAD,
    _lrelu,
    fused_dense_block,
    pack,
    pick_rb,
    proj_weights,
)
from superresolution_tpu.ops.pallas_windows import (  # noqa: E402
    const_spec,
    edge_windows,
    window_specs,
)


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def _kernel_lhs(top_ref, mid_ref, bot_ref, *w_refs, out_ref=None,
                rb, wp, width, nb, h_img, g, c):
    (a_px, b_px, c_px, bias_px,
     a_1, b_1, c_1, a_2, b_2, c_2, a_3, b_3, c_3, a_4, b_4, c_4) = w_refs
    row_start = (pl.program_id(0) % nb) * rb

    top = top_ref[0].reshape(HALO * wp, c)
    mid = mid_ref[0].reshape(rb * wp, c)
    bot = bot_ref[0].reshape(HALO * wp, c)
    xf = jnp.concatenate([top, mid, bot], axis=0)

    def rconv(u, a, b, cm, mask_k, bias=None):
        mu = u.shape[0]
        mo = mu - 2 * wp
        lhs = jnp.concatenate(
            [u[0:mo], u[wp:wp + mo], u[2 * wp:2 * wp + mo]], axis=1)
        acc = jnp.dot(lhs, a[:], preferred_element_type=jnp.float32)
        if bias is not None:
            acc = acc + bias[:]
        # roll(L@B, +1) == roll(L, +1)@B : shift the bf16 lhs instead of
        # the f32 output (sublane-concat roll — exp_r7's accepted idiom)
        lhs_d = jnp.concatenate([lhs[mo - 1:], lhs[:mo - 1]], axis=0)
        acc = acc + jnp.dot(lhs_d, b[:],
                            preferred_element_type=jnp.float32)
        lhs_u = jnp.concatenate([lhs[1:], lhs[:1]], axis=0)
        acc = acc + jnp.dot(lhs_u, cm[:],
                            preferred_element_type=jnp.float32)
        out = acc.astype(u.dtype)
        rows = mo // wp
        n = out.shape[1]
        o2 = out.reshape(rows, wp, n)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
        r_img = row + (row_start - HALO + mask_k)
        ok = ((col >= PAD) & (col < PAD + width)
              & (r_img >= 0) & (r_img < h_img))
        o2 = jnp.where(ok, o2, jnp.asarray(0, o2.dtype))
        return o2.reshape(mo, n)

    px = rconv(xf, a_px, b_px, c_px, 1, bias_px)
    mo = (xf.shape[0] - 2 * wp) - 8 * wp
    m_of = [px.shape[0] - 2 * i * wp for i in range(5)]
    pre = [px[i * wp:i * wp + m_of[i], i * g:(i + 1) * g]
           for i in range(1, 4)]
    acc = px[4 * wp:4 * wp + mo, 4 * g:]
    y = _lrelu(px[:, 0:g])
    pw = [(a_1, b_1, c_1), (a_2, b_2, c_2), (a_3, b_3, c_3),
          (a_4, b_4, c_4)]
    for i in range(1, 5):
        p_i = rconv(y, *pw[i - 1], i + 1)
        for k in range(i, 4):
            pre[k - 1] = pre[k - 1] + p_i[(k - i) * wp:
                                          (k - i) * wp + m_of[k],
                                          (k - i) * g:(k - i + 1) * g]
        acc = acc + p_i[(4 - i) * wp:(4 - i) * wp + mo, (4 - i) * g:]
        if i < 4:
            y = _lrelu(pre[i - 1])
    xc = xf[HALO * wp:HALO * wp + mo]
    out = xc + acc * jnp.asarray(0.2, xc.dtype)
    out_ref[0] = out.reshape(rb, wp, c)


def fused_dense_block_lhs(xp, weights, *, width, rb=None,
                          interpret=False):
    b, h, wp, c = xp.shape
    g = weights[4].shape[0] // 3
    if rb is None:
        rb = pick_rb(h, wp)
    nb = h // rb
    tops, mid, bots = edge_windows(xp, rb, nb, halo=HALO)
    spec_edge, spec_mid, _ = window_specs(rb, wp, c, halo=HALO)

    def kernel(*refs):
        *ins, out = refs
        _kernel_lhs(*ins, out_ref=out, rb=rb, wp=wp, width=width, nb=nb,
                    h_img=h, g=g, c=c)

    out = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        grid=(b * nb,),
        in_specs=[spec_edge, spec_mid, spec_edge]
        + [const_spec(t) for t in weights],
        out_specs=spec_mid,
        out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp, c), xp.dtype),
        interpret=interpret,
    )(tops, mid, bots, *weights)
    return out.reshape(b, h, wp, c)


def make_params(key, c, g):
    ks = jax.random.split(key, 6)
    dp = {"Conv_0": {"Conv_0": {
        "kernel": jax.random.normal(ks[0], (3, 3, c, 4 * g + c)) * 0.1,
        "bias": jax.random.normal(ks[5], (4 * g + c,)) * 0.1}}}
    for i in range(1, 5):
        dp[f"proj_y{i}"] = {"kernel": jax.random.normal(
            ks[i], (3, 3, g, (4 - i) * g + c)) * 0.1}
    return dp


def verify(interpret=True):
    dp = make_params(jax.random.key(0), c=16, g=8)
    w = proj_weights(dp, jnp.float32)
    x = jax.random.normal(jax.random.key(1), (2, 12, 20, 16)) * 0.5
    xp = pack(x)
    ref = fused_dense_block(xp, w, width=20, rb=4, interpret=interpret)
    got = fused_dense_block_lhs(xp, w, width=20, rb=4,
                                interpret=interpret)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    print("lhs-shift == roll (interpret, bit-exact): OK")


def time_chip():
    # production bench geometry: 24 tiles of 376 x 256 (+PAD -> wp=272),
    # c=64, g=32, rb=94
    c, g = 64, 32
    dp = make_params(jax.random.key(7), c=c, g=g)
    w = proj_weights(dp, jnp.bfloat16)
    b, h, width = 24, 376, 256
    x = jax.random.normal(jax.random.key(1), (b, h, width, c),
                          jnp.bfloat16) * 0.5
    xp = pack(x)
    rb = 94
    for name, fn in (("roll", fused_dense_block),
                     ("lhs", fused_dense_block_lhs)):
        @jax.jit
        def chained(m0, iters=12, fn=fn):
            def body(_, u):
                return fn(u, w, width=width, rb=rb)
            return jax.lax.fori_loop(0, iters, body, m0)

        try:
            jax.block_until_ready(chained(xp))
            t0 = time.perf_counter()
            jax.block_until_ready(chained(xp))
            dt = (time.perf_counter() - t0) / 12
            record(f"{name}_rb{rb}", {"ms": round(dt * 1e3, 3)})
        except Exception as e:
            record(f"{name}_rb{rb}", f"FAILED ...{str(e)[-200:]}")


if __name__ == "__main__":
    if "--chip" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        verify()
    else:
        from superresolution_tpu.utils.runtime import setup_jax_cache

        setup_jax_cache()
        time_chip()
