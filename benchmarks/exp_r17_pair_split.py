"""exp r17 — pair-IO dense block with SPLIT (unpadded) phase dots.

Motivation (exp_r16c call-floor anatomy, on chip): a passthrough
pallas_call at the production trunk operand class [24,376,272,64]
moves its 628 MB at ~190 GB/s (3.36-4.2 ms) while XLA's add1 moves the
same bytes at ~595 GB/s (1.06 ms) — and the SAME bytes as a 128-lane
block [24,376,136,128] move 2.02x faster (2.08 ms). The production
roll-conv kernel's 64-lane IO layout wastes half of every VMEM tile in
the DMA: ~2.1 ms/call x 69 calls ≈ 145 ms/frame.

exp_r9's pair kernel already had 128-lane IO but paid a 1.33x K pad
(sm contributes only to phase-0 outputs, sp only to phase-1 — zeros in
the fused [12c, 2n] weight), which cancelled the IO win (23.84 vs
23.94 — a wash). This kernel keeps the pair IO and removes the pad:
the two output phases run as SEPARATE parallel streams through the
whole cascade, each conv is 4 dots sharing one [p0|p1] lhs —

    out0 = [p0|p1]_dy @ A_mid0 (K=6c) + sm_dy @ A_sm (K=3c)
    out1 = [p0|p1]_dy @ A_mid1 (K=6c) + sp_dy @ A_sp (K=3c)

(18cn MACs per conv-token-pair — identical to the roll form's 3x3c
dots; NO output rolls, NO interleave shuffles; one lane-concat per
block at the very end restores the pair layout). wp % 32 required
(sublane alignment of the dy slices at wp2 strides).

Usage: python benchmarks/exp_r17_pair_split.py          (interpret check)
       python benchmarks/exp_r17_pair_split.py --chip   (+ on-chip timing)
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
    pick_rb,
    proj_weights,
)


def pack_width_pair(width: int) -> int:
    return -(-(width + 2 * PAD) // 32) * 32


def pack_pair(x: jnp.ndarray) -> jnp.ndarray:
    wp = pack_width_pair(x.shape[2])
    return jnp.pad(x, ((0, 0), (0, 0), (PAD, wp - x.shape[2] - PAD),
                       (0, 0)))


def pair_split_weights(dense_params, dtype=jnp.bfloat16):
    """FusedDenseBlock params -> [A_mid0, A_sm, A_mid1, A_sp] x 5 convs
    (+ bias_px after the px quartet): A_mid_q = [6*cin, n] dy-major
    [dx0-on-p_q | dx(+1/-1)-on-p_(1-q)] stacks, A_sm/A_sp = [3*cin, n]
    dy-major single-tap stacks."""
    px = dense_params["Conv_0"]["Conv_0"]
    kernels = [np.asarray(px["kernel"], np.float32)]
    for i in range(1, 5):
        kernels.append(np.asarray(dense_params[f"proj_y{i}"]["kernel"],
                                  np.float32))
    out = []
    for j, k in enumerate(kernels):
        cin, n = k.shape[2], k.shape[3]
        # phase 0: dx=0 on p0, dx=+1 on p1; sm carries dx=-1
        a_mid0 = np.concatenate(
            [np.concatenate([k[dy, 1], k[dy, 2]], axis=0)
             for dy in range(3)], axis=0)
        a_sm = np.concatenate([k[dy, 0] for dy in range(3)], axis=0)
        # phase 1: dx=-1 on p0, dx=0 on p1; sp carries dx=+1
        a_mid1 = np.concatenate(
            [np.concatenate([k[dy, 0], k[dy, 1]], axis=0)
             for dy in range(3)], axis=0)
        a_sp = np.concatenate([k[dy, 2] for dy in range(3)], axis=0)
        out += [jnp.asarray(a, dtype) for a in
                (a_mid0, a_sm, a_mid1, a_sp)]
        if j == 0:
            out.append(jnp.asarray(
                np.asarray(px["bias"], np.float32).reshape(1, n),
                jnp.float32))
    return out


def _kernel_pair_split(top_ref, mid_ref, bot_ref, *refs, rb, wp2, width,
                       nb, h_img, g, c, residual=False):
    if residual:
        *w_refs, res_ref, out_ref = refs
    else:
        *w_refs, out_ref = refs
        res_ref = None
    (m0_px, sm_px, m1_px, sp_px, bias_px,
     m0_1, sm_1, m1_1, sp_1, m0_2, sm_2, m1_2, sp_2,
     m0_3, sm_3, m1_3, sp_3, m0_4, sm_4, m1_4, sp_4) = w_refs
    row_start = (pl.program_id(0) % nb) * rb
    pad2 = PAD // 2
    c2 = 2 * c
    top = top_ref[0].reshape(HALO * wp2, c2)
    mid = mid_ref[0].reshape(rb * wp2, c2)
    bot = bot_ref[0].reshape(HALO * wp2, c2)
    xf = jnp.concatenate([top, mid, bot], axis=0)

    def mask(t, mask_k):
        m = t.shape[0]
        rows, n = m // wp2, t.shape[1]
        t2 = t.reshape(rows, wp2, n)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, wp2, 1), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
        r_img = row + (row_start - HALO + mask_k)
        ok = ((col >= pad2) & (col < pad2 + width // 2)
              & (r_img >= 0) & (r_img < h_img))
        t2 = jnp.where(ok, t2, jnp.asarray(0, t2.dtype))
        return t2.reshape(m, n)

    def rconv_split(u0, u1, m0, sm_w, m1, sp_w, mask_k, bias=None):
        """One 3x3 conv on the (p0, p1) phase streams -> (o0, o1)."""
        mu = u0.shape[0]
        mo = mu - 2 * wp2
        sm = jnp.concatenate([u1[mu - 1:], u1[:mu - 1]], axis=0)
        sp = jnp.concatenate([u0[1:], u0[:1]], axis=0)
        shared, sms, sps = [], [], []
        for dyo in (0, 1, 2):
            b_ = dyo * wp2
            shared += [u0[b_:b_ + mo], u1[b_:b_ + mo]]
            sms.append(sm[b_:b_ + mo])
            sps.append(sp[b_:b_ + mo])
        lhs = jnp.concatenate(shared, axis=1)
        lsm = jnp.concatenate(sms, axis=1)
        lsp = jnp.concatenate(sps, axis=1)
        a0 = (jnp.dot(lhs, m0[:], preferred_element_type=jnp.float32)
              + jnp.dot(lsm, sm_w[:], preferred_element_type=jnp.float32))
        a1 = (jnp.dot(lhs, m1[:], preferred_element_type=jnp.float32)
              + jnp.dot(lsp, sp_w[:], preferred_element_type=jnp.float32))
        if bias is not None:
            a0 = a0 + bias[:]
            a1 = a1 + bias[:]
        return (mask(a0.astype(u0.dtype), mask_k),
                mask(a1.astype(u0.dtype), mask_k))

    u0, u1 = xf[:, :c], xf[:, c:]
    px0, px1 = rconv_split(u0, u1, m0_px, sm_px, m1_px, sp_px, 1,
                           bias_px)
    mo = (xf.shape[0] - 2 * wp2) - 8 * wp2
    m_of = [px0.shape[0] - 2 * i * wp2 for i in range(5)]
    pre0 = [px0[i * wp2:i * wp2 + m_of[i], i * g:(i + 1) * g]
            for i in range(1, 4)]
    pre1 = [px1[i * wp2:i * wp2 + m_of[i], i * g:(i + 1) * g]
            for i in range(1, 4)]
    acc0 = px0[4 * wp2:4 * wp2 + mo, 4 * g:]
    acc1 = px1[4 * wp2:4 * wp2 + mo, 4 * g:]
    y0, y1 = _lrelu(px0[:, 0:g]), _lrelu(px1[:, 0:g])
    pw = [(m0_1, sm_1, m1_1, sp_1), (m0_2, sm_2, m1_2, sp_2),
          (m0_3, sm_3, m1_3, sp_3), (m0_4, sm_4, m1_4, sp_4)]
    for i in range(1, 5):
        p0, p1 = rconv_split(y0, y1, *pw[i - 1], i + 1)
        for k in range(i, 4):
            sl = (slice((k - i) * wp2, (k - i) * wp2 + m_of[k]),
                  slice((k - i) * g, (k - i + 1) * g))
            pre0[k - 1] = pre0[k - 1] + p0[sl]
            pre1[k - 1] = pre1[k - 1] + p1[sl]
        acc0 = acc0 + p0[(4 - i) * wp2:(4 - i) * wp2 + mo, (4 - i) * g:]
        acc1 = acc1 + p1[(4 - i) * wp2:(4 - i) * wp2 + mo, (4 - i) * g:]
        if i < 4:
            y0, y1 = _lrelu(pre0[i - 1]), _lrelu(pre1[i - 1])
    xc = xf[HALO * wp2:HALO * wp2 + mo]
    o0 = xc[:, :c] + acc0 * jnp.asarray(0.2, xc.dtype)
    o1 = xc[:, c:] + acc1 * jnp.asarray(0.2, xc.dtype)
    out = jnp.concatenate([o0, o1], axis=1)
    if res_ref is not None:
        res = res_ref[0].reshape(rb * wp2, c2)
        out = res + out * jnp.asarray(0.2, out.dtype)
    out_ref[0] = out.reshape(rb, wp2, c2)


def fused_dense_block_pair_split(xp, weights, *, width, rb=None,
                                 interpret=False, residual=None):
    """Pair-IO split-dot dense block (optionally with the RRDB residual
    fold). xp: [B, H, Wp, C] from pack_pair (Wp % 32 == 0, even width);
    weights: list from pair_split_weights. Returns [B, H, Wp, C]."""
    b, h, wp, c = xp.shape
    assert width % 2 == 0 and wp % 32 == 0
    wp2 = wp // 2
    g = weights[6].shape[0] // 3  # A_sm of conv 1 is [3g, ...]
    if rb is None:
        rb = pick_rb(h, wp)
    nb = h // rb
    x2 = xp.reshape(b, h, wp2, 2 * c)  # free row-major relabel
    from superresolution_tpu.ops.pallas_windows import (
        const_spec, edge_windows, window_specs)

    tops, mid, bots = edge_windows(x2, rb, nb, halo=HALO)
    spec_edge, spec_mid, _ = window_specs(rb, wp2, 2 * c, halo=HALO)
    extra = ()
    if residual is not None:
        extra = (residual.reshape(b, h, wp2, 2 * c)
                 .reshape(b * nb, rb, wp2, 2 * c),)

    def kernel(*refs):
        *ins, out = refs
        _kernel_pair_split(*ins, out, rb=rb, wp2=wp2, width=width,
                           nb=nb, h_img=h, g=g, c=c,
                           residual=residual is not None)

    out = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        grid=(b * nb,),
        in_specs=[spec_edge, spec_mid, spec_edge]
        + [const_spec(t) for t in weights]
        + ([spec_mid] if residual is not None else []),
        out_specs=spec_mid,
        out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp2, 2 * c),
                                       xp.dtype),
        interpret=interpret,
    )(tops, mid, bots, *weights, *extra)
    return out.reshape(b, h, wp, c)


def _mk_params(rng, c, g):
    def mk(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32)
                           * 0.1)

    dp = {"Conv_0": {"Conv_0": {
        "kernel": mk((3, 3, c, 4 * g + c)), "bias": mk((4 * g + c,))}}}
    for i in range(1, 5):
        dp[f"proj_y{i}"] = {"kernel": mk((3, 3, g, (4 - i) * g + c))}
    return dp


def verify(interpret=True):
    rng = np.random.default_rng(0)
    c, g = 16, 8
    dp = _mk_params(rng, c, g)
    x = jnp.asarray(rng.normal(size=(2, 12, 20, c))
                    .astype(np.float32) * 0.1)
    xp = pack_pair(x)
    res = jnp.asarray(rng.normal(size=xp.shape)
                      .astype(np.float32) * 0.1)
    ref = fused_dense_block(xp, proj_weights(dp, jnp.float32),
                            width=20, rb=4, interpret=interpret,
                            residual=res)
    got = fused_dense_block_pair_split(
        xp, pair_split_weights(dp, jnp.float32), width=20, rb=4,
        interpret=interpret, residual=res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)
    print("pair-split == roll (interpret, incl. residual fold): OK")


def timeit_chain(fn, x, iters=10):
    def make(n):
        @jax.jit
        def run(v):
            def body(_, u):
                return fn(u).astype(u.dtype)

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


def chip_bench():
    from superresolution_tpu.ops.pallas_dense_trunk import (
        pack, pack_width)
    from superresolution_tpu.utils.runtime import setup_jax_cache

    setup_jax_cache()
    rng = np.random.default_rng(1)
    c, g = 64, 32
    dp = _mk_params(rng, c, g)
    w_roll = proj_weights(dp, jnp.bfloat16)
    w_pair = pair_split_weights(dp, jnp.bfloat16)
    # bench tile batch: 24 tiles of 376 x 256 input
    x = jnp.asarray(rng.normal(size=(24, 376, 256, c))
                    .astype(np.float32) * 0.1).astype(jnp.bfloat16)
    xp_roll = pack(x)        # wp 272 (production roll geometry)
    xp_pair = pack_pair(x)   # wp 288 (+5.9% tokens)
    print(json.dumps({"wp_roll": xp_roll.shape[2],
                      "wp_pair": xp_pair.shape[2]}), flush=True)
    t = timeit_chain(lambda v: fused_dense_block(
        v, w_roll, width=256), xp_roll)
    print(json.dumps({"roll_ms": round(t * 1e3, 3)}), flush=True)
    t = timeit_chain(lambda v: fused_dense_block_pair_split(
        v, w_pair, width=256), xp_pair)
    print(json.dumps({"pair_split_ms": round(t * 1e3, 3)}), flush=True)
    # zero-extra-pad geometry: 30 tiles of 376 x 208 (tw=192), wp=224
    x2 = jnp.asarray(rng.normal(size=(30, 376, 208, c))
                     .astype(np.float32) * 0.1).astype(jnp.bfloat16)
    xp2 = pack_pair(x2)
    print(json.dumps({"wp_tw192": xp2.shape[2]}), flush=True)
    t = timeit_chain(lambda v: fused_dense_block_pair_split(
        v, w_pair, width=208), xp2)
    print(json.dumps({"pair_split_tw192_ms": round(t * 1e3, 3)}),
          flush=True)
    t = timeit_chain(lambda v: fused_dense_block(
        v, w_roll, width=208), pack(x2))
    print(json.dumps({"roll_tw192_ms": round(t * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    if "--chip" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        verify()
    else:
        verify(interpret=False)
        chip_bench()
