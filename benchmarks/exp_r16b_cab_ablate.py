"""CAB pair-kernel ablation: where do the ~3.7 ms go?

exp_r16 landed the THIRD CAB formulation at the same ~2.8-3.7 ms wall
(XLA 2.807, roll 2.831, pair 3.681 at [4,256,256,96]) — the trunk's
'machinery-bound' signature. This strips the pair kernel stage by
stage, same grid/IO each time:

  pad_only    jnp.pad + pair reshape + slice back (host-side prep cost)
  passthru    read packed tiles -> write (per-call floor at this
              geometry/lane class)
  ln_only     + per-phase LN
  ln_conv1    + conv1 dot (lhs concat + shift slabs + mask + gelu)
  full        the production pair kernel

Usage (on the TPU chip): python benchmarks/exp_r16b_cab_ablate.py
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

from superresolution_tpu.models.hat_lite import (  # noqa: E402
    ChannelAttentionBlock)
from superresolution_tpu.ops.pallas_hab import (  # noqa: E402
    _CAB_PAD,
    _ln,
    cab_pair_weights,
    fused_cab_convs_pair,
    gelu_exact,
)
from superresolution_tpu.ops.pallas_windows import (  # noqa: E402
    const_spec,
    edge_windows,
    largest_row_block,
    window_specs,
)

B, H, W, C = 4, 256, 256, 96


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def timeit(fn, x, iters=20, warmup=1):
    @jax.jit
    def chained(x):
        def body(_, v):
            return fn(v).astype(v.dtype)

        return jax.lax.fori_loop(0, iters, body, x)

    for _ in range(warmup):
        out = chained(x)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    jax.block_until_ready(chained(x))
    return (time.perf_counter() - t0) / iters


def make_variant(weights, stage):
    """stage: 'passthru' | 'ln' | 'conv1' — truncated pair kernels with
    the production kernel's exact grid/IO."""
    ln_s, ln_b, w1, bias1, w2, bias2 = weights

    def kernel(top_ref, mid_ref, bot_ref, ln_sr, ln_br, w1r, b1r,
               w2r, b2r, out_ref, *, rb, w_img, wp2, nb, h_img, c):
        halo = 2
        row_start = (pl.program_id(0) % nb) * rb
        pad2 = _CAB_PAD // 2
        w2_img = w_img // 2
        c2 = 2 * c
        xf = jnp.concatenate([top_ref[0].reshape(halo * wp2, c2),
                              mid_ref[0].reshape(rb * wp2, c2),
                              bot_ref[0].reshape(halo * wp2, c2)],
                             axis=0)

        def mask(t, k):
            m = t.shape[0]
            rows, n = m // wp2, t.shape[1]
            t2 = t.reshape(rows, wp2, n)
            col = jax.lax.broadcasted_iota(jnp.int32, (1, wp2, 1), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
            r_img = row + (row_start - halo + k)
            ok = ((col >= pad2) & (col < pad2 + w2_img)
                  & (r_img >= 0) & (r_img < h_img))
            t2 = jnp.where(ok, t2, jnp.asarray(0, t2.dtype))
            return t2.reshape(m, n)

        if stage == "passthru":
            out_ref[0] = xf[2 * wp2:(rb + 2) * wp2].reshape(rb, wp2, c2)
            return
        xf32 = xf.astype(jnp.float32)
        ln = jnp.concatenate(
            [_ln(xf32[:, :c], ln_sr[:], ln_br[:]),
             _ln(xf32[:, c:], ln_sr[:], ln_br[:])], axis=1)
        ln = mask(ln, 0).astype(xf.dtype)
        if stage == "ln":
            out_ref[0] = ln[2 * wp2:(rb + 2) * wp2].reshape(rb, wp2, c2)
            return

        def rconv2(u, w, bias, k):
            cin = u.shape[1] // 2
            mu = u.shape[0]
            mo = mu - 2 * wp2
            p0 = u[:, :cin]
            p1 = u[:, cin:]
            sm = jnp.concatenate([p1[mu - 1:], p1[:mu - 1]], axis=0)
            sp = jnp.concatenate([p0[1:], p0[:1]], axis=0)
            slabs = []
            for dyo in (0, 1, 2):
                base = dyo * wp2
                slabs += [sm[base:base + mo], u[base:base + mo],
                          sp[base:base + mo]]
            lhs = jnp.concatenate(slabs, axis=1)
            acc = jnp.dot(lhs, w[:], preferred_element_type=jnp.float32)
            acc = acc + bias[:]
            return mask(acc, k)

        h1 = rconv2(ln, w1r, b1r, 1)
        h1 = gelu_exact(h1).astype(xf.dtype)
        # pad h1's 64 lanes back to c2 for a uniform out spec
        m1 = h1.shape[0]
        h1p = jnp.concatenate(
            [h1, jnp.zeros((m1, c2 - h1.shape[1]), h1.dtype)], axis=1)
        out_ref[0] = h1p[wp2:(rb + 1) * wp2].reshape(rb, wp2, c2)

    def apply(x):
        b, h, w_img, c = x.shape
        w2_img = w_img // 2
        pad2 = _CAB_PAD // 2
        wp2 = -(-(w2_img + 2 * pad2) // 16) * 16
        halo = 2
        rb = largest_row_block(h, max(1, 12000 // wp2 - 2 * halo))
        nb = h // rb
        xp = jnp.pad(x, ((0, 0), (0, 0),
                         (_CAB_PAD, 2 * wp2 - w_img - _CAB_PAD),
                         (0, 0)))
        x2 = xp.reshape(b, h, wp2, 2 * c)
        tops, mid, bots = edge_windows(x2, rb, nb, halo=halo)
        spec_edge, spec_mid, _ = window_specs(rb, wp2, 2 * c, halo=halo)
        out = pl.pallas_call(
            partial(kernel, rb=rb, w_img=w_img, wp2=wp2, nb=nb,
                    h_img=h, c=c),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            grid=(b * nb,),
            in_specs=[spec_edge, spec_mid, spec_edge]
            + [const_spec(t) for t in weights],
            out_specs=pl.BlockSpec((1, rb, wp2, 2 * c),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * nb, rb, wp2, 2 * c),
                                           x.dtype),
            interpret=False,
        )(tops, mid, bots, *weights)
        out = out.reshape(b, h, wp2 * 2, c)
        return out[:, :, _CAB_PAD:_CAB_PAD + w_img]

    return apply


def main():
    ks = jax.random.split(jax.random.key(0), 4)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    block = ChannelAttentionBlock(C)
    cp = block.init(ks[1], x)["params"]
    hp = {
        "LayerNorm_0": {
            "scale": jax.random.normal(ks[2], (C,)) * 0.1 + 1.0,
            "bias": jax.random.normal(ks[3], (C,)) * 0.1,
        },
        "ChannelAttentionBlock_0": cp,
    }
    xb = x.astype(jnp.bfloat16)
    w_pair = cab_pair_weights(hp, jnp.bfloat16)

    def pad_only(v):
        b, h, w_img, c = v.shape
        wp2 = -(-(w_img // 2 + _CAB_PAD) // 16) * 16
        xp = jnp.pad(v, ((0, 0), (0, 0),
                         (_CAB_PAD, 2 * wp2 - w_img - _CAB_PAD),
                         (0, 0)))
        x2 = xp.reshape(b, h, wp2, 2 * c)
        return x2.reshape(b, h, 2 * wp2, c)[:, :, _CAB_PAD:_CAB_PAD + w_img]

    record("pad_only_ms", round(timeit(pad_only, xb) * 1e3, 3))
    for stage in ("passthru", "ln", "conv1"):
        t = timeit(make_variant(w_pair, stage), xb)
        record(f"{stage}_ms", round(t * 1e3, 3))
    t = timeit(lambda v: fused_cab_convs_pair(v, w_pair), xb)
    record("full_ms", round(t * 1e3, 3))


if __name__ == "__main__":
    main()
