"""Sub-pair itemization of the HAB pair (VERDICT r4 item 3c).

exp_r23 stopped at pair granularity: of the 11.97 ms HAB pair at the
flagship geometry ([4,256,256,96] bf16), the two attention kernels are
~5.7 ms and the two CABs ~3.1 ms, leaving ~3 ms/pair (~37 ms/frame) of
XLA glue that was never itemized. This harness times each named piece
standalone under the house-rule marginal chains:

  hab_noshift / hab_shift   one full _hab call (kernel + all glue)
  kernel_only               fused_hab_block on pre-partitioned windows
  partition+merge           window_partition -> window_merge round trip
  roll_pair                 the two jnp.rolls of the shifted branch
  cab_convs                 fused CAB conv kernel alone
  se_tail                   global-mean SE excitation + scale-mul
  ln_only                   one f32 LayerNorm over the map

Usage (on the TPU chip): python benchmarks/exp_r34_pair_glue.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from superresolution_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

from superresolution_tpu.infer.fused_hat import (  # noqa: E402
    _cab_fused,
    _hab,
    _ln,
    _se_scale,
    _wa_weights,
)
from superresolution_tpu.models.hat_lite import (  # noqa: E402
    HATLite,
    window_merge,
    window_partition,
)
from superresolution_tpu.ops.pallas_hab import (  # noqa: E402
    cab_weights,
    fused_cab_convs,
    fused_hab_block,
)

B = int(os.environ.get("SRTPU_HYBRID_BATCH", "1"))
H, W, C = 256, 256, 96
WS, NH = 8, 6


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def timeit(fn, x, iters=10):
    def make(n):
        @jax.jit
        def run(v):
            def body(_, u):
                out = fn(u)
                return (u + jnp.float32(1e-6).astype(u.dtype)
                        * jnp.mean(out.astype(jnp.float32)).astype(u.dtype))

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
    return (t2 - t1) / iters * 1e3


def main():
    model = HATLite(scale=2, in_channels=1, out_channels=1, embed_dim=C,
                    depths=(2, 2), num_heads=(NH, NH), window_size=WS,
                    attn_f32=False, flash_attn=True)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 32, 32, 1)))
    p = variables["params"]
    gp = jax.tree.map(lambda a: a[0], p["groups"])["ResidualGroup_0"]
    hp = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        jax.tree.map(lambda a: a[0], gp["hab_pairs"]))
    hp0 = hp["HABlock_0"]

    x = jax.random.normal(jax.random.key(1), (B, H, W, C), jnp.bfloat16)

    results = {}

    def run(tag, fn, v=x, iters=60):
        ms = timeit(fn, v, iters=iters)
        results[tag] = ms
        record(tag + "_ms", round(ms, 3))

    # full _hab call, both shift branches
    run("hab_noshift", lambda v: _hab(
        v, hp0, shift=0, ws=WS, nh=NH, conv_scale=0.01, interpret=False))
    run("hab_shift", lambda v: _hab(
        v, hp0, shift=WS // 2, ws=WS, nh=NH, conv_scale=0.01,
        interpret=False))

    # attention kernel alone on pre-partitioned windows
    weights = _wa_weights(hp0, NH, WS, jnp.bfloat16)
    xw = window_partition(x, WS)
    cw = window_partition(x * jnp.bfloat16(0.01), WS)
    run("kernel_only", lambda v: fused_hab_block(
        v, cw, NH, False, weights, None), v=xw)

    # partition -> merge round trip (the per-block layout glue)
    run("partition_merge", lambda v: window_merge(
        window_partition(v, WS), WS, (H, W)))

    # the shifted branch's two rolls
    run("roll_pair", lambda v: jnp.roll(
        jnp.roll(v, (-4, -4), axis=(1, 2)), (4, 4), axis=(1, 2)))

    # CAB pieces
    run("cab_convs", lambda v: fused_cab_convs(
        v, cab_weights(hp0, v.dtype), interpret=False))
    run("cab_full", lambda v: _cab_fused(v, hp0, False))
    run("se_tail", lambda v: _se_scale(
        v, hp0["ChannelAttentionBlock_0"]))

    # one LayerNorm over the full map (f32 stats)
    run("ln_only", lambda v: _ln(v, hp0["LayerNorm_0"]))

    glue = results["hab_noshift"] - results["kernel_only"] \
        - results["cab_full"]
    record("derived_noshift_glue_ms", round(glue, 3))
    record("derived_pair_ms",
           round(results["hab_noshift"] + results["hab_shift"], 3))


if __name__ == "__main__":
    main()
