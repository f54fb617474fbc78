"""Stacked-head attention inside the fused HAB kernel — A/B.

The shipped _body does 2 MXU dots per (window, head): 12 tiny
[64,96]x[96,64]-class dots per window at nh=6. The stacked form
(SRTPU_STACKED_ATTN=1) rides heads on the M dimension with lane masks
(ops/pallas_hab._body docstring): 2 dots per WINDOW —
[384,96]x[64,96]->[384,64] transposed logits and the dim-0-contracted
apply [384,64]x[384,96]->[64,96] — 6x fewer, better-filled dots and a
6x smaller per-window unroll.

Interpret-mode equivalence: both forms match reference_hab_body to the
same bf16 tolerance (masked + plain), verified at edit time and in
tests/test_fused_hat.py.

Timing: house-rule marginal chain (BENCHMARKS.md round 3) on the
flagship habk geometry from exp_r23: [4096, 64, 96] windows, nh=6,
masked (the shifted-block case) and unmasked.

Usage (on the TPU chip): python benchmarks/exp_r26_stacked_attn.py
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

from superresolution_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def make_weights(rng, c, nh, n, mlp):
    f32 = {"ln1_s", "ln1_b", "bq", "bk", "bv", "rpb", "bp", "ln2_s",
           "ln2_b", "b1", "b2"}
    shapes = {
        "ln1_s": (1, c), "ln1_b": (1, c), "wq": (c, c), "wk": (c, c),
        "wv": (c, c), "bq": (1, c), "bk": (1, c), "bv": (1, c),
        "rpb": (nh, n, n), "wp": (c, c), "bp": (1, c), "ln2_s": (1, c),
        "ln2_b": (1, c), "w1": (c, mlp), "b1": (1, mlp), "w2": (mlp, c),
        "b2": (1, c),
    }
    return {k: jnp.asarray(rng.standard_normal(s) * 0.1,
                           jnp.float32 if k in f32 else jnp.bfloat16)
            for k, s in shapes.items()}


def chain_ms(fn, x, k):
    # device_get a SCALAR (50 MB carry over the ~1.4 MB/s tunnel adds
    # ~36 s of transfer whose variance swamps the marginal — the
    # round-4 first-run garbage numbers).
    @jax.jit
    def run(u):
        return jnp.sum(jax.lax.fori_loop(
            0, k, lambda _, v: fn(v), u).astype(jnp.float32))

    jax.device_get(run(x))
    t0 = time.perf_counter()
    jax.device_get(run(x))
    return (time.perf_counter() - t0) * 1e3


def main():
    from superresolution_tpu.ops.pallas_hab import fused_hab_block

    rng = np.random.default_rng(0)
    nb, n, c, nh, mlp = 4096, 64, 96, 6, 192
    x = jnp.asarray(rng.standard_normal((nb, n, c)) * 0.5, jnp.bfloat16)
    w = make_weights(rng, c, nh, n, mlp)
    ids = jnp.asarray(rng.integers(0, 4, (8, n)), jnp.int32)
    interp = jax.default_backend() != "tpu"

    for env in ("0", "1"):
        os.environ["SRTPU_STACKED_ATTN"] = env
        tag = "stacked" if env == "1" else "loop"
        for mname, rids in (("plain", None), ("masked", ids)):
            def fn(v):
                return fused_hab_block(v, v, nh, interp, w, rids)

            t8, t16 = chain_ms(fn, x, 8), chain_ms(fn, x, 16)
            record(f"habk_{tag}_{mname}_marginal_ms",
                   round((t16 - t8) / 8, 3))


if __name__ == "__main__":
    main()
