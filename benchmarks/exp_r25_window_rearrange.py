"""Mosaic feasibility spike: in-kernel window partition (VERDICT r4
prereq for merging the CAB convs into the fused HAB program).

The merge design (ROUND4_NOTES.md) keeps the HAB kernel's grid over
8-row SPATIAL strips and does the window grouping in VMEM: only the
[64,64] attention dots need window-grouped tokens; LN/qkv/proj/MLP are
per-token and layout-agnostic. That kills the XLA partition/merge/roll
round-trips between the CAB kernel and the HAB kernel — IF Mosaic can
slice [ws, ws, C] sub-blocks out of a [ws, Wp, C] strip (a sublane-dim
slice at 8-aligned offsets) and concatenate them back at tolerable
cost.

Pieces:
  fwd    strip [8, Wp, C] -> windows [nw, 64, C] via 8-col slices
  inv    windows -> strip (the output-side inverse)
  rt     fwd + [64,64] dummy dot per window + inv (the real usage:
         measures whether the rearrange rides along with attention)
  xla    the XLA window_partition round-trip it would replace

Correctness: interpret mode vs jnp reference (runs on CPU).
Timing: house-rule marginal chain on the TPU.

Usage: python benchmarks/exp_r25_window_rearrange.py [check|time]
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

from superresolution_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

WS = 8


def _fwd_kernel(x_ref, out_ref, *, nw, c):
    x = x_ref[0]  # [WS, Wp, C]
    wins = [x[:, wi * WS:(wi + 1) * WS, :].reshape(WS * WS, c)
            for wi in range(nw)]
    out_ref[0] = jnp.stack(wins, axis=0)


def _inv_kernel(w_ref, out_ref, *, nw, c):
    w = w_ref[0]  # [nw, 64, C]
    cols = [w[wi].reshape(WS, WS, c) for wi in range(nw)]
    out_ref[0] = jnp.concatenate(cols, axis=1)


def _rt_kernel(x_ref, m_ref, out_ref, *, nw, c):
    x = x_ref[0]
    m = m_ref[:]  # [64, 64] dummy attention matrix
    outs = []
    for wi in range(nw):
        t = x[:, wi * WS:(wi + 1) * WS, :].reshape(WS * WS, c)
        t = jnp.dot(m, t, preferred_element_type=jnp.float32)
        outs.append(t.astype(x.dtype).reshape(WS, WS, c))
    out_ref[0] = jnp.concatenate(outs, axis=1)


def strip_partition(x, interpret):
    """[S, WS, Wp, C] strips -> [S, nw, 64, C] windows, in-kernel."""
    s, ws, wp, c = x.shape
    nw = wp // WS
    return pl.pallas_call(
        partial(_fwd_kernel, nw=nw, c=c),
        grid=(s,),
        in_specs=[pl.BlockSpec((1, ws, wp, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, nw, WS * WS, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, nw, WS * WS, c), x.dtype),
        interpret=interpret,
    )(x)


def strip_merge(w, wp, interpret):
    s, nw, n, c = w.shape
    return pl.pallas_call(
        partial(_inv_kernel, nw=nw, c=c),
        grid=(s,),
        in_specs=[pl.BlockSpec((1, nw, n, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, WS, wp, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, WS, wp, c), w.dtype),
        interpret=interpret,
    )(w)


def strip_roundtrip(x, m, interpret):
    s, ws, wp, c = x.shape
    nw = wp // WS
    return pl.pallas_call(
        partial(_rt_kernel, nw=nw, c=c),
        grid=(s,),
        in_specs=[pl.BlockSpec((1, ws, wp, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((WS * WS, WS * WS), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, WS, wp, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, WS, wp, c), x.dtype),
        interpret=interpret,
    )(x, m)


def record(key, value):
    print(json.dumps({key: value}), flush=True)


def check(interpret):
    rng = np.random.default_rng(0)
    s, wp, c = 4, 256, 96
    x = jnp.asarray(rng.standard_normal((s, WS, wp, c)),
                    jnp.bfloat16)
    ref = x.reshape(s, WS, wp // WS, WS, c).transpose(0, 2, 1, 3, 4)
    ref = ref.reshape(s, wp // WS, WS * WS, c)
    got = strip_partition(x, interpret)
    record("fwd_max_diff", float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - ref.astype(jnp.float32)))))
    back = strip_merge(got, wp, interpret)
    record("inv_max_diff", float(jnp.max(jnp.abs(
        back.astype(jnp.float32) - x.astype(jnp.float32)))))
    m = jnp.asarray(rng.standard_normal((64, 64)), jnp.bfloat16)
    rt = strip_roundtrip(x, m, interpret)
    ref_rt = jnp.einsum("nm,swmc->swnc", m.astype(jnp.float32),
                        ref.astype(jnp.float32)).astype(jnp.bfloat16)
    ref_rt = strip_merge(ref_rt, wp, True) if False else (
        ref_rt.reshape(s, wp // WS, WS, WS, c).transpose(0, 2, 1, 3, 4)
        .reshape(s, WS, wp, c))
    record("rt_max_diff", float(jnp.max(jnp.abs(
        rt.astype(jnp.float32) - ref_rt.astype(jnp.float32)))))


def _chain(fn, x, k):
    # device_get a SCALAR, not the 50 MB carry: the dev tunnel moves
    # ~1.4 MB/s, so pulling the carry adds ~36 s whose run-to-run
    # variance swamps the marginal (the round-4 exp_r25/r26 first-run
    # garbage: negative and 300 ms-scale "marginals").
    @jax.jit
    def run(x):
        def body(_, u):
            return fn(u)
        return jnp.sum(jax.lax.fori_loop(0, k, body, x).astype(
            jnp.float32))

    jax.device_get(run(x))
    t0 = time.perf_counter()
    jax.device_get(run(x))
    return (time.perf_counter() - t0) * 1e3


def timing():
    rng = np.random.default_rng(0)
    # hybrid stage-2 geometry: B4 x H256 -> 128 strips, W 256, C 96
    s, wp, c = 128, 256, 96
    x = jnp.asarray(rng.standard_normal((s, WS, wp, c)), jnp.bfloat16)
    m = jnp.asarray(rng.standard_normal((64, 64)), jnp.bfloat16)

    def rt(u):
        return strip_roundtrip(u, m, False)

    def xla_rt(u):
        w = u.reshape(s, WS, wp // WS, WS, c).transpose(0, 2, 1, 3, 4)
        w = w.reshape(s * wp // WS, WS * WS, c)
        w = jnp.einsum("nm,bmc->bnc", m.astype(jnp.float32),
                       w.astype(jnp.float32)).astype(u.dtype)
        w = w.reshape(s, wp // WS, WS, WS, c).transpose(0, 2, 1, 3, 4)
        return w.reshape(s, WS, wp, c)

    for name, fn in (("pallas_rt", rt), ("xla_rt", xla_rt)):
        t8, t16 = _chain(fn, x, 8), _chain(fn, x, 16)
        record(f"{name}_marginal_ms", round((t16 - t8) / 8, 3))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        check(jax.default_backend() != "tpu")
    else:
        timing()
