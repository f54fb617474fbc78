"""Pallas star-weighted L1 loss — a compiled production kernel.

The reference's training-loss hot path (reference: src/losses.py:9-19):
mean(|pred - target| * where(target > thr, w, 1)). As one Pallas kernel
the weight map, |diff|, multiply, and reduction fuse into a single
VMEM-resident pass per block (one HBM read of each operand, no
intermediate map materialized), with a custom VJP whose backward pass is
the same fused elementwise form. Verified to compile under Mosaic on v5e
(elementwise + reduce is comfortably inside its supported envelope).

Inputs are flattened to [M, 128]-aligned 2-D blocks; the tail is masked.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BLOCK_ROWS = 512


def _fwd_kernel(p_ref, t_ref, n_ref, out_ref, *, thr, w):
    i = pl.program_id(0)
    rows = p_ref.shape[0]
    base = i * rows * _LANES
    idx = (base
           + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0) * _LANES
           + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1))
    valid = idx < n_ref[0]
    p = p_ref[:].astype(jnp.float32)
    t = t_ref[:].astype(jnp.float32)
    wmap = jnp.where(t > thr, w, 1.0)
    contrib = jnp.where(valid, jnp.abs(p - t) * wmap, 0.0)
    s = jnp.sum(contrib)

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += s


def _bwd_kernel(p_ref, t_ref, n_ref, g_ref, dp_ref, *, thr, w):
    i = pl.program_id(0)
    rows = p_ref.shape[0]
    base = i * rows * _LANES
    idx = (base
           + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0) * _LANES
           + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1))
    valid = idx < n_ref[0]
    p = p_ref[:].astype(jnp.float32)
    t = t_ref[:].astype(jnp.float32)
    wmap = jnp.where(t > thr, w, 1.0)
    sgn = jnp.sign(p - t)
    scale = g_ref[0] / n_ref[0].astype(jnp.float32)
    dp_ref[:] = jnp.where(valid, sgn * wmap * scale, 0.0).astype(dp_ref.dtype)


def _flatten_pad(x):
    n = x.size
    rows = -(-n // _LANES)
    rows_pad = -(-rows // _BLOCK_ROWS) * _BLOCK_ROWS
    flat = jnp.pad(x.reshape(-1), (0, rows_pad * _LANES - n))
    return flat.reshape(rows_pad, _LANES), n


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def star_weighted_l1_pallas(pred: jnp.ndarray, target: jnp.ndarray,
                            threshold: float = 0.02,
                            weight: float = 500.0) -> jnp.ndarray:
    """Fused star-weighted L1 (reference src/losses.py semantics)."""
    return _forward(pred, target, threshold, weight)


def _forward(pred, target, threshold, weight):
    p2, n = _flatten_pad(pred)
    t2, _ = _flatten_pad(target)
    grid = (p2.shape[0] // _BLOCK_ROWS,)
    total = pl.pallas_call(
        partial(_fwd_kernel, thr=threshold, w=weight),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(p2, t2, jnp.asarray([n], jnp.int32))
    return total[0, 0] / n


def _fwd(pred, target, threshold, weight):
    return _forward(pred, target, threshold, weight), (pred, target)


def _bwd(threshold, weight, res, g):
    pred, target = res
    p2, n = _flatten_pad(pred)
    t2, _ = _flatten_pad(target)
    grid = (p2.shape[0] // _BLOCK_ROWS,)
    dp2 = pl.pallas_call(
        partial(_bwd_kernel, thr=threshold, w=weight),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(p2.shape, pred.dtype),
    )(p2, t2, jnp.asarray([n], jnp.int32),
      jnp.asarray([g], jnp.float32))
    dp = dp2.reshape(-1)[: pred.size].reshape(pred.shape)
    return dp, None


star_weighted_l1_pallas.defvjp(_fwd, _bwd)
