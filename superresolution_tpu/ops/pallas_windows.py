"""Shared host-side blocking helpers for the row-blocked Pallas kernels.

Every fused kernel in this package (dense-block trunk, phase tail)
consumes the image as an rb-row grid with a top/bottom halo window per
block; these helpers build the (tops, mid, bots) inputs and their
BlockSpecs once, so the halo-window construction cannot silently
diverge between kernels.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def edge_windows(x, rb: int, nb: int, halo: int = 1):
    """x [B, H, W, ch] -> (tops, mid, bots) blocked for an rb-row grid
    with `halo` zero rows above/below the image."""
    b, h, wd, ch = x.shape
    xh = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))
    mid = xh[:, halo:halo + h].reshape(b * nb, rb, wd, ch)
    tops = jnp.stack([xh[:, i * rb:i * rb + halo] for i in range(nb)],
                     axis=1).reshape(b * nb, halo, wd, ch)
    bots = jnp.stack([xh[:, halo + (i + 1) * rb:
                         2 * halo + (i + 1) * rb] for i in range(nb)],
                     axis=1).reshape(b * nb, halo, wd, ch)
    return tops, mid, bots


def window_specs(rb: int, wd: int, ch: int, halo: int = 1):
    """BlockSpecs matching edge_windows' (tops, mid, bots) order."""
    spec_mid = pl.BlockSpec((1, rb, wd, ch), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_edge = pl.BlockSpec((1, halo, wd, ch), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    return spec_edge, spec_mid, spec_edge


def const_spec(t):
    """Whole-array VMEM BlockSpec for grid-invariant weights."""
    return pl.BlockSpec(t.shape, lambda i: (0,) * t.ndim,
                        memory_space=pltpu.VMEM)


def largest_row_block(h: int, cap: int) -> int:
    """Largest divisor of h that is <= cap (at least 1) — the shared
    rb-picking kernel; each caller supplies its own VMEM-model cap."""
    best = 1
    for rb in range(1, h + 1):
        if h % rb == 0 and rb <= cap:
            best = rb
    return best


def padded_width(width: int, pad: int) -> int:
    """`pad` zero cols each side, rounded up to a multiple of 16 (the
    sublane-roll alignment every row-blocked kernel requires)."""
    return -(-(width + 2 * pad) // 16) * 16
