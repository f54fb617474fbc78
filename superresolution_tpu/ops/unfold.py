"""Overlapping-window (unfold) extraction for OCAB key/value gathers.

The reference HAT OCAB (see models/hat_lite.py:221) gathers, for every
ws-strided query window, the enlarged ows x ows key/value patch around
it. The direct form is a static loop of ows*ows strided slices (144 at
ws=8/ows=12) stacked along a new token axis — measured 4.05 ms inside
the 16.4 ms OCAB call at the hybrid geometry (exp_r23).

This module implements the same gather as a CELL decomposition: with
g = gcd(ws, ows), every patch is a pc x pc block of g x g cells on a
grid where window origins land every sc cells (sc = ws/g, pc = ows/g).
That turns the gather into pc*pc (=9) cell-grid slices plus ONE
transpose — the data moves once, in a single fused XLA copy, instead
of ows*ows slice+stack passes.

Token order matches the reference loop exactly: token = di*ows + dj
over the patch's (row, col) offsets.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def extract_overlapping_windows(kv: jnp.ndarray, ws: int, ows: int,
                                nh_w: int, nw_w: int) -> jnp.ndarray:
    """kv: [B, H + (ows-ws), W + (ows-ws), C] — the LN'd/padded kv map.
    Returns [B * nh_w * nw_w, ows*ows, C] patches, one ows x ows patch
    per ws-strided window, token-ordered row-major (di*ows + dj).
    """
    b, hp, wp, c = kv.shape
    g = math.gcd(ws, ows)
    sc, pc = ws // g, ows // g
    if hp % g or wp % g:
        return _extract_loop(kv, ws, ows, nh_w, nw_w)
    hc, wc = hp // g, wp // g
    cells = kv.reshape(b, hc, g, wc, g, c)
    rows9 = []
    for ci in range(pc):
        rows = cells[:, ci::sc][:, :nh_w]
        for cj in range(pc):
            cols = rows[:, :, :, cj::sc][:, :, :, :nw_w]
            rows9.append(cols)  # [B, nh_w, g, nw_w, g, C]
    out = jnp.stack(rows9, axis=1)  # [B, pc*pc, nh_w, g, nw_w, g, C]
    out = out.reshape(b, pc, pc, nh_w, g, nw_w, g, c)
    out = out.transpose(0, 3, 5, 1, 4, 2, 6, 7)
    return out.reshape(b * nh_w * nw_w, ows * ows, c)


def _extract_loop(kv: jnp.ndarray, ws: int, ows: int, nh_w: int,
                  nw_w: int) -> jnp.ndarray:
    """Direct ows*ows strided-slice form (the reference construction)."""
    b, _, _, c = kv.shape
    patches = []
    for di in range(ows):
        rows = kv[:, di::ws][:, :nh_w]
        for dj in range(ows):
            cols = rows[:, :, dj::ws][:, :, :nw_w]
            patches.append(cols)
    out = jnp.stack(patches, axis=3)
    return out.reshape(b * nh_w * nw_w, ows * ows, c)
