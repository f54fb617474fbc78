"""Spatial (image-space) sharding: single-image multi-chip inference.

The TPU-native analog of context/sequence parallelism for vision (SURVEY.md
section 5 "Long-context"): an image too large for one chip is sharded by
rows across the 'spatial' mesh axis; each chip exchanges `halo` boundary
rows with its neighbors over ICI (lax.ppermute inside shard_map), runs the
SR net on its halo-padded block, and crops the halo from the upscaled
output. Valid whenever the model is a shift-invariant conv/windowed net
whose half receptive field <= halo (same condition as tiled inference in
infer/tiled.py — this is its multi-chip twin).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 public API; fall back for older versions
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def spatial_shard_apply(mesh: Mesh, fn, img: jnp.ndarray, halo: int,
                        scale: int) -> jnp.ndarray:
    """Apply `fn` (NHWC -> NHWC, x`scale`) to `img` sharded by rows over the
    'spatial' mesh axis with halo exchange.

    img: [B, H, W, C] with H divisible by mesh.shape['spatial'] and the
    per-device block height >= halo.
    """
    n = mesh.shape["spatial"]
    if n == 1:
        return fn(img)
    h = img.shape[1]
    if h % n:
        raise ValueError(f"H={h} not divisible by spatial axis size {n}")
    if h // n < halo:
        raise ValueError(f"block height {h // n} < halo {halo}")

    fwd = [(i, (i + 1) % n) for i in range(n)]   # send to next (down)
    bwd = [(i, (i - 1) % n) for i in range(n)]   # send to prev (up)

    @partial(shard_map, mesh=mesh,
             in_specs=P(None, "spatial", None, None),
             out_specs=P(None, "spatial", None, None))
    def run(block):
        idx = lax.axis_index("spatial")
        # halo from the block above (its bottom rows travel down via fwd)
        from_above = lax.ppermute(block[:, -halo:], "spatial", fwd)
        # halo from the block below (its top rows travel up via bwd)
        from_below = lax.ppermute(block[:, :halo], "spatial", bwd)
        # global edges: replicate boundary rows; like tiled inference, the
        # result matches unsharded inference exactly except within
        # halo*scale rows of the true image border (see infer/tiled.py).
        top_edge = jnp.repeat(block[:, :1], halo, axis=1)
        bot_edge = jnp.repeat(block[:, -1:], halo, axis=1)
        top = jnp.where(idx == 0, top_edge, from_above)
        bot = jnp.where(idx == n - 1, bot_edge, from_below)
        padded = jnp.concatenate([top, block, bot], axis=1)
        out = fn(padded)
        return out[:, halo * scale: out.shape[1] - halo * scale]

    return run(img)
