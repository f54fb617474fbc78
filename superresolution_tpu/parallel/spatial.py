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

from jax import shard_map  # jax >= 0.7 (the package floor: pipeline.py
#                            also uses lax.pcast, jax >= 0.9)


def _halo_exchange(blk, halo: int, n: int, edge_mode: str):
    """Pad a per-device row block with its neighbors' boundary rows over
    ICI (one ppermute each way). The global top/bottom edges use
    edge_mode: 'replicate' (inference — matches the tiled-inference
    border convention) or 'zero' (the training objective's fixed,
    device-count-invariant padding)."""
    idx = lax.axis_index("spatial")
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_above = lax.ppermute(blk[:, -halo:], "spatial", fwd)
    from_below = lax.ppermute(blk[:, :halo], "spatial", bwd)
    if edge_mode == "replicate":
        top_edge = jnp.repeat(blk[:, :1], halo, axis=1)
        bot_edge = jnp.repeat(blk[:, -1:], halo, axis=1)
    else:
        top_edge = bot_edge = jnp.zeros_like(blk[:, :halo])
    top = jnp.where(idx == 0, top_edge, from_above)
    bot = jnp.where(idx == n - 1, bot_edge, from_below)
    return jnp.concatenate([top, blk, bot], axis=1)


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

    @partial(shard_map, mesh=mesh,
             in_specs=P(None, "spatial", None, None),
             out_specs=P(None, "spatial", None, None))
    def run(block):
        # replicate edges: like tiled inference, the result matches
        # unsharded inference exactly except within halo*scale rows of
        # the true image border (see infer/tiled.py).
        padded = _halo_exchange(block, halo, n, "replicate")
        out = fn(padded)
        return out[:, halo * scale: out.shape[1] - halo * scale]

    return run(img)


def make_spatial_loss(mesh: Mesh, apply_fn, loss_sum_fn, halo: int,
                      scale: int):
    """Spatial-parallel TRAINING objective: loss_fn(params, lr, hr) with
    the image rows sharded over the 'spatial' mesh axis.

    The SR-net forward runs per-chip on a halo-padded row block (halo
    exchange over ICI via ppermute, like spatial_shard_apply); the
    global top/bottom halos are ZERO rows. The sharded computation is
    then EXACTLY the unsharded forward applied to the halo-zero-padded
    image and cropped — a well-defined objective whose interior
    (everything but the halo*scale border band) coincides with plain
    unsharded training whenever the net's half receptive field <= halo
    (the tiled-inference contract, infer/tiled.py). Loss and gradients
    match that single-device reference to f.p. reassociation
    (tests/test_parallel.py::test_spatial_train_grads_match_single).
    Gradients flow through the ppermute exchange automatically (its
    transpose is the reverse permutation) and reduce over the mesh via
    the psum.

    apply_fn(params, lr_block) -> upscaled block; loss_sum_fn(pred, hr)
    must return the SUM of per-element losses (sum-decomposable over
    row shards — the mean is taken here over the global element count).

    Differentiate with jax.value_and_grad as usual:
        loss_fn = make_spatial_loss(mesh, apply, l1_sum, halo, scale)
        loss, grads = jax.value_and_grad(loss_fn)(params, lr, hr)
    """
    n = mesh.shape["spatial"]

    def loss_fn(params, lr, hr):
        h = lr.shape[1]
        if n > 1 and h % n:
            raise ValueError(f"H={h} not divisible by spatial size {n}")
        if n > 1 and h // n < halo:
            raise ValueError(f"block height {h // n} < halo {halo}")
        denom = jnp.asarray(hr.size, jnp.float32)

        if n == 1:
            # same objective as the sharded path (zero-halo pad + crop),
            # so the loss does not depend on the device count
            x = jnp.pad(lr, ((0, 0), (halo, halo), (0, 0), (0, 0)))
            out = apply_fn(params, x)
            out = out[:, halo * scale: out.shape[1] - halo * scale]
            return loss_sum_fn(out, hr) / denom

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(), P(None, "spatial", None, None),
                           P(None, "spatial", None, None)),
                 out_specs=P())
        def run(params, blk, hr_blk):
            padded = _halo_exchange(blk, halo, n, "zero")
            out = apply_fn(params, padded)
            out = out[:, halo * scale: out.shape[1] - halo * scale]
            return lax.psum(loss_sum_fn(out, hr_blk), "spatial")

        return run(params, lr, hr) / denom

    return loss_fn
