"""Fully on-device overlap-halo tiled inference.

The host-side tiler (infer/tiled.py) round-trips every tile batch over
PCIe/the host link — fine for huge images that do not fit HBM, but the
dominant cost when the link is slow. This variant keeps EVERYTHING on
device inside one jitted program: pad -> gather the static tile grid ->
lax.map the network over fixed-size tile batches -> crop halos ->
reassemble. One compilation, zero host round-trips, output stays in HBM
(e.g. for metric computation or 16-bit quantization before transfer).

Same exactness contract as infer/tiled.py (halo-crop; interior exact when
half receptive field <= halo).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_tiled_infer(fn, scale: int, tile: int, halo: int, batch: int,
                     h: int, w: int, channels: int):
    """Build a jitted HWC[h,w,c] -> HWC[h*scale, w*scale, c] tiled runner.

    `fn` maps [batch, tile+2*halo, tile+2*halo, c] -> upscaled batch.
    Static geometry (h, w) per compilation — reuse for a fixed input size.
    """
    ny, nx = -(-h // tile), -(-w // tile)
    n = ny * nx
    n_pad = (-n) % batch
    t_in = tile + 2 * halo
    ts = tile * scale
    hs = halo * scale

    # static gather coordinates of each tile's top-left corner (in padded img)
    coords = jnp.asarray([(iy * tile, ix * tile)
                          for iy in range(ny) for ix in range(nx)]
                         + [(0, 0)] * n_pad, dtype=jnp.int32)

    @jax.jit
    def run(img: jnp.ndarray) -> jnp.ndarray:
        ph, pw = ny * tile - h, nx * tile - w
        padded = jnp.pad(img, ((halo, ph + halo), (halo, pw + halo), (0, 0)),
                         mode="edge")

        def gather_tile(c):
            return jax.lax.dynamic_slice(
                padded, (c[0], c[1], 0), (t_in, t_in, channels))

        tiles = jax.vmap(gather_tile)(coords)  # [n+n_pad, t_in, t_in, C]
        tb = tiles.reshape(-1, batch, t_in, t_in, channels)

        outs = jax.lax.map(fn, tb)  # [nb, batch, t_in*s, t_in*s, C]
        outs = outs.reshape(-1, t_in * scale, t_in * scale, channels)[:n]
        outs = outs[:, hs:hs + ts, hs:hs + ts, :]  # crop halo
        grid = outs.reshape(ny, nx, ts, ts, channels)
        full = grid.transpose(0, 2, 1, 3, 4).reshape(ny * ts, nx * ts,
                                                     channels)
        return full[: h * scale, : w * scale]

    return run


def make_tiled_infer_staged(trunk_fn, tail_fn, scale: int, tile, halo: int,
                            tail_batch: int, h: int, w: int, channels: int,
                            trunk_batch: int | None = None,
                            split_stages: bool = False, mesh=None):
    """Two-stage tiled runner for trunk/tail-split SR models.

    The LR-resolution trunk is compute-bound: run it over the biggest tile
    batch that fits (default: ALL tiles at once — on v5e this lifts the
    fused-dense trunk from ~23 to ~40 TF/s vs batch-5). The tail
    materializes x`scale` tensors and is memory-bound: lax.map it in
    `tail_batch` chunks. Both stages live in one jitted program.

    `tile` may be an int or an (th, tw) pair — rectangular tiles let the
    grid divide non-square images with zero padding waste.
    With split_stages=True, returns (run_trunk, run_tail) as two separate
    jitted callables (for per-stage profiling) instead of one fused runner.

    With `mesh` (a Mesh with a 'data' axis), the tile batch is sharded
    across chips: each chip runs trunk+tail on its tile subset and the
    reassembled image is gathered over ICI — multi-chip single-image
    inference by tile parallelism (complements parallel/spatial.py's
    halo-exchange row sharding).
    """
    th_t, tw_t = (tile, tile) if isinstance(tile, int) else tile
    ny, nx = -(-h // th_t), -(-w // tw_t)
    n = ny * nx
    ti_h, ti_w = th_t + 2 * halo, tw_t + 2 * halo
    ts_h, ts_w = th_t * scale, tw_t * scale
    hs = halo * scale

    tb = tail_batch
    if mesh is not None:
        # pad the tile count so both the tail chunking and the data-axis
        # sharding divide it evenly (each chip maps over local chunks)
        mult = tb * mesh.shape["data"]
        n_pad_tail = (-n) % mult
    else:
        n_pad_tail = (-n) % tb
    kb = trunk_batch or (n + n_pad_tail if mesh is not None else n)
    n_pad_trunk = (-n) % kb
    if mesh is not None and trunk_batch:
        # with a mesh every trunk-padded tile also flows to the tail, so
        # the run count must divide into the trunk chunks AND the
        # (tail_batch x data) grid — pad to their common multiple
        import math

        pad = (-n) % math.lcm(kb, mult)
        n_pad_trunk = n_pad_tail = pad
    coords = jnp.asarray([(iy * th_t, ix * tw_t)
                          for iy in range(ny) for ix in range(nx)]
                         + [(0, 0)] * max(n_pad_trunk, n_pad_tail),
                         dtype=jnp.int32)

    def run_trunk(img: jnp.ndarray):
        ph, pw = ny * th_t - h, nx * tw_t - w
        padded = jnp.pad(img, ((halo, ph + halo), (halo, pw + halo), (0, 0)),
                         mode="edge")

        def gather_tile(c):
            return jax.lax.dynamic_slice(
                padded, (c[0], c[1], 0), (ti_h, ti_w, channels))

        n_run = n + max(n_pad_trunk, n_pad_tail if mesh is not None else 0)
        tiles = jax.vmap(gather_tile)(coords[:n_run])
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            tiles = jax.lax.with_sharding_constraint(
                tiles, NamedSharding(mesh, P("data")))
        if kb >= n_run:
            feats = trunk_fn(tiles)
        else:
            feats = jax.lax.map(
                trunk_fn, tiles.reshape(-1, kb, ti_h, ti_w, channels))
            feats = feats.reshape(-1, *feats.shape[2:])
        return feats if mesh is not None else feats[:n]

    def run_tail(feats: jnp.ndarray) -> jnp.ndarray:
        cf = feats.shape[-1]
        if mesh is None and n_pad_tail:
            feats = jnp.concatenate(
                [feats, jnp.zeros((n_pad_tail, ti_h, ti_w, cf),
                                  feats.dtype)])
        outs = jax.lax.map(tail_fn, feats.reshape(-1, tb, ti_h, ti_w, cf))
        outs = outs.reshape(-1, ti_h * scale, ti_w * scale,
                            outs.shape[-1])[:n]
        outs = outs[:, hs:hs + ts_h, hs:hs + ts_w, :]
        c_out = outs.shape[-1]
        grid = outs.reshape(ny, nx, ts_h, ts_w, c_out)
        full = grid.transpose(0, 2, 1, 3, 4).reshape(ny * ts_h, nx * ts_w,
                                                     c_out)
        full = full[: h * scale, : w * scale]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            full = jax.lax.with_sharding_constraint(
                full, NamedSharding(mesh, P()))
        return full

    if split_stages:
        return jax.jit(run_trunk), jax.jit(run_tail)

    @jax.jit
    def run(img: jnp.ndarray) -> jnp.ndarray:
        return run_tail(run_trunk(img))

    return run


def upscale_on_device(img, scale: int, model, params, tile: int = 256,
                      halo: int = 16, batch: int = 8,
                      compute_dtype=jnp.bfloat16):
    """Convenience wrapper: device-resident tiled SR of one HWC image."""
    h, w, c = img.shape

    def fn(x):
        out = model.apply(params, x.astype(compute_dtype))
        return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)

    runner = make_tiled_infer(fn, scale, tile, halo, batch, h, w, c)
    return runner(jnp.asarray(img))
