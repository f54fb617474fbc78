"""Device mesh and sharding layout.

The TPU-native replacement for the reference's single-process
nn.DataParallel (reference: scripts/Modello_supporto.py:103-105): a
jax.sharding.Mesh over all chips with a 'data' axis for batch sharding and
an optional 'spatial' axis for single-image sharding (parallel/spatial.py).
Parameters are replicated; the jit partitioner inserts the gradient
all-reduce over ICI automatically when the loss is averaged over a
data-sharded batch.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from superresolution_tpu.utils.config import MeshConfig


def create_mesh(config: MeshConfig | None = None,
                devices=None) -> Mesh:
    cfg = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    spatial = max(1, cfg.spatial)
    pipe = max(1, getattr(cfg, "pipe", 1))
    if pipe > 1:
        # pipeline stages for the trunk body (parallel/pipeline.py); the
        # pipe axis is only materialized when used so existing 2-axis
        # mesh shapes stay unchanged
        if spatial > 1:
            raise ValueError("mesh.pipe and mesh.spatial are exclusive")
        data = cfg.data if cfg.data > 0 else n // pipe
        if data < 1 or data * pipe > n:
            raise ValueError(
                f"mesh {max(data, 1)}x{pipe} needs"
                f" {max(data, 1) * pipe} devices, have {n}")
        dev_array = np.asarray(devices[: data * pipe]).reshape(data, pipe)
        return Mesh(dev_array, axis_names=("data", "pipe"))
    data = cfg.data if cfg.data > 0 else n // spatial
    if data < 1 or data * spatial > n:
        # data == 0 (devices < spatial) would build a 0-device mesh that
        # dies cryptically at the first device_put
        raise ValueError(
            f"mesh {max(data, 1)}x{spatial} needs"
            f" {max(data, 1) * spatial} devices, have {n}")
    dev_array = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(dev_array, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """device_put a host batch with the leading axis sharded over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
