"""Multi-chip tile-parallel inference: the staged tiler with a mesh must
match the single-device result (tiles sharded over the data axis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_tpu.infer import make_tiled_infer_staged
from superresolution_tpu.models import RRDBNet
from superresolution_tpu.parallel import create_mesh
from superresolution_tpu.utils.config import MeshConfig

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@requires_8
def test_mesh_tiled_matches_single_device(rng):
    m = RRDBNet(scale=2, in_channels=1, out_channels=1, num_blocks=1,
                features=16, growth=8)
    p = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 1)))
    trunk_fn = lambda t: m.apply(p, t, method="trunk")
    tail_fn = lambda f: m.apply(p, f, method="tail")

    img = jnp.asarray(rng.random((64, 96, 1), dtype=np.float32))
    single = make_tiled_infer_staged(trunk_fn, tail_fn, 2, 16, 8,
                                     tail_batch=2, h=64, w=96, channels=1)
    mesh = create_mesh(MeshConfig(data=8, spatial=1))
    multi = make_tiled_infer_staged(trunk_fn, tail_fn, 2, 16, 8,
                                    tail_batch=2, h=64, w=96, channels=1,
                                    mesh=mesh)
    a = np.asarray(single(img))
    b = np.asarray(multi(img))
    assert a.shape == b.shape == (128, 192, 1)
    np.testing.assert_allclose(b, a, atol=2e-5)


@requires_8
def test_mesh_tiled_explicit_trunk_batch_padding(rng):
    """mesh data=2 + tail_batch=4 + a 2x5 grid (n=10) + trunk_batch=5:
    the run count must pad to a common multiple of the trunk chunk and
    the (tail_batch x data) grid instead of failing the trunk reshape."""
    m = RRDBNet(scale=2, in_channels=1, out_channels=1, num_blocks=1,
                features=16, growth=8)
    p = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 1)))
    trunk_fn = lambda t: m.apply(p, t, method="trunk")
    tail_fn = lambda f: m.apply(p, f, method="tail")

    img = jnp.asarray(rng.random((32, 80, 1), dtype=np.float32))  # 2x5 tiles
    single = make_tiled_infer_staged(trunk_fn, tail_fn, 2, 16, 8,
                                     tail_batch=4, h=32, w=80, channels=1)
    mesh = create_mesh(MeshConfig(data=2, spatial=1))
    multi = make_tiled_infer_staged(trunk_fn, tail_fn, 2, 16, 8,
                                    tail_batch=4, h=32, w=80, channels=1,
                                    trunk_batch=5, mesh=mesh)
    a = np.asarray(single(img))
    b = np.asarray(multi(img))
    assert a.shape == b.shape == (64, 160, 1)
    np.testing.assert_allclose(b, a, atol=2e-5)
