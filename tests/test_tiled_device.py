"""Device-side tiled inference must match the host-side tiler exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from superresolution_tpu.infer import make_tiled_infer, tiled_apply
from superresolution_tpu.models import ESPCN


def test_device_tiler_matches_host_tiler(rng):
    model = ESPCN(scale=2, in_channels=1, out_channels=1, f1=8, f2=8)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)))

    @jax.jit
    def fn(x):
        return model.apply(params, x)

    img = rng.random((37, 53, 1), dtype=np.float32)
    host = tiled_apply(fn, img, scale=2, tile=16, halo=8, batch=4,
                       blend="crop", pad_mode="edge")
    runner = make_tiled_infer(fn, scale=2, tile=16, halo=8, batch=4,
                              h=37, w=53, channels=1)
    dev = np.asarray(runner(jnp.asarray(img)))
    assert dev.shape == host.shape == (74, 106, 1)
    np.testing.assert_allclose(dev, host, atol=2e-5)


def test_device_tiler_exact_grid(rng):
    model = ESPCN(scale=2, in_channels=1, out_channels=1, f1=8, f2=8)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)))

    def fn(x):
        return model.apply(params, x)

    img = rng.random((32, 32, 1), dtype=np.float32)
    full = np.asarray(fn(jnp.asarray(img[None])))[0]
    runner = make_tiled_infer(fn, scale=2, tile=16, halo=8, batch=3,
                              h=32, w=32, channels=1)
    dev = np.asarray(runner(jnp.asarray(img)))
    b = 16
    np.testing.assert_allclose(dev[b:-b, b:-b], full[b:-b, b:-b], atol=2e-5)
