"""Tiled inference: exactness of halo-crop vs whole-image execution, blend
mode smoothness, and the public upscale() API."""

import jax
import jax.numpy as jnp
import numpy as np

from superresolution_tpu.infer import tiled_apply, upscale
from superresolution_tpu.models import ESPCN


def _small_model(scale=2):
    model = ESPCN(scale=scale, in_channels=1, out_channels=1, f1=8, f2=8)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)))

    @jax.jit
    def fn(x):
        return model.apply(params, x)

    return fn


def test_tiled_matches_full_inference_interior(rng):
    """halo >= half receptive field (ESPCN: 5+3+3 convs -> half rf 4) =>
    tiled output identical to whole-image inference everywhere except
    within halo*scale of the true image border (exactness contract of
    infer/tiled.py)."""
    fn = _small_model(scale=2)
    img = rng.random((64, 48, 1), dtype=np.float32)
    full = np.asarray(fn(jnp.asarray(img[None])))[0]
    tiled = tiled_apply(fn, img, scale=2, tile=16, halo=8, batch=4,
                        blend="crop")
    assert tiled.shape == (128, 96, 1)
    b = 8 * 2
    np.testing.assert_allclose(tiled[b:-b, b:-b], full[b:-b, b:-b],
                               atol=2e-5)
    assert np.isfinite(tiled).all()


def test_tiled_non_divisible_sizes(rng):
    fn = _small_model(scale=2)
    img = rng.random((37, 53, 1), dtype=np.float32)
    out = tiled_apply(fn, img, scale=2, tile=16, halo=8, batch=4)
    assert out.shape == (74, 106, 1)
    full = np.asarray(fn(jnp.asarray(img[None])))[0]
    # interior must match exactly; borders may differ due to edge padding
    np.testing.assert_allclose(out[8:-8, 8:-8], full[8:-8, 8:-8], atol=2e-5)


def test_tiled_hann_blend(rng):
    fn = _small_model(scale=2)
    img = rng.random((32, 32, 1), dtype=np.float32)
    out = tiled_apply(fn, img, scale=2, tile=16, halo=8, batch=4,
                      blend="hann")
    full = np.asarray(fn(jnp.asarray(img[None])))[0]
    assert out.shape == full.shape
    # away from the blended border band the overlap-add must agree closely
    np.testing.assert_allclose(out[16:-16, 16:-16], full[16:-16, 16:-16],
                               atol=1e-3)


def test_upscale_api_smoke(rng):
    img = rng.random((20, 24), dtype=np.float32)
    out = upscale(img, scale=2, model="espcn", tile=16, halo=4, batch=2,
                  precision="fp32", f1=8, f2=8)
    assert out.shape == (40, 48)
    assert out.dtype == np.float32
    assert (out >= 0).all() and (out <= 1).all()


def test_api_upscale_on_device_matches_host(rng):
    """api.upscale(on_device=True) runs the whole tile loop in one jitted
    program and must match the host tiler away from borders."""
    from superresolution_tpu.api import upscale

    img = rng.random((24, 32), dtype=np.float32)
    host = upscale(img, scale=2, model="espcn", tile=16, halo=4)
    dev = np.asarray(upscale(img, scale=2, model="espcn", tile=16, halo=4,
                             on_device=True))
    assert host.shape == dev.shape == (48, 64)
    # identical params (seed 0 default init) => identical interiors
    np.testing.assert_allclose(host[8:-8, 8:-8], dev[8:-8, 8:-8], atol=1e-5)
