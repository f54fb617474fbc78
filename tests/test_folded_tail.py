"""The deploy-time folded x4 tail must equal the standard pixelshuffle
tail exactly (up to fp reassociation) on the same weights."""

import jax
import jax.numpy as jnp
import numpy as np

from superresolution_tpu.infer.folded_tail import make_folded_tail
from superresolution_tpu.models import RRDBNet


def test_folded_tail_matches_standard(rng):
    model = RRDBNet(scale=4, in_channels=3, out_channels=3, features=16,
                    num_blocks=1, growth=8, upsampler="pixelshuffle")
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    feat = jnp.asarray(rng.normal(0, 0.5, (2, 12, 16, 16))
                       .astype(np.float32))

    std = model.apply(params, feat, method="tail")
    folded = make_folded_tail(params, clip=False)(feat)
    assert folded.shape == std.shape == (2, 48, 64, 3)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(std),
                               atol=2e-5, rtol=1e-5)


def test_folded_tail_clip(rng):
    model = RRDBNet(scale=4, in_channels=1, out_channels=1, features=8,
                    num_blocks=1, growth=4, upsampler="pixelshuffle")
    params = model.init(jax.random.key(1), jnp.zeros((1, 8, 8, 1)))
    feat = jnp.asarray(rng.normal(0, 2.0, (1, 8, 8, 8)).astype(np.float32))
    out = make_folded_tail(params)(feat)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
