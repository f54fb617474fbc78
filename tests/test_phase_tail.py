"""Phase-space tail (infer/phase_tail.py + ops/pallas_phase_tail.py)
must reproduce the folded tail (itself standard-tail-equivalent,
tests/test_folded_tail.py) on the same RRDBNet weights. Interpret-mode
Pallas on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_tpu.infer.folded_tail import make_folded_tail
from superresolution_tpu.infer.phase_tail import make_phase_tail
from superresolution_tpu.models import RRDBNet


def _params(key=0):
    model = RRDBNet(scale=4, in_channels=3, out_channels=3, features=16,
                    num_blocks=1, growth=8, upsampler="pixelshuffle")
    return model.init(jax.random.key(key), jnp.zeros((1, 8, 8, 3)))


@pytest.mark.parametrize("h,w,rb", [(8, 12, 4), (12, 20, 3)])
def test_phase_tail_matches_folded(h, w, rb):
    params = _params()
    feat = jax.random.normal(jax.random.key(1), (2, h, w, 16),
                             jnp.float32) * 0.3
    ref = make_folded_tail(params, clip=False)(feat)
    got = make_phase_tail(params, clip=False, rb=rb,
                          interpret=True)(feat)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=2e-4)


def test_phase_tail_clip_and_shape():
    params = _params(3)
    feat = jax.random.normal(jax.random.key(2), (1, 8, 8, 16),
                             jnp.float32)
    out = make_phase_tail(params, rb=4, interpret=True)(feat)
    assert out.shape == (1, 32, 32, 3)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
