"""Pallas anti-checkerboard blur vs the XLA depthwise conv path."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.ops.blur import anti_checkerboard
from superresolution_tpu.ops.pallas_blur import anti_checkerboard_pallas


@pytest.mark.parametrize("mode", ["light", "balanced", "strong"])
def test_pallas_blur_matches_xla(rng, mode):
    x = jnp.asarray(rng.random((2, 16, 20, 3), dtype=np.float32))
    ref = anti_checkerboard(x, mode)
    with pltpu.force_tpu_interpret_mode():
        out = anti_checkerboard_pallas(x, mode, th=8)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pallas_blur_none_passthrough(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 1), dtype=np.float32))
    with pltpu.force_tpu_interpret_mode():
        out = anti_checkerboard_pallas(x, "none")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
