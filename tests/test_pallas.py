"""Pallas kernels: correctness vs the XLA reference path (interpret mode on
CPU; the same kernels compile with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.ops import depth_to_space
from superresolution_tpu.ops.pallas_kernels import fused_conv3x3_depth_to_space


def _reference(x, w, b, r):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return depth_to_space(out + b, r)


@pytest.mark.parametrize("r,c_in,c_out", [(2, 8, 4), (4, 16, 1)])
def test_fused_conv_d2s_matches_xla(rng, r, c_in, c_out):
    x = jnp.asarray(rng.standard_normal((2, 16, 24, c_in), dtype=np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 3, c_in, c_out * r * r), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(c_out * r * r, dtype=np.float32))
    ref = _reference(x, w, b, r)
    with pltpu.force_tpu_interpret_mode():
        out = fused_conv3x3_depth_to_space(x, w, b, r)
    assert out.shape == (2, 16 * r, 24 * r, c_out)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_conv_d2s_bf16_io(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8),
                                        dtype=np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16), dtype=np.float32)
                    ).astype(jnp.bfloat16)
    b = jnp.zeros(16, jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        out = fused_conv3x3_depth_to_space(x, w, b, 2)
    assert out.dtype == jnp.bfloat16
    ref = _reference(x.astype(jnp.float32), w.astype(jnp.float32),
                     b.astype(jnp.float32), 2)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), rtol=0.05, atol=0.05)
