"""Pallas fused dense-block kernel vs the flax FusedDenseBlock (interpret
mode on CPU; Mosaic-compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.models.rrdbnet import FusedDenseBlock
from superresolution_tpu.ops.pallas_dense import (
    fused_dense_block_pallas,
    pack_fused_weights,
)


def test_pallas_dense_matches_flax_interior(rng):
    c, g = 16, 8
    block = FusedDenseBlock(features=c, growth=g)
    x = jnp.asarray(rng.standard_normal((2, 24, 20, c), dtype=np.float32))
    params = block.init(jax.random.key(0), x)
    # flax applies SAME zero-padding per conv; the kernel pads once and
    # chains valid convs — equal everywhere except within 5 px of the
    # border (the same boundary semantics as halo-tiled inference).
    ref = block.apply(params, x)
    ws = [jnp.asarray(w) for w in pack_fused_weights(params["params"], c, g)]
    with pltpu.force_tpu_interpret_mode():
        out = fused_dense_block_pallas(x, *ws, th=8)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out)[:, 5:-5, 5:-5],
                               np.asarray(ref)[:, 5:-5, 5:-5],
                               rtol=1e-4, atol=1e-4)


def test_pallas_dense_bf16(rng):
    c, g = 16, 8
    block = FusedDenseBlock(features=c, growth=g)
    x32 = jnp.asarray(rng.standard_normal((1, 16, 16, c), dtype=np.float32))
    params = block.init(jax.random.key(0), x32)
    # compare against the flax block at the SAME precision (bf16 weights)
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    ref = block.apply(pb, x32.astype(jnp.bfloat16))
    ws = [jnp.asarray(w, jnp.bfloat16)
          for w in pack_fused_weights(params["params"], c, g)]
    with pltpu.force_tpu_interpret_mode():
        out = fused_dense_block_pallas(x32.astype(jnp.bfloat16), *ws, th=8)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32)[:, 5:-5, 5:-5],
                               np.asarray(ref, np.float32)[:, 5:-5, 5:-5],
                               rtol=0.1, atol=0.15)  # bf16 storage rounding differs per path
