"""FusedDenseBlock must be mathematically identical to DenseBlock when its
weights are the split/concat re-layout of the plain block's weights."""

import jax
import jax.numpy as jnp
import numpy as np

from superresolution_tpu.models.rrdbnet import DenseBlock, FusedDenseBlock, RRDBNet


def test_fused_equals_plain_with_converted_weights(rng):
    c, g = 16, 8
    plain = DenseBlock(features=c, growth=g)
    fused = FusedDenseBlock(features=c, growth=g)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, c), dtype=np.float32))
    p_plain = plain.init(jax.random.key(0), x)["params"]

    # plain conv_i input channels: [x (c), y1..y_{i-1} (g each)]
    ks = [p_plain[f"Conv_{i}"]["Conv_0"]["kernel"] for i in range(5)]
    bs = [p_plain[f"Conv_{i}"]["Conv_0"]["bias"] for i in range(5)]

    def seg(k, j):  # channel segment of source j (0 = x, 1.. = y_j)
        lo = c + (j - 1) * g if j else 0
        hi = lo + (g if j else c)
        return k[:, :, lo:hi, :]

    p_fused = {
        "Conv_0": {"Conv_0": {
            "kernel": jnp.concatenate([seg(ks[i], 0) for i in range(5)], -1),
            "bias": jnp.concatenate(bs, -1),
        }},
        "proj_y1": {"kernel": jnp.concatenate(
            [seg(ks[i], 1) for i in range(1, 5)], -1)},
        "proj_y2": {"kernel": jnp.concatenate(
            [seg(ks[i], 2) for i in range(2, 5)], -1)},
        "proj_y3": {"kernel": jnp.concatenate(
            [seg(ks[i], 3) for i in range(3, 5)], -1)},
        "proj_y4": {"kernel": seg(ks[4], 4)},
    }
    out_plain = plain.apply({"params": p_plain}, x)
    out_fused = fused.apply({"params": p_fused}, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                               rtol=1e-5, atol=1e-5)


def test_rrdbnet_fused_and_plain_shapes(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 1), dtype=np.float32))
    for fused in (True, False):
        m = RRDBNet(scale=2, in_channels=1, out_channels=1, num_blocks=2,
                    features=16, growth=8, fused_dense=fused)
        p = m.init(jax.random.key(0), x)
        out = m.apply(p, x)
        assert out.shape == (1, 16, 16, 1)
        assert np.isfinite(np.asarray(out)).all()
