"""remat / scan_unroll options: identical outputs and trainable grads."""

import jax
import jax.numpy as jnp
import numpy as np

from superresolution_tpu.models import RRDBNet

KW = dict(scale=2, in_channels=1, out_channels=1, features=16, growth=8,
          num_blocks=4)


def test_unroll_and_remat_match_baseline(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 1), dtype=np.float32))
    base = RRDBNet(**KW)
    p = base.init(jax.random.key(0), x)
    ref = np.asarray(base.apply(p, x))
    for kwargs in ({"scan_unroll": 2}, {"remat": True},
                   {"scan_unroll": 2, "remat": True}):
        m = RRDBNet(**KW, **kwargs)
        out = np.asarray(m.apply(p, x))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6), kwargs


def test_remat_gradients_finite(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 1), dtype=np.float32))
    m = RRDBNet(**KW, remat=True)
    p = m.init(jax.random.key(0), x)

    def loss(params):
        return jnp.mean(jnp.abs(m.apply(params, x) - 0.5))

    g = jax.grad(loss)(p)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)
