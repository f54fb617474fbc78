"""Staged (trunk/tail-split) tiled inference parity with the monolithic path."""

import jax
import jax.numpy as jnp
import numpy as np

from superresolution_tpu.infer import make_tiled_infer, make_tiled_infer_staged
from superresolution_tpu.models import RRDBNet


def test_trunk_tail_split_equals_call(rng):
    m = RRDBNet(scale=2, in_channels=1, out_channels=1, num_blocks=2,
                features=16, growth=8)
    x = jnp.asarray(rng.random((1, 8, 8, 1), dtype=np.float32))
    p = m.init(jax.random.key(0), x)
    full = m.apply(p, x)
    feats = m.apply(p, x, method="trunk")
    out = m.apply(p, feats, method="tail")
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=1e-6)


def test_staged_tiler_matches_monolithic(rng):
    m = RRDBNet(scale=2, in_channels=1, out_channels=1, num_blocks=1,
                features=16, growth=8)
    x0 = jnp.zeros((1, 8, 8, 1))
    p = m.init(jax.random.key(0), x0)

    def fn(t):
        return m.apply(p, t)

    def trunk_fn(t):
        return m.apply(p, t, method="trunk")

    def tail_fn(f):
        return m.apply(p, f, method="tail")

    img = rng.random((40, 56, 1), dtype=np.float32)
    mono = make_tiled_infer(fn, scale=2, tile=16, halo=8, batch=4,
                            h=40, w=56, channels=1)
    staged = make_tiled_infer_staged(trunk_fn, tail_fn, scale=2, tile=16,
                                     halo=8, tail_batch=4, h=40, w=56,
                                     channels=1)
    a = np.asarray(mono(jnp.asarray(img)))
    b = np.asarray(staged(jnp.asarray(img)))
    assert a.shape == b.shape == (80, 112, 1)
    np.testing.assert_allclose(b, a, atol=1e-5)


def test_staged_tiler_chunked_trunk(rng):
    m = RRDBNet(scale=2, in_channels=1, out_channels=1, num_blocks=1,
                features=16, growth=8)
    p = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 1)))
    trunk_fn = lambda t: m.apply(p, t, method="trunk")
    tail_fn = lambda f: m.apply(p, f, method="tail")
    img = rng.random((48, 48, 1), dtype=np.float32)
    all_at_once = make_tiled_infer_staged(trunk_fn, tail_fn, 2, 16, 8,
                                          tail_batch=3, h=48, w=48,
                                          channels=1)
    chunked = make_tiled_infer_staged(trunk_fn, tail_fn, 2, 16, 8,
                                      tail_batch=3, h=48, w=48, channels=1,
                                      trunk_batch=3)
    np.testing.assert_allclose(np.asarray(chunked(jnp.asarray(img))),
                               np.asarray(all_at_once(jnp.asarray(img))),
                               atol=1e-5)


def test_staged_runner_with_folded_tail_matches_standard(rng):
    """The staged tiler with the deploy-time folded tail must equal the
    staged tiler with the standard tail (same weights)."""
    import jax
    import jax.numpy as jnp

    from superresolution_tpu.infer import make_tiled_infer_staged
    from superresolution_tpu.infer.folded_tail import make_folded_tail
    from superresolution_tpu.models import RRDBNet

    model = RRDBNet(scale=4, in_channels=3, out_channels=3, features=8,
                    num_blocks=1, growth=4, upsampler="pixelshuffle")
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))

    def trunk(t):
        return model.apply(params, t, method="trunk")

    def tail_std(f):
        return jnp.clip(model.apply(params, f, method="tail"), 0, 1)

    tail_folded = make_folded_tail(params)
    img = jnp.asarray(rng.random((40, 48, 3), dtype=np.float32))
    kw = dict(scale=4, tile=16, halo=4, tail_batch=2, h=40, w=48, channels=3)
    a = np.asarray(make_tiled_infer_staged(trunk, tail_std, **kw)(img))
    b = np.asarray(make_tiled_infer_staged(trunk, tail_folded, **kw)(img))
    assert a.shape == b.shape == (160, 192, 3)
    np.testing.assert_allclose(a, b, atol=3e-5)
