"""Shape/dtype/grad tests per model config (SURVEY.md section 4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_tpu.models import (
    EDSR,
    ESPCN,
    FSRCNN,
    SRCNN,
    HATLite,
    HybridSR,
    RRDBNet,
    VGGStyleDiscriminator,
    get_model,
)


def _init_and_apply(model, lr_shape, seed=0):
    x = jnp.asarray(np.random.default_rng(seed).random(lr_shape, dtype=np.float32))
    params = model.init(jax.random.key(seed), x)
    out = model.apply(params, x)
    return params, x, out


@pytest.mark.parametrize("cls,kw,scale", [
    (SRCNN, {}, 2),
    (ESPCN, {}, 4),
    (FSRCNN, {}, 4),
    (EDSR, dict(num_blocks=2, in_channels=3, out_channels=3), 4),
    (RRDBNet, dict(num_blocks=2, in_channels=3, out_channels=3), 4),
])
def test_model_output_shapes(cls, kw, scale):
    c = kw.get("in_channels", 1)
    model = cls(scale=scale, **kw)
    _, x, out = _init_and_apply(model, (2, 16, 16, c))
    assert out.shape == (2, 16 * scale, 16 * scale, kw.get("out_channels", 1))
    assert out.dtype == x.dtype
    assert np.isfinite(np.asarray(out)).all()


def test_rrdbnet_pixelshuffle_upsampler():
    model = RRDBNet(scale=2, in_channels=1, out_channels=1, num_blocks=1,
                    upsampler="pixelshuffle")
    _, _, out = _init_and_apply(model, (1, 8, 8, 1))
    assert out.shape == (1, 16, 16, 1)


def test_hat_lite_shapes_and_window_padding():
    # 12x12 is not divisible by window 8 -> exercises the pad/crop path
    model = HATLite(scale=2, embed_dim=16, depths=(2,), num_heads=(2,),
                    window_size=8)
    _, _, out = _init_and_apply(model, (1, 12, 12, 1))
    assert out.shape == (1, 24, 24, 1)


def test_hybrid_two_stage_contract():
    # reference forward contract: stage1 x2 -> stage2 x2 -> resize to
    # output_size -> final smoothing (src/architecture.py:74-82)
    model = HybridSR(
        stage1=RRDBNet(scale=2, in_channels=1, out_channels=1, num_blocks=1),
        stage2=HATLite(scale=2, embed_dim=16, depths=(2,), num_heads=(2,),
                       window_size=8),
        output_size=64,
        smoothing="balanced",
    )
    _, _, out = _init_and_apply(model, (1, 16, 16, 1))
    assert out.shape == (1, 64, 64, 1)


def test_hybrid_stage1_only_graceful():
    model = HybridSR(
        stage1=RRDBNet(scale=2, in_channels=1, out_channels=1, num_blocks=1),
        stage2=None, output_size=64, smoothing="light")
    _, _, out = _init_and_apply(model, (1, 16, 16, 1))
    assert out.shape == (1, 64, 64, 1)


def test_discriminator_output():
    model = VGGStyleDiscriminator(in_channels=3, features=16, input_size=32)
    _, _, out = _init_and_apply(model, (2, 32, 32, 3))
    assert out.shape == (2, 1)


def test_registry():
    m = get_model("srcnn", scale=2)
    assert isinstance(m, SRCNN)
    with pytest.raises(KeyError):
        get_model("nope")


def test_models_are_differentiable():
    model = ESPCN(scale=2)
    x = jnp.ones((1, 8, 8, 1))
    params = model.init(jax.random.key(0), x)

    def loss(p):
        return jnp.mean((model.apply(p, x) - 1.0) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_bf16_compute_fp32_params():
    model = EDSR(scale=2, num_blocks=1, in_channels=1, out_channels=1)
    x32 = jnp.ones((1, 8, 8, 1), jnp.float32)
    params = model.init(jax.random.key(0), x32)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(params))
    out = model.apply(params, x32.astype(jnp.bfloat16))
    assert out.dtype == jnp.bfloat16


def test_hat_bf16_attention_mode_close_to_f32(rng):
    """attn_f32=False (bf16 logits fast-inference mode) must produce
    outputs close to the f32 path on the same weights."""
    import jax
    import jax.numpy as jnp

    from superresolution_tpu.models.hat_lite import HATLite

    kw = dict(scale=2, in_channels=1, out_channels=1, embed_dim=16,
              depths=(2,), num_heads=(2,), window_size=4)
    a = HATLite(**kw, attn_f32=True)
    b = HATLite(**kw, attn_f32=False)
    x = jnp.asarray(rng.random((1, 16, 16, 1), dtype=np.float32))
    p = a.init(jax.random.key(0), x)
    ya = a.apply(p, x)
    yb = b.apply(p, x)  # same param structure
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               atol=2e-2, rtol=2e-2)
