"""Deploy-time fused HAT (infer/fused_hat.py + ops/pallas_hab.py) must
reproduce HATLite.apply on the same variables. Interpreter-mode Pallas
on the CPU test mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_tpu.infer.fused_hat import make_fused_hat
from superresolution_tpu.models.hat_lite import HATLite

KW = dict(scale=2, in_channels=1, out_channels=1, embed_dim=12,
          depths=(2, 2), num_heads=(3, 3), window_size=4,
          scan_blocks=True)


@pytest.mark.parametrize("compat", [False, True])
def test_fused_hat_matches_apply(compat):
    model = HATLite(**KW, hat_compat=compat, upsample_feat=8)
    x = jax.random.normal(jax.random.key(0), (2, 12, 16, 1), jnp.float32)
    variables = model.init(jax.random.key(1), x)
    ref = model.apply(variables, x)
    fused = make_fused_hat(variables, model)
    got = fused(x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_fused_hat_rejects_non_scan_layouts():
    model = HATLite(**{**KW, "depths": (2, 3), "num_heads": (3, 3)})
    x = jnp.zeros((1, 8, 8, 1), jnp.float32)
    variables = HATLite(**KW).init(jax.random.key(0), x)
    with pytest.raises(ValueError):
        make_fused_hat(variables, model)


def test_fused_hab_block_gradients():
    """custom_vjp backward (reference recompute) must match jnp grads."""
    from superresolution_tpu.ops.pallas_hab import (
        fused_hab_block,
        reference_hab_body,
    )

    nb, n, c, nh, mlp = 4, 16, 12, 3, 24
    ks = jax.random.split(jax.random.key(2), 16)
    x = jax.random.normal(ks[0], (nb, n, c), jnp.float32)
    cab = jax.random.normal(ks[1], (nb, n, c), jnp.float32) * 0.01
    w = {
        "ln1_s": jax.random.normal(ks[2], (1, c)) * 0.1 + 1.0,
        "ln1_b": jax.random.normal(ks[3], (1, c)) * 0.1,
        "wq": jax.random.normal(ks[4], (c, c)) * 0.1,
        "wk": jax.random.normal(ks[5], (c, c)) * 0.1,
        "wv": jax.random.normal(ks[6], (c, c)) * 0.1,
        "bq": jax.random.normal(ks[7], (1, c)) * 0.02,
        "bk": jax.random.normal(ks[7], (1, c)) * 0.02,
        "bv": jax.random.normal(ks[7], (1, c)) * 0.02,
        "rpb": jax.random.normal(ks[8], (nh, n, n)) * 0.1,
        "wp": jax.random.normal(ks[9], (c, c)) * 0.1,
        "bp": jax.random.normal(ks[10], (1, c)) * 0.02,
        "ln2_s": jax.random.normal(ks[11], (1, c)) * 0.1 + 1.0,
        "ln2_b": jax.random.normal(ks[12], (1, c)) * 0.1,
        "w1": jax.random.normal(ks[13], (c, mlp)) * 0.1,
        "b1": jax.random.normal(ks[14], (1, mlp)) * 0.02,
        "w2": jax.random.normal(ks[15], (mlp, c)) * 0.1,
        "b2": jnp.zeros((1, c)),
    }

    out_k = fused_hab_block(x, cab, nh, True, w, None)
    out_r = reference_hab_body(x, cab, w, nh)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-5, rtol=2e-4)

    gk = jax.grad(lambda x: jnp.sum(
        fused_hab_block(x, cab, nh, True, w, None) ** 2))(x)
    gr = jax.grad(lambda x: jnp.sum(
        reference_hab_body(x, cab, w, nh) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("h,w,c", [(8, 10, 12), (6, 16, 6), (12, 7, 12)])
def test_fused_cab_convs_matches_reference(h, w, c):
    """The fused LN+conv+GELU+conv CAB kernel must match the jnp conv
    path (pre squeeze-excite) including zero-pad border behavior."""
    from superresolution_tpu.infer.fused_hat import _conv, _ln
    from superresolution_tpu.models.hat_lite import ChannelAttentionBlock
    from superresolution_tpu.ops.pallas_hab import (
        cab_weights,
        fused_cab_convs,
    )

    ks = jax.random.split(jax.random.key(7), 4)
    x = jax.random.normal(ks[0], (2, h, w, c), jnp.float32)
    block = ChannelAttentionBlock(c)
    variables = block.init(ks[1], x)
    cp = variables["params"]
    hp = {
        "LayerNorm_0": {
            "scale": jax.random.normal(ks[2], (c,)) * 0.1 + 1.0,
            "bias": jax.random.normal(ks[3], (c,)) * 0.1,
        },
        "ChannelAttentionBlock_0": cp,
    }
    y = _ln(x, hp["LayerNorm_0"])
    y = _conv(y, cp["Conv_0"]["Conv_0"])
    y = jax.nn.gelu(y, approximate=False)
    ref = _conv(y, cp["Conv_1"]["Conv_0"])
    got = fused_cab_convs(x, cab_weights(hp, jnp.float32),
                          interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_fused_hat_ws16_flash_ocab_matches_apply():
    """At window 16 the fused path routes OCAB through the flash kernel
    (benchmarks/exp_r11_ocab16.py); output must still match
    HATLite.apply with the einsum OCAB on the same variables."""
    kw16 = dict(scale=2, in_channels=1, out_channels=1, embed_dim=12,
                depths=(2, 2), num_heads=(3, 3), window_size=16,
                scan_blocks=True)
    model = HATLite(**kw16)
    ref_model = HATLite(**kw16, flash_oca=False)
    x = jax.random.normal(jax.random.key(4), (1, 32, 32, 1), jnp.float32)
    variables = ref_model.init(jax.random.key(5), x)
    ref = ref_model.apply(variables, x)
    got = make_fused_hat(variables, model)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize("h,w,c", [(8, 10, 12), (6, 16, 6), (12, 8, 12)])
def test_fused_cab_convs_pair_matches_reference(h, w, c):
    """The pair-packed CAB kernel (2-column-phase dots) must match the
    jnp conv path (pre squeeze-excite) including zero-pad borders."""
    from superresolution_tpu.infer.fused_hat import _conv, _ln
    from superresolution_tpu.models.hat_lite import ChannelAttentionBlock
    from superresolution_tpu.ops.pallas_hab import (
        cab_pair_weights,
        fused_cab_convs_pair,
    )

    ks = jax.random.split(jax.random.key(11), 4)
    x = jax.random.normal(ks[0], (2, h, w, c), jnp.float32)
    block = ChannelAttentionBlock(c)
    variables = block.init(ks[1], x)
    cp = variables["params"]
    hp = {
        "LayerNorm_0": {
            "scale": jax.random.normal(ks[2], (c,)) * 0.1 + 1.0,
            "bias": jax.random.normal(ks[3], (c,)) * 0.1,
        },
        "ChannelAttentionBlock_0": cp,
    }
    y = _ln(x, hp["LayerNorm_0"])
    y = _conv(y, cp["Conv_0"]["Conv_0"])
    y = jax.nn.gelu(y, approximate=False)
    ref = _conv(y, cp["Conv_1"]["Conv_0"])
    got = fused_cab_convs_pair(x, cab_pair_weights(hp, jnp.float32),
                               interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)
