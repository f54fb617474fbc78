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
def test_fused_hat_matches_apply(compat, monkeypatch):
    """Per-head-loop attention form (SRTPU_STACKED_ATTN=0; stacked is
    the default since round 4, covered by the test below)."""
    monkeypatch.setenv("SRTPU_STACKED_ATTN", "0")
    model = HATLite(**KW, hat_compat=compat, upsample_feat=8)
    x = jax.random.normal(jax.random.key(0), (2, 12, 16, 1), jnp.float32)
    variables = model.init(jax.random.key(1), x)
    ref = model.apply(variables, x)
    fused = make_fused_hat(variables, model)
    got = fused(x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_fused_hat_stacked_attn_matches_apply(monkeypatch):
    """SRTPU_STACKED_ATTN=1 (2 dots/window, heads on M with lane masks,
    transposed logits) must be apply-equivalent like the loop form."""
    monkeypatch.setenv("SRTPU_STACKED_ATTN", "1")
    model = HATLite(**KW, upsample_feat=8)
    x = jax.random.normal(jax.random.key(0), (2, 12, 16, 1), jnp.float32)
    variables = model.init(jax.random.key(1), x)
    ref = model.apply(variables, x)
    got = make_fused_hat(variables, model)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_fused_hat_strip_matches_apply(monkeypatch):
    """SRTPU_STRIP_HAB=1 (spatial-strip kernel, CAB merged, in-kernel
    window grouping + shift masks) must be apply-equivalent."""
    monkeypatch.setenv("SRTPU_STRIP_HAB", "1")
    model = HATLite(**KW, upsample_feat=8)
    x = jax.random.normal(jax.random.key(0), (2, 12, 16, 1), jnp.float32)
    variables = model.init(jax.random.key(1), x)
    ref = model.apply(variables, x)
    got = make_fused_hat(variables, model)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_strip_hab_block_matches_windowed():
    """strip_hab_block == roll -> window_partition -> reference body ->
    window_merge -> roll back, for both shifts and several row blocks
    (exercises wrap halos and the iota-computed region masks)."""
    from superresolution_tpu.models.hat_lite import (
        _shift_region_ids,
        window_merge,
        window_partition,
    )
    from superresolution_tpu.ops.pallas_hab import reference_hab_body
    from superresolution_tpu.ops.pallas_hab_strip import strip_hab_block

    rng = np.random.default_rng(1)
    b, h, wd, c, nh, ws, mlp = 2, 16, 24, 12, 3, 4, 24
    n = ws * ws
    x = jnp.asarray(rng.standard_normal((b, h, wd, c)) * 0.5, jnp.float32)
    cab_y = jnp.asarray(rng.standard_normal((b, h, wd, c)) * 0.3,
                        jnp.float32)
    se = jnp.asarray(rng.uniform(0.2, 0.9, (b, 1, c)), jnp.float32)
    shapes = {
        "ln1_s": (1, c), "ln1_b": (1, c), "wq": (c, c), "wk": (c, c),
        "wv": (c, c), "bq": (1, c), "bk": (1, c), "bv": (1, c),
        "rpb": (nh, n, n), "wp": (c, c), "bp": (1, c), "ln2_s": (1, c),
        "ln2_b": (1, c), "w1": (c, mlp), "b1": (1, mlp), "w2": (mlp, c),
        "b2": (1, c),
    }
    w = {k: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
         for k, s in shapes.items()}
    cab_full = cab_y * se.reshape(b, 1, 1, c)
    for shift in (0, ws // 2):
        if shift:
            xs = jnp.roll(x, (-shift, -shift), (1, 2))
            cs = jnp.roll(cab_full, (-shift, -shift), (1, 2))
            ids = jnp.asarray(_shift_region_ids(h, wd, ws, shift))
        else:
            xs, cs, ids = x, cab_full, None
        ref = reference_hab_body(window_partition(xs, ws),
                                 window_partition(cs, ws), w, nh,
                                 region_ids=ids)
        ref = window_merge(ref, ws, (h, wd))
        if shift:
            ref = jnp.roll(ref, (shift, shift), (1, 2))
        for rb in (ws, 8):
            got = strip_hab_block(x, cab_y, se, w, num_heads=nh,
                                  window_size=ws, shift=shift,
                                  interpret=True, rb=rb)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-5, rtol=2e-4,
                                       err_msg=f"shift={shift} rb={rb}")


def test_fused_hab_block_stacked_masked(monkeypatch):
    """Stacked vs loop attention on the same weights, WITH region-id
    masks (the shifted-window case: exercises the symmetric-madd and
    transposed-rpb paths)."""
    from superresolution_tpu.ops.pallas_hab import (
        fused_hab_block,
        reference_hab_body,
    )

    rng = np.random.default_rng(3)
    nb, n, c, nh, mlp = 8, 16, 12, 3, 24
    x = jnp.asarray(rng.standard_normal((nb, n, c)), jnp.float32)
    cab = jnp.asarray(rng.standard_normal((nb, n, c)) * 0.01, jnp.float32)
    f32 = {"ln1_s", "ln1_b", "bq", "bk", "bv", "rpb", "bp", "ln2_s",
           "ln2_b", "b1", "b2"}
    shapes = {
        "ln1_s": (1, c), "ln1_b": (1, c), "wq": (c, c), "wk": (c, c),
        "wv": (c, c), "bq": (1, c), "bk": (1, c), "bv": (1, c),
        "rpb": (nh, n, n), "wp": (c, c), "bp": (1, c), "ln2_s": (1, c),
        "ln2_b": (1, c), "w1": (c, mlp), "b1": (1, mlp), "w2": (mlp, c),
        "b2": (1, c),
    }
    del f32
    w = {k: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
         for k, s in shapes.items()}
    ids = jnp.asarray(rng.integers(0, 3, (4, n)), jnp.int32)
    ref = reference_hab_body(x, cab, w, nh, region_ids=ids)
    monkeypatch.setenv("SRTPU_STACKED_ATTN", "1")
    got = fused_hab_block(x, cab, nh, True, w, ids)
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


def test_fused_hat_lane_pad_matches_apply(monkeypatch):
    """SRTPU_LANE_PAD=1 (pad-to-full-lane deploy transform,
    infer/lane_pad.py): zero-padded weights + head padding + c_real
    LayerNorms must be apply-equivalent. Small dims: C 12 -> 16,
    heads 3 -> 4 (hd 4)."""
    monkeypatch.setenv("SRTPU_LANE_PAD", "1")
    monkeypatch.setenv("SRTPU_LANE_PAD_TO", "16")
    model = HATLite(**KW, upsample_feat=8)
    x = jax.random.normal(jax.random.key(0), (2, 12, 16, 1), jnp.float32)
    variables = model.init(jax.random.key(1), x)
    ref = model.apply(variables, x)
    got = make_fused_hat(variables, model)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_fused_hat_lane_pad_compat(monkeypatch):
    """Lane pad with hat_compat=True (norm_embed/norm_body +
    conv_before_upsample + OCA rel-pos table padding)."""
    monkeypatch.setenv("SRTPU_LANE_PAD", "1")
    monkeypatch.setenv("SRTPU_LANE_PAD_TO", "16")
    model = HATLite(**KW, hat_compat=True, upsample_feat=8)
    x = jax.random.normal(jax.random.key(0), (2, 12, 16, 1), jnp.float32)
    variables = model.init(jax.random.key(1), x)
    ref = model.apply(variables, x)
    got = make_fused_hat(variables, model)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_fused_hat_lane_pad_unsupported_falls_back(monkeypatch):
    """SRTPU_LANE_PAD on an unsupported geometry (pad target not a
    multiple of head_dim) must silently run the unpadded path."""
    from superresolution_tpu.infer.lane_pad import lane_pad_supported

    assert not lane_pad_supported(12, 3, 18)  # hd=4 does not divide 18
    monkeypatch.setenv("SRTPU_LANE_PAD", "1")
    monkeypatch.setenv("SRTPU_LANE_PAD_TO", "18")
    model = HATLite(**KW, upsample_feat=8)
    x = jax.random.normal(jax.random.key(0), (2, 12, 16, 1), jnp.float32)
    variables = model.init(jax.random.key(1), x)
    ref = model.apply(variables, x)
    got = make_fused_hat(variables, model)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_fused_hat_gather_oca_matches_apply(monkeypatch):
    """SRTPU_GATHER_OCA=1 (in-kernel OCAB kv gather,
    ops/pallas_flash_oca.py) must be apply-equivalent on a supported
    geometry (ws=4, overlap 0.5 -> ows=6, even extent)."""
    monkeypatch.setenv("SRTPU_GATHER_OCA", "1")
    model = HATLite(**KW, upsample_feat=8)
    x = jax.random.normal(jax.random.key(0), (2, 12, 16, 1), jnp.float32)
    variables = model.init(jax.random.key(1), x)
    ref = model.apply(variables, x)
    got = make_fused_hat(variables, model)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_fused_hat_gather_oca_odd_overlap_falls_back(monkeypatch):
    """SRTPU_GATHER_OCA=1 with an odd overlap extent (ws=4, overlap
    0.25 -> ows=5): oca_gather_supported rejects the geometry and the
    flash-attention gather path runs instead — still apply-equivalent
    (advisor round-4 finding: this used to ValueError at trace time)."""
    monkeypatch.setenv("SRTPU_GATHER_OCA", "1")
    model = HATLite(**KW, upsample_feat=8, overlap_ratio=0.25)
    x = jax.random.normal(jax.random.key(0), (2, 12, 16, 1), jnp.float32)
    variables = model.init(jax.random.key(1), x)
    ref = model.apply(variables, x)
    got = make_fused_hat(variables, model)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)
