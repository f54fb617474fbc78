"""Flash window attention (ops/pallas_attn.py) — correctness vs the jnp
reference path, gradient flow through the custom_vjp, and HATLite
integration. Runs in Pallas interpreter mode on the CPU test mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_tpu.ops.pallas_attn import (
    flash_window_attention,
    reference_window_attention,
)


def _inputs(nb=8, n=16, c=12, nh=3, nw_img=4, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.key(seed), 5)
    q = jax.random.normal(ks[0], (nb, n, c), dtype)
    k = jax.random.normal(ks[1], (nb, n, c), dtype)
    v = jax.random.normal(ks[2], (nb, n, c), dtype)
    bias = jax.random.normal(ks[3], (nh, n, n), jnp.float32) * 0.1
    ids = jax.random.randint(ks[4], (nw_img, n), 0, 3)
    return q, k, v, bias, ids


def test_flash_matches_reference_unmasked():
    q, k, v, bias, _ = _inputs()
    ref = reference_window_attention(q, k, v, bias)
    got = flash_window_attention(q, k, v, bias, 3, True, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_flash_matches_reference_shift_mask():
    q, k, v, bias, ids = _inputs()
    ref = reference_window_attention(q, k, v, bias, region_ids=ids)
    got = flash_window_attention(q, k, v, bias, 3, True, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_flash_gradients_match_reference():
    q, k, v, bias, ids = _inputs()

    def loss_flash(q, k, v, bias):
        return jnp.sum(flash_window_attention(q, k, v, bias, 3, True,
                                              ids) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(reference_window_attention(
            q, k, v, bias, region_ids=ids) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_flash_odd_window_count_picks_valid_block():
    # nb=6 windows: block size must fall back to 2 (then 1) — exercises
    # _pick_block
    q, k, v, bias, _ = _inputs(nb=6, nw_img=3)
    ref = reference_window_attention(q, k, v, bias)
    got = flash_window_attention(q, k, v, bias, 3, True, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.bfloat16])
def test_flash_bf16(dtype):
    q, k, v, bias, ids = _inputs(dtype=dtype)
    ref = reference_window_attention(q, k, v, bias, region_ids=ids)
    got = flash_window_attention(q, k, v, bias, 3, True, ids)
    assert got.dtype == dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)


def test_flash_cross_attention_matches_reference():
    """OCAB shape: k/v longer than q (enlarged overlap windows)."""
    nb, n, m, c, nh = 8, 16, 36, 12, 3
    ks = jax.random.split(jax.random.key(3), 4)
    q = jax.random.normal(ks[0], (nb, n, c), jnp.float32)
    k = jax.random.normal(ks[1], (nb, m, c), jnp.float32)
    v = jax.random.normal(ks[2], (nb, m, c), jnp.float32)
    bias = jax.random.normal(ks[3], (nh, n, m), jnp.float32) * 0.1
    ref = reference_window_attention(q, k, v, bias)
    got = flash_window_attention(q, k, v, bias, nh, True, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_flash_h200_geometry():
    """The Backup 'H200' config shape class: window 16 (n=256), embed 120
    (head dim 20 — not a lane divisor), 6 heads."""
    nb, n, c, nh = 2, 256, 120, 6
    ks = jax.random.split(jax.random.key(5), 4)
    q = jax.random.normal(ks[0], (nb, n, c), jnp.float32)
    k = jax.random.normal(ks[1], (nb, n, c), jnp.float32)
    v = jax.random.normal(ks[2], (nb, n, c), jnp.float32)
    bias = jax.random.normal(ks[3], (nh, n, n), jnp.float32) * 0.1
    ref = reference_window_attention(q, k, v, bias)
    got = flash_window_attention(q, k, v, bias, nh, True, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_hatlite_flash_matches_einsum_path():
    """HATLite end-to-end: flash_attn=True must reproduce the einsum path
    (both f32 logits) on the same params."""
    from superresolution_tpu.models.hat_lite import HATLite

    kw = dict(scale=2, in_channels=1, out_channels=1, embed_dim=12,
              depths=(2, 2), num_heads=(3, 3), window_size=4,
              scan_blocks=True)
    a = HATLite(**kw, flash_attn=False)
    b = HATLite(**kw, flash_attn=True)
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 1), jnp.float32)
    params = a.init(jax.random.key(2), x)
    ya = a.apply(params, x)
    yb = b.apply(params, x)  # same param structure: flash is math-only
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                               atol=2e-5, rtol=2e-5)


def test_hatlite_flash_oca_auto_at_ws16():
    """At window 16 HATLite auto-enables the flash OCAB (flash_oca=None
    -> on); output must match the einsum path on the same params, and an
    explicit flash_oca=False must keep the OCAB on the einsum path."""
    from superresolution_tpu.models.hat_lite import HATLite

    kw = dict(scale=2, in_channels=1, out_channels=1, embed_dim=12,
              depths=(2,), num_heads=(3,), window_size=16,
              scan_blocks=True)
    a = HATLite(**kw, flash_attn=False)
    b = HATLite(**kw, flash_attn=True)            # auto flash_oca on
    c = HATLite(**kw, flash_attn=True, flash_oca=False)
    x = jax.random.normal(jax.random.key(7), (1, 32, 32, 1), jnp.float32)
    params = a.init(jax.random.key(8), x)
    ya = a.apply(params, x)
    yb = b.apply(params, x)
    yc = c.apply(params, x)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(yc), np.asarray(ya),
                               atol=2e-5, rtol=2e-5)


def test_flash_stacked_matches_reference(monkeypatch):
    """SRTPU_STACKED_FLASH=1 (2 dots/window, heads on M, transposed
    logits + pre-stacked bias) — self-attention, plain and masked."""
    monkeypatch.setenv("SRTPU_STACKED_FLASH", "1")
    q, k, v, bias, ids = _inputs()
    ref = reference_window_attention(q, k, v, bias)
    got = flash_window_attention(q, k, v, bias, 3, True, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    ref_m = reference_window_attention(q, k, v, bias, region_ids=ids)
    got_m = flash_window_attention(q, k, v, bias, 3, True, ids)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m),
                               atol=2e-5, rtol=2e-5)


def test_flash_stacked_cross_attention(monkeypatch):
    """Stacked form at the OCAB cross-attention geometry (m > n)."""
    monkeypatch.setenv("SRTPU_STACKED_FLASH", "1")
    nb, n, m, c, nh = 8, 16, 36, 12, 3
    ks = jax.random.split(jax.random.key(7), 4)
    q = jax.random.normal(ks[0], (nb, n, c))
    k = jax.random.normal(ks[1], (nb, m, c))
    v = jax.random.normal(ks[2], (nb, m, c))
    bias = jax.random.normal(ks[3], (nh, n, m), jnp.float32) * 0.1
    ref = reference_window_attention(q, k, v, bias)
    got = flash_window_attention(q, k, v, bias, nh, True, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# flash_oca_gathered (ops/pallas_flash_oca.py): the in-kernel kv gather
# must equal the extract_overlapping_windows + reference attention
# composition (fwd and vjp) — advisor round-4 finding: the kernel was
# wired into the deploy path (SRTPU_GATHER_OCA) with no coverage.

def _oca_inputs(b=1, ws=4, ows=6, h=8, w=8, c=12, nh=3,
                dtype=jnp.float32, seed=11):
    nh_w, nw_w = h // ws, w // ws
    n = ws * ws
    ks = jax.random.split(jax.random.key(seed), 4)
    q = jax.random.normal(ks[0], (b * nh_w * nw_w, n, c), dtype)
    k_map = jax.random.normal(ks[1], (b, h + ows - ws, w + ows - ws, c),
                              dtype)
    v_map = jax.random.normal(ks[2], (b, h + ows - ws, w + ows - ws, c),
                              dtype)
    bias = jax.random.normal(ks[3], (nh, n, ows * ows), jnp.float32) * 0.1
    return q, k_map, v_map, bias, nh_w, nw_w


def _oca_composition(q, k_map, v_map, bias, ws, ows, nh_w, nw_w):
    from superresolution_tpu.ops.unfold import extract_overlapping_windows

    kw = extract_overlapping_windows(k_map, ws, ows, nh_w, nw_w)
    vw = extract_overlapping_windows(v_map, ws, ows, nh_w, nw_w)
    return reference_window_attention(q, kw, vw, bias)


def test_flash_oca_gathered_matches_composition():
    from superresolution_tpu.ops.pallas_flash_oca import flash_oca_gathered

    q, k_map, v_map, bias, nh_w, nw_w = _oca_inputs()
    ref = _oca_composition(q, k_map, v_map, bias, 4, 6, nh_w, nw_w)
    got = flash_oca_gathered(q, k_map, v_map, bias, 3, 4, 6, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_oca_gathered_multiwindow_rows():
    """More than one window row/col (nh_w=nw_w=3) exercises the
    row-block pairing and the per-column slices."""
    from superresolution_tpu.ops.pallas_flash_oca import flash_oca_gathered

    q, k_map, v_map, bias, nh_w, nw_w = _oca_inputs(h=12, w=12, seed=13)
    ref = _oca_composition(q, k_map, v_map, bias, 4, 6, nh_w, nw_w)
    got = flash_oca_gathered(q, k_map, v_map, bias, 3, 4, 6, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_oca_gathered_bf16():
    from superresolution_tpu.ops.pallas_flash_oca import flash_oca_gathered

    q, k_map, v_map, bias, nh_w, nw_w = _oca_inputs(dtype=jnp.bfloat16)
    ref = _oca_composition(q, k_map, v_map, bias, 4, 6, nh_w, nw_w)
    got = flash_oca_gathered(q, k_map, v_map, bias, 3, 4, 6, True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_flash_oca_gathered_gradients():
    """custom_vjp backward (recomputed-reference) must match grads of
    the composition for every differentiable input."""
    from superresolution_tpu.ops.pallas_flash_oca import flash_oca_gathered

    q, k_map, v_map, bias, nh_w, nw_w = _oca_inputs()

    def loss_kernel(q, km, vm, b):
        return jnp.sum(flash_oca_gathered(q, km, vm, b, 3, 4, 6, True) ** 2)

    def loss_ref(q, km, vm, b):
        return jnp.sum(
            _oca_composition(q, km, vm, b, 4, 6, nh_w, nw_w) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k_map, v_map, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k_map, v_map, bias)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_oca_gather_supported_guard():
    """Geometry guard: odd ows-ws (e.g. ws=8, overlap 0.4 -> ows=11)
    must be rejected — the caller pads the kv map by 2*((ows-ws)//2),
    so an odd extent would fail at trace time inside the kernel
    (advisor round-4 finding)."""
    from superresolution_tpu.ops.pallas_flash_oca import (
        oca_gather_supported)

    assert oca_gather_supported(8, 12, 64, 64)
    assert oca_gather_supported(4, 6, 8, 8)
    assert not oca_gather_supported(8, 11, 64, 64)   # odd overlap
    assert not oca_gather_supported(8, 8, 64, 64)    # no overlap
    assert not oca_gather_supported(8, 18, 64, 64)   # > 2*ws slab
    assert not oca_gather_supported(8, 12, 60, 64)   # h not tiled
