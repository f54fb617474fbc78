"""Cell-decomposition unfold vs the direct strided-slice reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_tpu.ops.unfold import (
    _extract_loop,
    extract_overlapping_windows,
)


@pytest.mark.parametrize("ws,ows,h,w", [
    (8, 12, 32, 40),   # hybrid geometry class (overlap 0.5)
    (16, 24, 48, 48),  # H200 ws=16 config
    (8, 16, 32, 32),   # overlap 1.0 (ows multiple of ws)
    (4, 6, 16, 24),
])
def test_cell_unfold_matches_loop(ws, ows, h, w):
    pad = (ows - ws) // 2
    b, c = 2, 6
    kv = jax.random.normal(jax.random.key(0), (b, h, w, c), jnp.float32)
    kv = jnp.pad(kv, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    nh_w, nw_w = h // ws, w // ws
    fast = extract_overlapping_windows(kv, ws, ows, nh_w, nw_w)
    slow = _extract_loop(kv, ws, ows, nh_w, nw_w)
    assert fast.shape == (b * nh_w * nw_w, ows * ows, c)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_unfold_patch_content():
    """Each patch is the ows x ows neighborhood of its window."""
    ws, ows = 8, 12
    pad = (ows - ws) // 2
    h = w = 24
    kv = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w, 1)
    kvp = jnp.pad(kv, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out = extract_overlapping_windows(kvp, ws, ows, h // ws, w // ws)
    # window (1, 2): rows 8-19, cols 16-27 in padded coords
    win = out[1 * (w // ws) + 2, :, 0].reshape(ows, ows)
    expect = kvp[0, 8:20, 16:28, 0]
    np.testing.assert_array_equal(np.asarray(win), np.asarray(expect))
