"""Sub-pixel convolution primitives (PixelShuffle) as XLA reshape/transpose.

On TPU a depth-to-space is a pure data-movement op that XLA fuses into the
surrounding convolution epilogue; there is no kernel to write for the
unfused case. The fused conv+depth_to_space Pallas kernel lives in
ops/pallas_kernels.py for the inference hot path.

Layout is NHWC (TPU-native). Channel ordering matches torch.nn.PixelShuffle
(NCHW channel index c*r*r + i*r + j -> output sub-pixel (i, j)), so weights
converted from the reference ecosystem produce identical images.
"""

from __future__ import annotations

import jax.numpy as jnp


def depth_to_space(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """[B, H, W, C*r*r] -> [B, H*r, W*r, C], torch.PixelShuffle-compatible."""
    b, h, w, c = x.shape
    r = block
    if c % (r * r):
        raise ValueError(f"channels {c} not divisible by block^2={r * r}")
    c_out = c // (r * r)
    # input channel index = c_out_idx * r * r + i * r + j
    x = x.reshape(b, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, c_out
    return x.reshape(b, h * r, w * r, c_out)


def space_to_depth(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """[B, H*r, W*r, C] -> [B, H, W, C*r*r]; exact inverse of depth_to_space."""
    b, hr, wr, c = x.shape
    r = block
    if hr % r or wr % r:
        raise ValueError(f"spatial dims ({hr},{wr}) not divisible by block={r}")
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h, w, c, i, j
    return x.reshape(b, h, w, c * r * r)
