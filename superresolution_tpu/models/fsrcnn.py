"""FSRCNN — feature-shrink-map-expand + learned upsampling (BASELINE config 2).

TPU-first deviation from the paper: the final 9x9 stride-`scale` transposed
convolution is replaced by an equivalent-capacity conv + depth_to_space
(sub-pixel) stage. A transposed conv with stride s is mathematically a
zero-interleaved conv that XLA lowers to a grad-conv; the sub-pixel form
does the same linear map with a dense MXU-friendly conv at LR resolution
and is the canonical TPU pattern.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from superresolution_tpu.models.common import Conv
from superresolution_tpu.ops import depth_to_space


class FSRCNN(nn.Module):
    scale: int = 4
    in_channels: int = 1
    out_channels: int = 1
    d: int = 56  # feature dim
    s: int = 12  # shrink dim
    m: int = 4   # mapping layers

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        prelu = lambda x, name: nn.PReLU(param_dtype=jnp.float32, name=name)(x)
        x = prelu(Conv(self.d, kernel=5)(x), "p_feat")
        x = prelu(Conv(self.s, kernel=1)(x), "p_shrink")
        for i in range(self.m):
            x = prelu(Conv(self.s, kernel=3)(x), f"p_map{i}")
        x = prelu(Conv(self.d, kernel=1)(x), "p_expand")
        x = Conv(self.out_channels * self.scale**2, kernel=9)(x)
        return depth_to_space(x, self.scale)
