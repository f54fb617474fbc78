"""SRCNN — 3-layer conv SR (BASELINE config 1, CPU-runnable).

Pre-upsample design: bicubic-upscale the LR input to target size, then
9-5-5 conv stack (64/32 features). Input/output NHWC in [0,1].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from superresolution_tpu.models.common import Conv
from superresolution_tpu.ops.resize import resize_bicubic


class SRCNN(nn.Module):
    scale: int = 2
    in_channels: int = 1
    out_channels: int = 1
    f1: int = 64
    f2: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = x.shape[1] * self.scale, x.shape[2] * self.scale
        x = resize_bicubic(x, (h, w), a=-0.5, antialias=False)
        x = nn.relu(Conv(self.f1, kernel=9)(x))
        x = nn.relu(Conv(self.f2, kernel=5)(x))
        return Conv(self.out_channels, kernel=5)(x)
