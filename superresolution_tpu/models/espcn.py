"""ESPCN — efficient sub-pixel CNN (BASELINE config 2).

All convs run at LR resolution; the final conv emits C*r^2 channels which
depth_to_space rearranges to the HR image (the PixelShuffle pattern this
framework fuses on TPU; see ops/pallas_kernels.py for the fused variant).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from superresolution_tpu.models.common import Conv
from superresolution_tpu.ops import depth_to_space


class ESPCN(nn.Module):
    scale: int = 4
    in_channels: int = 1
    out_channels: int = 1
    f1: int = 64
    f2: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.tanh(Conv(self.f1, kernel=5)(x))
        x = jnp.tanh(Conv(self.f2, kernel=3)(x))
        x = Conv(self.out_channels * self.scale**2, kernel=3)(x)
        return depth_to_space(x, self.scale)
