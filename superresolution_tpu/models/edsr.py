"""EDSR — residual conv trunk without BN (BASELINE config 3).

EDSR-baseline: 16 resblocks x 64 features, res_scale 1.0; EDSR-full:
32 x 256, res_scale 0.1. Sub-pixel upsampler. RGB inputs subtract the
DIV2K channel mean (learned-free shift) when in_channels == 3.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from superresolution_tpu.models.common import Conv, PixelShuffleUpsampler

_DIV2K_MEAN = (0.4488, 0.4371, 0.4040)


class ResBlock(nn.Module):
    features: int
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        y = Conv(self.features)(x)
        y = nn.relu(y)
        # residual-branch output conv initialized at 0.1x MSRA: with
        # res_scale 1.0 and no BN, unit-gain init doubles activation
        # variance per block (2^16 blowup for EDSR-16); the down-scaled
        # branch keeps the trunk near-identity at init.
        y = Conv(self.features, init_scale=0.1)(y)
        return x + y * jnp.asarray(self.res_scale, x.dtype)


class _ResScanBody(nn.Module):
    features: int
    res_scale: float

    @nn.compact
    def __call__(self, x, _):
        return ResBlock(self.features, self.res_scale)(x), None


class EDSR(nn.Module):
    scale: int = 4
    in_channels: int = 3
    out_channels: int = 3
    features: int = 64
    num_blocks: int = 16
    res_scale: float = 1.0
    # compile the resblock body once via lax.scan (TPU compile-time win)
    scan_blocks: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = None
        if self.in_channels == 3:
            mean = jnp.asarray(_DIV2K_MEAN, x.dtype)
            x = x - mean
        x = head = Conv(self.features)(x)
        if self.scan_blocks:
            scanned = nn.scan(
                _ResScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.num_blocks,
            )(self.features, self.res_scale, name="res_blocks")
            x, _ = scanned(x, None)
        else:
            for _ in range(self.num_blocks):
                x = ResBlock(self.features, self.res_scale)(x)
        x = Conv(self.features)(x) + head
        x = PixelShuffleUpsampler(self.scale, self.features)(x)
        x = Conv(self.out_channels)(x)
        if mean is not None:
            x = x + mean
        return x
