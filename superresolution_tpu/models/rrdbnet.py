"""RRDBNet — the ESRGAN generator (BASELINE configs 4/5) and the reference's
stage-1 trunk (reference: src/architecture.py:38-43 instantiates
RRDBNet(1ch, 64 feat, 23 blocks, growth 32, x2)).

Residual-in-Residual Dense Blocks: each RRDB is 3 dense blocks of 5 convs
with LeakyReLU(0.2) and dense (concat) connectivity, residual-scaled by 0.2
at both levels. Dense concats are pure layout ops on TPU; XLA fuses them
into the following conv's input.

Upsampling: nearest+conv (the ESRGAN pattern) by default, or sub-pixel
(`upsampler='pixelshuffle'`) which is faster on TPU (conv at LR resolution).

TPU-first structure: the 23 identical RRDB blocks run under flax nn.scan
(weights stacked on a leading block axis), so XLA traces and compiles ONE
block body instead of 345 distinct convolutions — compile time drops by
>10x with equal steady-state throughput. `scan_blocks=False` falls back to
the unrolled python loop.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from superresolution_tpu.models.common import (
    Conv,
    NearestConvUpsampler,
    PixelShuffleUpsampler,
    lrelu,
)


class DenseBlock(nn.Module):
    """5-conv dense block: conv_i sees [x, y1..y_{i-1}]; residual scale 0.2."""

    features: int
    growth: int = 32
    init_scale: float = 0.1  # MSRA x 0.1 (ESRGAN init convention)

    @nn.compact
    def __call__(self, x):
        feats = [x]
        for _ in range(4):
            y = lrelu(Conv(self.growth, init_scale=self.init_scale)(
                jnp.concatenate(feats, axis=-1)))
            feats.append(y)
        out = Conv(self.features, init_scale=self.init_scale)(
            jnp.concatenate(feats, axis=-1))
        return x + out * jnp.asarray(0.2, x.dtype)


class RRDB(nn.Module):
    features: int
    growth: int = 32

    @nn.compact
    def __call__(self, x):
        y = DenseBlock(self.features, self.growth)(x)
        y = DenseBlock(self.features, self.growth)(y)
        y = DenseBlock(self.features, self.growth)(y)
        return x + y * jnp.asarray(0.2, x.dtype)


class _RRDBScanBody(nn.Module):
    features: int
    growth: int

    @nn.compact
    def __call__(self, x, _):
        return RRDB(self.features, self.growth)(x), None


class RRDBNet(nn.Module):
    scale: int = 4
    in_channels: int = 3
    out_channels: int = 3
    features: int = 64
    num_blocks: int = 23
    growth: int = 32
    upsampler: str = "nearest_conv"  # 'nearest_conv' | 'pixelshuffle'
    scan_blocks: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = head = Conv(self.features)(x)
        if self.scan_blocks:
            scanned = nn.scan(
                _RRDBScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.num_blocks,
            )(self.features, self.growth, name="rrdb_blocks")
            x, _ = scanned(x, None)
        else:
            for _ in range(self.num_blocks):
                x = RRDB(self.features, self.growth)(x)
        x = Conv(self.features)(x) + head
        if self.upsampler == "pixelshuffle":
            x = PixelShuffleUpsampler(self.scale, self.features, act=lrelu)(x)
        else:
            x = NearestConvUpsampler(self.scale, self.features)(x)
        x = lrelu(Conv(self.features)(x))
        return Conv(self.out_channels)(x)
