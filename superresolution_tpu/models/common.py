"""Shared building blocks for the SR model family (flax.linen, NHWC)."""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import variance_scaling

from superresolution_tpu.ops import depth_to_space
from superresolution_tpu.ops.resize import resize_nearest


def msra_init(scale: float = 1.0):
    """Kaiming-normal (fan_in) scaled by `scale` — ESRGAN initializes its
    RRDB convs with MSRA x 0.1 for stable deep-dense-block training."""
    return variance_scaling(2.0 * scale * scale, "fan_in", "truncated_normal")


class Conv(nn.Module):
    """3x3-default conv with SAME padding; thin wrapper to keep call sites terse."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    init_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding="SAME",
            use_bias=self.use_bias, kernel_init=msra_init(self.init_scale),
            dtype=x.dtype, param_dtype=jnp.float32,
        )(x)


def lrelu(x, slope: float = 0.2):
    return jnp.where(x >= 0, x, slope * x)


class PixelShuffleUpsampler(nn.Module):
    """conv(C -> C*r^2) + depth_to_space per x2/x3 stage.

    The TPU-native sub-pixel upsampler: the conv runs at LOW resolution
    (cheap) and depth_to_space is pure data movement XLA fuses into the conv
    epilogue. Supports total scales 2, 3, 4, 8 (factored into x2/x3 stages).
    """

    scale: int
    features: int
    act: Callable | None = None

    @nn.compact
    def __call__(self, x):
        s = self.scale
        stages: Sequence[int]
        if s == 1:
            return x
        if s in (2, 3):
            stages = (s,)
        elif s == 4:
            stages = (2, 2)
        elif s == 8:
            stages = (2, 2, 2)
        else:
            raise ValueError(f"unsupported scale {s}")
        for r in stages:
            x = Conv(self.features * r * r)(x)
            x = depth_to_space(x, r)
            if self.act is not None:
                x = self.act(x)
        return x


class NearestConvUpsampler(nn.Module):
    """nearest x2 upsample + conv + LeakyReLU per stage — the ESRGAN/RRDBNet
    upsampling pattern (checkerboard-free)."""

    scale: int
    features: int

    @nn.compact
    def __call__(self, x):
        s = self.scale
        if s == 1:
            return x
        if s not in (2, 4, 8):
            raise ValueError(f"unsupported scale {s}")
        while s > 1:
            h, w = x.shape[1] * 2, x.shape[2] * 2
            x = resize_nearest(x, (h, w))
            x = lrelu(Conv(self.features)(x))
            s //= 2
        return x
