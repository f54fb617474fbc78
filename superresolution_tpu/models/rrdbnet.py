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
    msra_init,
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


class FusedDenseBlock(nn.Module):
    """Mathematically identical dense block with MXU-shaped convs.

    conv_i([x, y1..y_{i-1}]) decomposes linearly into per-source partial
    convolutions; each source therefore computes its contributions to ALL
    later steps (and the final projection) in ONE wide conv:
    x -> 4G+C lanes, y1 -> 3G+C, y2 -> 2G+C, y3 -> G+C, y4 -> C — instead
    of five narrow N=G(32) convs that leave 3/4 of the MXU idle. Same MAC
    count, same result up to fp reassociation; measured ~35% faster on
    v5e. All biases fold into the first conv's lane segments."""

    features: int
    growth: int = 32
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, x):
        c, g = self.features, self.growth
        px = Conv(4 * g + c, init_scale=self.init_scale)(x)
        p_no_bias = lambda n, name: nn.Conv(
            n, (3, 3), padding="SAME", use_bias=False,
            kernel_init=msra_init(self.init_scale), dtype=x.dtype,
            param_dtype=jnp.float32, name=name)
        acc = px[..., 4 * g:]
        y1 = lrelu(px[..., :g])
        p1 = p_no_bias(3 * g + c, "proj_y1")(y1)
        acc = acc + p1[..., 3 * g:]
        y2 = lrelu(px[..., g:2 * g] + p1[..., :g])
        p2 = p_no_bias(2 * g + c, "proj_y2")(y2)
        acc = acc + p2[..., 2 * g:]
        y3 = lrelu(px[..., 2 * g:3 * g] + p1[..., g:2 * g] + p2[..., :g])
        p3 = p_no_bias(g + c, "proj_y3")(y3)
        acc = acc + p3[..., g:]
        y4 = lrelu(px[..., 3 * g:4 * g] + p1[..., 2 * g:3 * g]
                   + p2[..., g:2 * g] + p3[..., :g])
        p4 = p_no_bias(c, "proj_y4")(y4)
        return x + (acc + p4) * jnp.asarray(0.2, x.dtype)


class RRDB(nn.Module):
    features: int
    growth: int = 32
    fused: bool = True

    @nn.compact
    def __call__(self, x):
        block = FusedDenseBlock if self.fused else DenseBlock
        y = block(self.features, self.growth)(x)
        y = block(self.features, self.growth)(y)
        y = block(self.features, self.growth)(y)
        return x + y * jnp.asarray(0.2, x.dtype)


class _RRDBScanBody(nn.Module):
    features: int
    growth: int
    fused: bool = True

    @nn.compact
    def __call__(self, x, _):
        return RRDB(self.features, self.growth, self.fused)(x), None


class RRDBNet(nn.Module):
    """Exposes `trunk` (LR-resolution body) and `tail` (x`scale` upsampling
    head) as separate apply methods so tiled inference can batch them
    differently: the trunk is compute-bound and wants the biggest batch
    that fits; the tail materializes HR-resolution tensors and is
    memory-bound (see infer/tiled_device.make_tiled_infer_staged)."""

    scale: int = 4
    in_channels: int = 3
    out_channels: int = 3
    features: int = 64
    num_blocks: int = 23
    growth: int = 32
    upsampler: str = "nearest_conv"  # 'nearest_conv' | 'pixelshuffle'
    scan_blocks: bool = True
    fused_dense: bool = True  # MXU-shaped dense blocks (FusedDenseBlock)
    # unroll N scan iterations per XLA loop step (cross-block fusion at
    # modest compile cost); remat rematerializes each block's activations
    # in backward (O(sqrt) memory for deep trunks at 512^2 training)
    scan_unroll: int = 1
    remat: bool = False
    # BasicSR convention for scale<4: space-to-depth the input by this
    # factor (conv_first sees in*u^2 channels) and upsample by scale*u —
    # required for weight compatibility with reference-ecosystem scale-2
    # RRDBNet checkpoints (the reference hybrid's stage 1).
    pixel_unshuffle_input: int = 1

    def setup(self):
        self.conv_first = Conv(self.features)
        if self.scan_blocks:
            body_cls = (nn.remat(_RRDBScanBody, prevent_cse=False)
                        if self.remat else _RRDBScanBody)
            self.body = nn.scan(
                body_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.num_blocks,
                unroll=self.scan_unroll,
            )(self.features, self.growth, self.fused_dense)
        else:
            self.body_blocks = [
                RRDB(self.features, self.growth, self.fused_dense)
                for _ in range(self.num_blocks)]
        self.trunk_conv = Conv(self.features)
        up_scale = self.scale * self.pixel_unshuffle_input
        if self.upsampler == "pixelshuffle":
            self.up = PixelShuffleUpsampler(up_scale, self.features,
                                            act=lrelu)
        else:
            self.up = NearestConvUpsampler(up_scale, self.features)
        self.conv_hr = Conv(self.features)
        self.conv_last = Conv(self.out_channels)

    def trunk(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.pixel_unshuffle_input > 1:
            from superresolution_tpu.ops.pixel_shuffle import space_to_depth

            x = space_to_depth(x, self.pixel_unshuffle_input)
        x = head = self.conv_first(x)
        if self.scan_blocks:
            x, _ = self.body(x, None)
        else:
            for blk in self.body_blocks:
                x = blk(x)
        return self.trunk_conv(x) + head

    def tail(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.up(x)
        x = lrelu(self.conv_hr(x))
        return self.conv_last(x)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.tail(self.trunk(x))
