"""HATLite — windowed-attention SR refiner (stage 2 of the reference hybrid).

Capability target: the reference's HAT stage (reference:
src/architecture.py:51-61 — embed 96, depths [6,6,6,6], heads [6,6,6,6],
window 8, mlp_ratio 2, conv_scale 0.01, pixelshuffle upsampler; the Backup
'H200' config uses embed 120, depths [6]*6, window 16,
Backup/src/architecture.py:48-68).

TPU-first design notes rather than a port:
  * window partition/merge are reshape/transposes — zero-copy layout ops
    XLA folds into the surrounding matmuls;
  * attention is batched einsum over [B*nWindows, ws*ws, C] so every matmul
    is large and MXU-shaped; with ws=8 the sequence length is 64 and heads
    pack densely;
  * shifted windows use jnp.roll + a statically precomputed Swin-style mask
    (host-side numpy at trace time, no dynamic shapes);
  * HAT's channel-attention conv branch (CAB) runs in parallel with W-MSA
    inside each block, scaled by `conv_scale`;
  * HAT's overlapping cross-attention block (OCAB, overlap_ratio 0.5) is
    realized as windowed cross-attention where K/V windows are enlarged by
    the overlap via an unfold expressed as strided slicing.
"""

from __future__ import annotations

from functools import lru_cache

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from superresolution_tpu.models.common import Conv, PixelShuffleUpsampler
from superresolution_tpu.ops.unfold import extract_overlapping_windows


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B,H,W,C] -> [B*nH*nW, ws*ws, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_merge(x: jnp.ndarray, ws: int, hw: tuple[int, int]) -> jnp.ndarray:
    """[B*nH*nW, ws*ws, C] -> [B,H,W,C]."""
    h, w = hw
    c = x.shape[-1]
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@lru_cache(maxsize=None)
def _relative_position_index(ws: int) -> np.ndarray:
    """Swin relative-position index table for a ws x ws window."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, n, n]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


@lru_cache(maxsize=None)
def _relative_position_index_oca(ws: int, wse: int) -> np.ndarray:
    """Relative-position index between a ws-window (queries) and the
    enlarged wse-window (keys) for overlapping cross-attention — the HAT
    rpi_oca construction. Table size (ws + wse - 1)^2."""
    def grid(n):
        c = np.stack(np.meshgrid(np.arange(n), np.arange(n), indexing="ij"))
        return c.reshape(2, -1)

    rel = grid(wse)[:, None, :] - grid(ws)[:, :, None]  # [2, ws^2, wse^2]
    rel = rel.transpose(1, 2, 0) + (ws - 1)  # per-axis range [0, ws+wse-2]
    return (rel[..., 0] * (ws + wse - 1) + rel[..., 1]).astype(np.int32)


@lru_cache(maxsize=None)
def _shift_region_ids(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Swin shift region labels per window: [nWindows, ws*ws] int32.
    Two positions may attend iff their labels match."""
    img = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    return np.ascontiguousarray(win.reshape(-1, ws * ws))


@lru_cache(maxsize=None)
def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Swin shifted-window attention mask: [nWindows, n, n] of 0 / -inf."""
    win = _shift_region_ids(h, w, ws, shift)
    diff = win[:, :, None].astype(np.int64) - win[:, None, :]
    return np.where(diff == 0, 0.0, -1e9).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    # f32 attention logits/softmax (training default). False keeps the
    # [nb, nh, n, n] logits tensor in bf16 — it is the dominant HBM
    # traffic of the whole block (measured: ~2x faster attention path,
    # output diff ~1e-3; fine for inference).
    attn_f32: bool = True
    # Pallas flash kernel (ops/pallas_attn.py): logits never leave VMEM —
    # removes the logits HBM traffic entirely. Compiled on TPU,
    # interpreter elsewhere; gradients via the jnp reference (custom_vjp).
    flash: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 region_ids: jnp.ndarray | None) -> jnp.ndarray:
        """x: [nB, n, C] windows; region_ids: [nW, n] int32 Swin shift
        labels (None for unshifted blocks)."""
        nb, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        acc_t = jnp.float32 if self.attn_f32 else x.dtype
        qkv = nn.Dense(3 * c, dtype=x.dtype, param_dtype=jnp.float32)(x)
        rpb_table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, nh), jnp.float32)
        idx = jnp.asarray(_relative_position_index(self.window_size))
        bias = rpb_table[idx.reshape(-1)].reshape(n, n, nh).transpose(2, 0, 1)
        if self.flash:
            from superresolution_tpu.ops.pallas_attn import (
                flash_window_attention)

            q, k, v = jnp.split(qkv, 3, axis=-1)  # packed [nb, n, C]
            interpret = jax.default_backend() != "tpu"
            out = flash_window_attention(q, k, v, bias, nh, interpret,
                                         region_ids)
        else:
            q, k, v = jnp.split(qkv.reshape(nb, n, 3, nh, hd)
                                .transpose(2, 0, 3, 1, 4), 3, axis=0)
            q, k, v = q[0], k[0], v[0]  # [nb, nh, n, hd]
            scale = jnp.asarray(hd, jnp.float32) ** -0.5
            attn = jnp.einsum(
                "bhnd,bhmd->bhnm", q, k,
                preferred_element_type=acc_t) * scale.astype(acc_t)
            attn = attn + bias[None].astype(acc_t)
            if region_ids is not None:
                nw = region_ids.shape[0]
                mask = jnp.where(
                    region_ids[:, :, None] == region_ids[:, None, :],
                    0.0, -1e9)
                attn = (attn.reshape(nb // nw, nw, nh, n, n)
                        + mask[None, :, None].astype(acc_t))
                attn = attn.reshape(nb, nh, n, n)
            attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
            out = out.transpose(0, 2, 1, 3).reshape(nb, n, c)
        return nn.Dense(c, dtype=x.dtype, param_dtype=jnp.float32)(out)


class ChannelAttentionBlock(nn.Module):
    """HAT's CAB: conv -> GELU -> conv -> squeeze-excite channel attention."""

    dim: int
    compress_ratio: int = 3
    squeeze_factor: int = 30

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = Conv(self.dim // self.compress_ratio)(x)
        y = nn.gelu(y, approximate=False)
        y = Conv(self.dim)(y)
        # channel attention
        s = jnp.mean(y, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Dense(max(1, self.dim // self.squeeze_factor),
                             dtype=y.dtype, param_dtype=jnp.float32)(s))
        s = nn.sigmoid(nn.Dense(self.dim, dtype=y.dtype,
                                param_dtype=jnp.float32)(s))
        return y * s


class HABlock(nn.Module):
    """Hybrid attention block: (shifted) W-MSA + conv_scale * CAB, then MLP."""

    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 2.0
    conv_scale: float = 0.01
    attn_f32: bool = True
    flash_attn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        y = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, param_dtype=jnp.float32)(x)
        cab = ChannelAttentionBlock(c)(y)
        if self.shift:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            region_ids = jnp.asarray(_shift_region_ids(h, w, ws, self.shift))
        else:
            region_ids = None
        wins = window_partition(y, ws)
        wins = WindowAttention(c, self.num_heads, ws,
                       attn_f32=self.attn_f32,
                       flash=self.flash_attn)(wins, region_ids)
        y = window_merge(wins, ws, (h, w))
        if self.shift:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        x = x + y + jnp.asarray(self.conv_scale, x.dtype) * cab
        z = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, param_dtype=jnp.float32)(x)
        z = nn.Dense(int(c * self.mlp_ratio), dtype=x.dtype,
                     param_dtype=jnp.float32)(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(c, dtype=x.dtype, param_dtype=jnp.float32)(z)
        return x + z


class OverlappingCrossAttention(nn.Module):
    """HAT's OCAB: Q from ws-windows, K/V from (1+overlap)*ws windows gathered
    with stride ws — implemented as an extract-patches conv-free unfold."""

    dim: int
    num_heads: int
    window_size: int
    overlap_ratio: float = 0.5
    # HAT-checkpoint compatibility: learned relative-position bias between
    # the query window and the enlarged key/value window
    use_rpb: bool = False
    attn_f32: bool = True  # see WindowAttention.attn_f32
    flash: bool = False  # see WindowAttention.flash (cross-attn variant)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        ows = int(ws * (1 + self.overlap_ratio))
        pad = (ows - ws) // 2
        y = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, param_dtype=jnp.float32)(x)
        q = window_partition(y, ws)  # [nB, ws*ws, C]
        kv = nn.Dense(2 * c, dtype=x.dtype, param_dtype=jnp.float32)(y)
        # asymmetric tail pad: odd ows-ws would otherwise leave the map
        # one short of the full overlap extent (upstream HAT's nn.Unfold
        # breaks there too — we define the odd case instead)
        kv = jnp.pad(kv, ((0, 0), (pad, ows - ws - pad),
                          (pad, ows - ws - pad), (0, 0)))
        # unfold overlapping windows: cell-decomposed gather (9 slices +
        # one transpose instead of ows*ows slice+stacks — ops/unfold.py;
        # falls back to the slice loop when padded dims aren't divisible
        # by gcd(ws, ows), so odd geometries lose the fast path silently)
        nh_w, nw_w = h // ws, w // ws
        kvw = extract_overlapping_windows(kv, ws, ows, nh_w, nw_w)
        k, v = jnp.split(kvw, 2, axis=-1)
        nh = self.num_heads
        hd = c // nh
        qd = nn.Dense(c, dtype=x.dtype, param_dtype=jnp.float32)(q)
        bias = None
        if self.use_rpb:
            table = self.param(
                "rel_pos_bias_oca",
                nn.initializers.truncated_normal(0.02),
                ((ws + ows - 1) ** 2, nh), jnp.float32)
            idx = jnp.asarray(_relative_position_index_oca(ws, ows))
            bias = table[idx.reshape(-1)].reshape(
                ws * ws, ows * ows, nh).transpose(2, 0, 1)
        if self.flash:
            from superresolution_tpu.ops.pallas_attn import (
                flash_window_attention)

            if bias is None:
                bias = jnp.zeros((nh, ws * ws, ows * ows), jnp.float32)
            interpret = jax.default_backend() != "tpu"
            out = flash_window_attention(qd, k, v, bias, nh, interpret,
                                         None)
        else:
            qh = qd.reshape(-1, ws * ws, nh, hd).transpose(0, 2, 1, 3)
            kh = k.reshape(-1, ows * ows, nh, hd).transpose(0, 2, 1, 3)
            vh = v.reshape(-1, ows * ows, nh, hd).transpose(0, 2, 1, 3)
            acc_t = jnp.float32 if self.attn_f32 else x.dtype
            scale = jnp.asarray(hd, jnp.float32) ** -0.5
            attn = jnp.einsum(
                "bhnd,bhmd->bhnm", qh, kh,
                preferred_element_type=acc_t) * scale.astype(acc_t)
            if bias is not None:
                attn = attn + bias[None].astype(acc_t)
            attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
            out = out.transpose(0, 2, 1, 3).reshape(-1, ws * ws, c)
        out = nn.Dense(c, dtype=x.dtype, param_dtype=jnp.float32)(out)
        y = window_merge(out, ws, (h, w))
        x = x + y
        z = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, param_dtype=jnp.float32)(x)
        z = nn.Dense(int(c * 2), dtype=x.dtype, param_dtype=jnp.float32)(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(c, dtype=x.dtype, param_dtype=jnp.float32)(z)
        return x + z


class _HABPair(nn.Module):
    """One unshifted + one shifted block — the scan unit inside a group."""

    dim: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    conv_scale: float
    attn_f32: bool = True
    flash_attn: bool = False

    @nn.compact
    def __call__(self, x, _):
        x = HABlock(self.dim, self.num_heads, self.window_size, 0,
                    self.mlp_ratio, self.conv_scale, self.attn_f32,
                    self.flash_attn)(x)
        x = HABlock(self.dim, self.num_heads, self.window_size,
                    self.window_size // 2, self.mlp_ratio, self.conv_scale,
                    self.attn_f32, self.flash_attn)(x)
        return x, None


class ResidualGroup(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 2.0
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    scan_blocks: bool = True
    oca_rpb: bool = False
    attn_f32: bool = True
    # rematerialize each HAB pair in backward: activation memory drops
    # from O(depth) to O(1) per group — required to TRAIN the reference
    # hybrid at 512^2 within 16 GB HBM (same pattern as RRDBNet.remat)
    remat: bool = False
    flash_attn: bool = False
    flash_oca: bool = False  # flash kernel for the group-end OCAB too

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x
        if self.scan_blocks and self.depth >= 2:
            pairs = self.depth // 2
            body_cls = (nn.remat(_HABPair, prevent_cse=False)
                        if self.remat else _HABPair)
            scanned = nn.scan(
                body_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=pairs,
            )(self.dim, self.num_heads, self.window_size, self.mlp_ratio,
              self.conv_scale, self.attn_f32, self.flash_attn,
              name="hab_pairs")
            y, _ = scanned(y, None)
            tail = self.depth - 2 * pairs
        else:
            tail = self.depth
        for i in range(tail):
            shift = 0 if i % 2 == 0 else self.window_size // 2
            y = HABlock(self.dim, self.num_heads, self.window_size, shift,
                        self.mlp_ratio, self.conv_scale, self.attn_f32,
                        self.flash_attn)(y)
        # the group-end OCAB must sit INSIDE the remat boundary too: its
        # saved einsum logits/softmax ([64,144] per window x 1024
        # windows x heads x batch, f32) are multi-GB at 256^2 — the
        # r3 hybrid-train OOM (22.6 G vs 15.75 G HBM) traced here
        oca_cls = (nn.remat(OverlappingCrossAttention, prevent_cse=False)
                   if self.remat else OverlappingCrossAttention)
        y = oca_cls(self.dim, self.num_heads,
                    self.window_size, self.overlap_ratio,
                    use_rpb=self.oca_rpb,
                    attn_f32=self.attn_f32,
                    flash=self.flash_oca)(y)
        return x + Conv(self.dim)(y)


class _GroupScanBody(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    conv_scale: float
    overlap_ratio: float
    scan_blocks: bool
    oca_rpb: bool = False
    attn_f32: bool = True
    remat: bool = False
    flash_attn: bool = False
    flash_oca: bool = False

    @nn.compact
    def __call__(self, x, _):
        return ResidualGroup(self.dim, self.depth, self.num_heads,
                             self.window_size, self.mlp_ratio,
                             self.conv_scale, self.overlap_ratio,
                             self.scan_blocks, self.oca_rpb,
                             self.attn_f32, self.remat,
                             self.flash_attn, self.flash_oca)(x), None


class HATLite(nn.Module):
    scale: int = 2
    in_channels: int = 1
    out_channels: int = 1
    embed_dim: int = 96
    depths: tuple[int, ...] = (6, 6, 6, 6)
    num_heads: tuple[int, ...] = (6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    scan_blocks: bool = True
    # HAT-checkpoint compatibility mode: LayerNorm after the embedding conv
    # and before the body-residual conv, OCA relative-position bias, and a
    # conv_before_upsample squeeze to `upsample_feat` channels — the extra
    # structure the reference's external HAT carries
    # (reference src/architecture.py:51-61 instantiates it with
    # upsampler='pixelshuffle', resi_connection='1conv').
    hat_compat: bool = False
    upsample_feat: int = 64
    # f32 attention logits (training default); False halves the dominant
    # HBM traffic of every attention block for inference
    attn_f32: bool = True
    remat: bool = False  # rematerialized HAB pairs (train-memory option)
    # Pallas flash window attention (ops/pallas_attn.py): logits stay in
    # VMEM. The fastest inference path on TPU; gradients fall back to the
    # jnp reference via custom_vjp.
    flash_attn: bool = False
    # Flash kernel for the group-end OCAB: None = auto (on whenever
    # flash_attn — the old 'flash loses at ws=8' verdict came from the
    # untrusted pre-house-rule timing; trusted re-measure exp_r19 shows
    # flash OCAB wins 252.8 vs 280.5 ms/batch at ws=8 too;
    # BENCHMARKS.md r3).
    flash_oca: bool | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        foca = (self.flash_attn
                if self.flash_oca is None else self.flash_oca)
        ph = (ws - h % ws) % ws
        pw = (ws - w % ws) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        feat = Conv(self.embed_dim)(x)
        y = feat
        if self.hat_compat:
            y = nn.LayerNorm(epsilon=1e-5, dtype=y.dtype,
                             param_dtype=jnp.float32, name="norm_embed")(y)
        uniform = (len(set(self.depths)) == 1
                   and len(set(self.num_heads)) == 1)
        if self.scan_blocks and uniform and len(self.depths) > 1:
            scanned = nn.scan(
                _GroupScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=len(self.depths),
            )(self.embed_dim, self.depths[0], self.num_heads[0], ws,
              self.mlp_ratio, self.conv_scale, self.overlap_ratio,
              self.scan_blocks, self.hat_compat, self.attn_f32,
              self.remat, self.flash_attn, foca, name="groups")
            y, _ = scanned(y, None)
        else:
            for depth, heads in zip(self.depths, self.num_heads):
                y = ResidualGroup(self.embed_dim, depth, heads, ws,
                                  self.mlp_ratio, self.conv_scale,
                                  self.overlap_ratio, self.scan_blocks,
                                  self.hat_compat, self.attn_f32,
                                  self.remat, self.flash_attn, foca)(y)
        if self.hat_compat:
            y = nn.LayerNorm(epsilon=1e-5, dtype=y.dtype,
                             param_dtype=jnp.float32, name="norm_body")(y)
        y = Conv(self.embed_dim)(y) + feat
        if self.hat_compat:
            # conv_before_upsample: squeeze to num_feat then LeakyReLU(0.01)
            y = Conv(self.upsample_feat, name="conv_before_upsample")(y)
            y = jnp.where(y >= 0, y, jnp.asarray(0.01, y.dtype) * y)
            y = PixelShuffleUpsampler(self.scale, self.upsample_feat)(y)
        else:
            y = PixelShuffleUpsampler(self.scale, self.embed_dim)(y)
        y = Conv(self.out_channels)(y)
        if ph or pw:
            y = y[:, : h * self.scale, : w * self.scale]
        return y
