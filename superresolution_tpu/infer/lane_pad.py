"""Pad-to-full-lane deploy transform for the fused HAT stage.

Why: the flagship HAT runs every activation at C=96 — a sub-128-lane
channel count. Measured on this chip (benchmarks/exp_r29_lane_rates.py,
grid-pipelined Pallas passthrough, house-rule marginal timing):

    lanes   64      96      128     192     256
    GB/s    119.5   197.8   262.9   265.1   260.5

i.e. 96-lane tensors ride HBM at ~75% of the full 128-lane rate, on
every one of the stage's many activation passes (kernel I/O, window
partition/merge, rolls, pads, residual adds). This module zero-pads the
HAT parameter tree so the whole stage computes in a 128-lane embedding
space while remaining EXACTLY the 96-channel model:

  * weight matrices / conv kernels gain zero rows (input dim) and zero
    columns (output dim) — pad lanes of every activation stay zero by
    construction (zero filters in, zero contributions out);
  * packed projections (the [C, 3C] qkv and [C, 2C] OCAB kv) are split
    into their sections and each section is padded separately, so the
    in-kernel C-offset splits stay 128-aligned;
  * attention heads are padded nh -> c_pad // head_dim (6 -> 8 at the
    flagship's head_dim 16) with zero rel-pos-bias rows: a pad head
    attends uniformly over zero-valued V lanes and contributes zero;
  * LayerNorm statistics must average over the REAL channels only —
    the fused kernels take a `c_real` divisor (ops/pallas_hab._ln);
    scale/bias pad lanes are zero so pad lanes stay zero through LN.

The MXU cost of the extra lanes is ~free: systolic-array tiles are
128 wide, so a 96-lane contraction already occupied (and zero-padded)
the same hardware tile. This is a deploy-time rewrite over the same
checkpoint, like infer/fused_hat.py itself; outputs match the unpadded
path to bf16 accuracy (tests/test_fused_hat.py::test_fused_hat_lane_pad*).

Capability parity target: reference flagship stage 2
(src/architecture.py:51-61) — same model, TPU-native lane layout.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _pad_last(a, to, axis=-1):
    a = jnp.asarray(a)
    axis = axis % a.ndim
    cur = a.shape[axis]
    if cur == to:
        return a
    if cur > to:
        raise ValueError(f"cannot pad dim {cur} down to {to}")
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, to - cur)
    return jnp.pad(a, widths)


def _pad_dense(dp, c_in=None, c_out=None):
    """Dense {kernel [in, out], bias [out]}: pad input rows and/or
    output cols with zeros."""
    k = jnp.asarray(dp["kernel"])
    b = jnp.asarray(dp["bias"])
    if c_in is not None:
        k = _pad_last(k, c_in, axis=-2)
    if c_out is not None:
        k = _pad_last(k, c_out, axis=-1)
        b = _pad_last(b, c_out)
    return {"kernel": k, "bias": b}


def _pad_packed_dense(dp, sections, c, cp):
    """Dense whose OUTPUT packs `sections` blocks of width c (qkv: 3,
    OCAB kv: 2): split, pad each section to cp, re-pack, and pad the
    input rows. Keeps in-kernel C-offset splits 128-aligned."""
    k = jnp.asarray(dp["kernel"])
    b = jnp.asarray(dp["bias"])
    if k.shape[-1] != sections * c:
        raise ValueError(f"packed dense: {k.shape[-1]} != {sections}*{c}")
    ks = [_pad_last(k[..., i * c:(i + 1) * c], cp) for i in range(sections)]
    bs = [_pad_last(b[..., i * c:(i + 1) * c], cp) for i in range(sections)]
    return {"kernel": _pad_last(jnp.concatenate(ks, axis=-1), cp, axis=-2),
            "bias": jnp.concatenate(bs, axis=-1)}


def _pad_conv(cp, c_in=None, c_out=None):
    """Conv {kernel [kh, kw, in, out], bias [out]}."""
    k = jnp.asarray(cp["kernel"])
    b = jnp.asarray(cp["bias"])
    if c_in is not None:
        k = _pad_last(k, c_in, axis=-2)
    if c_out is not None:
        k = _pad_last(k, c_out, axis=-1)
        b = _pad_last(b, c_out)
    return {"kernel": k, "bias": b}


def _pad_ln(lp, cp):
    return {"scale": _pad_last(lp["scale"], cp),
            "bias": _pad_last(lp["bias"], cp)}


def _pad_hab(hp, c, cp, nhp):
    wa = hp["WindowAttention_0"]
    cab = hp["ChannelAttentionBlock_0"]
    return {
        "LayerNorm_0": _pad_ln(hp["LayerNorm_0"], cp),
        "LayerNorm_1": _pad_ln(hp["LayerNorm_1"], cp),
        "WindowAttention_0": {
            "Dense_0": _pad_packed_dense(wa["Dense_0"], 3, c, cp),
            "Dense_1": _pad_dense(wa["Dense_1"], c_in=cp, c_out=cp),
            "rel_pos_bias": _pad_last(wa["rel_pos_bias"], nhp),
        },
        # MLP: hidden width stays (>=128-lane already at mlp_ratio 2)
        "Dense_0": _pad_dense(hp["Dense_0"], c_in=cp),
        "Dense_1": _pad_dense(hp["Dense_1"], c_out=cp),
        "ChannelAttentionBlock_0": {
            "Conv_0": {"Conv_0": _pad_conv(cab["Conv_0"]["Conv_0"],
                                           c_in=cp)},
            "Conv_1": {"Conv_0": _pad_conv(cab["Conv_1"]["Conv_0"],
                                           c_out=cp)},
            # SE tail: pad-lane scale is sigmoid(0)=0.5 but multiplies
            # zero activations, so pad lanes stay zero
            "Dense_0": _pad_dense(cab["Dense_0"], c_in=cp),
            "Dense_1": _pad_dense(cab["Dense_1"], c_out=cp),
        },
    }


def _pad_ocab(op, c, cp, nhp):
    out = {
        "LayerNorm_0": _pad_ln(op["LayerNorm_0"], cp),
        "LayerNorm_1": _pad_ln(op["LayerNorm_1"], cp),
        "Dense_0": _pad_packed_dense(op["Dense_0"], 2, c, cp),  # kv
        "Dense_1": _pad_dense(op["Dense_1"], c_in=cp, c_out=cp),  # q
        "Dense_2": _pad_dense(op["Dense_2"], c_in=cp, c_out=cp),  # proj
        "Dense_3": _pad_dense(op["Dense_3"], c_in=cp),  # MLP in
        "Dense_4": _pad_dense(op["Dense_4"], c_out=cp),  # MLP out
    }
    if "rel_pos_bias_oca" in op:
        out["rel_pos_bias_oca"] = _pad_last(op["rel_pos_bias_oca"], nhp)
    return out


def lane_pad_supported(c: int, nh: int, c_pad: int = 128) -> bool:
    """True when the pad-to-c_pad transform applies: sub-c_pad embed
    whose head_dim divides c_pad (pad heads must tile exactly)."""
    return c < c_pad and c % nh == 0 and c_pad % (c // nh) == 0


def pad_hat_params(p, model, c_pad: int = 128):
    """HATLite param tree (scan layout, make_fused_hat-validated) ->
    the zero-padded tree computing in c_pad-lane space. Returns
    (padded_tree, nh_padded). Raises ValueError when unsupported."""
    c = int(np.asarray(p["Conv_0"]["Conv_0"]["kernel"]).shape[-1])
    nh = model.num_heads[0]
    if not lane_pad_supported(c, nh, c_pad):
        raise ValueError(
            f"lane pad unsupported: C={c}, nh={nh}, c_pad={c_pad}")
    hd = c // nh
    nhp = c_pad // hd
    compat = model.hat_compat
    scale = model.scale

    out = dict(p)
    out["Conv_0"] = {"Conv_0": _pad_conv(p["Conv_0"]["Conv_0"],
                                         c_out=c_pad)}
    out["Conv_1"] = {"Conv_0": _pad_conv(p["Conv_1"]["Conv_0"],
                                         c_in=c_pad, c_out=c_pad)}
    if compat:
        out["norm_embed"] = _pad_ln(p["norm_embed"], c_pad)
        out["norm_body"] = _pad_ln(p["norm_body"], c_pad)
        out["conv_before_upsample"] = {
            "Conv_0": _pad_conv(p["conv_before_upsample"]["Conv_0"],
                                c_in=c_pad)}
    else:
        # the first conv consuming the padded body output leaves the
        # padded space: pad its input rows only
        up = dict(p["PixelShuffleUpsampler_0"])
        stages = {1: (), 2: (2,), 3: (3,), 4: (2, 2), 8: (2, 2, 2)}[scale]
        if stages:
            up["Conv_0"] = {"Conv_0": _pad_conv(
                p["PixelShuffleUpsampler_0"]["Conv_0"]["Conv_0"],
                c_in=c_pad)}
            out["PixelShuffleUpsampler_0"] = up
        else:
            out["Conv_2"] = {"Conv_0": _pad_conv(p["Conv_2"]["Conv_0"],
                                                 c_in=c_pad)}

    g = p["groups"]["ResidualGroup_0"]
    out["groups"] = {"ResidualGroup_0": {
        "hab_pairs": {
            "HABlock_0": _pad_hab(g["hab_pairs"]["HABlock_0"], c, c_pad,
                                  nhp),
            "HABlock_1": _pad_hab(g["hab_pairs"]["HABlock_1"], c, c_pad,
                                  nhp),
        },
        "OverlappingCrossAttention_0": _pad_ocab(
            g["OverlappingCrossAttention_0"], c, c_pad, nhp),
        "Conv_0": {"Conv_0": _pad_conv(g["Conv_0"]["Conv_0"],
                                       c_in=c_pad, c_out=c_pad)},
    }}
    return out, nhp
