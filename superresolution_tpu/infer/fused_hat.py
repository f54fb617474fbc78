"""Deploy-time fused HATLite inference — HAB blocks run as ONE Pallas
program each (ops/pallas_hab.py), everything else as param-apply XLA.

Like infer/folded_tail.py, this is a deployment rewrite over the SAME
checkpoint: `make_fused_hat(variables, model)` reads the flax param tree
directly and returns an apply-equivalent function. No parameter
conversion; outputs match `model.apply` to bf16 accuracy
(tests/test_fused_hat.py proves equivalence in interpret mode).

Measured on the hybrid workload: each HAB block drops from ~13 ms (XLA,
f32-logits parity path) to ~4.4 ms (benchmarks/exp_r3_fused_hab.py) —
the stage's K=96 dense round-trips collapse into VMEM-resident compute.

Supported layout: the production HATLite configuration — scan_blocks
with uniform groups and even depths (all presets), with or without
hat_compat (reference-checkpoint import mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from superresolution_tpu.infer.common import (
    PreboundModel as _PreboundModel,
    param_conv as _conv,
)
from superresolution_tpu.models.hat_lite import (
    HATLite,
    _relative_position_index,
    _relative_position_index_oca,
    _shift_region_ids,
    window_merge,
    window_partition,
)
from superresolution_tpu.ops.pallas_hab import fused_hab_block
from superresolution_tpu.ops.pixel_shuffle import depth_to_space
from superresolution_tpu.ops.unfold import extract_overlapping_windows

_EPS = 1e-5

def _dense(x, dp):
    y = jnp.dot(x, jnp.asarray(dp["kernel"], x.dtype),
                preferred_element_type=jnp.float32)
    return (y + jnp.asarray(dp["bias"], jnp.float32)).astype(x.dtype)


def _ln(x, lp, c_real=None):
    """LayerNorm; c_real averages stats over the real channels only
    when the lane dim is zero-padded (infer/lane_pad.py)."""
    xf = x.astype(jnp.float32)
    if c_real is None or c_real == xf.shape[-1]:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = (jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
               - jnp.square(mu))
    else:
        inv = 1.0 / c_real
        mu = jnp.sum(xf, axis=-1, keepdims=True) * inv
        var = (jnp.sum(jnp.square(xf), axis=-1, keepdims=True) * inv
               - jnp.square(mu))
    y = (xf - mu) * jax.lax.rsqrt(var + _EPS)
    return (y * jnp.asarray(lp["scale"], jnp.float32)
            + jnp.asarray(lp["bias"], jnp.float32)).astype(x.dtype)


def _se_scale(y, cp):
    """Squeeze-excite tail shared by both CAB paths."""
    s = jnp.mean(y, axis=(1, 2), keepdims=True)
    s = jax.nn.relu(_dense(s, cp["Dense_0"]))
    s = jax.nn.sigmoid(_dense(s, cp["Dense_1"]))
    return y * s


def _cab(x, cp):
    """ChannelAttentionBlock math (models/hat_lite.py)."""
    y = _conv(x, cp["Conv_0"]["Conv_0"])
    y = jax.nn.gelu(y, approximate=False)
    y = _conv(y, cp["Conv_1"]["Conv_0"])
    return _se_scale(y, cp)


def _cab_fused(x, hp, interpret, c_real=None):
    """LN + the CAB conv stack as ONE Pallas program
    (ops/pallas_hab.fused_cab_convs) + the XLA squeeze-excite tail.
    Measured 1.377 vs 1.545 ms for the XLA stack at [4,256,256,96]
    (benchmarks/exp_r18_cab_remeasure.py — the earlier 'wash' verdicts
    used the untrusted timing). cab_weights is tracer-safe, so this
    composes with the hab_pairs lax.scan."""
    from superresolution_tpu.ops.pallas_hab import (
        cab_weights, fused_cab_convs)

    y = fused_cab_convs(x, cab_weights(hp, x.dtype), interpret=interpret,
                        c_real=c_real)
    return _se_scale(y.astype(x.dtype), hp["ChannelAttentionBlock_0"])


def _wa_weights(hp, nh, ws, dtype):
    """HABlock params -> the fused kernel's weight dict."""
    wa = hp["WindowAttention_0"]
    n = ws * ws
    qkv_k = jnp.asarray(wa["Dense_0"]["kernel"], dtype)  # [C, 3C]
    c = qkv_k.shape[0]
    table = jnp.asarray(wa["rel_pos_bias"], jnp.float32)
    idx = jnp.asarray(_relative_position_index(ws))
    rpb = table[idx.reshape(-1)].reshape(n, n, nh).transpose(2, 0, 1)
    bqkv = jnp.asarray(wa["Dense_0"]["bias"], jnp.float32).reshape(3 * c)
    return {
        "ln1_s": jnp.asarray(hp["LayerNorm_0"]["scale"],
                             jnp.float32).reshape(1, c),
        "ln1_b": jnp.asarray(hp["LayerNorm_0"]["bias"],
                             jnp.float32).reshape(1, c),
        "wq": qkv_k[:, :c], "wk": qkv_k[:, c:2 * c], "wv": qkv_k[:, 2 * c:],
        "bq": bqkv[:c].reshape(1, c), "bk": bqkv[c:2 * c].reshape(1, c),
        "bv": bqkv[2 * c:].reshape(1, c),
        "rpb": rpb,
        "wp": jnp.asarray(wa["Dense_1"]["kernel"], dtype),
        "bp": jnp.asarray(wa["Dense_1"]["bias"], jnp.float32).reshape(1, c),
        "ln2_s": jnp.asarray(hp["LayerNorm_1"]["scale"],
                             jnp.float32).reshape(1, c),
        "ln2_b": jnp.asarray(hp["LayerNorm_1"]["bias"],
                             jnp.float32).reshape(1, c),
        "w1": jnp.asarray(hp["Dense_0"]["kernel"], dtype),
        "b1": jnp.asarray(hp["Dense_0"]["bias"],
                          jnp.float32).reshape(1, -1),
        "w2": jnp.asarray(hp["Dense_1"]["kernel"], dtype),
        "b2": jnp.asarray(hp["Dense_1"]["bias"],
                          jnp.float32).reshape(1, -1),
    }


def _hab(x, hp, *, shift, ws, nh, conv_scale, interpret, c_real=None):
    import os

    b, h, w, c = x.shape
    if os.environ.get("SRTPU_STRIP_HAB") and c_real is None:
        # CAB-merged strip path (ops/pallas_hab_strip.py): the HAB body
        # runs on SPATIAL strips with in-kernel window grouping — no
        # partition/merge/roll/SE-apply XLA passes. The SE SCALE still
        # needs the global mean of the CAB conv output, so the conv
        # kernel stays a separate program.
        from superresolution_tpu.ops.pallas_hab import (
            cab_weights, fused_cab_convs)
        from superresolution_tpu.ops.pallas_hab_strip import (
            strip_hab_block)

        cp = hp["ChannelAttentionBlock_0"]
        y_cab = fused_cab_convs(x, cab_weights(hp, x.dtype),
                                interpret=interpret).astype(x.dtype)
        s = jnp.mean(y_cab, axis=(1, 2), keepdims=True)
        s = jax.nn.relu(_dense(s, cp["Dense_0"]))
        s = jax.nn.sigmoid(_dense(s, cp["Dense_1"]))
        se = (s.astype(jnp.float32)
              * jnp.float32(conv_scale)).reshape(b, 1, c)
        weights = _wa_weights(hp, nh, ws, x.dtype)
        rb_env = os.environ.get("SRTPU_STRIP_RB")  # exp_r27 rb sweep
        return strip_hab_block(x, y_cab, se, weights, num_heads=nh,
                               window_size=ws,
                               shift=shift if shift else 0,
                               rb=int(rb_env) if rb_env else None,
                               interpret=interpret)
    if os.environ.get("SRTPU_XLA_CAB"):  # A/B lever (exp_r19)
        cab = _cab(_ln(x, hp["LayerNorm_0"], c_real),
                   hp["ChannelAttentionBlock_0"])
    else:
        cab = _cab_fused(x, hp, interpret, c_real)
    cab = cab * jnp.asarray(conv_scale, x.dtype)
    if shift:
        xs = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        cabs = jnp.roll(cab, (-shift, -shift), axis=(1, 2))
        ids = jnp.asarray(_shift_region_ids(h, w, ws, shift))
    else:
        xs, cabs, ids = x, cab, None
    x_wins = window_partition(xs, ws)
    cab_wins = window_partition(cabs, ws)
    weights = _wa_weights(hp, nh, ws, x.dtype)
    if c_real is not None:
        from superresolution_tpu.ops.pallas_hab import (
            fused_hab_block_inference)

        out_wins = fused_hab_block_inference(x_wins, cab_wins, nh,
                                             interpret, weights, ids,
                                             c_real=c_real)
    else:
        out_wins = fused_hab_block(x_wins, cab_wins, nh, interpret,
                                   weights, ids)
    out = window_merge(out_wins, ws, (h, w))
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    return out


def _ocab(x, op, *, ws, nh, overlap_ratio, use_rpb, c_real=None):
    """OverlappingCrossAttention on raw params via the flash
    cross-attention kernel at every window size (trusted re-measure:
    +11% e2e at ws=8, +4.1% at ws=16 — BENCHMARKS.md r3);
    SRTPU_EINSUM_OCA=1 restores the einsum reference path."""
    b, h, w, c = x.shape
    ows = int(ws * (1 + overlap_ratio))
    pad = (ows - ws) // 2
    hd = c // nh
    y = _ln(x, op["LayerNorm_0"], c_real)
    q = window_partition(y, ws)
    kv = _dense(y, op["Dense_0"])
    # asymmetric tail pad for odd ows-ws (models/hat_lite.py OCAB keeps
    # the identical convention, so deploy == apply at every geometry)
    kv = jnp.pad(kv, ((0, 0), (pad, ows - ws - pad),
                      (pad, ows - ws - pad), (0, 0)))
    nh_w, nw_w = h // ws, w // ws
    qd = _dense(q, op["Dense_1"])
    bias = None
    if use_rpb:
        table = jnp.asarray(op["rel_pos_bias_oca"], jnp.float32)
        idx = jnp.asarray(_relative_position_index_oca(ws, ows))
        bias = table[idx.reshape(-1)].reshape(
            ws * ws, ows * ows, nh).transpose(2, 0, 1)
    import os

    from superresolution_tpu.ops.pallas_flash_oca import (
        flash_oca_gathered, oca_gather_supported)

    if (not os.environ.get("SRTPU_EINSUM_OCA")
            and os.environ.get("SRTPU_GATHER_OCA", "1") not in ("", "0")
            and oca_gather_supported(ws, ows, h, w)):
        # in-kernel kv gather (ops/pallas_flash_oca.py): the padded
        # key/value MAPS stream into the kernel as paired row blocks;
        # the [B*nW, ows^2, 2C] gathered tensor (~226 MB at the b4
        # flagship geometry, ~3.9 ms/OCAB in XLA — exp_r23) is never
        # materialized. DEFAULT since round 5: e2e 46.3 vs 49.6
        # ms/frame at the b1 deploy geometry (+7.2%, exp_r32);
        # SRTPU_GATHER_OCA=0 restores the windowed-gather flash path.
        if bias is None:
            bias = jnp.zeros((nh, ws * ws, ows * ows), jnp.float32)
        k_map, v_map = jnp.split(kv, 2, axis=-1)
        out = flash_oca_gathered(
            qd, k_map, v_map, bias, nh, ws, ows,
            jax.default_backend() != "tpu")
    elif not os.environ.get("SRTPU_EINSUM_OCA"):
        # flash OCAB at EVERY window size: the old 'flash loses at
        # ws=8' verdict (350.7 vs 343.2, exp_r3_hybrid_flash) was a
        # pre-house-rule timing artifact — trusted e2e re-measure
        # (exp_r19 + SRTPU_FLASH_OCA8): 252.8 vs 280.5 ms/batch.
        # SRTPU_EINSUM_OCA=1 restores the einsum path for A/Bs.
        # Gather is cell-decomposed; falls back to the ows*ows slice
        # loop when padded dims aren't divisible by gcd(ws, ows)
        # (ops/unfold.py).
        from superresolution_tpu.ops.pallas_attn import (
            flash_window_attention)

        kvw = extract_overlapping_windows(kv, ws, ows, nh_w, nw_w)
        k, v = jnp.split(kvw, 2, axis=-1)
        if bias is None:
            bias = jnp.zeros((nh, ws * ws, ows * ows), jnp.float32)
        out = flash_window_attention(
            qd, k, v, bias, nh, jax.default_backend() != "tpu", None)
    else:
        kvw = extract_overlapping_windows(kv, ws, ows, nh_w, nw_w)
        k, v = jnp.split(kvw, 2, axis=-1)
        qh = qd.reshape(-1, ws * ws, nh, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(-1, ows * ows, nh, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(-1, ows * ows, nh, hd).transpose(0, 2, 1, 3)
        scale = jnp.asarray(hd, jnp.float32) ** -0.5
        attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh,
                          preferred_element_type=jnp.float32) * scale
        if bias is not None:
            attn = attn + bias[None]
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(-1, ws * ws, c)
    out = _dense(out, op["Dense_2"])
    y = window_merge(out, ws, (h, w))
    x = x + y
    z = _ln(x, op["LayerNorm_1"], c_real)
    z = _dense(z, op["Dense_3"])
    z = jax.nn.gelu(z, approximate=False).astype(x.dtype)
    return x + _dense(z, op["Dense_4"])


def make_fused_hat(variables, model: HATLite):
    """Build apply_fn(x [B,H,W,Cin]) -> [B, H*scale, W*scale, Cout]
    equivalent to model.apply(variables, x), with fused HAB kernels."""
    if not model.scan_blocks:
        raise ValueError("fused HAT requires scan_blocks=True")
    depths, heads = model.depths, model.num_heads
    if len(set(depths)) != 1 or len(set(heads)) != 1 or len(depths) < 2:
        raise ValueError("fused HAT requires uniform groups (scan layout)")
    if depths[0] % 2:
        raise ValueError("fused HAT requires even group depth")
    p = variables["params"] if "params" in variables else variables
    ws = model.window_size
    nh = heads[0]
    pairs = depths[0] // 2
    conv_scale = model.conv_scale
    overlap = model.overlap_ratio
    compat = model.hat_compat
    scale = model.scale

    # pad-to-full-lane deploy transform (SRTPU_LANE_PAD=1): run the
    # whole stage in a 128-lane embedding space — 96-lane tensors ride
    # HBM at ~75% of the 128-lane rate (exp_r29). Zero-padded weights
    # keep the math exactly the 96-channel model's; the kernels' LNs
    # take c_real. SRTPU_LANE_PAD_TO overrides the target width (tests
    # use small dims).
    import os

    c_real = None
    if os.environ.get("SRTPU_LANE_PAD"):
        from superresolution_tpu.infer.lane_pad import (
            lane_pad_supported, pad_hat_params)

        c_model = int(jnp.asarray(
            p["Conv_0"]["Conv_0"]["kernel"]).shape[-1])
        c_pad = int(os.environ.get("SRTPU_LANE_PAD_TO", "128"))
        if lane_pad_supported(c_model, nh, c_pad):
            p, nh = pad_hat_params(p, model, c_pad)
            c_real = c_model

    def apply_fn(x):
        interpret = jax.default_backend() != "tpu"
        b, h0, w0, _ = x.shape
        ph = (ws - h0 % ws) % ws
        pw = (ws - w0 % ws) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        feat = _conv(x, p["Conv_0"]["Conv_0"])
        y = feat
        if compat:
            y = _ln(y, p["norm_embed"], c_real)

        def group_body(y, gp_s):
            gp = gp_s["ResidualGroup_0"]
            y0 = y

            def pair_body(y, pp):
                y = _hab(y, pp["HABlock_0"], shift=0, ws=ws, nh=nh,
                         conv_scale=conv_scale, interpret=interpret,
                         c_real=c_real)
                y = _hab(y, pp["HABlock_1"], shift=ws // 2, ws=ws, nh=nh,
                         conv_scale=conv_scale, interpret=interpret,
                         c_real=c_real)
                return y, None

            y, _ = jax.lax.scan(pair_body, y, gp["hab_pairs"])
            y = _ocab(y, gp["OverlappingCrossAttention_0"], ws=ws, nh=nh,
                      overlap_ratio=overlap, use_rpb=compat,
                      c_real=c_real)
            return y0 + _conv(y, gp["Conv_0"]["Conv_0"]), None

        y, _ = jax.lax.scan(group_body, y, p["groups"])
        if compat:
            y = _ln(y, p["norm_body"], c_real)
        y = _conv(y, p["Conv_1"]["Conv_0"]) + feat
        if compat:
            y = _conv(y, p["conv_before_upsample"]["Conv_0"])
            y = jnp.where(y >= 0, y, jnp.asarray(0.01, y.dtype) * y)
        # PixelShuffleUpsampler stages (models/common.py)
        up = p["PixelShuffleUpsampler_0"]
        stages = {1: (), 2: (2,), 3: (3,), 4: (2, 2), 8: (2, 2, 2)}[scale]
        for i, r in enumerate(stages):
            y = _conv(y, up[f"Conv_{i}"]["Conv_0"])
            y = depth_to_space(y, r)
        y = _conv(y, p["Conv_2"]["Conv_0"])
        if ph or pw:
            y = y[:, : h0 * scale, : w0 * scale]
        return y

    return apply_fn


def fused_hybrid_model(variables, model):
    """HybridSR with a HATLite stage 2 -> a pre-bound model whose stage-2
    HAB blocks run as fused Pallas kernels. Replicates the HybridSR
    forward contract (models/hybrid.py: stage1 -> smooth -> stage2 ->
    smooth -> resize-to-output -> light smooth). Raises ValueError for
    layouts make_fused_hat does not support."""
    from superresolution_tpu.models.hat_lite import HATLite as _HAT
    from superresolution_tpu.ops.blur import anti_checkerboard
    from superresolution_tpu.ops.resize import resize_bicubic

    if model.stage2 is None or not isinstance(model.stage2, _HAT):
        raise ValueError("fused hybrid requires a HATLite stage 2")
    p = variables["params"] if "params" in variables else variables
    fused_s2 = make_fused_hat({"params": p["stage2"]}, model.stage2)
    s1 = model.stage1
    smoothing = model.smoothing
    output_size = model.output_size

    # stage 1: fused dense-block trunk + phase-space tail when the
    # layout supports them (infer/fused_trunk.py), standard apply
    # otherwise
    s1_apply = None
    try:
        from superresolution_tpu.infer.fused_trunk import fused_rrdb_model

        s1_model = fused_rrdb_model({"params": p["stage1"]}, s1)

        def s1_apply(x):
            return s1_model.apply(None, x)
    except (ValueError, KeyError, AttributeError):
        pass

    def apply_fn(x):
        if s1_apply is not None:
            y = s1_apply(x)
        else:
            y = s1.apply({"params": p["stage1"]}, x)
        if smoothing:
            y = anti_checkerboard(y, smoothing)
        y = fused_s2(y)
        if smoothing:
            y = anti_checkerboard(y, smoothing)
        if output_size and y.shape[1] != output_size:
            y = resize_bicubic(y, (output_size, output_size), a=-0.75,
                               antialias=False)
        if smoothing:
            y = anti_checkerboard(y, "light")
        return y

    return _PreboundModel(apply_fn)
