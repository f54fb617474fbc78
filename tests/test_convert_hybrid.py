"""Reference-hybrid checkpoint interop: import a stage1./stage2. state dict
(BasicSR RRDBNet scale-2 + HAT conventions — the layout of a
reference-trained best.pth, reference scripts/Modello_4.py:45-49,
src/architecture.py:30-82), apply it with our HybridSR, and prove:

  1. forward-output equivalence < 1e-4 against an independent torch
     re-expression built from the SAME numpy state dict (torch is in the
     image; strongest parity evidence available with zero egress), and
  2. a bit-exact import -> export round-trip of every weight.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from superresolution_tpu.models.convert import (
    export_hybrid_numpy,
    import_hybrid_numpy,
)
from superresolution_tpu.models.hat_lite import (
    HATLite,
    _relative_position_index,
    _relative_position_index_oca,
    _shift_attn_mask,
)
from superresolution_tpu.models.hybrid import HybridSR
from superresolution_tpu.models.rrdbnet import RRDBNet

# tiny hybrid: stage1 RRDBNet(feat 16, growth 8, 2 blocks, x2 with
# pixel-unshuffled input) -> stage2 HAT(embed 16, 2 groups x depth 2,
# 2 heads, window 4) x2
C1, G1, NB = 16, 8, 2
C2, NH, WS = 16, 2, 4
DEPTHS = (2, 2)
NF = 8  # HAT num_feat before upsample


def _make_state_dict(rng):
    sd = {}

    def conv(name, cout, cin, k=3):
        sd[f"{name}.weight"] = rng.normal(
            0, 0.08, (cout, cin, k, k)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.01, (cout,)).astype(np.float32)

    def lin(name, cout, cin):
        sd[f"{name}.weight"] = rng.normal(
            0, 0.08, (cout, cin)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.01, (cout,)).astype(np.float32)

    def ln(name, c):
        sd[f"{name}.weight"] = rng.normal(1, 0.02, (c,)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.01, (c,)).astype(np.float32)

    # stage1: BasicSR RRDBNet, scale 2 => pixel-unshuffled input (1*4 ch)
    conv("stage1.conv_first", C1, 4)
    for i in range(NB):
        for r in (1, 2, 3):
            for j in range(1, 6):
                cin = C1 + (j - 1) * G1
                cout = G1 if j < 5 else C1
                conv(f"stage1.body.{i}.rdb{r}.conv{j}", cout, cin)
    conv("stage1.conv_body", C1, C1)
    conv("stage1.conv_up1", C1, C1)
    conv("stage1.conv_up2", C1, C1)
    conv("stage1.conv_hr", C1, C1)
    conv("stage1.conv_last", 1, C1)

    # stage2: HAT layout
    conv("stage2.conv_first", C2, 1)
    ln("stage2.patch_embed.norm", C2)
    for g in range(len(DEPTHS)):
        for b in range(DEPTHS[g]):
            pre = f"stage2.layers.{g}.residual_group.blocks.{b}"
            ln(f"{pre}.norm1", C2)
            lin(f"{pre}.attn.qkv", 3 * C2, C2)
            lin(f"{pre}.attn.proj", C2, C2)
            sd[f"{pre}.attn.relative_position_bias_table"] = rng.normal(
                0, 0.02, ((2 * WS - 1) ** 2, NH)).astype(np.float32)
            conv(f"{pre}.conv_block.cab.0", C2 // 3, C2)
            conv(f"{pre}.conv_block.cab.2", C2, C2 // 3)
            conv(f"{pre}.conv_block.cab.3.attention.1", 1, C2, k=1)
            conv(f"{pre}.conv_block.cab.3.attention.3", C2, 1, k=1)
            ln(f"{pre}.norm2", C2)
            lin(f"{pre}.mlp.fc1", 2 * C2, C2)
            lin(f"{pre}.mlp.fc2", C2, 2 * C2)
        pre = f"stage2.layers.{g}.overlap_attn"
        ln(f"{pre}.norm1", C2)
        lin(f"{pre}.qkv", 3 * C2, C2)
        ows = WS + WS // 2
        sd[f"{pre}.relative_position_bias_table"] = rng.normal(
            0, 0.02, ((WS + ows - 1) ** 2, NH)).astype(np.float32)
        lin(f"{pre}.proj", C2, C2)
        ln(f"{pre}.norm2", C2)
        lin(f"{pre}.mlp.fc1", 2 * C2, C2)
        lin(f"{pre}.mlp.fc2", C2, 2 * C2)
        conv(f"stage2.layers.{g}.conv", C2, C2)
    ln("stage2.norm", C2)
    conv("stage2.conv_after_body", C2, C2)
    conv("stage2.conv_before_upsample.0", NF, C2)
    conv("stage2.upsample.0", 4 * NF, NF)
    conv("stage2.conv_last", 1, NF)
    return sd


# ---------------------------------------------------------------------------
# torch re-expression (independent forward from the same state dict)
# ---------------------------------------------------------------------------


def _t(sd, k):
    return torch.from_numpy(np.asarray(sd[k]))


def t_conv(x, sd, name, pad=1):
    return F.conv2d(x, _t(sd, f"{name}.weight"), _t(sd, f"{name}.bias"),
                    padding=pad)


def t_lin(x, sd, name):
    return F.linear(x, _t(sd, f"{name}.weight"), _t(sd, f"{name}.bias"))


def t_ln(x, sd, name, c):
    return F.layer_norm(x, (c,), _t(sd, f"{name}.weight"),
                        _t(sd, f"{name}.bias"), eps=1e-5)


def torch_stage1(x, sd):
    x = F.pixel_unshuffle(x, 2)
    feat = t_conv(x, sd, "stage1.conv_first")
    t = feat
    for i in range(NB):
        rrdb_in = t
        for r in (1, 2, 3):
            d_in = t
            feats = [t]
            for j in range(1, 5):
                y = F.leaky_relu(
                    t_conv(torch.cat(feats, 1), sd,
                           f"stage1.body.{i}.rdb{r}.conv{j}"), 0.2)
                feats.append(y)
            y5 = t_conv(torch.cat(feats, 1), sd,
                        f"stage1.body.{i}.rdb{r}.conv5")
            t = d_in + 0.2 * y5
        t = rrdb_in + 0.2 * t
    t = t_conv(t, sd, "stage1.conv_body") + feat
    for up in ("conv_up1", "conv_up2"):
        t = F.interpolate(t, scale_factor=2, mode="nearest")
        t = F.leaky_relu(t_conv(t, sd, f"stage1.{up}"), 0.2)
    t = F.leaky_relu(t_conv(t, sd, "stage1.conv_hr"), 0.2)
    return t_conv(t, sd, "stage1.conv_last")


def _t_partition(x, ws):
    # x: [B,H,W,C] -> [nB, ws*ws, C]
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _t_merge(x, ws, h, w):
    c = x.shape[-1]
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def _t_attention(q, k, v, nh, bias):
    nb, n, c = q.shape
    m = k.shape[1]
    hd = c // nh
    qh = q.reshape(nb, n, nh, hd).permute(0, 2, 1, 3)
    kh = k.reshape(nb, m, nh, hd).permute(0, 2, 1, 3)
    vh = v.reshape(nb, m, nh, hd).permute(0, 2, 1, 3)
    attn = qh @ kh.transpose(-2, -1) * hd ** -0.5 + bias
    attn = attn.softmax(-1)
    return (attn @ vh).permute(0, 2, 1, 3).reshape(nb, n, c)


def torch_hab(x, sd, pre, shift, h, w):
    xn = t_ln(x, sd, f"{pre}.norm1", C2)
    # CAB (convs are NCHW)
    y = xn.permute(0, 3, 1, 2)
    y = t_conv(y, sd, f"{pre}.conv_block.cab.0")
    y = F.gelu(y)
    y = t_conv(y, sd, f"{pre}.conv_block.cab.2")
    s = y.mean((2, 3), keepdim=True)
    s = F.relu(t_conv(s, sd, f"{pre}.conv_block.cab.3.attention.1", pad=0))
    s = torch.sigmoid(
        t_conv(s, sd, f"{pre}.conv_block.cab.3.attention.3", pad=0))
    cab = (y * s).permute(0, 2, 3, 1)
    # (shifted) window attention
    ys = torch.roll(xn, (-shift, -shift), dims=(1, 2)) if shift else xn
    wins = _t_partition(ys, WS)
    qkv = t_lin(wins, sd, f"{pre}.attn.qkv")
    nb, n, _ = qkv.shape
    q, k, v = qkv.reshape(nb, n, 3, C2).permute(2, 0, 1, 3)
    table = _t(sd, f"{pre}.attn.relative_position_bias_table")
    idx = torch.from_numpy(_relative_position_index(WS).astype(np.int64))
    bias = table[idx.reshape(-1)].reshape(n, n, NH).permute(2, 0, 1)[None]
    if shift:
        mask = torch.from_numpy(_shift_attn_mask(h, w, WS, shift))
        nw = mask.shape[0]
        # expand bias to per-window then add the mask
        bias = bias.expand(nb, NH, n, n).reshape(nb // nw, nw, NH, n, n)
        bias = (bias + mask[None, :, None]).reshape(nb, NH, n, n)
    out = _t_attention(q, k, v, NH, bias)
    out = t_lin(out, sd, f"{pre}.attn.proj")
    y = _t_merge(out, WS, h, w)
    if shift:
        y = torch.roll(y, (shift, shift), dims=(1, 2))
    x = x + y + 0.01 * cab
    z = t_ln(x, sd, f"{pre}.norm2", C2)
    z = t_lin(z, sd, f"{pre}.mlp.fc1")
    z = F.gelu(z)
    z = t_lin(z, sd, f"{pre}.mlp.fc2")
    return x + z


def torch_ocab(x, sd, pre, h, w):
    ows = WS + WS // 2
    pad = (ows - WS) // 2
    xn = t_ln(x, sd, f"{pre}.norm1", C2)
    wq = _t(sd, f"{pre}.qkv.weight")
    bq = _t(sd, f"{pre}.qkv.bias")
    q_full = F.linear(xn, wq[:C2], bq[:C2])
    kv = F.linear(xn, wq[C2:], bq[C2:])  # [B,H,W,2C]
    q = _t_partition(q_full, WS)
    # unfold kv into overlapping ows-windows at stride WS
    kv_nchw = kv.permute(0, 3, 1, 2)
    unf = F.unfold(kv_nchw, kernel_size=ows, stride=WS, padding=pad)
    b = kv.shape[0]
    L = (h // WS) * (w // WS)
    unf = unf.reshape(b, 2 * C2, ows * ows, L).permute(0, 3, 2, 1)
    kvw = unf.reshape(b * L, ows * ows, 2 * C2)
    k, v = kvw[..., :C2], kvw[..., C2:]
    table = _t(sd, f"{pre}.relative_position_bias_table")
    idx = torch.from_numpy(
        _relative_position_index_oca(WS, ows).astype(np.int64))
    bias = table[idx.reshape(-1)].reshape(
        WS * WS, ows * ows, NH).permute(2, 0, 1)[None]
    out = _t_attention(q, k, v, NH, bias)
    out = t_lin(out, sd, f"{pre}.proj")
    x = x + _t_merge(out, WS, h, w)
    z = t_ln(x, sd, f"{pre}.norm2", C2)
    z = t_lin(z, sd, f"{pre}.mlp.fc1")
    z = F.gelu(z)
    z = t_lin(z, sd, f"{pre}.mlp.fc2")
    return x + z


def torch_stage2(x, sd):
    feat = t_conv(x, sd, "stage2.conv_first")  # NCHW
    y = feat.permute(0, 2, 3, 1)  # NHWC for token ops
    h, w = y.shape[1], y.shape[2]
    y = t_ln(y, sd, "stage2.patch_embed.norm", C2)
    for g in range(len(DEPTHS)):
        shortcut = y
        for b in range(DEPTHS[g]):
            shift = 0 if b % 2 == 0 else WS // 2
            y = torch_hab(y, sd, f"stage2.layers.{g}.residual_group"
                                 f".blocks.{b}", shift, h, w)
        y = torch_ocab(y, sd, f"stage2.layers.{g}.overlap_attn", h, w)
        y = t_conv(y.permute(0, 3, 1, 2), sd,
                   f"stage2.layers.{g}.conv").permute(0, 2, 3, 1) + shortcut
    y = t_ln(y, sd, "stage2.norm", C2)
    y = t_conv(y.permute(0, 3, 1, 2), sd, "stage2.conv_after_body") + feat
    y = F.leaky_relu(t_conv(y, sd, "stage2.conv_before_upsample.0"), 0.01)
    y = F.pixel_shuffle(t_conv(y, sd, "stage2.upsample.0"), 2)
    return t_conv(y, sd, "stage2.conv_last")


def _build_jax_hybrid():
    stage1 = RRDBNet(scale=2, in_channels=1, out_channels=1, features=C1,
                     num_blocks=NB, growth=G1, upsampler="nearest_conv",
                     pixel_unshuffle_input=2)
    stage2 = HATLite(scale=2, in_channels=1, out_channels=1, embed_dim=C2,
                     depths=DEPTHS, num_heads=(NH,) * len(DEPTHS),
                     window_size=WS, hat_compat=True, upsample_feat=NF)
    return HybridSR(stage1=stage1, stage2=stage2, output_size=None,
                    smoothing=None)


def test_hybrid_import_matches_torch_reexpression(rng):
    sd = _make_state_dict(rng)
    params = import_hybrid_numpy(
        sd, num_blocks=NB, features=C1, growth=G1, embed_dim=C2,
        depths=DEPTHS)
    model = _build_jax_hybrid()
    x = rng.random((1, 16, 16, 1), dtype=np.float32)

    import jax.numpy as jnp

    ours = np.asarray(model.apply(params, jnp.asarray(x)))

    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        t1 = torch_stage1(xt, sd)
        t2 = torch_stage2(t1, sd)
        theirs = t2.permute(0, 2, 3, 1).numpy()

    assert ours.shape == theirs.shape == (1, 64, 64, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_hybrid_import_export_roundtrip_bit_exact(rng):
    sd = _make_state_dict(rng)
    params = import_hybrid_numpy(
        sd, num_blocks=NB, features=C1, growth=G1, embed_dim=C2,
        depths=DEPTHS)
    back = export_hybrid_numpy(
        params, num_blocks=NB, features=C1, growth=G1, embed_dim=C2,
        depths=DEPTHS)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], np.asarray(sd[k]),
                                      err_msg=k)


def test_imported_params_match_init_structure(rng):
    """The imported tree must be structurally identical to model.init's —
    otherwise apply() would silently broadcast/mismatch."""
    import jax

    sd = _make_state_dict(rng)
    params = import_hybrid_numpy(
        sd, num_blocks=NB, features=C1, growth=G1, embed_dim=C2,
        depths=DEPTHS)
    model = _build_jax_hybrid()
    ref = model.init(jax.random.key(0), np.zeros((1, 16, 16, 1), np.float32))
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, params)
    assert ref_shapes == got_shapes


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_import_reference_cli_end_to_end(tmp_path, rng, capsys):
    """A reference-trained hybrid .pth goes through `import-reference` and
    is directly usable by `upscale --ckpt` — the switch-over journey for a
    reference user."""
    import json
    import os

    from superresolution_tpu.cli.main import main

    sd = _make_state_dict(rng)
    pth = str(tmp_path / "best.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               pth)

    out = str(tmp_path / "imported")
    main(["import-reference", "--pth", pth, "--out", out])
    info = json.loads(capsys.readouterr().out)
    assert info["refiner"] == "hat_lite"
    assert os.path.isdir(info["checkpoint"])

    from superresolution_tpu.data.io import load_image, save_png

    src = str(tmp_path / "in.png")
    save_png(rng.random((16, 16, 1), dtype=np.float32), src)
    dst = str(tmp_path / "out.png")
    main(["upscale", "--input", src, "--output", dst,
          "--ckpt", info["checkpoint"], "--tile", "16", "--halo", "4"])
    capsys.readouterr()
    assert load_image(dst).shape == (64, 64, 1)  # x4 total (2 x 2)


def test_plain_esrgan_import_matches_torch(rng):
    """The plain BasicSR ESRGAN x4 path (detect_and_import) must also match
    a torch re-expression — covers the nearest-conv upsampler and the
    fused/scan import without the hybrid wrapper."""
    from superresolution_tpu.models.convert import detect_and_import
    from superresolution_tpu.models.factory import build_from_config
    from superresolution_tpu.utils.config import ModelConfig

    sd = {}

    def conv(name, cout, cin):
        sd[f"{name}.weight"] = rng.normal(
            0, 0.08, (cout, cin, 3, 3)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.01, (cout,)).astype(np.float32)

    conv("conv_first", C1, 3)
    for i in range(NB):
        for r in (1, 2, 3):
            for j in range(1, 6):
                conv(f"body.{i}.rdb{r}.conv{j}",
                     G1 if j < 5 else C1, C1 + (j - 1) * G1)
    for name, cout, cin in (("conv_body", C1, C1), ("conv_up1", C1, C1),
                            ("conv_up2", C1, C1), ("conv_hr", C1, C1),
                            ("conv_last", 3, C1)):
        conv(name, cout, cin)

    variables, cfg = detect_and_import(sd)
    assert cfg["refiner"] is None and cfg["scale"] == 4
    model = build_from_config(ModelConfig(**dict(
        cfg, kwargs=dict(cfg["kwargs"], features=C1, num_blocks=NB,
                         growth=G1))))
    x = rng.random((1, 12, 12, 3), dtype=np.float32)

    import jax.numpy as jnp

    ours = np.asarray(model.apply(variables, jnp.asarray(x)))

    # torch re-expression: plain ESRGAN x4 (no pixel_unshuffle)
    with torch.no_grad():
        t = torch.from_numpy(x).permute(0, 3, 1, 2)
        feat = t_conv(t, sd, "conv_first")
        y = feat
        for i in range(NB):
            rrdb_in = y
            for r in (1, 2, 3):
                d_in = y
                feats = [y]
                for j in range(1, 5):
                    z = F.leaky_relu(
                        t_conv(torch.cat(feats, 1), sd,
                               f"body.{i}.rdb{r}.conv{j}"), 0.2)
                    feats.append(z)
                y = d_in + 0.2 * t_conv(torch.cat(feats, 1), sd,
                                        f"body.{i}.rdb{r}.conv5")
            y = rrdb_in + 0.2 * y
        y = t_conv(y, sd, "conv_body") + feat
        for up in ("conv_up1", "conv_up2"):
            y = F.interpolate(y, scale_factor=2, mode="nearest")
            y = F.leaky_relu(t_conv(y, sd, up), 0.2)
        y = F.leaky_relu(t_conv(y, sd, "conv_hr"), 0.2)
        theirs = t_conv(y, sd, "conv_last").permute(0, 2, 3, 1).numpy()

    assert ours.shape == theirs.shape == (1, 48, 48, 3)
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_bare_hat_import(rng):
    """A HAT checkpoint without the hybrid wrapper imports, applies, and
    matches the hybrid test's torch stage-2 re-expression."""
    from superresolution_tpu.models.convert import detect_and_import
    from superresolution_tpu.models.factory import build_from_config
    from superresolution_tpu.utils.config import ModelConfig

    hyb = _make_state_dict(rng)
    sd = {k[len("stage2."):]: v for k, v in hyb.items()
          if k.startswith("stage2.")}
    variables, cfg = detect_and_import(sd)
    assert cfg["name"] == "hat_lite" and cfg["scale"] == 2
    assert cfg["kwargs"]["window_size"] == WS
    model = build_from_config(ModelConfig(**cfg))
    x = rng.random((1, 16, 16, 1), dtype=np.float32)

    import jax.numpy as jnp

    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        theirs = torch_stage2(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            {f"stage2.{k}": v for k, v in sd.items()},
        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_bare_hat_import_x4_and_x3_upsample(rng):
    """HAT's Upsample Sequential has convs at even indices: x4 carries
    TWO convs (upsample.0/upsample.2) and x3 ONE 9x conv — the import
    must map all of them and detect the right total scale."""
    from superresolution_tpu.models.convert import detect_and_import
    from superresolution_tpu.models.factory import build_from_config
    from superresolution_tpu.utils.config import ModelConfig

    import jax.numpy as jnp

    hyb = _make_state_dict(rng)
    base = {k[len("stage2."):]: v for k, v in hyb.items()
            if k.startswith("stage2.")}

    # x4: a second [4nf, nf] conv at Sequential index 2
    sd4 = dict(base)
    sd4["upsample.2.weight"] = rng.standard_normal(
        (4 * NF, NF, 3, 3)).astype(np.float32) * 0.05
    sd4["upsample.2.bias"] = np.zeros(4 * NF, np.float32)
    variables, cfg = detect_and_import(sd4)
    assert cfg["scale"] == 4
    up = variables["params"]["PixelShuffleUpsampler_0"]
    assert set(up) == {"Conv_0", "Conv_1"}
    model = build_from_config(ModelConfig(**cfg))
    x = rng.random((1, 16, 16, 1), dtype=np.float32)
    out = model.apply(variables, jnp.asarray(x))
    assert out.shape == (1, 64, 64, 1)

    # x3: ONE conv at 9x width
    sd3 = dict(base)
    sd3["upsample.0.weight"] = rng.standard_normal(
        (9 * NF, NF, 3, 3)).astype(np.float32) * 0.05
    sd3["upsample.0.bias"] = np.zeros(9 * NF, np.float32)
    variables, cfg = detect_and_import(sd3)
    assert cfg["scale"] == 3
    model = build_from_config(ModelConfig(**cfg))
    out = model.apply(variables, jnp.asarray(x))
    assert out.shape == (1, 48, 48, 1)


def test_plain_rrdbnet_x2plus_import(rng):
    """BasicSR scale-2 convention (pixel-unshuffled 12-channel
    conv_first): the import must detect scale 2 + pixel_unshuffle_input,
    not report a 12-channel x4 model."""
    from superresolution_tpu.models.convert import detect_and_import
    from superresolution_tpu.models.factory import build_from_config
    from superresolution_tpu.utils.config import ModelConfig

    import jax.numpy as jnp

    f, g, nb = 8, 4, 1

    def conv(sd, name, cout, cin):
        sd[f"{name}.weight"] = rng.standard_normal(
            (cout, cin, 3, 3)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    sd = {}
    conv(sd, "conv_first", f, 12)  # 3ch x pixel_unshuffle(2)
    for d in range(1, 4):
        for c in range(1, 6):
            cin = f + (c - 1) * g
            cout = g if c < 5 else f
            conv(sd, f"body.0.rdb{d}.conv{c}", cout, cin)
    conv(sd, "conv_body", f, f)
    conv(sd, "conv_up1", f, f)
    conv(sd, "conv_up2", f, f)
    conv(sd, "conv_hr", f, f)
    conv(sd, "conv_last", 3, f)
    variables, cfg = detect_and_import(sd)
    assert cfg["scale"] == 2 and cfg["in_channels"] == 3
    assert cfg["kwargs"]["pixel_unshuffle_input"] == 2
    model = build_from_config(ModelConfig(**cfg))
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    out = model.apply(variables, jnp.asarray(x))
    assert out.shape == (1, 32, 32, 3)
