"""Weight conversion: BasicSR/ESRGAN-convention RRDBNet state dicts <-> this
framework's RRDBNet parameter tree.

A user of the reference ecosystem holds `.pth` state dicts with keys like

    conv_first.weight                          [64, in, 3, 3]  (OIHW)
    body.{i}.rdb{1,2,3}.conv{1..5}.weight      dense-block convs
    conv_body.weight                           trunk conv
    conv_up1 / conv_up2 / conv_hr / conv_last  nearest-conv upsampler

`import_rrdbnet_numpy` maps such a dict (as numpy arrays — load the .pth
with torch and call .numpy(), no torch needed here) onto our RRDBNet in ANY
configuration: per-block or scan-stacked (leading 23-axis), plain or
fused-projection dense blocks (the wide-conv re-layout is the exact linear
split proven equivalent in tests/test_fused_dense.py).
`export_rrdbnet_numpy` is the inverse (from a plain/unstacked param tree).
"""

from __future__ import annotations

import numpy as np


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _hwio_to_oihw(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (3, 2, 0, 1))


def _fuse_dense(ks: list[np.ndarray], bs: list[np.ndarray], c: int, g: int):
    """Split/concat the 5 plain dense-block convs (HWIO) into the
    FusedDenseBlock layout (see models/rrdbnet.py)."""

    def seg(k, j):
        lo = c + (j - 1) * g if j else 0
        hi = lo + (g if j else c)
        return k[:, :, lo:hi, :]

    return {
        "Conv_0": {"Conv_0": {
            "kernel": np.concatenate([seg(ks[i], 0) for i in range(5)], -1),
            "bias": np.concatenate(bs, -1)}},
        "proj_y1": {"kernel": np.concatenate(
            [seg(ks[i], 1) for i in range(1, 5)], -1)},
        "proj_y2": {"kernel": np.concatenate(
            [seg(ks[i], 2) for i in range(2, 5)], -1)},
        "proj_y3": {"kernel": np.concatenate(
            [seg(ks[i], 3) for i in range(3, 5)], -1)},
        "proj_y4": {"kernel": seg(ks[4], 4)},
    }


def _plain_dense(ks, bs):
    return {f"Conv_{i}": {"Conv_0": {"kernel": ks[i], "bias": bs[i]}}
            for i in range(5)}


def import_rrdbnet_numpy(sd: dict[str, np.ndarray], *, num_blocks: int = 23,
                         features: int = 64, growth: int = 32,
                         scan_blocks: bool = True,
                         fused_dense: bool = True) -> dict:
    """BasicSR-style numpy state dict -> {'params': ...} for our RRDBNet
    (upsampler='nearest_conv', the ESRGAN configuration)."""
    c, g = features, growth

    def conv(name):
        return {"kernel": _oihw_to_hwio(np.asarray(sd[f"{name}.weight"])),
                "bias": np.asarray(sd[f"{name}.bias"])}

    def dense(i, rdb):
        ks, bs = [], []
        for j in range(1, 6):
            p = conv(f"body.{i}.rdb{rdb}.conv{j}")
            ks.append(p["kernel"])
            bs.append(p["bias"])
        return _fuse_dense(ks, bs, c, g) if fused_dense else _plain_dense(ks, bs)

    blocks = []
    for i in range(num_blocks):
        blocks.append({f"FusedDenseBlock_{k}" if fused_dense
                       else f"DenseBlock_{k}": dense(i, k + 1)
                       for k in range(3)})

    if scan_blocks:
        stacked = _stack_trees(blocks)
        body = {"RRDB_0": stacked}
    else:
        body = None  # handled below as body_blocks_{i}

    params: dict = {
        "conv_first": {"Conv_0": conv("conv_first")},
        "trunk_conv": {"Conv_0": conv("conv_body")},
        "up": {"Conv_0": {"Conv_0": conv("conv_up1")},
               "Conv_1": {"Conv_0": conv("conv_up2")}},
        "conv_hr": {"Conv_0": conv("conv_hr")},
        "conv_last": {"Conv_0": conv("conv_last")},
    }
    if scan_blocks:
        params["body"] = body
    else:
        for i, blk in enumerate(blocks):
            params[f"body_blocks_{i}"] = blk
    return {"params": params}


def _stack_trees(trees: list[dict]) -> dict:
    """Stack a list of identical pytrees along a new leading axis."""
    first = trees[0]
    if isinstance(first, dict):
        return {k: _stack_trees([t[k] for t in trees]) for k in first}
    return np.stack(trees)


def export_rrdbnet_numpy(params: dict, *, num_blocks: int = 23,
                         features: int = 64,
                         growth: int = 32) -> dict[str, np.ndarray]:
    """Our PLAIN (scan_blocks=False, fused_dense=False) RRDBNet params ->
    BasicSR-style numpy state dict (OIHW)."""
    p = params["params"] if "params" in params else params
    sd: dict[str, np.ndarray] = {}

    def put(name, node):
        sd[f"{name}.weight"] = _hwio_to_oihw(np.asarray(node["kernel"]))
        sd[f"{name}.bias"] = np.asarray(node["bias"])

    put("conv_first", p["conv_first"]["Conv_0"])
    put("conv_body", p["trunk_conv"]["Conv_0"])
    put("conv_up1", p["up"]["Conv_0"]["Conv_0"])
    put("conv_up2", p["up"]["Conv_1"]["Conv_0"])
    put("conv_hr", p["conv_hr"]["Conv_0"])
    put("conv_last", p["conv_last"]["Conv_0"])
    for i in range(num_blocks):
        blk = p[f"body_blocks_{i}"]
        for k in range(3):
            db = blk[f"DenseBlock_{k}"]
            for j in range(5):
                put(f"body.{i}.rdb{k + 1}.conv{j + 1}",
                    db[f"Conv_{j}"]["Conv_0"])
    return sd


# ---------------------------------------------------------------------------
# Reference hybrid (stage1 RRDBNet + stage2 HAT) checkpoint interop
# ---------------------------------------------------------------------------
#
# A reference-trained hybrid `best.pth` carries `stage1.*` keys in the
# BasicSR RRDBNet convention (scale-2 variant: pixel-unshuffled input,
# conv_first sees in*4 channels) and `stage2.*` keys in the HAT convention
# (reference scripts/Modello_4.py:45-49 probes stage1.conv_first.weight;
# src/architecture.py:30-82 builds the two stages). These functions map
# that layout onto HybridSR(RRDBNet(pixel_unshuffle_input=2),
# HATLite(hat_compat=True)).


def _lin(sd, name):
    """torch Linear -> flax Dense kernel/bias."""
    out = {"kernel": np.asarray(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _ln(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _conv(sd, name):
    return {"Conv_0": {
        "kernel": _oihw_to_hwio(np.asarray(sd[f"{name}.weight"])),
        "bias": np.asarray(sd[f"{name}.bias"])}}


def _hab_block(sd, pre):
    """One HAT HAB block -> our HABlock param subtree."""
    qkv = _lin(sd, f"{pre}.attn.qkv")
    se1 = np.asarray(sd[f"{pre}.conv_block.cab.3.attention.1.weight"])
    se2 = np.asarray(sd[f"{pre}.conv_block.cab.3.attention.3.weight"])
    return {
        "LayerNorm_0": _ln(sd, f"{pre}.norm1"),
        "ChannelAttentionBlock_0": {
            "Conv_0": _conv(sd, f"{pre}.conv_block.cab.0"),
            "Conv_1": _conv(sd, f"{pre}.conv_block.cab.2"),
            # 1x1 SE convs [out,in,1,1] <-> Dense [in,out]
            "Dense_0": {"kernel": se1[:, :, 0, 0].T,
                        "bias": np.asarray(
                            sd[f"{pre}.conv_block.cab.3.attention.1.bias"])},
            "Dense_1": {"kernel": se2[:, :, 0, 0].T,
                        "bias": np.asarray(
                            sd[f"{pre}.conv_block.cab.3.attention.3.bias"])},
        },
        "WindowAttention_0": {
            "Dense_0": qkv,
            "Dense_1": _lin(sd, f"{pre}.attn.proj"),
            "rel_pos_bias": np.asarray(
                sd[f"{pre}.attn.relative_position_bias_table"]),
        },
        "LayerNorm_1": _ln(sd, f"{pre}.norm2"),
        "Dense_0": _lin(sd, f"{pre}.mlp.fc1"),
        "Dense_1": _lin(sd, f"{pre}.mlp.fc2"),
    }


def _ocab(sd, pre, dim):
    """HAT OCAB (packed qkv) -> our OverlappingCrossAttention subtree."""
    wq = np.asarray(sd[f"{pre}.qkv.weight"])  # [3C, C]
    bq = np.asarray(sd[f"{pre}.qkv.bias"])
    return {
        "LayerNorm_0": _ln(sd, f"{pre}.norm1"),
        "Dense_0": {"kernel": wq[dim:].T, "bias": bq[dim:]},  # kv
        "Dense_1": {"kernel": wq[:dim].T, "bias": bq[:dim]},  # q
        "rel_pos_bias_oca": np.asarray(
            sd[f"{pre}.relative_position_bias_table"]),
        "Dense_2": _lin(sd, f"{pre}.proj"),
        "LayerNorm_1": _ln(sd, f"{pre}.norm2"),
        "Dense_3": _lin(sd, f"{pre}.mlp.fc1"),
        "Dense_4": _lin(sd, f"{pre}.mlp.fc2"),
    }


def import_hat_numpy(sd: dict[str, np.ndarray], *, embed_dim: int = 96,
                     depths=(6, 6, 6, 6), prefix: str = "") -> dict:
    """HAT-convention numpy state dict -> params for
    HATLite(hat_compat=True, scan_blocks=True)."""
    p = prefix
    groups = []
    for g in range(len(depths)):
        pairs = [
            {"HABlock_0": _hab_block(sd, f"{p}layers.{g}.residual_group"
                                         f".blocks.{2 * i}"),
             "HABlock_1": _hab_block(sd, f"{p}layers.{g}.residual_group"
                                         f".blocks.{2 * i + 1}")}
            for i in range(depths[g] // 2)]
        groups.append({
            "hab_pairs": _stack_trees(pairs),
            "OverlappingCrossAttention_0": _ocab(
                sd, f"{p}layers.{g}.overlap_attn", embed_dim),
            "Conv_0": _conv(sd, f"{p}layers.{g}.conv"),
        })
    params = {
        "Conv_0": _conv(sd, f"{p}conv_first"),
        "norm_embed": _ln(sd, f"{p}patch_embed.norm"),
        "groups": {"ResidualGroup_0": _stack_trees(groups)},
        "norm_body": _ln(sd, f"{p}norm"),
        "Conv_1": _conv(sd, f"{p}conv_after_body"),
        "conv_before_upsample": _conv(sd, f"{p}conv_before_upsample.0"),
        # HAT's Upsample is Sequential([Conv, PixelShuffle] per stage):
        # convs sit at even indices; our PixelShuffleUpsampler names its
        # per-stage convs Conv_0, Conv_1, ... (x4 has TWO convs)
        "PixelShuffleUpsampler_0": {
            f"Conv_{j}": _conv(sd, f"{p}upsample.{2 * j}")
            for j in range(_count_upsample_convs(sd, p))},
        "Conv_2": _conv(sd, f"{p}conv_last"),
    }
    return params


def _count_upsample_convs(sd, prefix: str) -> int:
    j = 0
    while f"{prefix}upsample.{2 * j}.weight" in sd:
        j += 1
    return j


def _upsample_scale(sd, prefix: str) -> int:
    """Total scale of a HAT/BasicSR Upsample Sequential: the per-stage
    factor is sqrt(out/in) of each conv (x3 is ONE conv at 9x, not 2^n
    convs — counting convs mis-detects it)."""
    total = 1
    for j in range(_count_upsample_convs(sd, prefix)):
        w = np.asarray(sd[f"{prefix}upsample.{2 * j}.weight"])
        total *= int(round((w.shape[0] / w.shape[1]) ** 0.5))
    return total


def import_hybrid_numpy(sd: dict[str, np.ndarray], *, num_blocks: int = 23,
                        features: int = 64, growth: int = 32,
                        embed_dim: int = 96, depths=(6, 6, 6, 6),
                        scan_blocks: bool = True,
                        fused_dense: bool = True) -> dict:
    """Reference-hybrid state dict (stage1.* BasicSR RRDBNet scale-2 +
    stage2.* HAT) -> {'params': {'stage1': ..., 'stage2': ...}} for
    HybridSR(RRDBNet(..., pixel_unshuffle_input=2, upsampler=
    'nearest_conv'), HATLite(..., hat_compat=True))."""
    s1 = {k[len("stage1."):]: v for k, v in sd.items()
          if k.startswith("stage1.")}
    stage1 = import_rrdbnet_numpy(
        s1, num_blocks=num_blocks, features=features, growth=growth,
        scan_blocks=scan_blocks, fused_dense=fused_dense)["params"]
    stage2 = import_hat_numpy(sd, embed_dim=embed_dim, depths=depths,
                              prefix="stage2.")
    return {"params": {"stage1": stage1, "stage2": stage2}}


# --- inverses: our params -> reference-layout numpy state dicts -----------


def _unstack_trees(tree, n: int) -> list[dict]:
    """Inverse of _stack_trees: split the leading axis into n pytrees."""
    if isinstance(tree, dict):
        subs = {k: _unstack_trees(v, n) for k, v in tree.items()}
        return [{k: subs[k][i] for k in tree} for i in range(n)]
    return [np.asarray(tree)[i] for i in range(n)]


def _unfuse_dense(fd: dict, c: int, g: int):
    """Inverse of _fuse_dense: fused wide-conv params -> the 5 plain
    dense-block conv (kernel HWIO, bias) pairs."""
    px = np.asarray(fd["Conv_0"]["Conv_0"]["kernel"])
    pb = np.asarray(fd["Conv_0"]["Conv_0"]["bias"])
    p1 = np.asarray(fd["proj_y1"]["kernel"])
    p2 = np.asarray(fd["proj_y2"]["kernel"])
    p3 = np.asarray(fd["proj_y3"]["kernel"])
    p4 = np.asarray(fd["proj_y4"]["kernel"])
    ks = [
        px[..., 0:g],
        np.concatenate([px[..., g:2 * g], p1[..., 0:g]], axis=2),
        np.concatenate([px[..., 2 * g:3 * g], p1[..., g:2 * g],
                        p2[..., 0:g]], axis=2),
        np.concatenate([px[..., 3 * g:4 * g], p1[..., 2 * g:3 * g],
                        p2[..., g:2 * g], p3[..., 0:g]], axis=2),
        np.concatenate([px[..., 4 * g:], p1[..., 3 * g:], p2[..., 2 * g:],
                        p3[..., g:], p4], axis=2),
    ]
    bs = [pb[0:g], pb[g:2 * g], pb[2 * g:3 * g], pb[3 * g:4 * g], pb[4 * g:]]
    return ks, bs


def export_hybrid_numpy(params: dict, *, num_blocks: int = 23,
                        features: int = 64, growth: int = 32,
                        embed_dim: int = 96,
                        depths=(6, 6, 6, 6)) -> dict[str, np.ndarray]:
    """Inverse of import_hybrid_numpy (scan-stacked, fused-dense params ->
    reference stage1./stage2. state dict). Bit-exact round-trip: every
    mapping is a transpose/concat/split."""
    p = params["params"] if "params" in params else params
    sd: dict[str, np.ndarray] = {}
    c, g = features, growth

    def put_conv(name, node):
        sd[f"{name}.weight"] = _hwio_to_oihw(np.asarray(node["Conv_0"]["kernel"]))
        sd[f"{name}.bias"] = np.asarray(node["Conv_0"]["bias"])

    def put_lin(name, node):
        sd[f"{name}.weight"] = np.asarray(node["kernel"]).T
        if "bias" in node:
            sd[f"{name}.bias"] = np.asarray(node["bias"])

    def put_ln(name, node):
        sd[f"{name}.weight"] = np.asarray(node["scale"])
        sd[f"{name}.bias"] = np.asarray(node["bias"])

    # ---- stage1 (BasicSR RRDBNet layout) ----
    s1 = p["stage1"]
    put_conv("stage1.conv_first", s1["conv_first"])
    put_conv("stage1.conv_body", s1["trunk_conv"])
    put_conv("stage1.conv_up1", s1["up"]["Conv_0"])
    put_conv("stage1.conv_up2", s1["up"]["Conv_1"])
    put_conv("stage1.conv_hr", s1["conv_hr"])
    put_conv("stage1.conv_last", s1["conv_last"])
    blocks = _unstack_trees(s1["body"]["RRDB_0"], num_blocks)
    for i, blk in enumerate(blocks):
        for k in range(3):
            ks, bs = _unfuse_dense(blk[f"FusedDenseBlock_{k}"], c, g)
            for j in range(5):
                sd[f"stage1.body.{i}.rdb{k + 1}.conv{j + 1}.weight"] = \
                    _hwio_to_oihw(ks[j])
                sd[f"stage1.body.{i}.rdb{k + 1}.conv{j + 1}.bias"] = bs[j]

    # ---- stage2 (HAT layout) ----
    s2 = p["stage2"]
    put_conv("stage2.conv_first", s2["Conv_0"])
    put_ln("stage2.patch_embed.norm", s2["norm_embed"])
    put_ln("stage2.norm", s2["norm_body"])
    put_conv("stage2.conv_after_body", s2["Conv_1"])
    put_conv("stage2.conv_before_upsample.0", s2["conv_before_upsample"])
    put_conv("stage2.upsample.0", s2["PixelShuffleUpsampler_0"]["Conv_0"])
    put_conv("stage2.conv_last", s2["Conv_2"])
    groups = _unstack_trees(s2["groups"]["ResidualGroup_0"], len(depths))
    for gi, grp in enumerate(groups):
        pairs = _unstack_trees(grp["hab_pairs"], depths[gi] // 2)
        for pi, pair in enumerate(pairs):
            for half in (0, 1):
                b = 2 * pi + half
                hb = pair[f"HABlock_{half}"]
                pre = f"stage2.layers.{gi}.residual_group.blocks.{b}"
                put_ln(f"{pre}.norm1", hb["LayerNorm_0"])
                put_ln(f"{pre}.norm2", hb["LayerNorm_1"])
                wa = hb["WindowAttention_0"]
                put_lin(f"{pre}.attn.qkv", wa["Dense_0"])
                put_lin(f"{pre}.attn.proj", wa["Dense_1"])
                sd[f"{pre}.attn.relative_position_bias_table"] = \
                    np.asarray(wa["rel_pos_bias"])
                cab = hb["ChannelAttentionBlock_0"]
                put_conv(f"{pre}.conv_block.cab.0", cab["Conv_0"])
                put_conv(f"{pre}.conv_block.cab.2", cab["Conv_1"])
                sd[f"{pre}.conv_block.cab.3.attention.1.weight"] = \
                    np.asarray(cab["Dense_0"]["kernel"]).T[:, :, None, None]
                sd[f"{pre}.conv_block.cab.3.attention.1.bias"] = \
                    np.asarray(cab["Dense_0"]["bias"])
                sd[f"{pre}.conv_block.cab.3.attention.3.weight"] = \
                    np.asarray(cab["Dense_1"]["kernel"]).T[:, :, None, None]
                sd[f"{pre}.conv_block.cab.3.attention.3.bias"] = \
                    np.asarray(cab["Dense_1"]["bias"])
                put_lin(f"{pre}.mlp.fc1", hb["Dense_0"])
                put_lin(f"{pre}.mlp.fc2", hb["Dense_1"])
        oc = grp["OverlappingCrossAttention_0"]
        pre = f"stage2.layers.{gi}.overlap_attn"
        put_ln(f"{pre}.norm1", oc["LayerNorm_0"])
        put_ln(f"{pre}.norm2", oc["LayerNorm_1"])
        sd[f"{pre}.qkv.weight"] = np.concatenate(
            [np.asarray(oc["Dense_1"]["kernel"]).T,
             np.asarray(oc["Dense_0"]["kernel"]).T], axis=0)
        sd[f"{pre}.qkv.bias"] = np.concatenate(
            [np.asarray(oc["Dense_1"]["bias"]),
             np.asarray(oc["Dense_0"]["bias"])])
        sd[f"{pre}.relative_position_bias_table"] = \
            np.asarray(oc["rel_pos_bias_oca"])
        put_lin(f"{pre}.proj", oc["Dense_2"])
        put_lin(f"{pre}.mlp.fc1", oc["Dense_3"])
        put_lin(f"{pre}.mlp.fc2", oc["Dense_4"])
        put_conv(f"stage2.layers.{gi}.conv", grp["Conv_0"])
    return sd


def detect_and_import(sd: dict[str, np.ndarray]):
    """Infer the architecture of a reference-ecosystem state dict and
    import it. Returns (variables, model_config_dict) where the config
    dict matches utils.config.ModelConfig fields (consumable by
    models.factory.build_from_config and the checkpoint contract).

    Handles: BasicSR ESRGAN RRDBNet dicts (conv_first/body.*/conv_up*)
    and the reference hybrid (stage1.* RRDBNet scale-2 + stage2.* HAT —
    reference scripts/Modello_4.py:45-49)."""
    if any(k.startswith("stage1.") for k in sd):
        cf = np.asarray(sd["stage1.conv_first.weight"])  # [C, in*u^2, 3, 3]
        features = cf.shape[0]
        num_blocks = 1 + max(int(k.split(".")[2]) for k in sd
                             if k.startswith("stage1.body."))
        growth = np.asarray(sd["stage1.body.0.rdb1.conv1.weight"]).shape[0]
        u = 2  # BasicSR scale-2 convention: pixel-unshuffled input
        in_ch = cf.shape[1] // (u * u)
        embed_dim = np.asarray(sd["stage2.conv_first.weight"]).shape[0]
        n_groups = 1 + max(int(k.split(".")[2]) for k in sd
                           if k.startswith("stage2.layers."))
        depth = 1 + max(
            int(k.split(".")[5]) for k in sd
            if k.startswith("stage2.layers.0.residual_group.blocks."))
        rpb = np.asarray(sd["stage2.layers.0.residual_group.blocks.0"
                            ".attn.relative_position_bias_table"])
        num_heads = rpb.shape[1]
        ws = (int(round(rpb.shape[0] ** 0.5)) + 1) // 2
        nf = np.asarray(sd["stage2.conv_before_upsample.0.weight"]).shape[0]
        s2_scale = _upsample_scale(sd, "stage2.")
        params = import_hybrid_numpy(
            sd, num_blocks=num_blocks, features=features, growth=growth,
            embed_dim=embed_dim, depths=(depth,) * n_groups)
        cfg = {
            "name": "rrdbnet", "scale": 2, "in_channels": in_ch,
            "out_channels": np.asarray(sd["stage1.conv_last.weight"]).shape[0],
            "kwargs": {"features": features, "num_blocks": num_blocks,
                       "growth": growth, "upsampler": "nearest_conv",
                       "pixel_unshuffle_input": u},
            "refiner": "hat_lite",
            "refiner_kwargs": {
                "scale": s2_scale, "embed_dim": embed_dim,
                "depths": (depth,) * n_groups,
                "num_heads": (num_heads,) * n_groups, "window_size": ws,
                "hat_compat": True, "upsample_feat": nf},
            "smoothing": "balanced",
        }
        return params, cfg
    if any(k.startswith("layers.") and ".residual_group." in k for k in sd):
        # bare HAT checkpoint (no hybrid wrapper)
        embed_dim = np.asarray(sd["conv_first.weight"]).shape[0]
        in_ch = np.asarray(sd["conv_first.weight"]).shape[1]
        n_groups = 1 + max(int(k.split(".")[1]) for k in sd
                           if k.startswith("layers."))
        depth = 1 + max(int(k.split(".")[4]) for k in sd
                        if k.startswith("layers.0.residual_group.blocks."))
        rpb = np.asarray(sd["layers.0.residual_group.blocks.0"
                            ".attn.relative_position_bias_table"])
        num_heads = rpb.shape[1]
        ws = (int(round(rpb.shape[0] ** 0.5)) + 1) // 2
        nf = np.asarray(sd["conv_before_upsample.0.weight"]).shape[0]
        params = {"params": import_hat_numpy(
            sd, embed_dim=embed_dim, depths=(depth,) * n_groups)}
        cfg = {
            "name": "hat_lite", "scale": _upsample_scale(sd, ""),
            "in_channels": in_ch,
            "out_channels": np.asarray(sd["conv_last.weight"]).shape[0],
            "kwargs": {"embed_dim": embed_dim, "depths": (depth,) * n_groups,
                       "num_heads": (num_heads,) * n_groups,
                       "window_size": ws, "hat_compat": True,
                       "upsample_feat": nf},
            "refiner": None, "refiner_kwargs": {}, "smoothing": None,
        }
        return params, cfg
    # plain BasicSR RRDBNet (ESRGAN). BasicSR encodes scale < 4 by
    # pixel-unshuffling the input (conv_first sees in*u^2 channels) and
    # keeping the fixed 2x2 nearest-conv upsampler: scale = 4 // u.
    cf = np.asarray(sd["conv_first.weight"])
    features = cf.shape[0]
    num_blocks = 1 + max(int(k.split(".")[1]) for k in sd
                         if k.startswith("body."))
    growth = np.asarray(sd["body.0.rdb1.conv1.weight"]).shape[0]
    params = import_rrdbnet_numpy(sd, num_blocks=num_blocks,
                                  features=features, growth=growth)
    w_in = cf.shape[1]
    # in*u^2 -> (in, u); RGB/grayscale widths are unambiguous (a genuine
    # 4/12/16/48-channel input model would be misread — not a BasicSR
    # configuration)
    u = {12: 2, 48: 4, 4: 2, 16: 4}.get(w_in, 1)
    in_ch = w_in // (u * u)
    kwargs = {"features": features, "num_blocks": num_blocks,
              "growth": growth, "upsampler": "nearest_conv"}
    if u > 1:
        kwargs["pixel_unshuffle_input"] = u
    cfg = {
        "name": "rrdbnet", "scale": 4 // u, "in_channels": in_ch,
        "out_channels": np.asarray(sd["conv_last.weight"]).shape[0],
        "kwargs": kwargs,
        "refiner": None, "refiner_kwargs": {}, "smoothing": None,
    }
    return params, cfg
