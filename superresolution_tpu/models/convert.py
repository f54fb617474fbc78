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
