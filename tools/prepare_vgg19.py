#!/usr/bin/env python
"""One-command VGG19 weight prep for the perceptual loss.

The reference's Backup loss uses torchvision's pretrained VGG19
(reference: Backup/src/losses.py:27). This image has zero egress, so
losses/perceptual.py falls back to a fixed-seed random init; the day a
network (or a local torchvision cache) exists, run

    python tools/prepare_vgg19.py --out vgg19_features.npz
    export SRTPU_VGG19_NPZ=$PWD/vgg19_features.npz

and every perceptual-loss preset (esrgan_gan, hybrid_astro_prod) trains
against the real critic. The .npz holds torchvision's layout verbatim
('features.N.weight'/'features.N.bias', torch OIHW) — exactly what
losses/perceptual.load-time conversion expects — so the artifact is
byte-auditable against upstream.

Offline use: --from-state-dict accepts an already-downloaded
vgg19-dcbb9e9d.pth (torch hub cache file) and never touches the net.
"""

from __future__ import annotations

import argparse
import hashlib
import sys

import numpy as np

# sha256 of the canonical torchvision checkpoint (VGG19_Weights.DEFAULT,
# vgg19-dcbb9e9d.pth — the 'dcbb9e9d' infix is the first 8 hex chars of
# its sha256, torch hub's integrity convention)
TORCH_HUB_SHA256_PREFIX = "dcbb9e9d"


def state_dict_to_npz(state_dict, out_path: str) -> dict:
    """Write features.* conv tensors to .npz; returns a manifest."""
    arrays = {}
    for key, tensor in state_dict.items():
        if not key.startswith("features."):
            continue
        arr = np.asarray(tensor.detach().cpu().numpy()
                         if hasattr(tensor, "detach") else tensor,
                         dtype=np.float32)
        arrays[key] = arr
    if not arrays:
        raise ValueError("no features.* tensors found in the state dict")
    np.savez(out_path, **arrays)
    digest = hashlib.sha256()
    for key in sorted(arrays):
        digest.update(key.encode())
        digest.update(arrays[key].tobytes())
    return {"tensors": len(arrays), "content_sha256": digest.hexdigest()}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="vgg19_features.npz")
    ap.add_argument("--from-state-dict", default="",
                    help="path to a local vgg19-*.pth (skip download)")
    args = ap.parse_args(argv)

    if args.from_state_dict:
        import torch

        sd = torch.load(args.from_state_dict, map_location="cpu",
                        weights_only=True)
        src = args.from_state_dict
        if TORCH_HUB_SHA256_PREFIX not in args.from_state_dict:
            print("note: filename does not carry the canonical torch-hub"
                  f" sha prefix {TORCH_HUB_SHA256_PREFIX!r}; verify the"
                  " source", file=sys.stderr)
    else:
        try:
            from torchvision.models import VGG19_Weights, vgg19
        except ImportError:
            print("error: torchvision unavailable and no"
                  " --from-state-dict given", file=sys.stderr)
            return 2
        sd = vgg19(weights=VGG19_Weights.DEFAULT).state_dict()
        src = "torchvision VGG19_Weights.DEFAULT"

    manifest = state_dict_to_npz(sd, args.out)
    print(f"wrote {args.out}: {manifest['tensors']} tensors from {src}\n"
          f"content sha256: {manifest['content_sha256']}\n"
          f"export SRTPU_VGG19_NPZ={args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
