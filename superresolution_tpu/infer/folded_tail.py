"""Deploy-time folded x4 sub-pixel tail.

The standard RRDBNet pixelshuffle tail is

    conv1(64->256) -> d2s(2) -> lrelu -> conv2(64->256)@2x -> d2s(2)
    -> lrelu -> conv_hr@4x -> lrelu -> conv_last@4x

Measured on v5e, the two intermediate depth_to_space layout copies cost
more than the convs they feed (28 ms vs 19 ms per 15-tile batch for the
first one alone), and conv2 runs at 4x the pixel count in the slow
K=9*64 regime. This module rewrites the SAME weights at deployment:

  * lrelu commutes with depth_to_space (elementwise), so conv2 can be
    evaluated in *phase space* at LR resolution: each of its 4 output
    phases (a, b) is an independent 2x2 conv over the 256-lane phase
    layout (K = 2*2*256 = 1024 — the fast MXU regime), with the kernel
    derived from the standard 3x3 conv2 kernel by the exact sub-pixel
    index transform below;
  * the two d2s(2) stages collapse into ONE final d2s(4) from the
    composite 1024-lane phase layout.

1.78x the conv2 FLOPs (the 2x2 phase kernel covers a 4x4 input footprint
of which 3x3 is used), bought at ~2.5x the rate plus two eliminated
layout copies. Exact: outputs equal the standard tail up to fp
reassociation (tests/test_folded_tail.py).

Reference for the tail it folds: ESRGAN RRDBNet upsampling head
(BASELINE config 4); the module itself has no reference counterpart —
it is TPU deployment engineering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from superresolution_tpu.infer.common import conv_nhwc as _conv
from superresolution_tpu.ops.pixel_shuffle import depth_to_space


def _lrelu(x, slope=0.2):
    return jnp.where(x >= 0, x, jnp.asarray(slope, x.dtype) * x)


def fold_stage2_kernel(k3: np.ndarray) -> np.ndarray:
    """Standard stage-2 kernel [3,3,C,C*4] (applied at 2x resolution after
    d2s(2)) -> phase kernels [2,2,2,2,C*4,C*4] indexed [a,b,di,dj,cin,cout]
    where cin = f*4 + i1*2 + j1 is the stage-1 phase layout.

    Derivation: output position (2I+a, 2J+b) at 2x reads input rows
    2I+a+dy; with i1 = (a+dy) % 2 the source phase, the source LR row is
    I - 1 + di + a... concretely dy -> (i1, di): di = (a+dy-i1)//2 + 1 - a,
    valid di in {0, 1} (pad (1-a, a) + VALID 2x2 aligns them).
    """
    kh, kw, c, cout = k3.shape
    assert (kh, kw) == (3, 3)
    kf = np.zeros((2, 2, 2, 2, 4 * c, cout), k3.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for dy in (-1, 0, 1):
                i1 = (a + dy) % 2
                di = (a + dy - i1) // 2 + 1 - a
                for dx in (-1, 0, 1):
                    j1 = (b + dx) % 2
                    dj = (b + dx - j1) // 2 + 1 - b
                    for f in range(c):
                        kf[a, b, di, dj, f * 4 + i1 * 2 + j1] = \
                            k3[dy + 1, dx + 1, f]
    return kf


def make_folded_tail(params, clip: bool = True):
    """Build tail_fn(feat[B,H,W,C]) -> [B,4H,4W,out] from standard
    RRDBNet(upsampler='pixelshuffle', scale=4) params — a deploy-time
    kernel rewrite, no retraining/conversion of checkpoints."""
    p = params["params"] if "params" in params else params
    up1 = p["up"]["Conv_0"]["Conv_0"]
    up2 = p["up"]["Conv_1"]["Conv_0"]
    hr = p["conv_hr"]["Conv_0"]
    last = p["conv_last"]["Conv_0"]
    kf = jnp.asarray(fold_stage2_kernel(np.asarray(up2["kernel"],
                                                   np.float32)))
    c = np.asarray(up1["kernel"]).shape[2]

    def tail_fn(feat: jnp.ndarray) -> jnp.ndarray:
        z1 = _lrelu(_conv(feat, jnp.asarray(up1["kernel"]),
                          jnp.asarray(up1["bias"])))  # [B,H,W,4C] phases
        phases = []
        for a in (0, 1):
            row = []
            for b in (0, 1):
                zp = jnp.pad(z1, ((0, 0), (1 - a, a), (1 - b, b), (0, 0)))
                y = _conv(zp, kf[a, b], jnp.asarray(up2["bias"]),
                          padding="VALID")
                row.append(_lrelu(y))
            phases.append(row)
        bsz, h, w, _ = z1.shape
        # [i1][j1] of [B,H,W, f*4+i2*2+j2] -> composite phase layout
        # f*16 + i1*8 + i2*4 + j1*2 + j2 == d2s(4) channel convention
        z2 = jnp.stack([jnp.stack(r, axis=3) for r in phases], axis=3)
        z2 = z2.reshape(bsz, h, w, 2, 2, c, 2, 2)  # [.., i1, j1, f, i2, j2]
        z2 = z2.transpose(0, 1, 2, 5, 3, 6, 4, 7)  # [.., f, i1, i2, j1, j2]
        y = depth_to_space(z2.reshape(bsz, h, w, 16 * c), 4)  # [B,4H,4W,C]
        y = _lrelu(_conv(y, jnp.asarray(hr["kernel"]),
                         jnp.asarray(hr["bias"])))
        y = _conv(y, jnp.asarray(last["kernel"]), jnp.asarray(last["bias"]))
        return jnp.clip(y, 0.0, 1.0) if clip else y

    return tail_fn
