"""Deploy-time x4 tail fully in phase space — conv_hr and conv_last
run as Pallas phase-gathered dots at LR resolution.

Extends infer/folded_tail.py (which already folds the stage-2 conv to
LR): the remaining 4x-resolution work — conv_hr (120 ms), conv_last
(115 ms, N=3) and the 64-lane d2s(4) interleave (31 ms) on the bench
frame (benchmarks/exp_r8b_tail.py) — moves to LR-resolution MXU dots
at measured 169 / 65 TF/s (ops/pallas_phase_tail.py). Only a 3-channel
interleave remains at 4x.

Same contract as make_folded_tail: tail_fn(feat [B,H,W,C]) ->
[B,4H,4W,out], exact on the same weights up to fp reassociation
(tests/test_phase_tail.py proves equivalence to the folded tail).

Reference: ESRGAN RRDBNet upsampling head (BASELINE config 4) — this
module is TPU deployment engineering with no reference counterpart.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from superresolution_tpu.infer.folded_tail import (
    _conv,
    _lrelu,
    fold_stage2_kernel,
)
from superresolution_tpu.ops.pallas_phase_tail import (
    PAD,
    pack_width,
    phase_hr_last,
)
from superresolution_tpu.ops.pixel_shuffle import depth_to_space


def make_phase_tail(params, clip: bool = True, rb=None, interpret=None):
    """Build tail_fn from standard RRDBNet(pixelshuffle, scale=4) params."""
    p = params["params"] if "params" in params else params
    up1 = p["up"]["Conv_0"]["Conv_0"]
    up2 = p["up"]["Conv_1"]["Conv_0"]
    hr = p["conv_hr"]["Conv_0"]
    last = p["conv_last"]["Conv_0"]
    kf = jnp.asarray(fold_stage2_kernel(np.asarray(up2["kernel"],
                                                   np.float32)))
    c = np.asarray(up1["kernel"]).shape[2]
    cout = np.asarray(last["kernel"]).shape[3]

    def tail_fn(feat: jnp.ndarray) -> jnp.ndarray:
        interp = (jax.default_backend() != "tpu"
                  if interpret is None else interpret)
        z1 = _lrelu(_conv(feat, jnp.asarray(up1["kernel"]),
                          jnp.asarray(up1["bias"])))  # [B,H,W,4C] phases
        ys = []
        for i1 in (0, 1):
            for j1 in (0, 1):
                zp = jnp.pad(z1, ((0, 0), (1 - i1, i1), (1 - j1, j1),
                                  (0, 0)))
                y = _conv(zp, kf[i1, j1], jnp.asarray(up2["bias"]),
                          padding="VALID")
                ys.append(_lrelu(y))  # [B,H,W,4C]: f*4 + i2*2 + j2
        bsz, h, w, _ = z1.shape
        t = jnp.stack(ys, axis=3)  # [B,H,W, i1*2+j1, 4C]
        t = t.reshape(bsz, h, w, 2, 2, c, 2, 2)  # i1, j1, f, i2, j2
        # phase-major: channel = (py*4+px)*C + f, py=i1*2+i2, px=j1*2+j2
        t = t.transpose(0, 1, 2, 3, 6, 4, 7, 5)
        z2pm = t.reshape(bsz, h, w, 16 * c)
        wp = pack_width(w)
        z2pm = jnp.pad(z2pm, ((0, 0), (0, 0), (PAD, wp - w - PAD),
                              (0, 0)))
        # The barrier is load-bearing: without it XLA fuses the
        # phase-packing transpose into the pallas operand and the TPU
        # backend ABORTS at runtime (measured; kernels alone and
        # prologue alone are both fine). Forcing materialization
        # restores the default operand layout Mosaic expects.
        z2pm = jax.lax.optimization_barrier(z2pm)
        out = phase_hr_last(z2pm, hr["kernel"], hr["bias"],
                            last["kernel"], last["bias"], width=w,
                            interpret=interp, rb=rb)
        out = out[:, :, PAD:PAD + w]  # [B,H,W,16*cout]: (a*4+b)*cout+c
        # d2s(4) expects channel = c*16 + a*4 + b
        o = out.reshape(bsz, h, w, 16, cout).transpose(0, 1, 2, 4, 3)
        y = depth_to_space(o.reshape(bsz, h, w, 16 * cout), 4)
        return jnp.clip(y, 0.0, 1.0) if clip else y

    return tail_fn
