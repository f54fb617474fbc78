"""Deploy-time x4 tail fully in phase space — conv_hr and conv_last
run as Pallas phase-gathered dots at LR resolution.

Extends infer/folded_tail.py (which already folds the stage-2 conv to
LR): the remaining 4x-resolution work — conv_hr (120 ms), conv_last
(115 ms, N=3) and the 64-lane d2s(4) interleave (31 ms) on the bench
frame (benchmarks/exp_r8b_tail.py) — moves to LR-resolution MXU dots
at measured 169 / 65 TF/s (ops/pallas_phase_tail.py).

Neither the phase-major packing nor the stage-2 phase outputs ever
materialize in HBM: the folded up2 kernel's output channels are
permuted weight-side (permute_up2) so each phase conv emits 64-lane
phase-contiguous slabs, and the up2 phase convs run INSIDE the hr
kernel as in-VMEM tap dots on z1 (2-row halo). conv_last's output
channel order folds the d2s(4) convention and its width crop, so the
whole epilogue is one depth_to_space. (v1 packed a [B,H,Wp,16c]
phase-major tensor in XLA — stack + 8D transpose + pad, 19.5 ms of
pure HBM copies per 6-tile chunk; v2 ran the up2 convs in XLA at
48 TF/s and round-tripped their 2.4 GB/chunk output; both deleted.)

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
from superresolution_tpu.ops.pallas_phase_tail import phase_hr_last
from superresolution_tpu.ops.pixel_shuffle import depth_to_space


def permute_up2(kf: np.ndarray, bias: np.ndarray):
    """Permute the folded stage-2 kernel's output channels from the
    d2s layout f*4+i2*2+j2 to the slab layout (i2*2+j2)*c+f, so each
    phase conv's output is 64-lane phase-contiguous for the hr kernel.
    kf: [2,2,2,2,4c,4c] from fold_stage2_kernel; bias: [4c]."""
    c4 = kf.shape[-1]
    c = c4 // 4
    perm = np.empty(c4, np.int64)
    for f in range(c):
        for q in range(4):
            perm[q * c + f] = f * 4 + q
    return kf[..., perm], np.asarray(bias, np.float32)[perm]


def make_phase_tail(params, clip: bool = True, rb=None, interpret=None):
    """Build tail_fn from standard RRDBNet(pixelshuffle, scale=4) params."""
    p = params["params"] if "params" in params else params
    up1 = p["up"]["Conv_0"]["Conv_0"]
    up2 = p["up"]["Conv_1"]["Conv_0"]
    hr = p["conv_hr"]["Conv_0"]
    last = p["conv_last"]["Conv_0"]
    kf, bias2 = permute_up2(
        fold_stage2_kernel(np.asarray(up2["kernel"], np.float32)),
        np.asarray(up2["bias"], np.float32))
    kf, bias2 = jnp.asarray(kf), jnp.asarray(bias2)
    cout = np.asarray(last["kernel"]).shape[3]

    def tail_fn(feat: jnp.ndarray) -> jnp.ndarray:
        interp = (jax.default_backend() != "tpu"
                  if interpret is None else interpret)
        z1 = _lrelu(_conv(feat, jnp.asarray(up1["kernel"]),
                          jnp.asarray(up1["bias"])))  # [B,H,W,4C] phases
        bsz, h, w, _ = z1.shape
        # The barrier is load-bearing: without it XLA fuses the conv
        # epilogue chain into the pallas operand and the TPU backend
        # ABORTS at runtime (measured; kernels alone and prologue alone
        # are both fine). Forcing materialization restores the default
        # operand layout Mosaic expects.
        z1 = jax.lax.optimization_barrier(z1)
        out = phase_hr_last(z1, kf, bias2, hr["kernel"], hr["bias"],
                            last["kernel"], last["bias"], width=w,
                            interpret=interp, rb=rb)
        # out channel is already c*16+a*4+b == the d2s(4) convention
        y = depth_to_space(out.reshape(bsz, h, w, 16 * cout), 4)
        return jnp.clip(y, 0.0, 1.0) if clip else y

    return tail_fn
