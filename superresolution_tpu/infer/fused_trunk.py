"""Deploy-time fused RRDB trunk — every dense block runs as ONE Pallas
program (ops/pallas_dense_trunk.py), chained in the packed layout.

Like infer/folded_tail.py and infer/fused_hat.py, this is a deployment
rewrite over the SAME checkpoint: `make_fused_trunk(params, model)`
reads the flax param tree of an RRDBNet and returns a function
equivalent to `model.apply(..., method='trunk')`. conv_first and
trunk_conv stay XLA; the 23x3 dense blocks run fused, with the packed
(W-padded) layout carried across ALL of them — one pack, 69 fused
blocks + residual adds, one unpack.

The 23 RRDB blocks run under lax.scan over the stacked weights (one
compiled kernel body), mirroring the model's own nn.scan structure.

Requires scan_blocks=True and fused_dense=True (every production
preset). Supports pixel_unshuffle_input (BasicSR scale-2 convention).

Measured (benchmarks/exp_r5e_proj_ablate.py): the fused dense block at
rb=56 runs 23.2 ms vs 29.8 ms XLA on the bench tile batch — and the
packed chaining removes the per-block pack/unpack that a naive swap
would pay. Capability parity: reference stage-1 RRDBNet trunk
(src/architecture.py:38-43).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from superresolution_tpu.infer.common import (
    PreboundModel as _PreboundModel,
    param_conv as _conv,
)
from superresolution_tpu.ops.pallas_dense_trunk import (
    fused_dense_block,
    pack,
    pick_rb,
    pack_width,
    proj_weights,
    unpack,
)

def _stacked_weights(body, num_blocks, dtype):
    """Scan-stacked body params -> per-dense-slot stacked weight lists.

    body: params['body'] with leading block axis on every leaf.
    Returns [w_dense0, w_dense1, w_dense2], each a list of arrays with
    a leading [num_blocks] axis (scan xs).
    """
    rrdb = body["RRDB_0"]
    out = []
    for i in range(3):
        dp = rrdb[f"FusedDenseBlock_{i}"]
        per_block = []
        for bidx in range(num_blocks):
            sub = jax.tree.map(lambda a: np.asarray(a)[bidx], dp)
            per_block.append(proj_weights(sub, dtype))
        stacked = [jnp.stack([pb[j] for pb in per_block])
                   for j in range(len(per_block[0]))]
        out.append(stacked)
    return out


def make_fused_trunk(variables, model, rb=None, interpret=None,
                     chain_rrdb=False):
    """-> trunk_fn(x [B,H,W,Cin]) equivalent to
    model.apply(variables, x, method='trunk').

    chain_rrdb: run each RRDB's 3 dense blocks + residual as ONE Pallas
    program (ops/pallas_dense_trunk.fused_rrdb, halo 15) — kills 2 of 3
    per-RRDB packed-tensor HBM boundaries at a deeper halo cascade."""
    if not model.scan_blocks or not model.fused_dense:
        raise ValueError("fused trunk requires scan_blocks and "
                         "fused_dense (the production layout)")
    p = variables["params"] if "params" in variables else variables
    dtype = jnp.bfloat16
    stacked = _stacked_weights(p["body"], model.num_blocks, dtype)
    n_w = len(stacked[0])
    unshuffle = model.pixel_unshuffle_input

    def trunk_fn(x):
        interp = (jax.default_backend() != "tpu" if interpret is None
                  else interpret)
        if unshuffle > 1:
            from superresolution_tpu.ops.pixel_shuffle import space_to_depth

            x = space_to_depth(x, unshuffle)
        x = head = _conv(x, p["conv_first"]["Conv_0"])
        b, h, w, c = x.shape
        rbk = pick_rb(h, pack_width(w)) if rb is None else rb
        xp = pack(x)

        def body(carry, ws):
            w0, w1, w2 = (ws[:n_w], ws[n_w:2 * n_w], ws[2 * n_w:])
            if chain_rrdb:
                from superresolution_tpu.ops.pallas_dense_trunk import (
                    fused_rrdb)

                return fused_rrdb(carry, list(w0), list(w1), list(w2),
                                  width=w, interpret=interp), None
            y = fused_dense_block(carry, list(w0), width=w, rb=rbk,
                                  interpret=interp)
            y = fused_dense_block(y, list(w1), width=w, rb=rbk,
                                  interpret=interp)
            # the RRDB residual (models/rrdbnet.py RRDB.__call__) folds
            # into the third kernel's epilogue: the separate XLA pass
            # cost 4.85 ms/RRDB (benchmarks/exp_r13_residual.py)
            y = fused_dense_block(y, list(w2), width=w, rb=rbk,
                                  interpret=interp, residual=carry)
            return y, None

        xs = tuple(stacked[0] + stacked[1] + stacked[2])
        out, _ = jax.lax.scan(body, xp, xs)
        feat = unpack(out, w)
        return _conv(feat, p["trunk_conv"]["Conv_0"]) + head

    return trunk_fn


def fused_rrdb_model(variables, model):
    """RRDBNet -> a pre-bound model whose trunk runs fused dense-block
    kernels and whose tail is the phase-space Pallas tail when the
    layout supports it (scale-4 pixelshuffle; infer/phase_tail.py),
    else the standard apply. Raises ValueError for layouts
    make_fused_trunk does not support."""
    trunk = make_fused_trunk(variables, model)

    tail = None
    if model.scale == 4 and model.upsampler == "pixelshuffle":
        from superresolution_tpu.infer.phase_tail import make_phase_tail

        try:
            # clip=False: the standard apply tail this replaces does not
            # clip (models/rrdbnet.py::tail); upscale() handles range
            tail = make_phase_tail(variables, clip=False)
        except (KeyError, ValueError):
            tail = None

    def apply_fn(x):
        feat = trunk(x)
        if tail is not None:
            return tail(feat)
        return model.apply(variables, feat, method="tail")

    return _PreboundModel(apply_fn)
