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
    conv3_rollconv_weights,
    fused_dense_block,
    fused_dense_block_epilogue,
    fused_dense_block_prologue,
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
                     chain_rrdb=False, fold_ends=False):
    """-> trunk_fn(x [B,H,W,Cin]) equivalent to
    model.apply(variables, x, method='trunk').

    chain_rrdb: run each RRDB's 3 dense blocks + residual as ONE Pallas
    program (ops/pallas_dense_trunk.fused_rrdb, halo 15) — kills 2 of 3
    per-RRDB packed-tensor HBM boundaries at a deeper halo cascade.

    fold_ends: fold conv_first into the first dense block's prologue
    and trunk_conv + the global trunk residual into the last block's
    epilogue (ops/pallas_dense_trunk end folds) — removes the pack
    copy + 4 full-tensor XLA passes at the trunk ends; the first and
    last RRDB are peeled out of the scan (3 kernel bodies compile
    instead of 1). MEASURED-CLOSED on chip (BENCHMARKS.md r3): a wash
    at the bench geometry (1.5779 vs 1.5773 MP/s) — XLA already fuses
    those end passes to near-zero — so the default stays False to keep
    the single-kernel-body compile time; the kernels remain
    chip-verified (CHIPEQ fused_trunk_end_folds) behind this lever."""
    if not model.scan_blocks or not model.fused_dense:
        raise ValueError("fused trunk requires scan_blocks and "
                         "fused_dense (the production layout)")
    p = variables["params"] if "params" in variables else variables
    dtype = jnp.bfloat16
    stacked = _stacked_weights(p["body"], model.num_blocks, dtype)
    n_w = len(stacked[0])
    unshuffle = model.pixel_unshuffle_input
    if chain_rrdb or model.num_blocks < 2:
        fold_ends = False  # chained A/B lever keeps the r2 layout; the
        # peeled first/last-RRDB structure needs >= 2 blocks
    if fold_ends:
        cin = model.in_channels * unshuffle * unshuffle
        cin_pad = -(-cin // 8) * 8
        # end convs keep the params' own dtype — the deploy caller has
        # already cast params to bf16, and tests feed f32 params so the
        # fold stays comparable to the XLA _conv path at f32
        cf_dtype = jnp.asarray(
            p["conv_first"]["Conv_0"]["kernel"]).dtype
        head_w = conv3_rollconv_weights(p["conv_first"]["Conv_0"],
                                        cin_pad=cin_pad, dtype=cf_dtype)
        trunk_w = conv3_rollconv_weights(p["trunk_conv"]["Conv_0"],
                                         dtype=cf_dtype)

        def blk(slot, idx):
            return [a[idx] for a in stacked[slot]]

    def trunk_fn(x):
        interp = (jax.default_backend() != "tpu" if interpret is None
                  else interpret)
        if unshuffle > 1:
            from superresolution_tpu.ops.pixel_shuffle import space_to_depth

            x = space_to_depth(x, unshuffle)

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

        if fold_ends:
            b, h, w, _ = x.shape
            rbk = pick_rb(h, pack_width(w)) if rb is None else rb
            xr = x  # caller picks the compute dtype (bench casts bf16)
            cin = xr.shape[-1]
            if cin_pad > cin:
                xr = jnp.pad(xr, ((0, 0), (0, 0), (0, 0),
                                  (0, cin_pad - cin)))
            xr = pack(xr)
            # RRDB 0, peeled: conv_first rides the first block
            y, head = fused_dense_block_prologue(
                xr, head_w, blk(0, 0), width=w, rb=rbk, interpret=interp)
            y = fused_dense_block(y, blk(1, 0), width=w, rb=rbk,
                                  interpret=interp)
            carry = fused_dense_block(y, blk(2, 0), width=w, rb=rbk,
                                      interpret=interp, residual=head)
            nb = model.num_blocks
            if nb > 2:
                xs = tuple(a[1:nb - 1] for a in
                           stacked[0] + stacked[1] + stacked[2])
                carry, _ = jax.lax.scan(body, carry, xs)
            # last RRDB, peeled: trunk_conv + global residual ride the
            # last block
            y = fused_dense_block(carry, blk(0, nb - 1), width=w,
                                  rb=rbk, interpret=interp)
            y = fused_dense_block(y, blk(1, nb - 1), width=w, rb=rbk,
                                  interpret=interp)
            feat = fused_dense_block_epilogue(
                y, blk(2, nb - 1), carry, trunk_w, head, width=w,
                rb=rbk, interpret=interp)
            return unpack(feat, w)

        x = head = _conv(x, p["conv_first"]["Conv_0"])
        b, h, w, c = x.shape
        rbk = pick_rb(h, pack_width(w)) if rb is None else rb
        xp = pack(x)
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
