"""Fused-kernel TRAINING forward for RRDB-family models.

The deploy rewrites (infer/fused_trunk.py) pre-bake weights host-side,
which breaks differentiation; this module builds the SAME fused
dense-block trunk as a pure function of the live param tree, with every
dense block running ops/pallas_dense_trunk_vjp.fused_dense_block_train
(fused Pallas forward AND backward). Drop-in for make_train_step's
apply_fn / make_gan_steps' gen apply, so RRDB training runs at the
fused-kernel envelope instead of the per-conv HBM round-trip XLA
envelope (VERDICT r2 item 1; reference hot loop:
scripts/Modello_supporto.py:124-148).

Supports the plain RRDBNet and the two-stage HybridSR whose stage1 is
an RRDBNet (the reference flagship, src/architecture.py:30-82): stage1
runs fused, stage2/smoothing/resize replay HybridSR.__call__ on the
same param subtrees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from superresolution_tpu.infer.common import param_conv
from superresolution_tpu.models.hybrid import HybridSR
from superresolution_tpu.models.rrdbnet import RRDBNet
from superresolution_tpu.ops.pallas_dense_trunk import pack, unpack
from superresolution_tpu.ops.pallas_dense_trunk_vjp import (
    fused_dense_block_train,
    proj_weights_traced,
)


def supports_fused_train(model) -> bool:
    """True when make_fused_train_apply can handle this model."""
    if isinstance(model, HybridSR):
        return (model.stage1 is not None
                and supports_fused_train(model.stage1))
    return (isinstance(model, RRDBNet) and model.scan_blocks
            and model.fused_dense)


def pack_batch_rows(x: jnp.ndarray, spacer: int = 1) -> jnp.ndarray:
    """[B, H, W, C] -> [1, B*(H+spacer), W, C]: the batch stacked along
    H with `spacer` zero rows after each image. With the kernels' seg
    mask (pallas_dense_trunk._roll_conv3) one spacer row gives each
    image exact zero-pad SAME semantics while the whole batch rides one
    tall row-block grid — the amortization small training patches
    (LR < 96^2) can't reach per-image (VERDICT r3 item 4)."""
    b, h, w, c = x.shape
    xr = jnp.pad(x, ((0, 0), (0, spacer), (0, 0), (0, 0)))
    return xr.reshape(1, b * (h + spacer), w, c)


def unpack_batch_rows(xp: jnp.ndarray, b: int, h: int,
                      spacer: int = 1) -> jnp.ndarray:
    """Inverse of pack_batch_rows (drops the spacer rows)."""
    return xp.reshape(b, h + spacer, *xp.shape[2:])[:, :h]


def _make_rrdb_apply(model: RRDBNet, interpret, row_pack=False):
    def apply(p, x):
        interp = (jax.default_backend() != "tpu" if interpret is None
                  else interpret)
        if model.pixel_unshuffle_input > 1:
            from superresolution_tpu.ops.pixel_shuffle import (
                space_to_depth)

            x = space_to_depth(x, model.pixel_unshuffle_input)
        x = head = param_conv(x, p["conv_first"]["Conv_0"])
        width = x.shape[2]
        b, h = x.shape[0], x.shape[1]
        xp = pack(x)
        seg = None
        if row_pack and b > 1:
            seg = (h + 1, h)
            xp = pack_batch_rows(xp, 1)
        rrdb = p["body"]["RRDB_0"]
        slots = tuple(
            jax.vmap(lambda t: proj_weights_traced(t, x.dtype))(
                rrdb[f"FusedDenseBlock_{i}"]) for i in range(3))

        def body(carry, ws):
            w0, w1, w2 = ws
            y = fused_dense_block_train(carry, w0, None, width, None,
                                        interp, seg)
            y = fused_dense_block_train(y, w1, None, width, None,
                                        interp, seg)
            # RRDB residual folded into the third kernel (fwd epilogue /
            # bwd scale factors)
            y = fused_dense_block_train(y, w2, carry, width, None,
                                        interp, seg)
            return y, None

        out, _ = jax.lax.scan(body, xp, slots)
        if seg is not None:
            out = unpack_batch_rows(out, b, h, 1)
        feat = unpack(out, width)
        feat = param_conv(feat, p["trunk_conv"]["Conv_0"]) + head
        return model.apply({"params": p}, feat, method="tail")

    return apply


def make_fused_train_apply(model, interpret=None, row_pack=False):
    """-> apply(params, x) == model.apply(params, x) with the RRDB trunk
    on fused train kernels; differentiable in params and x.

    row_pack: stack the batch along H (one zero spacer row per image,
    seg-masked in the kernels) so small patches amortize the recompute
    halo like one tall image — the sub-96^2 fused-train lever."""
    if not supports_fused_train(model):
        raise ValueError(
            "fused train apply requires an RRDBNet (or HybridSR over"
            " one) with scan_blocks and fused_dense")
    if isinstance(model, HybridSR):
        stage1_apply = _make_rrdb_apply(model.stage1, interpret,
                                        row_pack)

        def apply(params, x):
            from superresolution_tpu.ops.blur import anti_checkerboard
            from superresolution_tpu.ops.resize import resize_bicubic

            p = params["params"] if "params" in params else params
            x = stage1_apply(p["stage1"], x)
            if model.smoothing:
                x = anti_checkerboard(x, model.smoothing)
            if model.stage2 is not None:
                x = model.stage2.apply({"params": p["stage2"]}, x)
                if model.smoothing:
                    x = anti_checkerboard(x, model.smoothing)
            if model.output_size and x.shape[1] != model.output_size:
                x = resize_bicubic(
                    x, (model.output_size, model.output_size),
                    a=-0.75, antialias=False)
            if model.smoothing:
                x = anti_checkerboard(x, "light")
            return x

        return apply

    rrdb_apply = _make_rrdb_apply(model, interpret, row_pack)

    def apply(params, x):
        p = params["params"] if "params" in params else params
        return rrdb_apply(p, x)

    return apply


def make_fused_train_apply_dp(model, mesh, interpret=None,
                              axis: str = "data", row_pack=False):
    """Data-parallel fused train apply: pallas_call has no GSPMD
    partitioning rule, so on a >1-device mesh the fused forward runs
    under shard_map — params replicated (their cotangents psum over the
    axis automatically in shard_map's transpose), batch sharded on
    `axis`. Identical math to make_fused_train_apply per sample."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    inner = make_fused_train_apply(model, interpret, row_pack)

    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation, which the vma checker requires
    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P(axis)),
             out_specs=P(axis), check_vma=False)
    def sharded(params, lr):
        return inner(params, lr)

    def apply(params, lr):
        return sharded(params, lr)

    return apply
