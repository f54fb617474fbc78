"""Pipeline parallelism: model stages sharded across a 'pipe' mesh axis.

The TPU-native pipeline: stage weights live sharded on the leading axis
of a stacked param tree (one slice per device), and microbatches flow
device-to-device over ICI via `lax.ppermute` inside `shard_map` — the
SPMD collective-permute schedule from the public scaling playbook, not
a multi-process send/recv runtime. Every device runs the SAME traced
program; device d at ring step t works on microbatch t-d, so the
pipeline fills in P-1 steps and drains in P-1 steps (bubble fraction
(P-1)/(M+P-1) for M microbatches).

Because the whole schedule is ordinary differentiable lax (ppermute,
scan, dynamic slicing), `jax.grad` through `pipeline_apply` IS the
backward pipeline — the transposed ppermutes run the reverse schedule
automatically, and each device's stage-weight gradients materialize
already sharded on the pipe axis.

The reference is a single-GPU torch pipeline-free design (reference
scripts/Modello_supporto.py wraps one nn.DataParallel model); this
module is the capability the SURVEY section-5 distributed-backend row
calls for when a model's weights or activations exceed one chip. For
SuperResolution the natural pipelined body is the RRDB trunk — 23
identical residual blocks already scan-stacked on a leading axis
(models/rrdbnet.py) — so `split_scan_params` re-slices that stack into
per-stage groups directly. 23 is prime, so stages carry zero-padded
slots with a validity mask (`jnp.where(valid, block(x), x)`); the pad
slots burn one block of FLOPs per extra slot but keep the program SPMD.

Composes with the other axes: dp shards the microbatch dim, spatial
(parallel/spatial.py) shards rows, pipe shards depth. See
__graft_entry__.dryrun_multichip for the combined smoke test.

Deliberate choice: stage weights are CONSUMED sharded (shard_map
in_specs) but STORED replicated. SR trunks are small (the 23-block
RRDBNet body is ~33 MB in bf16) — weight/optimizer sharding would save
nothing that matters while complicating checkpoints; what outgrows a
chip in this domain is activations, which spatial sharding and the
microbatch ring already split. The pipe axis buys stage concurrency,
not memory.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_apply(mesh: Mesh, stage_fn, stage_params, x, *,
                   axis: str = "pipe", batch_axis: str | None = None):
    """Apply P sequential stages to M microbatches, pipelined over `axis`.

    stage_fn(params_slice, u) -> v: ONE stage; must be shape-preserving
        (v.shape == u.shape) so activations can ride the ppermute ring.
    stage_params: pytree whose leaves all have leading axis P (one
        slice per stage, in stage order). Device d consumes slice d.
    x: [M, mb, ...] microbatches (M >= 1). With batch_axis (a second
        mesh axis, e.g. 'data'), the mb dim is sharded over it so a
        dp x pp mesh does NOT redundantly run the full global batch on
        every data row; without it x is replicated.

    Returns [M, mb, ...]: for each microbatch, stage_{P-1}(...stage_0(mb)).
    Exactly equal to the sequential loop (same ops in the same order on
    each device; the ring only moves data).
    """
    n = mesh.shape[axis]
    num_stages = jax.tree.leaves(stage_params)[0].shape[0]
    if num_stages != n:
        raise ValueError(
            f"stage_params has {num_stages} stages for a {n}-device"
            f" '{axis}' axis")
    if n == 1:
        return jax.vmap(lambda u: stage_fn(
            jax.tree.map(lambda l: l[0], stage_params), u))(x)
    m = x.shape[0]
    perm = [(i, (i + 1) % n) for i in range(n)]
    x_spec = P(None, batch_axis) if batch_axis else P()

    @partial(shard_map, mesh=mesh, in_specs=(P(axis), x_spec),
             out_specs=x_spec)
    def run(sp, xs):
        sp = jax.tree.map(lambda l: l[0], sp)  # this device's stage
        idx = lax.axis_index(axis)

        def step(carry, t):
            state, out = carry
            incoming = lax.ppermute(state, axis, perm)
            feed = lax.dynamic_index_in_dim(
                xs, jnp.minimum(t, m - 1), 0, keepdims=False)
            u = jnp.where(idx == 0, feed, incoming)
            y = stage_fn(sp, u)
            # device n-1's product at step t is microbatch t-(n-1) done
            o = jnp.clip(t - (n - 1), 0, m - 1)
            write = (idx == n - 1) & (t >= n - 1)
            cur = lax.dynamic_index_in_dim(out, o, 0, keepdims=False)
            out = lax.dynamic_update_index_in_dim(
                out, jnp.where(write, y, cur), o, 0)
            return (y, out), None

        # the carry is device-varying (ppermute / axis_index); mark the
        # replicated zero init accordingly for shard_map's vma typing
        init = jax.tree.map(
            lambda z: lax.pcast(z, (axis,), to="varying"),
            (jnp.zeros_like(xs[0]), jnp.zeros_like(xs)))
        (_, out), _ = lax.scan(step, init, jnp.arange(m + n - 1))
        # only the last device's buffer is real; psum broadcasts it.
        # (a ring all-reduce moves ~2B(n-1)/n per link vs ~B for an
        # ideal one-hop broadcast — acceptable until output bandwidth
        # shows in profiles; a rotating-token broadcast riding the
        # existing scan would halve it at real schedule complexity)
        return lax.psum(
            jnp.where(idx == n - 1, out, jnp.zeros_like(out)), axis)

    return run(stage_params, x)


def split_scan_params(stacked, num_items: int, n_stages: int):
    """Re-slice scan-stacked params [num_items, ...] into per-stage groups.

    Returns (blocks, valid): blocks has leaves [n_stages, slots, ...]
    (zero-padded past num_items), valid is [n_stages, slots] bool. Feed
    both to a stage_fn that scans its slots and skips invalid ones.
    """
    slots = math.ceil(num_items / n_stages)
    pad = n_stages * slots - num_items

    def resplit(leaf):
        if leaf.shape[0] != num_items:
            raise ValueError(
                f"leaf leading axis {leaf.shape[0]} != {num_items}")
        if pad:
            leaf = jnp.concatenate(
                [leaf, jnp.zeros((pad,) + leaf.shape[1:], leaf.dtype)])
        return leaf.reshape((n_stages, slots) + leaf.shape[1:])

    blocks = jax.tree.map(resplit, stacked)
    valid = (jnp.arange(n_stages * slots) < num_items).reshape(
        n_stages, slots)
    return blocks, valid


def _rrdb_stage_fn(model):
    """stage_fn over a stage's {'blocks', 'valid'} slot group."""
    from superresolution_tpu.models.rrdbnet import RRDB

    rrdb = RRDB(model.features, model.growth, model.fused_dense)

    def stage_fn(sp, u):
        def body_step(h, wv):
            w, v = wv
            y = rrdb.apply({"params": w["RRDB_0"]}, h)
            return jnp.where(v, y, h), None

        h, _ = lax.scan(body_step, u, (sp["blocks"], sp["valid"]))
        return h

    return stage_fn


def make_pipeline_forward(mesh: Mesh, model, n_micro: int, *,
                          axis: str = "pipe"):
    """Pipeline-parallel RRDBNet forward: fwd(params, lr) -> pred.

    The 23-block body runs pipelined over the `axis` mesh axis while
    conv_first / trunk_conv / tail stay replicated (they are <2% of the
    FLOPs). The per-sample math is IDENTICAL to the plain forward —
    microbatching a conv net changes nothing per sample — so outputs
    (and, under jax.grad, all param grads) match model.apply up to f.p.
    determinism. Drop-in for make_train_step's apply_fn, which makes
    MeshConfig(pipe=N) a trainable configuration.
    """
    n = mesh.shape[axis]
    ndata = dict(mesh.shape).get("data", 1)
    stage_fn = _rrdb_stage_fn(model)

    def fwd(params, lr):
        b = lr.shape[0]
        if b % n_micro:
            raise ValueError(f"batch {b} not divisible by n_micro {n_micro}")
        x = lr
        if model.pixel_unshuffle_input > 1:
            from superresolution_tpu.ops.pixel_shuffle import space_to_depth

            x = space_to_depth(x, model.pixel_unshuffle_input)
        head = model.apply(params, x,
                           method=lambda m, u: m.conv_first(u))
        body = (params["params"]["body"] if "params" in params
                else params["body"])
        blocks, valid = split_scan_params(body, model.num_blocks, n)
        mb = b // n_micro
        micro = head.reshape((n_micro, mb) + head.shape[1:])
        # shard each microbatch over the data axis when it divides, so
        # dp x pp does not redundantly run the full batch per data row
        batch_axis = "data" if ndata > 1 and mb % ndata == 0 else None
        out = pipeline_apply(mesh, stage_fn,
                             {"blocks": blocks, "valid": valid},
                             micro, axis=axis, batch_axis=batch_axis)
        feat = out.reshape(head.shape)
        feat = model.apply(params, feat,
                           method=lambda m, u: m.trunk_conv(u)) + head
        return model.apply(params, feat, method="tail")

    return fwd


def make_pipeline_loss(mesh: Mesh, model, loss_sum_fn, n_micro: int, *,
                       axis: str = "pipe"):
    """Pipeline-parallel TRAINING objective over make_pipeline_forward.

    loss_sum_fn(pred, hr) must return the SUM of per-element losses
    (the mean is taken here), the same contract as make_spatial_loss.

        loss_fn = make_pipeline_loss(mesh, model, l1_sum, n_micro=8)
        loss, grads = jax.value_and_grad(loss_fn)(params, lr, hr)

    Backward is the reverse-schedule pipeline jax.grad derives from the
    ppermute ring; body-weight grads return in the stacked [num_blocks]
    layout the optimizer already holds.
    """
    fwd = make_pipeline_forward(mesh, model, n_micro, axis=axis)

    def loss_fn(params, lr, hr):
        pred = fwd(params, lr)
        return loss_sum_fn(pred, hr) / jnp.asarray(hr.size, jnp.float32)

    return loss_fn


def make_hat_group_pipeline(mesh: Mesh, model, params, *,
                            axis: str = "pipe"):
    """Pipeline HATLite's residual groups over the `axis` mesh axis.

    model: a HATLite with scan_blocks=True and uniform groups (weights
    stacked [n_groups] under params['groups']). Returns
    fn(x_microbatches: [M, mb, H, W, C]) -> [M, mb, H, W, C] equal to
    scanning all groups on one device (the embed conv / body norm /
    upsampler stay outside — see HATLite.__call__). Groups are
    shape-preserving (window attention + convs at constant dim), so they
    ride the ppermute ring like RRDB blocks; group counts that don't
    divide the axis get masked zero-pad slots.
    """
    from superresolution_tpu.models.hat_lite import ResidualGroup

    n = mesh.shape[axis]
    p = params["params"] if "params" in params else params
    groups = p["groups"]
    n_groups = len(model.depths)
    if len(set(model.depths)) != 1 or len(set(model.num_heads)) != 1:
        raise ValueError("group pipeline requires uniform groups")
    blocks, valid = split_scan_params(groups, n_groups, n)
    stage_params = {"blocks": blocks, "valid": valid}
    rg = ResidualGroup(model.embed_dim, model.depths[0],
                       model.num_heads[0], model.window_size,
                       mlp_ratio=model.mlp_ratio,
                       conv_scale=model.conv_scale,
                       overlap_ratio=model.overlap_ratio,
                       scan_blocks=model.scan_blocks,
                       oca_rpb=model.hat_compat,
                       attn_f32=model.attn_f32)

    def stage_fn(sp, u):
        def body_step(h, wv):
            w, v = wv
            y = rg.apply({"params": w["ResidualGroup_0"]}, h)
            return jnp.where(v, y, h), None

        h, _ = lax.scan(body_step, u, (sp["blocks"], sp["valid"]))
        return h

    def apply(x_microbatches):
        return pipeline_apply(mesh, stage_fn, stage_params,
                              x_microbatches, axis=axis)

    return apply


def make_trunk_pipeline(mesh: Mesh, model, params, *, axis: str = "pipe",
                        dtype=None):
    """Pipeline the RRDBNet trunk body over the `axis` mesh axis.

    model: an RRDBNet with scan_blocks=True (weights stacked [num_blocks]
    under params['body']). Returns fn(x_microbatches: [M, mb, H, W, C])
    -> [M, mb, H, W, C] equal to scanning all blocks on one device
    (conv_first / trunk_conv / tail stay outside — they are tiny and run
    replicated; see RRDBNet.trunk).
    """
    n = mesh.shape[axis]
    body = params["params"]["body"] if "params" in params else params["body"]
    if dtype is not None:
        body = jax.tree.map(lambda l: l.astype(dtype), body)
    blocks, valid = split_scan_params(body, model.num_blocks, n)
    stage_params = {"blocks": blocks, "valid": valid}
    stage_fn = _rrdb_stage_fn(model)

    def apply(x_microbatches):
        return pipeline_apply(mesh, stage_fn, stage_params,
                              x_microbatches, axis=axis)

    return apply
