"""Pack-GEMM 3x3 convolution — the RRDB trunk's conv replacement.

Why: XLA's conv3x3 schedule on this stack is K-starved at the trunk's
channel widths (measured envelope, BENCHMARKS.md: Cin=32 convs run
12-21 TF/s, Cin=64 37.7 TF/s, vs 107+ for 128-wide convs). The MXU wants
a 128-deep contraction; 9*Cin never presents one because XLA's implicit
im2col cannot keep the tap windows VMEM-resident at these widths.

This kernel re-expresses the conv as dense GEMMs whose contraction packs
``p`` adjacent W-pixels into lanes (K = p*Cin = 128):

    x [B,H,W,c] --reshape--> packs [B,H,W/p,p*c]
    out[m] = sum_dy  L_dy @ A_dy            in-pack taps, banded-dense
           + roll_+1(L_dy @ B_dy)           left tap crossing a pack edge
           + roll_-1(L_dy @ C_dy)           right tap crossing a pack edge

with L_dy the lhs slice at row offset dy*W2 — sublane-ALIGNED because W2
is padded to a multiple of 8 (this is the trick the round-2 attempts
missed: their per-tap W-slices forced misaligned VMEM relayouts). The
+-1 pack shifts become `pltpu.roll` on the dot OUTPUTS; the roll's wrap
garbage lands only in the zero pad packs, which stay masked.

FLOP overhead vs the mathematical conv is (p+2)/3 (p=2: 1.33x).

MEASURED OUTCOME (benchmarks/exp_r4_pairconv.py, exp_r4c ablation): as a
STANDALONE per-conv kernel this does NOT beat XLA — 25.9 TF/s useful on
c64n192 vs XLA's 37.7 — because a single conv at these widths is bound
by its HBM round trip, not by the MXU (a passthrough kernel with the
same IO pattern costs the same 19.5us/block; the chip's Mosaic dot rate
on VMEM-resident data is ~198 TF/s at K>=384 — exp_r4d). The pack-GEMM
formulation is kept because it is the building block of the FUSED
dense-block kernel (all 5 convs VMEM-resident between one read and one
write), where the HBM bound disappears.

The public entry `pack_conv3x3` works on PACKED operands so consecutive
convs chain with no relayout: `pack_input`/`unpack_output` convert at
chain boundaries. Pad packs are re-zeroed in-kernel on the way out
(`broadcasted_iota` mask over the pack axis), so chained calls keep SAME
semantics.

Gradients: `custom_vjp` falls back to the XLA conv expression (one
recompute) — this kernel is the inference/deploy path; training keeps
XLA convs.

Capability parity: reference conv stacks (BasicSR RRDBNet dense blocks,
reference src/architecture.py:38-43); same math as
jax.lax.conv_general_dilated(..., 'SAME') to bf16 accuracy.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_geometry(width: int, p: int) -> tuple[int, int, int]:
    """-> (w2 packs, pad_l, pad_r): one zero pack each side, W2 % 8 == 0
    so the dy lhs offsets stay sublane-aligned."""
    if width % p:
        raise ValueError(f"width {width} not a multiple of pack {p}")
    # 16-aligned pack count: bf16 VMEM tiles are (16, 128) sublanes x
    # lanes, so every dy slice offset (a multiple of w2) stays tile-aligned
    w2 = -(-(width // p + 2) // 16) * 16
    pad_l = p
    pad_r = w2 * p - width - pad_l
    return w2, pad_l, pad_r


def pack_input(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B,H,W,c] -> packed [B,H,W2,p*c] with zeroed pad packs."""
    b, h, w, c = x.shape
    w2, pad_l, pad_r = pack_geometry(w, p)
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad_l, pad_r), (0, 0)))
    return xp.reshape(b, h, w2, p * c)


def unpack_output(y: jnp.ndarray, p: int, width: int) -> jnp.ndarray:
    """packed [B,H,W2,p*n] -> [B,H,W,n]."""
    b, h, w2, pn = y.shape
    n = pn // p
    _, pad_l, _ = pack_geometry(width, p)
    return y.reshape(b, h, w2 * p, n)[:, :, pad_l:pad_l + width]


def _pack_weights(w, p, c, n, dtype):
    """w [3,3,c,n] HWIO -> per-dy A [pc, pn] banded, B [pc, n], C [pc, n]."""
    a = np.zeros((3, p * c, p * n), np.float32)
    bm = np.zeros((3, p * c, n), np.float32)
    cm = np.zeros((3, p * c, n), np.float32)
    wn = np.asarray(w, np.float32)
    for dy in range(3):
        for src in range(p):
            for dst in range(p):
                dx = src - dst
                if abs(dx) <= 1:
                    a[dy, src * c:(src + 1) * c,
                      dst * n:(dst + 1) * n] = wn[dy, dx + 1]
        bm[dy, (p - 1) * c:p * c, :] = wn[dy, 0]
        cm[dy, 0:c, :] = wn[dy, 2]
    return (jnp.asarray(a, dtype), jnp.asarray(bm, dtype),
            jnp.asarray(cm, dtype))


def _kernel(top_ref, mid_ref, bot_ref, a_ref, b_ref, c_ref, bias_ref,
            out_ref, *, rb, w2, p, c, n, n_real_packs, act):
    pc, pn = p * c, p * n
    mo = rb * w2
    top = top_ref[0].reshape(w2, pc)
    mid = mid_ref[0].reshape(mo, pc)
    bot = bot_ref[0].reshape(w2, pc)
    xf = jnp.concatenate([top, mid, bot], axis=0)
    acc = None
    pb = None
    pcc = None
    for dy in range(3):
        lhs = xf[dy * w2:dy * w2 + mo]
        da = jnp.dot(lhs, a_ref[dy], preferred_element_type=jnp.float32)
        db = jnp.dot(lhs, b_ref[dy], preferred_element_type=jnp.float32)
        dc = jnp.dot(lhs, c_ref[dy], preferred_element_type=jnp.float32)
        acc = da if acc is None else acc + da
        pb = db if pb is None else pb + db
        pcc = dc if pcc is None else pcc + dc
    # cross-pack taps: the roll wrap garbage lands in pad packs (masked)
    pb = pltpu.roll(pb, 1, 0)
    pcc = pltpu.roll(pcc, mo - 1, 0)
    if p == 2:
        cross = jnp.concatenate([pb, pcc], axis=1)
    else:
        zeros = jnp.zeros((mo, (p - 2) * n), jnp.float32)
        cross = jnp.concatenate([pb, zeros, pcc], axis=1)
    out = acc + cross + bias_ref[:]
    if act == "lrelu":
        out = jnp.where(out >= 0, out, 0.2 * out)
    # re-zero pad packs so chained packed convs keep SAME semantics
    pack_idx = jax.lax.broadcasted_iota(jnp.int32, (mo, 1), 0) % w2
    valid = (pack_idx >= 1) & (pack_idx <= n_real_packs)
    out = jnp.where(valid, out, 0.0)
    out_ref[0] = out.astype(out_ref.dtype).reshape(rb, w2, pn)


def _fwd(xp, a, bm, cm, bias, *, p, c, n, width, rb, act, interpret):
    b, h, w2, pc = xp.shape
    if h % rb:
        raise ValueError(f"H={h} not a multiple of row band {rb}")
    nb = h // rb
    xh = jnp.pad(xp, ((0, 0), (1, 1), (0, 0), (0, 0)))
    mid = xh[:, 1:h + 1]
    top = xh[:, 0:h:rb]
    bot = xh[:, rb + 1::rb]
    spec_mid = pl.BlockSpec((1, rb, w2, pc), lambda bi, i: (bi, i, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_edge = pl.BlockSpec((1, 1, w2, pc), lambda bi, i: (bi, i, 0, 0),
                             memory_space=pltpu.VMEM)

    def spec_w(nn):
        return pl.BlockSpec((3, pc, nn), lambda bi, i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_kernel, rb=rb, w2=w2, p=p, c=c, n=n,
                n_real_packs=width // p, act=act),
        grid=(b, nb),
        in_specs=[spec_edge, spec_mid, spec_edge,
                  spec_w(p * n), spec_w(n), spec_w(n),
                  pl.BlockSpec((1, p * n), lambda bi, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rb, w2, p * n),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w2, p * n), xp.dtype),
        interpret=interpret,
    )(top, mid, bot, a, bm, cm, bias)


def _ref_packed(xp, w, bias, *, p, width, act):
    """XLA reference on packed operands (for custom_vjp backward/tests)."""
    x = unpack_output(xp, p, width)
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + bias.reshape(1, 1, 1, -1).astype(jnp.float32)
    if act == "lrelu":
        y = jnp.where(y >= 0, y, 0.2 * y)
    return pack_input(y.astype(xp.dtype), p)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def pack_conv3x3(xp, w, bias, p, width, act="none", interpret=False):
    """SAME conv3x3 (+bias, optional fused lrelu) on PACKED operands.

    xp: [B, H, W2, p*c] (from pack_input / a previous pack_conv3x3);
    w: [3, 3, c, n] HWIO; bias: [n]. Returns packed [B, H, W2, p*n].
    """
    c = w.shape[2]
    n = w.shape[3]
    a, bm, cm = _pack_weights(w, p, c, n, xp.dtype)
    bias_row = jnp.tile(bias.astype(jnp.float32), (p,)).reshape(1, p * n)
    rb = 8
    h = xp.shape[1]
    while h % rb:
        rb //= 2
    return _fwd(xp, a, bm, cm, bias_row, p=p, c=c, n=n, width=width,
                rb=rb, act=act, interpret=interpret)


def _pack_conv_fwd(xp, w, bias, p, width, act, interpret):
    out = pack_conv3x3(xp, w, bias, p, width, act, interpret)
    return out, (xp, w, bias)


def _pack_conv_bwd(p, width, act, interpret, residuals, g):
    xp, w, bias = residuals
    _, vjp = jax.vjp(
        lambda xp, w, bias: _ref_packed(xp, w, bias, p=p, width=width,
                                        act=act), xp, w, bias)
    return vjp(g)


pack_conv3x3.defvjp(_pack_conv_fwd, _pack_conv_bwd)
