"""Overlap-halo tiled inference for arbitrary-size images.

The reference can only infer on fixed 128x128 patches (reference:
scripts/Modello_5.py:54-77; README's OOM advice is "shrink the model").
Here any image runs in constant HBM: the image is cut into a static grid of
`tile`-sized blocks, each padded by `halo` pixels of real neighboring
context (edge-replicated at image borders), the network runs on the padded
blocks in fixed-shape batches (one XLA compilation total), and the halo is
cropped from each upscaled block before reassembly.

Halo-crop is *exact* (bit-identical to full-image inference away from image
borders) whenever the network is shift-invariant with half receptive field
<= halo. For windowed-attention models whose outputs are not strictly
shift-invariant, `blend='hann'` gives smooth seams via raised-cosine
weighted overlap-add instead.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _pad(img: np.ndarray, top: int, bottom: int, left: int, right: int,
         mode: str) -> np.ndarray:
    kw = {"mode": "edge"} if mode == "edge" else {"mode": "constant"}
    return np.pad(img, ((top, bottom), (left, right), (0, 0)), **kw)


def tiled_apply(fn, img, scale: int, tile: int = 256, halo: int = 16,
                batch: int = 8, blend: str = "crop",
                pad_mode: str = "edge") -> np.ndarray:
    """Apply `fn` ([N,h,w,C]->[N,h*scale,w*scale,C]) to HWC `img` tile-wise.

    fn must accept a fixed shape [batch, tile+2*halo, tile+2*halo, C]; it is
    called ceil(ntiles/batch) times with that exact shape (ragged tail is
    zero-padded), so XLA compiles it once.

    Exactness contract: for a shift-invariant net with half receptive field
    <= halo, the output matches full-image inference EXACTLY except within
    `halo*scale` pixels of the true image border. (No padding scheme can be
    bit-exact at the border itself: stacked SAME convs with biases and
    nonlinearities produce nonzero activations in their padding region that
    a one-shot halo pad cannot reproduce.) pad_mode: 'edge' (default,
    vignette-free) or 'zero'.
    """
    img = np.asarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    ny, nx = -(-h // tile), -(-w // tile)
    ph, pw = ny * tile - h, nx * tile - w
    padded = _pad(img, halo, ph + halo, halo, pw + halo, pad_mode)

    t_in = tile + 2 * halo
    tiles = np.empty((ny * nx, t_in, t_in, c), img.dtype)
    for iy in range(ny):
        for ix in range(nx):
            y0, x0 = iy * tile, ix * tile
            tiles[iy * nx + ix] = padded[y0:y0 + t_in, x0:x0 + t_in]

    n = tiles.shape[0]
    outs = np.empty((n, t_in * scale, t_in * scale, c), np.float32)
    for i in range(0, n, batch):
        chunk = tiles[i:i + batch]
        if chunk.shape[0] < batch:
            chunk = np.concatenate(
                [chunk, np.zeros((batch - chunk.shape[0], *chunk.shape[1:]),
                                 chunk.dtype)])
        res = np.asarray(jax.device_get(fn(jnp.asarray(chunk))),
                         dtype=np.float32)
        outs[i:i + batch] = res[: min(batch, n - i)]

    hs, ts, os_ = halo * scale, tile * scale, (tile + 2 * halo) * scale
    if blend == "crop":
        out = np.empty((ny * ts, nx * ts, c), np.float32)
        for iy in range(ny):
            for ix in range(nx):
                o = outs[iy * nx + ix]
                out[iy * ts:(iy + 1) * ts, ix * ts:(ix + 1) * ts] = \
                    o[hs:hs + ts, hs:hs + ts]
    elif blend == "hann":
        # Crop the outer half-halo (receptive-field-contaminated when
        # half-rf <= halo/2), then raised-cosine overlap-add over the
        # remaining halo-wide overlap between neighbors. sin^2 + cos^2 = 1
        # across each seam, so exact tiles blend exactly; non-shift-
        # invariant models get smooth seams.
        m = hs // 2
        span = os_ - 2 * m  # ts + hs
        ramp = np.ones(span, np.float64)
        if hs:
            r = np.sin(np.linspace(0, math.pi / 2, hs, endpoint=False)) ** 2
            ramp[:hs] = r
            ramp[-hs:] = r[::-1]
        wgt = np.outer(ramp, ramp)[..., None]
        acc = np.zeros(((ny * tile + 2 * halo) * scale,
                        (nx * tile + 2 * halo) * scale, c), np.float64)
        den = np.zeros_like(acc)
        for iy in range(ny):
            for ix in range(nx):
                y0, x0 = iy * ts + m, ix * ts + m
                o = outs[iy * nx + ix][m:os_ - m, m:os_ - m]
                acc[y0:y0 + span, x0:x0 + span] += o * wgt
                den[y0:y0 + span, x0:x0 + span] += wgt
        out = (acc / np.maximum(den, 1e-12))[hs:hs + ny * ts,
                                             hs:hs + nx * ts].astype(np.float32)
    else:
        raise ValueError(f"unknown blend mode {blend!r}")

    out = out[: h * scale, : w * scale]
    return out[..., 0] if squeeze else out


def _default_model_params(img, scale, model, params, tile: int = 256,
                          halo: int = 16, **model_kwargs):
    """Resolve (model, params): `model` may be a flax module, a registry
    name, or None (defaults to 'rrdbnet'); None params -> random init
    (smoke tests/benchmarks only)."""
    from superresolution_tpu.models import get_model

    img = np.asarray(img)
    c = 1 if img.ndim == 2 else img.shape[-1]
    if model is None or isinstance(model, str):
        name = model or "rrdbnet"
        model = get_model(name, scale=scale, in_channels=c, out_channels=c,
                          **model_kwargs)
    if params is None:
        t_in = tile + 2 * halo
        params = model.init(jax.random.key(0),
                            jnp.zeros((1, t_in, t_in, c), jnp.float32))
    return model, params


def upscale(img, scale: int = 4, *, model=None, params=None, tile: int = 256,
            halo: int = 16, batch: int = 8, blend: str = "crop",
            pad_mode: str = "edge", precision: str = "bf16",
            **model_kwargs) -> np.ndarray:
    """Public API: super-resolve an HWC (or HW) image in [0,1] by `scale`.

    `model` may be a flax module, a registry name, or None (defaults to
    'rrdbnet'). If `params` is None the model is randomly initialized —
    useful only for smoke tests/benchmarks.
    """
    from superresolution_tpu.utils.precision import get_policy

    img = np.asarray(img)
    model, params = _default_model_params(img, scale, model, params,
                                          tile=tile, halo=halo,
                                          **model_kwargs)
    policy = get_policy(precision)

    @jax.jit
    def fn(x):
        params_c = policy.cast_to_compute(params)
        out = model.apply(params_c, x.astype(policy.compute_dtype))
        return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)

    return tiled_apply(fn, img, scale, tile=tile, halo=halo, batch=batch,
                       blend=blend, pad_mode=pad_mode)
