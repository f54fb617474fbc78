"""Synthetic LR degradation pipeline, fully in-graph (jit/vmap-able).

The reference trains on real co-registered telescope LR frames and has no
degradation model (SURVEY.md section 2, "Degradation / LR-synthesis model").
Standard-SR training (DIV2K / Set5 / Set14, BASELINE configs) requires
synthesizing LR from HR: blur -> bicubic downscale -> noise -> JPEG. All
stages here are static-shape jnp ops so the whole pipeline fuses into the
device-side input stage (no host round-trip), including an 8x8 block-DCT
JPEG model that runs as batched matmuls on the MXU.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from superresolution_tpu.ops.resize import resize_bicubic

_BLUR_KSIZE = 21  # fixed support so shapes stay static; sigma is traced


def _gaussian_1d_traced(sigma: jnp.ndarray, size: int = _BLUR_KSIZE) -> jnp.ndarray:
    xs = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(xs**2) / (2.0 * jnp.maximum(sigma, 1e-4) ** 2))
    return g / jnp.sum(g)


def gaussian_blur_random(x: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Separable Gaussian blur of HWC `x` with a *traced* scalar sigma.

    sigma <= 0 degenerates to (numerically) a delta kernel, i.e. no blur.
    """
    g = _gaussian_1d_traced(sigma).astype(x.dtype)
    c = x.shape[-1]
    xb = x[None]  # NHWC
    kh = jnp.broadcast_to(g[:, None, None, None], (_BLUR_KSIZE, 1, 1, c))
    kw = jnp.broadcast_to(g[None, :, None, None], (1, _BLUR_KSIZE, 1, c))
    out = jax.lax.conv_general_dilated(
        xb, kh, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    out = jax.lax.conv_general_dilated(
        out, kw, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return out[0]


def degrade_bicubic(hr: jnp.ndarray, scale: int) -> jnp.ndarray:
    """PIL/MATLAB-convention bicubic x1/scale downscale of HWC/NHWC `hr`
    (a=-0.5, antialiased, border window renormalized)."""
    h, w = hr.shape[-3], hr.shape[-2]
    return resize_bicubic(hr, (h // scale, w // scale), a=-0.5,
                          antialias=True, border="renorm")


def add_gaussian_noise(key: jax.Array, x: jnp.ndarray, sigma255: jnp.ndarray) -> jnp.ndarray:
    """Additive white Gaussian noise; sigma expressed in 8-bit units."""
    noise = jax.random.normal(key, x.shape, dtype=x.dtype) * (sigma255 / 255.0)
    return jnp.clip(x + noise, 0.0, 1.0)


# ----------------------------------------------------------------------------
# In-graph JPEG model: 8x8 block DCT + quality-scaled quantization.
# ----------------------------------------------------------------------------

_Q_LUMA = np.array(
    [[16, 11, 10, 16, 24, 40, 51, 61],
     [12, 12, 14, 19, 26, 58, 60, 55],
     [14, 13, 16, 24, 40, 57, 69, 56],
     [14, 17, 22, 29, 51, 87, 80, 62],
     [18, 22, 37, 56, 68, 109, 103, 77],
     [24, 35, 55, 64, 81, 104, 113, 92],
     [49, 64, 78, 87, 103, 121, 120, 101],
     [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.float32)


@lru_cache(maxsize=None)
def _dct8() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix."""
    n = 8
    d = np.zeros((n, n), dtype=np.float64)
    for k in range(n):
        for i in range(n):
            d[k, i] = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    d *= np.sqrt(2.0 / n)
    d[0] /= np.sqrt(2.0)
    return d.astype(np.float32)


def _quality_scale(quality: jnp.ndarray) -> jnp.ndarray:
    """libjpeg quality -> quant-table scale factor (traced)."""
    q = jnp.clip(quality, 1.0, 100.0)
    return jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q)


def jpeg_compress(x: jnp.ndarray, quality: jnp.ndarray) -> jnp.ndarray:
    """Grayscale-model JPEG round-trip on HWC `x` in [0,1], traced quality.

    Applies the luminance path per channel (no chroma subsampling) — the
    standard differentiable-JPEG approximation for degradation training.
    H and W must be multiples of 8.
    """
    h, w, c = x.shape
    if h % 8 or w % 8:
        raise ValueError("jpeg_compress needs H, W divisible by 8")
    d = jnp.asarray(_dct8())
    scale = _quality_scale(quality)
    qtab = jnp.clip(jnp.floor((jnp.asarray(_Q_LUMA) * scale + 50.0) / 100.0), 1.0, 255.0)

    v = x.astype(jnp.float32) * 255.0 - 128.0
    blocks = v.reshape(h // 8, 8, w // 8, 8, c).transpose(0, 2, 4, 1, 3)  # [bh,bw,c,8,8]
    coef = jnp.einsum("ki,...ij,lj->...kl", d, blocks, d, precision="highest")
    coef = jnp.round(coef / qtab) * qtab
    rec = jnp.einsum("ki,...kl,lj->...ij", d, coef, d, precision="highest")
    out = rec.transpose(0, 3, 1, 4, 2).reshape(h, w, c)
    return jnp.clip((out + 128.0) / 255.0, 0.0, 1.0)


def degradation_pipeline(
    key: jax.Array,
    hr: jnp.ndarray,
    scale: int,
    mode: str = "bicubic",
    blur_sigma: tuple[float, float] = (0.2, 2.0),
    noise_sigma: tuple[float, float] = (0.0, 10.0),
    jpeg_quality: tuple[float, float] = (60.0, 95.0),
) -> jnp.ndarray:
    """HWC HR [0,1] -> HWC LR [0,1]. Pure function of (key, hr); vmap over
    batch for per-sample random degradation parameters."""
    if mode == "none":
        raise ValueError("mode='none' means real LR is supplied by the dataset")
    if mode == "bicubic":
        return jnp.clip(degrade_bicubic(hr, scale), 0.0, 1.0)
    k_blur, k_noise, k_jpeg, k_q = jax.random.split(key, 4)
    sigma = jax.random.uniform(k_blur, (), minval=blur_sigma[0], maxval=blur_sigma[1])
    lr = gaussian_blur_random(hr, sigma)
    lr = jnp.clip(degrade_bicubic(lr, scale), 0.0, 1.0)
    if mode == "blur_bicubic":
        return lr
    if mode == "bsr_light":
        ns = jax.random.uniform(k_noise, (), minval=noise_sigma[0], maxval=noise_sigma[1])
        lr = add_gaussian_noise(k_jpeg, lr, ns)
        q = jax.random.uniform(k_q, (), minval=jpeg_quality[0], maxval=jpeg_quality[1])
        return jpeg_compress(lr, q)
    raise ValueError(f"unknown degradation mode {mode!r}")
