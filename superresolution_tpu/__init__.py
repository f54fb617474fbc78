"""superresolution_tpu — a TPU-native single-image super-resolution framework.

A ground-up JAX/XLA/Pallas re-design of the capability surface of
``GDev96/SuperResolution`` (see SURVEY.md): conv/attention SR model family
(SRCNN/ESPCN/FSRCNN/EDSR/RRDBNet/HAT-style refiner/hybrid two-stage),
star-weighted/Charbonnier/perceptual/adversarial losses, PSNR/SSIM metrics,
mesh data-parallel training with gradient accumulation and bf16 policy,
checkpoint/resume, overlap-halo tiled inference, a synthetic degradation
pipeline, and the astronomy ETL (FITS/WCS patch pairing, log-stretch
normalization) as an optional host-side module.

Public top-level API:
    upscale(img, scale, ...)        -- tiled SR inference on arbitrary images
    build_model(name, **overrides)  -- model factory for the SR family
    presets                         -- the five BASELINE.json named configs
"""

__version__ = "0.1.0"

from superresolution_tpu.api import upscale, build_model  # noqa: F401
from superresolution_tpu.utils.config import presets  # noqa: F401
