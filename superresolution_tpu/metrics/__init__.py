from superresolution_tpu.metrics.psnr_ssim import (  # noqa: F401
    psnr,
    ssim,
    ssim_reference,
    Metrics,
)
