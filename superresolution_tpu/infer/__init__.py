from superresolution_tpu.infer.tiled import tiled_apply, upscale  # noqa: F401
from superresolution_tpu.infer.tiled_device import (  # noqa: F401
    make_tiled_infer,
    make_tiled_infer_staged,
    upscale_on_device,
)
