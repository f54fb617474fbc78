from superresolution_tpu.infer.tiled import tiled_apply, upscale  # noqa: F401
