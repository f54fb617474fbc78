from superresolution_tpu.ops.pixel_shuffle import (  # noqa: F401
    depth_to_space,
    space_to_depth,
)
from superresolution_tpu.ops.blur import (  # noqa: F401
    binomial_kernel,
    gaussian_kernel_1d,
    depthwise_blur,
    anti_checkerboard,
)
from superresolution_tpu.ops.resize import (  # noqa: F401
    resize_bicubic,
    resize_nearest,
    cubic_kernel,
)
from superresolution_tpu.ops.degradation import (  # noqa: F401
    degrade_bicubic,
    gaussian_blur_random,
    add_gaussian_noise,
    jpeg_compress,
    degradation_pipeline,
)
