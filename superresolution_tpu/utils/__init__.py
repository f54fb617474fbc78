from superresolution_tpu.utils.config import (  # noqa: F401
    Config,
    ModelConfig,
    DataConfig,
    TrainConfig,
    LossConfig,
    MeshConfig,
    presets,
    get_preset,
)
from superresolution_tpu.utils.precision import Policy, DEFAULT_POLICY  # noqa: F401
