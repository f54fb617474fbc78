from superresolution_tpu.train.state import TrainState, make_optimizer  # noqa: F401
from superresolution_tpu.train.steps import (  # noqa: F401
    make_device_input,
    make_train_step,
    make_eval_step,
)
from superresolution_tpu.train.checkpoint import CheckpointManager  # noqa: F401
from superresolution_tpu.train.trainer import Trainer  # noqa: F401
