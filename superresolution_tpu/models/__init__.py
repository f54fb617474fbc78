"""SR model registry.

The family covers the BASELINE configs (SRCNN/ESPCN/FSRCNN/EDSR/ESRGAN-RRDB)
plus the reference's two-stage hybrid pattern (RRDB trunk -> windowed-
attention refiner -> smoothing; reference: src/architecture.py:30-82) and
the ESRGAN discriminator. All models are flax.linen modules over NHWC
float tensors in [0,1]: `model.apply(params, lr) -> sr`.
"""

from superresolution_tpu.models.srcnn import SRCNN  # noqa: F401
from superresolution_tpu.models.espcn import ESPCN  # noqa: F401
from superresolution_tpu.models.fsrcnn import FSRCNN  # noqa: F401
from superresolution_tpu.models.edsr import EDSR  # noqa: F401
from superresolution_tpu.models.rrdbnet import RRDBNet  # noqa: F401
from superresolution_tpu.models.hat_lite import HATLite  # noqa: F401
from superresolution_tpu.models.hybrid import HybridSR  # noqa: F401
from superresolution_tpu.models.discriminator import VGGStyleDiscriminator  # noqa: F401

_REGISTRY = {
    "srcnn": SRCNN,
    "espcn": ESPCN,
    "fsrcnn": FSRCNN,
    "edsr": EDSR,
    "rrdbnet": RRDBNet,
    "hat_lite": HATLite,
    "hybrid": HybridSR,
    "discriminator": VGGStyleDiscriminator,
}


def get_model(name: str, **kwargs):
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def register_model(name: str, cls) -> None:
    _REGISTRY[name] = cls
