"""Build a generator from a ModelConfig, including the two-stage hybrid
composition (reference pattern: src/architecture.py:30-82)."""

from __future__ import annotations

from superresolution_tpu.models import get_model
from superresolution_tpu.models.hybrid import HybridSR
from superresolution_tpu.utils.config import ModelConfig


def total_scale(mc: ModelConfig) -> int:
    s = mc.scale
    if mc.refiner:
        # default must match what get_model actually builds when
        # refiner_kwargs omits 'scale' (HATLite defaults to scale=2) —
        # a mismatch would size the tiled-inference output wrong
        s *= mc.refiner_kwargs.get("scale", 2)
    return s


def _tuplify(kw: dict) -> dict:
    """JSON round-trips turn tuples into lists; flax module fields want
    hashable tuples back (e.g. HATLite depths/num_heads)."""
    return {k: tuple(v) if isinstance(v, list) else v for k, v in kw.items()}


def build_from_config(mc: ModelConfig, output_size: int | None = None):
    stage1 = get_model(mc.name, scale=mc.scale, in_channels=mc.in_channels,
                       out_channels=mc.out_channels, **_tuplify(mc.kwargs))
    if mc.refiner is None and mc.smoothing in (None, "none"):
        return stage1
    stage2 = None
    if mc.refiner is not None:
        stage2 = get_model(mc.refiner, in_channels=mc.out_channels,
                           out_channels=mc.out_channels,
                           **_tuplify(mc.refiner_kwargs))
    return HybridSR(stage1=stage1, stage2=stage2,
                    output_size=output_size, smoothing=mc.smoothing)
