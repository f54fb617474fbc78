"""HybridSR — two-stage generator composition with smoothing slots.

Re-creates the reference's HybridSuperResolutionModel forward contract
(reference: src/architecture.py:67-82): stage1 -> smooth -> [stage2 ->
smooth] -> resize-to-output (bicubic a=-0.75, the torch convention) ->
final 'light' smooth. Stage 2 is optional (the reference gracefully
degrades to stage-1-only when HAT import fails, src/architecture.py:45-65).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from superresolution_tpu.ops.blur import anti_checkerboard
from superresolution_tpu.ops.resize import resize_bicubic


class HybridSR(nn.Module):
    stage1: Any = None  # a linen module, e.g. RRDBNet(scale=2, ...)
    stage2: Any = None  # optional refiner, e.g. HATLite(scale=2, ...)
    output_size: int | None = 512
    smoothing: str | None = "balanced"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.stage1 is None:
            raise ValueError("HybridSR requires a stage1 module")
        x = self.stage1(x)
        if self.smoothing:
            x = anti_checkerboard(x, self.smoothing)
        if self.stage2 is not None:
            x = self.stage2(x)
            if self.smoothing:
                x = anti_checkerboard(x, self.smoothing)
        if self.output_size and x.shape[1] != self.output_size:
            x = resize_bicubic(x, (self.output_size, self.output_size),
                               a=-0.75, antialias=False)
        if self.smoothing:
            x = anti_checkerboard(x, "light")
        return x
