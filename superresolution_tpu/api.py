"""Top-level public API: `upscale` and `build_model`.

Mirrors (and completes) the reference's inference surface
(reference: scripts/Modello_5.py:35-91), adding arbitrary-size tiled
execution that the reference lacks.
"""

from __future__ import annotations

from typing import Any


def build_model(name: str, **kwargs) -> Any:
    """Construct an SR model by registry name (see superresolution_tpu.models)."""
    from superresolution_tpu.models import get_model

    return get_model(name, **kwargs)


def upscale(img, scale: int = 4, *, model=None, params=None,
            tile: int = 256, halo: int = 16, **model_kwargs):
    """Super-resolve an HWC (or HW) image array by `scale` with overlap-halo
    tiled inference. See superresolution_tpu.infer.tiled for the mechanism."""
    from superresolution_tpu.infer import upscale as _upscale

    return _upscale(img, scale, model=model, params=params, tile=tile,
                    halo=halo, **model_kwargs)
