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
            tile: int = 256, halo: int = 16, on_device: bool = False,
            **model_kwargs):
    """Super-resolve an HWC (or HW) image array by `scale` with overlap-halo
    tiled inference. See superresolution_tpu.infer.tiled for the mechanism.

    on_device=True runs the whole tile loop as ONE jitted program with the
    output kept in HBM (infer/tiled_device.py) — the production-serving
    path; the default host tiler streams tiles and also handles images
    larger than HBM."""
    if on_device:
        import jax.numpy as jnp
        import numpy as np

        from superresolution_tpu.infer.tiled import _default_model_params
        from superresolution_tpu.infer.tiled_device import upscale_on_device
        from superresolution_tpu.utils.precision import get_policy

        # host-tiler options must not leak into the model constructor
        batch = model_kwargs.pop("batch", 8)
        precision = model_kwargs.pop("precision", "bf16")
        for k in ("blend", "pad_mode"):
            if k in model_kwargs:
                raise ValueError(
                    f"{k!r} applies to the host tiler only (the on-device"
                    " path always uses exact crop blending)")
        arr = np.asarray(img)
        squeeze = arr.ndim == 2
        if squeeze:
            arr = arr[..., None]
        model, params = _default_model_params(arr, scale, model, params,
                                              tile=tile, halo=halo,
                                              **model_kwargs)
        out = upscale_on_device(
            jnp.asarray(arr), scale, model, params, tile=tile, halo=halo,
            batch=batch,
            compute_dtype=get_policy(precision).compute_dtype)
        return out[..., 0] if squeeze else out
    from superresolution_tpu.infer import upscale as _upscale

    return _upscale(img, scale, model=model, params=params, tile=tile,
                    halo=halo, **model_kwargs)
