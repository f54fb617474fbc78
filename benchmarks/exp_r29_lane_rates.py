"""Lane-width HBM rate probe at the stage-2 channel counts.

The flagship HAT runs every activation at C=96 (and the HAB MLP at
C=192); bench.py's DMA probe only measures 64 vs 128. If 96-lane
tensors ride at the degraded sub-128 rate, a pad-to-128 deploy
transform for stage 2 is worth tens of ms/frame; if 96 already moves
at full rate, that lever is dead. Same total bytes per config
(24 x 376 x 18432 elements, bf16), grid-pipelined Pallas passthrough,
house-rule marginal timing (bench.py _marginal_ms).

Usage (on the TPU chip): python benchmarks/exp_r29_lane_rates.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superresolution_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

import bench  # noqa: E402  (for _marginal_ms, the trusted timer)


def make_pt(shape, rb):
    b, h, w2, c2 = shape
    nb = h // rb

    def kernel(mid_ref, out_ref):
        out_ref[0] = mid_ref[0]

    def apply(x):
        mid = x.reshape(b * nb, rb, w2, c2)
        out = pl.pallas_call(
            kernel,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            grid=(b * nb,),
            in_specs=[pl.BlockSpec((1, rb, w2, c2),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, rb, w2, c2),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * nb, rb, w2, c2),
                                           x.dtype),
        )(mid)
        return out.reshape(b, h, w2, c2)

    return apply


def main():
    for tag, shape in (("lane64", (24, 376, 288, 64)),
                       ("lane96", (24, 376, 192, 96)),
                       ("lane128", (24, 376, 144, 128)),
                       ("lane192", (24, 376, 96, 192)),
                       ("lane256", (24, 376, 72, 256))):
        x = jax.random.normal(jax.random.key(0), shape,
                              jnp.float32).astype(jnp.bfloat16)
        ms = bench._marginal_ms(make_pt(shape, 94), x, iters=10)
        gb = 2 * int(np.prod(shape)) * 2 / 1e9
        print(json.dumps({f"gbps_{tag}": round(gb / (ms / 1e3), 1)}),
              flush=True)


if __name__ == "__main__":
    main()
