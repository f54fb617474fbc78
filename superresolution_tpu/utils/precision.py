"""Mixed-precision policy: the TPU analog of the reference's AMP.

The reference wraps its forward pass in torch.cuda.amp.autocast with a
GradScaler (reference: scripts/Modello_supporto.py:113,128-141). On TPU the
idiomatic equivalent is bfloat16 compute with float32 parameters and float32
metrics/loss accumulation — bf16 has fp32's exponent range, so no loss
scaling is required.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    def cast_to_param(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.param_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    def cast_to_output(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.output_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)


def get_policy(name: str) -> Policy:
    if name in ("bf16", "bfloat16", "mixed"):
        return DEFAULT_POLICY
    if name in ("fp32", "float32", "full"):
        return FP32_POLICY
    raise ValueError(f"unknown precision policy {name!r}")
