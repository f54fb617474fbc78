"""CombinedLoss — weighted sum of named terms with a per-component dict.

Mirrors the contract of both reference generations: current tree's
star-weighted L1 returning (loss, {'total','weighted_l1'}) (reference:
src/losses.py:5-20) and the Backup Charbonnier+perceptual+astro combination
returning per-component logs (reference: Backup/src/losses.py:62-71).
GAN terms are handled by the training engine (they need discriminator
logits), not here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from superresolution_tpu.losses.basic import (
    astro_loss,
    charbonnier_loss,
    l1_loss,
    l2_loss,
    star_weighted_l1,
)
from superresolution_tpu.losses.perceptual import perceptual_loss
from superresolution_tpu.utils.config import LossConfig


@dataclass
class CombinedLoss:
    config: LossConfig = field(default_factory=LossConfig)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray):
        cfg = self.config
        total = jnp.float32(0.0)
        logs: dict[str, jnp.ndarray] = {}
        for name, weight in cfg.terms.items():
            if name == "l1":
                v = l1_loss(pred, target)
            elif name == "l2":
                v = l2_loss(pred, target)
            elif name == "charbonnier":
                v = charbonnier_loss(pred, target, cfg.charbonnier_eps)
            elif name in ("star_l1", "star_l1_pallas"):
                # on TPU the fused Pallas kernel is the production path
                # (one VMEM pass, no weight map materialized); the jnp form
                # is the CPU/GPU fallback and the explicit 'star_l1' choice
                # nowhere Pallas-capable
                import jax

                if name == "star_l1_pallas" or jax.default_backend() == "tpu":
                    from superresolution_tpu.ops.pallas_loss import (
                        star_weighted_l1_pallas)

                    v = star_weighted_l1_pallas(pred, target,
                                                cfg.star_threshold,
                                                cfg.star_weight)
                else:
                    v = star_weighted_l1(pred, target, cfg.star_threshold,
                                         cfg.star_weight)
            elif name == "astro":
                v = astro_loss(pred, target, cfg.astro_weight_scale,
                               cfg.charbonnier_eps)
            elif name == "perceptual":
                v = perceptual_loss(pred, target,
                                    tap=cfg.perceptual_layers[0])
            elif name == "gan":
                continue  # adversarial term is added by the GAN train step
            else:
                raise ValueError(f"unknown loss term {name!r}")
            logs[name] = v
            total = total + weight * v
        logs["total"] = total
        return total, logs
