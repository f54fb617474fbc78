"""Train state and optimizer factory.

Optimizer parity targets (reference: scripts/Modello_supporto.py:107-108,
136-141): AdamW + cosine annealing to lr_min + global-norm clip 1.0. The
schedule is per-step (the reference steps per-epoch; identical trajectory
for the same total step count). Optional EMA of params for eval/export.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from superresolution_tpu.utils.config import TrainConfig


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any = None

    def apply_gradients(self, grads, tx, ema_decay=None):
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if self.ema_params is not None and ema_decay is not None:
            d = jnp.asarray(ema_decay, jnp.float32)
            new_ema = jax.tree.map(
                lambda e, p: e * d + p.astype(jnp.float32) * (1.0 - d),
                self.ema_params, new_params)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt, ema_params=new_ema)


def make_optimizer(cfg: TrainConfig, total_steps: int, lr: float | None = None
                   ) -> tuple[optax.GradientTransformation, optax.Schedule]:
    base_lr = lr if lr is not None else cfg.lr
    schedule = optax.cosine_decay_schedule(
        init_value=base_lr,
        decay_steps=max(1, total_steps),
        alpha=cfg.lr_min / base_lr,
    )
    parts = []
    if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    parts.append(optax.adamw(schedule, b1=cfg.betas[0], b2=cfg.betas[1],
                             weight_decay=cfg.weight_decay))
    return optax.chain(*parts), schedule


def create_train_state(params, tx, ema: bool = False) -> TrainState:
    ema_params = jax.tree.map(lambda p: p.astype(jnp.float32), params) if ema else None
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), ema_params=ema_params)
