"""Training state: params + batch stats + optimiser + EMA + counters.

Unlike the reference (weights-only torch.save, utils/utils_fit.py:213-226),
the full state — including optimiser momentum, EMA and step counters — is a
single pytree, checkpointable with orbax and shardable with jax.sharding.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from asy_vrnet_tpu.config import Config
from asy_vrnet_tpu.train.optim import (
    ema_decay_schedule,
    ema_update,
    make_optimizer,
)


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    # multitask uncertainty log-variance (utils/multitaskloss.py:10) — a
    # *persistently learned* parameter here, fixing the reference's
    # re-instantiation bug (utils/utils_fit.py:74).
    log_var: jnp.ndarray
    ema_params: Any
    ema_batch_stats: Any
    ema_updates: jnp.ndarray    # EMA update counter (ModelEMA.updates)
    step: jnp.ndarray

    def apply_ema(self, ema_decay: float, ema_tau: float) -> "TrainState":
        updates = self.ema_updates + 1.0
        d = ema_decay_schedule(updates, ema_decay, ema_tau)
        return self.replace(
            ema_params=ema_update(self.ema_params, self.params, d),
            ema_batch_stats=ema_update(self.ema_batch_stats, self.batch_stats, d),
            ema_updates=updates,
        )


def create_train_state(cfg: Config, params, batch_stats) -> tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(cfg.optim, params)
    opt_state = tx.init(params)
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        log_var=jnp.zeros((), jnp.float32),
        ema_params=jax.tree.map(jnp.copy, params),
        ema_batch_stats=jax.tree.map(jnp.copy, batch_stats),
        ema_updates=jnp.zeros((), jnp.float32),
        step=jnp.zeros((), jnp.int32),
    )
    return state, tx


def eval_variables(state: TrainState, use_ema: bool = True) -> dict:
    """Variables dict for evaluation (EMA weights preferred, like
    utils/utils_fit.py:139-142)."""
    if use_ema:
        return {"params": state.ema_params, "batch_stats": state.ema_batch_stats}
    return {"params": state.params, "batch_stats": state.batch_stats}
