"""Optimiser, LR schedules, EMA (train.py:448-478, nets/yolo_training.py:449-536).

Parameter grouping mirrors the reference's pg0/pg1/pg2 split
(train.py:460-473): weight decay applies only to conv/dense kernels
(ndim >= 2); BN/GroupNorm scales, biases and scalar params are decay-free.
The decay is implemented with optax.add_decayed_weights + mask, composed with
SGD-nesterov or Adam; the learning rate is injected as a dynamic hyperparam
so the host-side epoch schedule can set it each epoch, exactly like
set_optimizer_lr (yolo_training.py:539-542).
"""
from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from asy_vrnet_tpu.config import OptimConfig


def adaptive_lr(cfg: OptimConfig, batch_size: int) -> tuple[float, float]:
    """Batch-size-adaptive init/min lr with optimiser clamps (train.py:451-455)."""
    if cfg.optimizer == "adam":
        lr_max, lr_min = 1e-3, 3e-4
    else:
        lr_max, lr_min = 5e-2, 5e-4
    init_lr = min(max(batch_size / cfg.nbs * cfg.init_lr, lr_min), lr_max)
    min_lr_target = cfg.init_lr * cfg.min_lr_ratio
    min_lr = min(
        max(batch_size / cfg.nbs * min_lr_target, lr_min * 1e-2), lr_max * 1e-2
    )
    return init_lr, min_lr


def yolox_warm_cos_lr(
    lr: float, min_lr: float, total_iters: int,
    warmup_iters_ratio: float = 0.05, warmup_lr_ratio: float = 0.1,
    no_aug_iter_ratio: float = 0.05,
) -> Callable[[float], float]:
    """Quadratic-warmup cosine schedule (yolo_training.py:506-517,526-530)."""
    warmup_total = min(max(warmup_iters_ratio * total_iters, 1), 3)
    warmup_start = max(warmup_lr_ratio * lr, 1e-6)
    no_aug = min(max(no_aug_iter_ratio * total_iters, 1), 15)

    def f(iters: float) -> float:
        if iters <= warmup_total:
            return (lr - warmup_start) * (iters / warmup_total) ** 2 + warmup_start
        if iters >= total_iters - no_aug:
            return min_lr
        return min_lr + 0.5 * (lr - min_lr) * (
            1.0 + math.cos(
                math.pi * (iters - warmup_total) / (total_iters - warmup_total - no_aug)
            )
        )

    return f


def step_lr(lr: float, min_lr: float, total_iters: int, step_num: int = 10
            ) -> Callable[[float], float]:
    """Step decay (yolo_training.py:519-524,531-534)."""
    decay_rate = (min_lr / lr) ** (1 / (step_num - 1))
    step_size = total_iters / step_num

    def f(iters: float) -> float:
        return lr * decay_rate ** (iters // step_size)

    return f


def make_lr_schedule(cfg: OptimConfig, batch_size: int, total_epochs: int
                     ) -> Callable[[float], float]:
    init_lr, min_lr = adaptive_lr(cfg, batch_size)
    if cfg.lr_decay_type == "cos":
        return yolox_warm_cos_lr(
            init_lr, min_lr, total_epochs,
            cfg.warmup_iters_ratio, cfg.warmup_lr_ratio, cfg.no_aug_iter_ratio,
        )
    return step_lr(init_lr, min_lr, total_epochs, cfg.step_num)


def decay_mask(params) -> Any:
    """True for leaves that receive weight decay (kernels, ndim >= 2)."""
    return jax.tree.map(lambda p: p.ndim >= 2, params)


def flat_decay_mask(params) -> jnp.ndarray:
    """decay_mask as a 0/1 f32 vector in ravel_pytree leaf order."""
    from jax.flatten_util import ravel_pytree

    return ravel_pytree(
        jax.tree.map(
            lambda p: jnp.full(p.shape, float(p.ndim >= 2), jnp.float32), params
        )
    )[0]


def _add_flat_decayed_weights(
    weight_decay: float, mask_vec: jnp.ndarray
) -> optax.GradientTransformation:
    """add_decayed_weights for a flattened update vector, masked elementwise
    (replaces optax.masked(add_decayed_weights, tree_mask) under
    optax.flatten, where a tree mask no longer matches)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return updates + weight_decay * mask_vec * params, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: OptimConfig, params) -> optax.GradientTransformation:
    """SGD-nesterov / Adam with pg-style selective weight decay and an
    injected (mutable) learning rate.

    The whole transformation runs on ONE flattened parameter vector
    (optax.flatten): the model has ~800 small leaves, and per-leaf optimiser
    math costs ~40 ms/step of fixed per-op overhead on TPU — two orders of
    magnitude more than the actual FLOPs.  Flattening collapses it to a
    handful of vector ops.  The optimizer state (momentum trace) is stored
    flat; set/get_learning_rate still address the inject_hyperparams state
    at the end of the chain."""
    if cfg.optimizer == "sgd":
        base = optax.trace(decay=cfg.momentum, nesterov=cfg.nesterov)
    elif cfg.optimizer == "adam":
        base = optax.scale_by_adam(b1=cfg.momentum, b2=0.999)
    else:
        raise ValueError(cfg.optimizer)
    tx = optax.chain(
        _add_flat_decayed_weights(cfg.weight_decay, flat_decay_mask(params)),
        base,
        # dynamic lr: scale_by_learning_rate with injected value
        optax.inject_hyperparams(
            lambda learning_rate: optax.scale(-learning_rate)
        )(learning_rate=1e-3),
    )
    return optax.flatten(tx)


def _find_inject_state(opt_state):
    """Locate the InjectHyperparamsState carrying `learning_rate` anywhere in
    the optimizer-state structure (don't assume the chain's tuple layout —
    reordering the optax chain must not silently break LR control)."""
    if hasattr(opt_state, "hyperparams") and "learning_rate" in getattr(
        opt_state, "hyperparams", {}
    ):
        return opt_state
    if isinstance(opt_state, (tuple, list)):
        for sub in opt_state:
            found = _find_inject_state(sub)
            if found is not None:
                return found
    return None


def _replace_inject_state(opt_state, new_inner):
    if hasattr(opt_state, "hyperparams") and "learning_rate" in getattr(
        opt_state, "hyperparams", {}
    ):
        return new_inner
    if isinstance(opt_state, tuple):
        replaced = tuple(_replace_inject_state(sub, new_inner) for sub in opt_state)
        if hasattr(opt_state, "_fields"):
            return type(opt_state)(*replaced)
        return replaced
    return opt_state


def injected_learning_rate(opt_state) -> jnp.ndarray:
    """The current injected LR as a traced scalar (jit-safe)."""
    inner = _find_inject_state(opt_state)
    if inner is None:
        raise ValueError("no inject_hyperparams(learning_rate) state found")
    return inner.hyperparams["learning_rate"]


def set_learning_rate(opt_state, lr: float):
    """Set the injected learning rate in the optimiser state."""
    inner = _find_inject_state(opt_state)
    if inner is None:
        raise ValueError("no inject_hyperparams(learning_rate) state found")
    new_inner = inner._replace(
        hyperparams={**inner.hyperparams, "learning_rate": jnp.asarray(lr, jnp.float32)}
    )
    return _replace_inject_state(opt_state, new_inner)


def get_learning_rate(opt_state) -> float:
    return float(injected_learning_rate(opt_state))


def ema_decay_schedule(updates: jnp.ndarray, decay: float = 0.9999,
                       tau: float = 2000.0) -> jnp.ndarray:
    """Ramped EMA decay d(t) = decay*(1-exp(-t/tau)) (yolo_training.py:461)."""
    return decay * (1.0 - jnp.exp(-updates / tau))


def ema_update(ema_tree, new_tree, d: jnp.ndarray):
    """v_ema = d*v_ema + (1-d)*v for every float leaf (yolo_training.py:465-475).

    When all leaves share one float dtype the update runs on a single
    ravelled vector (2 fused vector ops instead of ~3 tiny ops per leaf —
    per-leaf overhead dominates at ~800 leaves)."""
    from jax.flatten_util import ravel_pytree

    leaves = jax.tree.leaves(ema_tree)
    if leaves and all(
        jnp.issubdtype(l.dtype, jnp.floating) and l.dtype == leaves[0].dtype
        for l in leaves
    ):
        flat_e, unravel = ravel_pytree(ema_tree)
        flat_n, _ = ravel_pytree(new_tree)
        return unravel(d * flat_e + (1.0 - d) * flat_n)

    def upd(e, n):
        if jnp.issubdtype(e.dtype, jnp.floating):
            return d * e + (1.0 - d) * n
        return n

    return jax.tree.map(upd, ema_tree, new_tree)
