"""The training loop: freeze/unfreeze phases, per-epoch LR, val pass,
callbacks, checkpointing (train.py:563-622 + utils/utils_fit.py:17-226).
"""
from __future__ import annotations

import os
import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.config import Config
from asy_vrnet_tpu.data.dataset import DataLoader, device_prefetch
from asy_vrnet_tpu.parallel.mesh import (
    batch_sharding,
    build_parallel_eval_step,
    build_parallel_train_step,
    make_mesh,
    replicate_state,
)
from asy_vrnet_tpu.train.callbacks import DetEvalCallback, LossHistory, SegEvalCallback
from asy_vrnet_tpu.train.checkpoint import save_checkpoint, save_weights
from asy_vrnet_tpu.train.optim import make_lr_schedule, set_learning_rate
from asy_vrnet_tpu.train.state import TrainState, eval_variables
from asy_vrnet_tpu.train.train_step import build_eval_step, build_train_step


def _mean_metrics(metric_dicts: list[dict]) -> dict:
    """Epoch-mean of per-step metric dicts with ONE host transfer.

    Pulling float(m[k]) per step per key forces steps_per_epoch * n_keys
    blocking round trips (each ~30 ms through a relay) and serialises the
    otherwise-async dispatch of the training steps; stacking on device and
    fetching once keeps the epoch loop free-running."""
    if not metric_dicts:
        return {}
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *metric_dicts)
    means = jax.device_get(jax.tree.map(jnp.mean, stacked))
    return {k: float(v) for k, v in means.items()}


def fit(
    model,
    cfg: Config,
    state: TrainState,
    tx,
    train_loader: DataLoader,
    val_loader: Optional[DataLoader] = None,
    class_names: Optional[Sequence[str]] = None,
    mesh=None,
    log: Callable[[str], None] = print,
) -> TrainState:
    """Run the full schedule; returns the final state."""
    tcfg = cfg.train
    save_dir = tcfg.save_dir
    os.makedirs(save_dir, exist_ok=True)

    loss_history = LossHistory(os.path.join(save_dir, "loss"), "det_seg")
    det_cb = seg_cb = None
    if val_loader is not None and class_names is not None:
        det_cb = DetEvalCallback(
            model, cfg, val_loader, class_names, save_dir,
            period=tcfg.eval_period, conf_thres=tcfg.eval_conf_thres,
            max_det=tcfg.eval_max_det,
        )
        seg_cb = SegEvalCallback(model, cfg, val_loader, save_dir, period=tcfg.eval_period)

    freeze = tcfg.freeze_epoch > tcfg.init_epoch
    # The reference trains the frozen phase at a larger batch (train.py:90,
    # 568-606 rebuilds loaders and re-derives the adaptive LR at the
    # transition); mirror that with a per-phase loader + schedule.
    schedule = make_lr_schedule(cfg.optim, tcfg.batch_size, tcfg.epochs)
    schedule_frozen = make_lr_schedule(cfg.optim, tcfg.freeze_batch_size, tcfg.epochs)
    frozen_loader = None
    if freeze and tcfg.freeze_batch_size != train_loader.batch_size:
        frozen_loader = DataLoader(
            train_loader.dataset, tcfg.freeze_batch_size,
            shuffle=train_loader.shuffle, prefetch=train_loader.prefetch,
            drop_last=train_loader.drop_last, workers=train_loader.workers,
        )
    step_frozen = build_train_step(model, cfg, tx, freeze_backbone=True)
    step_unfrozen = build_train_step(model, cfg, tx, freeze_backbone=False)
    ev_step = build_eval_step(model, cfg)
    if mesh is not None:
        step_frozen = build_parallel_train_step(step_frozen, mesh)
        step_unfrozen = build_parallel_train_step(step_unfrozen, mesh)
        ev_step = build_parallel_eval_step(ev_step, mesh)
        state = replicate_state(state, mesh)
    else:
        # donate the state: params/momentum/EMA update in place
        step_frozen = jax.jit(step_frozen, donate_argnums=(0,))
        step_unfrozen = jax.jit(step_unfrozen, donate_argnums=(0,))
        ev_step = jax.jit(ev_step)

    best_val = float("inf")
    for epoch in range(tcfg.init_epoch, tcfg.epochs):
        frozen = freeze and epoch < tcfg.freeze_epoch
        step_fn = step_frozen if frozen else step_unfrozen
        loader = frozen_loader if (frozen and frozen_loader is not None) else train_loader
        lr = (schedule_frozen if frozen else schedule)(epoch)
        state = state.replace(opt_state=set_learning_rate(state.opt_state, lr))

        t0 = time.time()
        train_metrics = []
        sharding = batch_sharding(mesh) if mesh is not None else None
        for db in device_prefetch(iter(loader), sharding=sharding):
            db.pop("image_id", None)
            state, metrics = step_fn(state, db)
            train_metrics.append(metrics)
        tm = _mean_metrics(train_metrics)

        vm = {}
        if val_loader is not None:
            val_metrics = []
            variables = eval_variables(state, use_ema=cfg.optim.ema)
            for db in device_prefetch(iter(val_loader), sharding=sharding):
                db.pop("image_id", None)
                val_metrics.append(ev_step(variables, db))
            vm = _mean_metrics(val_metrics)

        log(
            f"epoch {epoch + 1}/{tcfg.epochs} lr={lr:.2e} "
            f"loss={tm.get('loss', float('nan')):.3f} "
            f"det={tm.get('loss_det', float('nan')):.3f} "
            f"seg={tm.get('loss_seg', float('nan')):.3f} "
            f"val={vm.get('loss', float('nan')):.3f} "
            f"f_score={tm.get('f_score', float('nan')):.3f} "
            f"({time.time() - t0:.1f}s{' frozen' if frozen else ''})"
        )
        loss_history.append_loss(
            epoch + 1, tm.get("loss", float("nan")), vm.get("loss", float("nan"))
        )

        variables = eval_variables(state, use_ema=cfg.optim.ema)
        if det_cb is not None:
            ap = det_cb.on_epoch_end(epoch + 1, variables)
            if ap is not None:
                log(f"  val AP50 = {ap:.4f}")
        if seg_cb is not None:
            miou = seg_cb.on_epoch_end(epoch + 1, variables)
            if miou is not None:
                log(f"  val mIoU = {miou:.4f}")

        # checkpoints: periodic, best (val-loss improvement), last
        if (epoch + 1) % tcfg.save_period == 0 or epoch + 1 == tcfg.epochs:
            save_checkpoint(os.path.join(save_dir, "ckpt"), state, step=epoch + 1)
        if vm and vm["loss"] <= best_val:
            best_val = vm["loss"]
            save_weights(
                os.path.join(save_dir, "best_epoch_weights.npz"),
                variables["params"], variables["batch_stats"],
            )
        save_weights(
            os.path.join(save_dir, "last_epoch_weights.npz"),
            variables["params"], variables["batch_stats"],
        )
    loss_history.close()
    return state
