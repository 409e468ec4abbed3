"""Segmentation-only training step (utils_seg/utils_fit.py:13 — the seg-only
fit variant the reference ships alongside the joint path).

Trains the full EfficientVRNet with only the segmentation head supervised
(detection branch runs but receives no gradient).  Pairs with
data/seg_dataset.py::SegOnlyDataset; radar is optional (zeros when absent,
matching a camera-only ablation).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from asy_vrnet_tpu.config import Config
from asy_vrnet_tpu.ops.losses_seg import f_score
from asy_vrnet_tpu.train.state import TrainState
from asy_vrnet_tpu.train.train_step import seg_onehot_of, segmentation_loss


def build_seg_train_step(
    model, cfg: Config, tx: optax.GradientTransformation
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    radar_ch = cfg.model.radar_channels

    def train_step(state: TrainState, batch: dict):
        from asy_vrnet_tpu.data.preprocess import maybe_normalize_image_device

        image = maybe_normalize_image_device(batch["image"])
        radar = batch.get("radar")
        if radar is None:
            b, h, w, _ = image.shape
            radar = jnp.zeros((b, h, w, radar_ch), image.dtype)

        def loss_fn(params):
            (det, seg), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image, radar, train=True, mutable=["batch_stats"],
            )
            onehot = seg_onehot_of(batch, cfg.model.num_seg_classes)
            loss = segmentation_loss(cfg, seg, batch["seg_target"], onehot)
            metrics = {
                "loss": loss,
                "loss_seg": loss,
                "f_score": f_score(seg, onehot),
            }
            return loss, (mutated["batch_stats"], metrics)

        (_, (new_bstats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        state = state.replace(
            params=new_params, batch_stats=new_bstats,
            opt_state=new_opt_state, step=state.step + 1,
        )
        if cfg.optim.ema:
            state = state.apply_ema(cfg.optim.ema_decay, cfg.optim.ema_tau)
        return state, metrics

    return train_step
