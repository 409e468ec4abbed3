"""Single fused train/eval step (the TPU equivalent of utils/utils_fit.py:34-131).

The whole step — forward (both tasks), seg losses, SimOTA + YOLOX loss,
multitask combine, backward, optimiser update and EMA — compiles to one XLA
program.  bf16 compute with fp32 params needs no GradScaler; SimOTA runs in
fp32 (ops/simota.py).

Batch layout (all fixed shapes):
  image       (B, H, W, 3)  float32, ImageNet-normalised
  radar       (B, H, W, 4)  float32 (raw — parity with utils/dataloader.py:87)
  gt_boxes    (B, G, 4)     cxcywh absolute pixels
  gt_classes  (B, G)        int32
  gt_valid    (B, G)        bool
  seg_target  (B, H, W)     int32 with ignore == num_seg_classes
  seg_onehot  (B, H, W, S+1) float32 (trailing ignore channel)
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from asy_vrnet_tpu.config import Config
from asy_vrnet_tpu.data.preprocess import maybe_normalize_image_device
from asy_vrnet_tpu.ops.losses_det import yolox_loss
from asy_vrnet_tpu.ops.losses_seg import ce_loss, dice_loss, f_score, focal_loss
from asy_vrnet_tpu.train.state import TrainState


def seg_onehot_of(batch: dict, num_seg_classes: int) -> jnp.ndarray:
    """(B,H,W,S+1) one-hot seg target with the trailing ignore channel.

    Computed on device from the int map when the batch doesn't carry a
    precomputed `seg_onehot`: the host-side one-hot is ~10 MB/sample of CPU
    memset + H2D transfer (the dominant pipeline cost at 512²), while the
    device one_hot fuses into the loss for free."""
    if "seg_onehot" in batch:
        return batch["seg_onehot"]
    return jax.nn.one_hot(
        batch["seg_target"], num_seg_classes + 1, dtype=jnp.float32
    )


def segmentation_loss(cfg: Config, seg_logits, seg_target, seg_onehot):
    lcfg = cfg.loss
    weights = (
        jnp.asarray(lcfg.cls_balance_weights, jnp.float32)
        if lcfg.cls_balance_weights is not None
        else None
    )
    n = cfg.model.num_seg_classes
    if lcfg.focal_loss:
        loss = focal_loss(
            seg_logits, seg_target, weights, n, lcfg.focal_alpha, lcfg.focal_gamma
        )
    else:
        loss = ce_loss(seg_logits, seg_target, weights, n)
    if lcfg.dice_loss:
        loss = loss + dice_loss(seg_logits, seg_onehot)
    return loss


def seg_loss_and_fscore(cfg: Config, seg_logits, batch):
    """(loss_seg, f_score) — fused Pallas kernel on TPU (one pass over
    channel-major tiles, no materialised one-hot; ops/losses_seg_pallas.py),
    oracle composition elsewhere.  bf16 logits I/O under a bf16 compute
    dtype: bit-identical values to the model's pre-cast bf16 output."""
    lcfg = cfg.loss
    use_pallas = lcfg.use_pallas_seg
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        onehot = seg_onehot_of(batch, cfg.model.num_seg_classes)
        loss = segmentation_loss(cfg, seg_logits, batch["seg_target"], onehot)
        return loss, f_score(seg_logits, onehot)

    from asy_vrnet_tpu.ops.losses_seg_pallas import fused_seg_loss_and_fscore

    weights = (
        jnp.asarray(lcfg.cls_balance_weights, jnp.float32)
        if lcfg.cls_balance_weights is not None
        else None
    )
    dt = jnp.dtype(cfg.model.compute_dtype)
    if dt == jnp.bfloat16:
        seg_logits = seg_logits.astype(dt)
    return fused_seg_loss_and_fscore(
        seg_logits, batch["seg_target"], weights, cfg.model.num_seg_classes,
        use_focal=lcfg.focal_loss, focal_alpha=lcfg.focal_alpha,
        focal_gamma=lcfg.focal_gamma, use_dice=lcfg.dice_loss,
        use_pallas=True,
    )


def detection_loss(cfg: Config, det_outputs, batch):
    lcfg = cfg.loss
    return yolox_loss(
        det_outputs,
        batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"],
        strides=cfg.model.head_strides,
        num_classes=cfg.model.num_classes,
        center_radius=lcfg.center_radius,
        candidate_k=lcfg.simota_candidate_k,
        iou_weight=lcfg.iou_weight,
        obj_weight=lcfg.obj_weight,
        cls_weight=lcfg.cls_weight,
    )


def combine_losses(cfg: Config, loss_det, loss_seg, log_var):
    """Multitask combine: reference-parity fixed det+w*seg
    (utils/utils_fit.py:106) or corrected Kendall uncertainty weighting
    (utils/multitaskloss.py:12-18, with a *persistent* log-var)."""
    if cfg.loss.multitask_mode == "uncertainty":
        return loss_det + jnp.exp(-log_var) * loss_seg + log_var
    return loss_det + cfg.loss.seg_weight * loss_seg


def _zero_frozen(tree, freeze_backbone: bool):
    """Zero the VRCoC-backbone subtree of a grad/update pytree
    (train.py:439-440 freezes model.backbone.backbone == neck/backbone here).
    Applied to both grads (keeps momentum clean) and final updates (keeps
    weight decay from moving frozen params)."""
    if not freeze_backbone:
        return tree
    if "neck" in tree and "backbone" in tree["neck"]:
        frozen = jax.tree.map(jnp.zeros_like, tree["neck"]["backbone"])
        tree = dict(tree)
        tree["neck"] = dict(tree["neck"])
        tree["neck"]["backbone"] = frozen
    return tree


def _flat_frozen_mask(params) -> jnp.ndarray:
    """0/1 f32 vector (ravel_pytree leaf order) marking the frozen
    neck/backbone subtree.  Built from constants, so XLA folds it at compile
    time — zero runtime cost."""
    from jax.flatten_util import ravel_pytree

    def mark(path, p):
        keys = [q.key for q in path if hasattr(q, "key")]
        frozen = any(
            keys[i] == "neck" and keys[i + 1] == "backbone"
            for i in range(len(keys) - 1)
        )
        return jnp.full(p.shape, float(frozen), jnp.float32)

    return ravel_pytree(jax.tree_util.tree_map_with_path(mark, params))[0]


def _restore_frozen_opt(new_opt_state, old_opt_state, freeze_backbone: bool,
                        params=None):
    """Keep the optimizer state of frozen params untouched.

    Even with grads zeroed, the decayed-weights term inside the optax chain
    feeds wd*param into the momentum trace; without this, unfreezing would
    start with a stale decay-driven momentum kick the reference's freeze
    (which accumulates nothing, train.py:439-446) never has.

    Handles both state layouts: the flattened optimizer (make_optimizer wraps
    the chain in optax.flatten, so momentum is ONE vector in ravel_pytree
    order — select by a frozen-index mask) and unflattened tree optimizers
    (leaves mirror the param tree — select by keypath)."""
    if not freeze_backbone:
        return new_opt_state

    mask = _flat_frozen_mask(params) if params is not None else None
    # Flat per-parameter accumulator fields of the optax states make_optimizer
    # can produce (trace: optax.trace / TraceState; mu, nu: scale_by_adam /
    # ScaleByAdamState).  The flat-mask branch applies ONLY to these — a
    # future 1-D state leaf that merely coincides in length must not be
    # silently frozen-masked.
    _FLAT_ACC_FIELDS = ("trace", "mu", "nu")

    def pick(path, new, old):
        field_names = [
            p.name for p in path if isinstance(p, jax.tree_util.GetAttrKey)
        ]
        if (
            mask is not None
            and getattr(new, "ndim", None) == 1
            and new.shape == mask.shape
        ):
            if not (field_names and field_names[-1] in _FLAT_ACC_FIELDS):
                raise ValueError(
                    "flat optimizer-state leaf with parameter-count length at "
                    f"unexpected path {path}; extend _FLAT_ACC_FIELDS if this "
                    "is a real per-parameter accumulator"
                )
            return jnp.where(mask > 0, old, new)
        keys = [p.key for p in path if hasattr(p, "key")]
        for i in range(len(keys) - 1):
            if keys[i] == "neck" and keys[i + 1] == "backbone":
                return old
        return new

    return jax.tree_util.tree_map_with_path(pick, new_opt_state, old_opt_state)


def build_train_step(
    model, cfg: Config, tx: optax.GradientTransformation,
    freeze_backbone: bool = False,
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """Returns train_step(state, batch) -> (state, metrics); jit/pjit-able."""

    def train_step(state: TrainState, batch: dict):
        image = maybe_normalize_image_device(batch["image"])

        def loss_fn(params, log_var):
            (det, seg), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image, batch["radar"], train=True,
                mutable=["batch_stats"],
            )
            loss_seg, fsc = seg_loss_and_fscore(cfg, seg, batch)
            loss_det, aux = detection_loss(cfg, det, batch)
            total = combine_losses(cfg, loss_det, loss_seg, log_var)
            metrics = {
                "loss": total,
                "loss_det": loss_det,
                "loss_seg": loss_seg,
                "num_fg": aux.num_fg,
                "f_score": fsc,
            }
            return total, (mutated["batch_stats"], metrics)

        (_, (new_bstats, metrics)), (grads, gv) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, state.log_var)

        grads = _zero_frozen(grads, freeze_backbone)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        updates = _zero_frozen(updates, freeze_backbone)
        new_opt_state = _restore_frozen_opt(
            new_opt_state, state.opt_state, freeze_backbone, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        if cfg.loss.multitask_mode == "uncertainty":
            # plain SGD on the scalar log-var at the current injected lr
            from asy_vrnet_tpu.train.optim import injected_learning_rate

            new_log_var = state.log_var - injected_learning_rate(
                state.opt_state
            ) * gv
        else:
            new_log_var = state.log_var

        state = state.replace(
            params=new_params,
            batch_stats=new_bstats,
            opt_state=new_opt_state,
            log_var=new_log_var,
            step=state.step + 1,
        )
        if cfg.optim.ema:
            state = state.apply_ema(cfg.optim.ema_decay, cfg.optim.ema_tau)
        return state, metrics

    return train_step


def build_eval_step(model, cfg: Config) -> Callable[[dict, dict], dict]:
    """eval_step(variables, batch) -> metrics (val losses + f_score), using
    running BN stats (utils/utils_fit.py:144-196)."""

    def eval_step(variables: dict, batch: dict):
        det, seg = model.apply(
            variables, maybe_normalize_image_device(batch["image"]),
            batch["radar"], train=False,
        )
        loss_seg, fsc = seg_loss_and_fscore(cfg, seg, batch)
        loss_det, aux = detection_loss(cfg, det, batch)
        return {
            "loss_det": loss_det,
            "loss_seg": loss_seg,
            "loss": loss_det + loss_seg,
            "f_score": fsc,
            "num_fg": aux.num_fg,
        }

    return eval_step


def build_forward(model) -> Callable[[dict, jnp.ndarray, jnp.ndarray], Any]:
    def forward(variables, image, radar):
        return model.apply(
            variables, maybe_normalize_image_device(image), radar, train=False
        )

    return forward
