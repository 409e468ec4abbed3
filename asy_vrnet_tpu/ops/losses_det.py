"""YOLOX detection loss with SimOTA assignment (nets/yolo_training.py:60-207).

Fixed-shape, jit-compatible: GT boxes come padded to (B, G, 4) with a
validity mask; the per-image assignment is vmapped; loss terms use masked
sums.  Weights and normalisation match get_losses (yolo_training.py:190-207):

    loss = (1·Σ iou_loss(fg) + 2·Σ bce(obj, fg_target) + 2·Σ bce(cls, fg))
           / max(total_num_fg, 1)

with iou_loss = 1 - iou² (IOUloss, :39-40) and cls targets soft-weighted by
the matched IoU (:175-176).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.ops.boxes import decode_for_loss, iou_loss_squared
from asy_vrnet_tpu.ops.simota_pallas import simota_assign_batched


class DetLossAux(NamedTuple):
    loss_iou: jnp.ndarray
    loss_obj: jnp.ndarray
    loss_cls: jnp.ndarray
    num_fg: jnp.ndarray


def _bce_with_logits(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))


def yolox_loss(
    det_outputs: Sequence[jnp.ndarray],   # 3x NHWC (B,h,w,5+C), raw head maps
    gt_boxes: jnp.ndarray,                # (B, G, 4) cxcywh absolute pixels
    gt_classes: jnp.ndarray,              # (B, G) int
    gt_valid: jnp.ndarray,                # (B, G) bool
    strides: Sequence[int] = (8, 16, 32),
    num_classes: int | None = None,
    center_radius: float = 2.5,
    candidate_k: int = 10,
    iou_weight: float = 1.0,
    obj_weight: float = 2.0,
    cls_weight: float = 2.0,
) -> tuple[jnp.ndarray, DetLossAux]:
    outputs, grids, svec = decode_for_loss(det_outputs, strides)
    outputs = outputs.astype(jnp.float32)
    c = outputs.shape[-1] - 5 if num_classes is None else num_classes

    bbox_preds = outputs[..., :4]          # (B, A, 4)
    obj_logits = outputs[..., 4]           # (B, A)
    cls_logits = outputs[..., 5:]          # (B, A, C)

    # Fused Pallas assignment on TPU (the whole per-image SimOTA runs in
    # VMEM, ops/simota_pallas.py); vmapped jnp path elsewhere.
    assign = simota_assign_batched(
        bbox_preds, cls_logits, obj_logits, gt_boxes, gt_classes, gt_valid,
        grids, svec, center_radius=center_radius, candidate_k=candidate_k,
    )

    fg = assign.fg_mask.astype(jnp.float32)                 # (B, A)
    num_fg = jnp.maximum(jnp.sum(assign.num_fg), 1.0)

    # Matched-GT lookups as one-hot matmuls, NOT take_along_axis: per-anchor
    # gathers lower to scalar-indexed gathers on TPU (slow + slow transpose);
    # the (B,A,G)x(B,G,*) contractions ride the MXU instead.
    match_onehot = jax.nn.one_hot(
        assign.matched_gt, gt_boxes.shape[1], dtype=jnp.float32
    )                                                        # (B, A, G)

    # regression: IoU^2 loss on positives against their matched GT box.
    # precision=HIGHEST: TPU default matmul precision truncates fp32 operands
    # to bf16, which would put ~0.4% error on the looked-up box coordinates —
    # these lookup matmuls must stay exact per the losses-fp32 policy.
    matched_boxes = jnp.einsum(
        "bag,bgk->bak", match_onehot, gt_boxes,
        precision=jax.lax.Precision.HIGHEST,
    )
    loss_iou = jnp.sum(iou_loss_squared(bbox_preds, matched_boxes) * fg)

    # objectness: BCE over all anchors, target = fg mask
    loss_obj = jnp.sum(_bce_with_logits(obj_logits, fg))

    # classification: BCE on positives, soft target = one_hot * matched IoU
    gt_cls_onehot = jax.nn.one_hot(gt_classes, c, dtype=jnp.float32)  # (B,G,C)
    cls_target = (
        jnp.einsum(
            "bag,bgc->bac", match_onehot, gt_cls_onehot,
            precision=jax.lax.Precision.HIGHEST,
        )
        * assign.pred_iou[..., None]
    )
    loss_cls = jnp.sum(
        jnp.sum(_bce_with_logits(cls_logits, cls_target), axis=-1) * fg
    )

    total = (
        iou_weight * loss_iou + obj_weight * loss_obj + cls_weight * loss_cls
    ) / num_fg
    aux = DetLossAux(
        loss_iou / num_fg, loss_obj / num_fg, loss_cls / num_fg,
        jnp.sum(assign.num_fg),
    )
    return total, aux


def pad_gt_boxes(
    boxes_list: Sequence, max_boxes: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Host-side helper: ragged per-image [N_i, 5] (cxcywh+cls) arrays ->
    padded (B,G,4), (B,G), (B,G) device arrays."""
    import numpy as np

    b = len(boxes_list)
    gb = np.zeros((b, max_boxes, 4), np.float32)
    gc = np.zeros((b, max_boxes), np.int32)
    gv = np.zeros((b, max_boxes), bool)
    for i, arr in enumerate(boxes_list):
        arr = np.asarray(arr, np.float32).reshape(-1, 5)
        n = min(len(arr), max_boxes)
        gb[i, :n] = arr[:n, :4]
        gc[i, :n] = arr[:n, 4].astype(np.int32)
        gv[i, :n] = True
    return jnp.asarray(gb), jnp.asarray(gc), jnp.asarray(gv)
