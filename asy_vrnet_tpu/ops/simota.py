"""SimOTA dynamic label assignment, re-expressed in fixed shapes for XLA.

The reference (nets/yolo_training.py:209-427) runs a per-image Python loop
with data-dependent gathers (boolean-mask indexing of the fg anchors, a
Python loop over ground truths for dynamic-k top-k, and `.item()` calls) —
none of which trace under jit.  This module computes the identical assignment
with static shapes:

  - GT boxes are padded to (G, 4) with a validity mask;
  - the cost matrix is computed for *all* anchors, with additive big-M terms
    replacing the reference's gather: 1e5 for anchors outside the
    center/box intersection (yolo_training.py:257) and 1e9 for anchors
    outside the fg prefilter or rows of invalid GTs;
  - per-GT dynamic-k selection takes the top-`candidate_k` lowest-cost
    anchors and keeps the first k of them via a rank mask
    (k = clamp(int(sum top-10 IoU), 1) — yolo_training.py:384-393);
  - the anchor-conflict resolution pass (an anchor matched to >1 GT keeps the
    min-cost GT, :399-407) becomes a one-hot select.

Everything runs in fp32 (the reference forces fp32 under AMP,
yolo_training.py:240-247) and under stop_gradient (the torch version is
@torch.no_grad).  vmap over the batch replaces the per-image loop.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.ops.boxes import pairwise_iou_cxcywh

_BIG = 1e9            # replaces data-dependent gathers
_CENTER_PENALTY = 1e5  # reference's soft constraint (yolo_training.py:257)


class SimOTAResult(NamedTuple):
    fg_mask: jnp.ndarray        # (A,) bool — anchor is a positive
    matched_gt: jnp.ndarray     # (A,) int — index of matched GT (0 if none)
    pred_iou: jnp.ndarray       # (A,) f32 — IoU with the matched GT (0 if none)
    num_fg: jnp.ndarray         # () f32


def _bce_probs(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """binary_cross_entropy on probabilities with torch's -100 log clamp."""
    logp = jnp.maximum(jnp.log(p), -100.0)
    log1mp = jnp.maximum(jnp.log1p(-p), -100.0)
    return -(t * logp + (1.0 - t) * log1mp)


def in_boxes_info(
    gt_boxes: jnp.ndarray,       # (G, 4) cxcywh, absolute pixels
    gt_valid: jnp.ndarray,       # (G,) bool
    grids: jnp.ndarray,          # (A, 2)
    strides: jnp.ndarray,        # (A,)
    center_radius: float = 2.5,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(fg_prefilter (A,), in_box (G,A), in_center (G,A)) — parity with
    get_in_boxes_info (yolo_training.py:291-365)."""
    cx = (grids[:, 0] + 0.5) * strides    # (A,)
    cy = (grids[:, 1] + 0.5) * strides

    gl = gt_boxes[:, 0] - 0.5 * gt_boxes[:, 2]
    gr = gt_boxes[:, 0] + 0.5 * gt_boxes[:, 2]
    gt_ = gt_boxes[:, 1] - 0.5 * gt_boxes[:, 3]
    gb = gt_boxes[:, 1] + 0.5 * gt_boxes[:, 3]
    in_box = (
        (cx[None, :] > gl[:, None])
        & (cx[None, :] < gr[:, None])
        & (cy[None, :] > gt_[:, None])
        & (cy[None, :] < gb[:, None])
    ) & gt_valid[:, None]

    r = center_radius * strides[None, :]
    in_center = (
        (cx[None, :] > gt_boxes[:, 0][:, None] - r)
        & (cx[None, :] < gt_boxes[:, 0][:, None] + r)
        & (cy[None, :] > gt_boxes[:, 1][:, None] - r)
        & (cy[None, :] < gt_boxes[:, 1][:, None] + r)
    ) & gt_valid[:, None]

    fg_prefilter = jnp.any(in_box, axis=0) | jnp.any(in_center, axis=0)
    return fg_prefilter, in_box, in_center


def simota_assign(
    pred_boxes: jnp.ndarray,     # (A, 4) cxcywh absolute
    cls_logits: jnp.ndarray,     # (A, C)
    obj_logits: jnp.ndarray,     # (A,) or (A,1)
    gt_boxes: jnp.ndarray,       # (G, 4) cxcywh absolute
    gt_classes: jnp.ndarray,     # (G,) int
    gt_valid: jnp.ndarray,       # (G,) bool
    grids: jnp.ndarray,          # (A, 2)
    strides: jnp.ndarray,        # (A,)
    center_radius: float = 2.5,
    candidate_k: int = 10,
) -> SimOTAResult:
    """Single-image SimOTA assignment (vmap over the batch for multi-image)."""
    pred_boxes = jax.lax.stop_gradient(pred_boxes.astype(jnp.float32))
    cls_logits = jax.lax.stop_gradient(cls_logits.astype(jnp.float32))
    obj_logits = jax.lax.stop_gradient(obj_logits.astype(jnp.float32)).reshape(-1)
    a = pred_boxes.shape[0]
    g = gt_boxes.shape[0]
    c = cls_logits.shape[-1]

    fg_pre, in_box, in_center = in_boxes_info(
        gt_boxes, gt_valid, grids, strides, center_radius
    )
    both = in_box & in_center                                         # (G, A)

    ious = pairwise_iou_cxcywh(gt_boxes, pred_boxes)                  # (G, A)
    ious = jnp.where(gt_valid[:, None], ious, 0.0)
    iou_cost = -jnp.log(ious + 1e-8)

    probs = jax.nn.sigmoid(cls_logits) * jax.nn.sigmoid(obj_logits)[:, None]
    sqrt_p = jnp.sqrt(probs)                                          # (A, C)
    gt_onehot = jax.nn.one_hot(gt_classes, c, dtype=jnp.float32)      # (G, C)
    cls_cost = jnp.sum(
        _bce_probs(sqrt_p[None, :, :], gt_onehot[:, None, :]), axis=-1
    )                                                                 # (G, A)

    invalid = (~fg_pre)[None, :] | (~gt_valid)[:, None]
    cost = (
        cls_cost
        + 3.0 * iou_cost
        + _CENTER_PENALTY * (~both).astype(jnp.float32)
        + _BIG * invalid.astype(jnp.float32)
    )

    # dynamic k per GT: clamp(int(sum of top-10 candidate IoUs), min 1).
    # Exact top-k by k rounds of max-and-mask instead of lax.top_k: the TPU
    # TopK lowering sorts the whole (G, A) row block (~10 ms/step at
    # (16,100,5376)); k fused max/argmax passes cost ~1 ms.  Tie order
    # (lowest index first) matches top_k's.
    k = min(candidate_k, a)
    cand_ious = jnp.where(fg_pre[None, :], ious, 0.0)

    def iou_body(_, carry):
        xm, s = carry
        m = jnp.max(xm, axis=1)                                       # (G,)
        oh = jax.nn.one_hot(jnp.argmax(xm, axis=1), a, dtype=xm.dtype)
        return xm * (1.0 - oh), s + m

    _, topk_iou_sum = jax.lax.fori_loop(
        0, k, iou_body, (cand_ious, jnp.zeros((g,), jnp.float32))
    )
    dynamic_ks = jnp.clip(topk_iou_sum.astype(jnp.int32), 1, k)

    # per-GT: pick the first dynamic_k of the k lowest-cost anchors, skipping
    # anchors carrying the big-M (outside fg prefilter / invalid gt)
    def cost_body(j, carry):
        xm, match = carry
        m = jnp.min(xm, axis=1)                                       # (G,)
        oh = jax.nn.one_hot(jnp.argmin(xm, axis=1), a, dtype=jnp.float32)
        ok = (j < dynamic_ks) & (m < _BIG / 2)                        # (G,)
        return (
            jnp.where(oh > 0, jnp.inf, xm),
            match + oh * ok.astype(jnp.float32)[:, None],
        )

    _, matching = jax.lax.fori_loop(
        0, k, cost_body, (cost, jnp.zeros((g, a), jnp.float32))
    )

    # conflict resolution: anchors matched to >1 GT keep only the min-cost GT
    # (a conflicted anchor by definition stays matched — just re-pointed).
    anchor_matches = jnp.sum(matching, axis=0)                        # (A,)
    conflict = anchor_matches > 1.0
    best_gt = jnp.argmin(cost, axis=0)                                # (A,)
    resolved = jax.nn.one_hot(best_gt, g, dtype=jnp.float32, axis=0)  # (G, A)
    matching = jnp.where(conflict[None, :], resolved, matching)

    fg_mask = jnp.sum(matching, axis=0) > 0.0                         # (A,)
    matched_gt = jnp.argmax(matching, axis=0)                         # (A,)
    pred_iou = jnp.sum(matching * ious, axis=0)                       # (A,)
    num_fg = jnp.sum(fg_mask.astype(jnp.float32))
    return SimOTAResult(fg_mask, matched_gt, pred_iou, num_fg)
