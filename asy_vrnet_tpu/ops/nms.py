"""Fixed-shape on-device NMS.

`torchvision.ops.batched_nms` (utils/utils_bbox.py:124) has no XLA analogue;
this module implements greedy class-aware NMS with fully static shapes so it
jits and fuses into the inference graph:

  1. take the top-K score candidates (static K),
  2. build the K x K IoU matrix once (two small matmul-shaped reductions),
  3. sequential greedy suppression as a lax.scan over candidates (each step is
     a vectorised row update, so the scan is K steps of VPU work, not K^2
     scalar ops).

Matches torchvision semantics: strictly-greater-than-threshold suppression,
descending score order, per-class separation via the IoU mask.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.ops.boxes import pairwise_iou_xyxy


@functools.partial(jax.jit, static_argnames=("max_out", "num_candidates"))
def nms_fixed(
    boxes: jnp.ndarray,      # (A, 4) xyxy
    scores: jnp.ndarray,     # (A,)
    classes: jnp.ndarray,    # (A,) int
    valid: jnp.ndarray,      # (A,) bool — pre-filter (conf threshold)
    iou_threshold: float,
    max_out: int = 100,
    num_candidates: int = 512,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy class-aware NMS; returns (indices (max_out,), keep_mask (max_out,)).

    Suppressed/invalid slots have keep_mask False; indices index into the
    original (A,) arrays.
    """
    a = boxes.shape[0]
    k = min(num_candidates, a)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked_scores = jnp.where(valid, scores, neg_inf)
    top_scores, order = jax.lax.top_k(masked_scores, k)       # descending
    cand_boxes = boxes[order]
    cand_classes = classes[order]
    cand_valid = top_scores > neg_inf

    iou = pairwise_iou_xyxy(cand_boxes, cand_boxes)
    same_class = cand_classes[:, None] == cand_classes[None, :]
    suppress = (iou > iou_threshold) & same_class             # (K, K)

    def step(keep, i):
        # candidate i survives if valid and not suppressed by a kept earlier box
        killed = jnp.any(suppress[:, i] & keep & (jnp.arange(k) < i))
        keep_i = cand_valid[i] & ~killed
        return keep.at[i].set(keep_i), keep_i

    keep, _ = jax.lax.scan(step, jnp.zeros((k,), bool), jnp.arange(k))

    # compact the kept candidates to the front, preserving score order
    kept_rank = jnp.cumsum(keep) - 1
    out_idx = jnp.zeros((max_out,), jnp.int32)
    out_keep = jnp.zeros((max_out,), bool)
    in_range = keep & (kept_rank < max_out)
    out_idx = out_idx.at[jnp.where(in_range, kept_rank, max_out)].set(
        order.astype(jnp.int32), mode="drop"
    )
    out_keep = out_keep.at[jnp.where(in_range, kept_rank, max_out)].set(
        True, mode="drop"
    )
    return out_idx, out_keep


def non_max_suppression(
    prediction: jnp.ndarray,   # (B, A, 5+C) normalised cxcywh + sigmoid scores
    num_classes: int,
    conf_thres: float = 0.5,
    nms_thres: float = 0.4,
    max_out: int = 100,
    num_candidates: int = 512,
):
    """Batched class-aware NMS over decoded predictions.

    Equivalent of utils/utils_bbox.py:86-131 (max-class confidence filter,
    obj*cls score, batched NMS) with fixed output shape.  Returns a dict of
    (B, max_out) arrays: boxes_xyxy (normalised), scores (obj*cls), obj, cls
    conf, classes, valid.
    """
    boxes_xyxy = jnp.concatenate(
        [
            prediction[..., :2] - prediction[..., 2:4] / 2.0,
            prediction[..., :2] + prediction[..., 2:4] / 2.0,
        ],
        axis=-1,
    )
    obj = prediction[..., 4]
    cls_scores = prediction[..., 5 : 5 + num_classes]
    class_conf = jnp.max(cls_scores, axis=-1)
    class_pred = jnp.argmax(cls_scores, axis=-1)
    score = obj * class_conf
    valid = score >= conf_thres

    def per_image(b, s, c, v):
        idx, keep = nms_fixed(
            b, s, c, v, nms_thres, max_out=max_out, num_candidates=num_candidates
        )
        return idx, keep

    idx, keep = jax.vmap(per_image)(boxes_xyxy, score, class_pred, valid)
    gather = jax.vmap(lambda arr, i: arr[i])
    return {
        "boxes_xyxy": gather(boxes_xyxy, idx),
        "scores": gather(score, idx),
        "obj": gather(obj, idx),
        "class_conf": gather(class_conf, idx),
        "classes": gather(class_pred, idx),
        "valid": keep,
    }
