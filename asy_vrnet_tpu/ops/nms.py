"""Fixed-shape on-device NMS.

`torchvision.ops.batched_nms` (utils/utils_bbox.py:124) has no XLA analogue;
this module implements greedy class-aware NMS with fully static shapes so it
jits and fuses into the inference graph.

Algorithm: `max_out` rounds of select-and-suppress over ALL anchors — each
round takes the highest-score live anchor, emits it, and kills every
same-class anchor with IoU strictly above the threshold.  This is exactly
greedy descending-score NMS (the first `max_out` kept boxes of the full
torchvision result), processes every conf-passing box with NO candidate cap
(the eval callback feeds all 5376 anchors at conf 0.05, utils/callbacks.py:
199-205), and needs O(A) memory and max_out*A work instead of a KxK IoU
matrix.

Matches torchvision semantics: strictly-greater-than-threshold suppression,
descending score order (ties broken by lowest index, like a stable sort),
per-class separation via the class-equality mask.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp



@functools.partial(jax.jit, static_argnames=("max_out", "num_candidates"))
def nms_fixed(
    boxes: jnp.ndarray,      # (A, 4) xyxy
    scores: jnp.ndarray,     # (A,)
    classes: jnp.ndarray,    # (A,) int
    valid: jnp.ndarray,      # (A,) bool — pre-filter (conf threshold)
    iou_threshold: float,
    max_out: int = 100,
    num_candidates: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy class-aware NMS; returns (indices (max_out,), keep_mask (max_out,)).

    Suppressed/invalid slots have keep_mask False; indices index into the
    original (A,) arrays.  `num_candidates` is an OPTIONAL explicit top-k
    pre-filter (purely a speed knob; results match the uncapped path whenever
    it exceeds the number of conf-passing boxes); default None = all anchors,
    the reference's eval semantics.
    """
    a = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)
    live = jnp.where(valid, scores.astype(jnp.float32), neg_inf)

    if num_candidates is not None and num_candidates < a:
        # keep only the top-k scores live (explicit, opt-in cap)
        kth = jax.lax.top_k(live, num_candidates)[0][-1]
        rank_ok = (live > kth) | (
            (live == kth)
            & (jnp.cumsum(live == kth) <= num_candidates
               - jnp.sum(live > kth))
        )
        live = jnp.where(rank_ok, live, neg_inf)

    arange_a = jnp.arange(a)
    x1, y1, x2, y2 = (boxes.astype(jnp.float32)[:, i] for i in range(4))
    areas = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)

    def step(live, _):
        i = jnp.argmax(live)
        ok = live[i] > neg_inf
        # IoU of the selected box against every anchor (one VPU row)
        bx1, by1, bx2, by2 = boxes[i].astype(jnp.float32)
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        barea = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
        iou_row = inter / jnp.maximum(areas + barea - inter, 1e-16)
        kill = ((iou_row > iou_threshold) & (classes == classes[i])) | (
            arange_a == i
        )
        live = jnp.where(ok & kill, neg_inf, live)
        return live, (i.astype(jnp.int32), ok)

    _, (out_idx, out_keep) = jax.lax.scan(
        step, live, None, length=max_out
    )
    out_idx = jnp.where(out_keep, out_idx, 0)
    return out_idx, out_keep


def non_max_suppression(
    prediction: jnp.ndarray,   # (B, A, 5+C) normalised cxcywh + sigmoid scores
    num_classes: int,
    conf_thres: float = 0.5,
    nms_thres: float = 0.4,
    max_out: int = 100,
    num_candidates: int | None = None,
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
