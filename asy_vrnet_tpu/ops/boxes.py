"""Box decode / IoU utilities (fixed-shape, device-side).

Parity targets: utils/utils_bbox.py:5-84 (decode_outputs, yolo_correct_boxes)
and the grid/stride decode inside the loss (nets/yolo_training.py:99-111).
Anchor ordering matches the reference exactly: levels concatenated in
(stride 8, 16, 32) order, each level flattened row-major with x fastest.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _level_grid(h: int, w: int) -> np.ndarray:
    """(h*w, 2) grid of (x, y) cell indices, x fastest (row-major scan)."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(np.float32)


def make_grids_and_strides(
    level_hw: Sequence[tuple[int, int]], strides: Sequence[int]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Concatenated (A,2) grid and (A,) stride vectors for all levels."""
    grids = np.concatenate([_level_grid(h, w) for h, w in level_hw], axis=0)
    svec = np.concatenate(
        [np.full((h * w,), s, np.float32) for (h, w), s in zip(level_hw, strides)]
    )
    return jnp.asarray(grids), jnp.asarray(svec)


def flatten_level_outputs(det_outputs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """3x NHWC (B,h,w,5+C) -> (B, A, 5+C), reference anchor order."""
    flat = [o.reshape(o.shape[0], -1, o.shape[-1]) for o in det_outputs]
    return jnp.concatenate(flat, axis=1)


def decode_for_loss(
    det_outputs: Sequence[jnp.ndarray], strides: Sequence[int]
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Raw head maps -> absolute-pixel predictions for the YOLOX loss.

    Returns (outputs (B,A,5+C) with xy/wh decoded and obj/cls raw logits,
    grid (A,2), stride (A,)).  Matches get_output_and_grid
    (yolo_training.py:99-111): xy=(pred+grid)*stride, wh=exp(pred)*stride.
    """
    level_hw = tuple((o.shape[1], o.shape[2]) for o in det_outputs)
    grid, svec = make_grids_and_strides(level_hw, strides)
    out = flatten_level_outputs(det_outputs)
    xy = (out[..., :2] + grid) * svec[None, :, None]
    wh = jnp.exp(out[..., 2:4]) * svec[None, :, None]
    return jnp.concatenate([xy, wh, out[..., 4:]], axis=-1), grid, svec


def decode_predictions(
    det_outputs: Sequence[jnp.ndarray],
    input_hw: tuple[int, int],
    strides: Sequence[int] = (8, 16, 32),
) -> jnp.ndarray:
    """Raw head maps -> (B, A, 5+C) with normalised cxcywh + sigmoid scores.

    Parity with decode_outputs (utils_bbox.py:32-84); note the reference
    derives per-level stride as input_h / level_h, equal to `strides` for the
    standard pyramid.
    """
    level_hw = tuple((o.shape[1], o.shape[2]) for o in det_outputs)
    eff_strides = tuple(input_hw[0] / h for h, _ in level_hw)
    grid, svec = make_grids_and_strides(level_hw, eff_strides)
    out = flatten_level_outputs(det_outputs)
    xy = (out[..., :2] + grid) * svec[None, :, None]
    wh = jnp.exp(out[..., 2:4]) * svec[None, :, None]
    scores = jax.nn.sigmoid(out[..., 4:])
    norm = jnp.asarray(
        [input_hw[1], input_hw[0], input_hw[1], input_hw[0]], jnp.float32
    )
    return jnp.concatenate([jnp.concatenate([xy, wh], -1) / norm, scores], axis=-1)


def cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    xy, wh = b[..., :2], b[..., 2:4]
    return jnp.concatenate([xy - wh / 2.0, xy + wh / 2.0], axis=-1)


def xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    tl, br = b[..., :2], b[..., 2:4]
    return jnp.concatenate([(tl + br) / 2.0, br - tl], axis=-1)


def pairwise_iou_cxcywh(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between (M,4) and (N,4) cxcywh boxes (yolo_training.py:266-289,
    xyxy=False branch; same epsilon-free denominator)."""
    tl = jnp.maximum(
        a[:, None, :2] - a[:, None, 2:] / 2, b[None, :, :2] - b[None, :, 2:] / 2
    )
    br = jnp.minimum(
        a[:, None, :2] + a[:, None, 2:] / 2, b[None, :, :2] + b[None, :, 2:] / 2
    )
    area_a = jnp.prod(a[:, 2:], axis=-1)
    area_b = jnp.prod(b[:, 2:], axis=-1)
    valid = jnp.all(tl < br, axis=-1).astype(a.dtype)
    inter = jnp.prod(br - tl, axis=-1) * valid
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def pairwise_iou_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    tl = jnp.maximum(a[:, None, :2], b[None, :, :2])
    br = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    area_a = jnp.prod(a[:, 2:] - a[:, :2], axis=-1)
    area_b = jnp.prod(b[:, 2:] - b[:, :2], axis=-1)
    valid = jnp.all(tl < br, axis=-1).astype(a.dtype)
    inter = jnp.prod(br - tl, axis=-1) * valid
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def iou_loss_squared(pred_cxcywh: jnp.ndarray, tgt_cxcywh: jnp.ndarray) -> jnp.ndarray:
    """Elementwise 1 - iou^2 loss (IOUloss, yolo_training.py:13-57)."""
    tl = jnp.maximum(
        pred_cxcywh[..., :2] - pred_cxcywh[..., 2:] / 2,
        tgt_cxcywh[..., :2] - tgt_cxcywh[..., 2:] / 2,
    )
    br = jnp.minimum(
        pred_cxcywh[..., :2] + pred_cxcywh[..., 2:] / 2,
        tgt_cxcywh[..., :2] + tgt_cxcywh[..., 2:] / 2,
    )
    area_p = jnp.prod(pred_cxcywh[..., 2:], axis=-1)
    area_g = jnp.prod(tgt_cxcywh[..., 2:], axis=-1)
    valid = jnp.all(tl < br, axis=-1).astype(pred_cxcywh.dtype)
    inter = jnp.prod(br - tl, axis=-1) * valid
    iou = inter / (area_p + area_g - inter + 1e-16)
    return 1.0 - iou**2


def correct_boxes(
    boxes_xyxy_norm: np.ndarray,
    input_hw: tuple[int, int],
    image_hw: tuple[int, int],
    letterbox: bool = True,
) -> np.ndarray:
    """Map normalised network-space xyxy boxes back to original-image pixel
    coords, removing letterbox padding (utils/utils_bbox.py:5-30)."""
    boxes = np.asarray(boxes_xyxy_norm, np.float32)
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    box_yx = np.stack([(y1 + y2) / 2, (x1 + x2) / 2], axis=-1)
    box_hw = np.stack([y2 - y1, x2 - x1], axis=-1)
    input_shape = np.array(input_hw, np.float32)
    image_shape = np.array(image_hw, np.float32)
    if letterbox:
        new_shape = np.round(image_shape * np.min(input_shape / image_shape))
        offset = (input_shape - new_shape) / 2.0 / input_shape
        scale = input_shape / new_shape
        box_yx = (box_yx - offset) * scale
        box_hw = box_hw * scale
    mins = box_yx - box_hw / 2.0
    maxes = box_yx + box_hw / 2.0
    out = np.concatenate(
        [mins[..., 0:1], mins[..., 1:2], maxes[..., 0:1], maxes[..., 1:2]], axis=-1
    )
    out *= np.concatenate([image_shape, image_shape], axis=-1)
    return out
