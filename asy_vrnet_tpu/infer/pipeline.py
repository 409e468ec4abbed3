"""Fully-fused on-device inference pipeline (BASELINE config 3).

One jit graph: raw uint8 camera frame + raw radar points ->
  device-side letterbox (PIL-bicubic as interpolation matmuls) ->
  ImageNet normalisation -> radar RVEP projection (+ optional min-max) ->
  EfficientVRNet forward -> box decode -> fixed-shape NMS.

No host round trips between stages; the host only supplies the raw frame and
reads back the final (max_det) detections.  The reference does all of this on
the CPU in Python (yolo.py:118-149) per frame.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.config import ModelConfig
from asy_vrnet_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
from asy_vrnet_tpu.ops.boxes import decode_predictions
from asy_vrnet_tpu.ops.nms import non_max_suppression
from asy_vrnet_tpu.ops.radar import project_points_to_rvep
from asy_vrnet_tpu.ops.resize import resize_bicubic_pil


def device_letterbox(
    image_u8: jnp.ndarray,            # (H0, W0, 3) uint8
    out_hw: tuple[int, int],
    fill: float = 128.0,
) -> jnp.ndarray:
    """BICUBIC letterbox + /255 + ImageNet norm, all on device."""
    h0, w0, _ = image_u8.shape
    h, w = out_hw
    scale = min(w / w0, h / h0)
    nw, nh = int(w0 * scale), int(h0 * scale)
    dx, dy = (w - nw) // 2, (h - nh) // 2
    resized = resize_bicubic_pil(
        image_u8.astype(jnp.float32)[None], (nh, nw)
    )[0]
    resized = jnp.clip(resized, 0.0, 255.0)
    canvas = jnp.full((h, w, 3), fill, jnp.float32)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (dy, dx, 0))
    return (canvas / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def build_fused_pipeline(
    model,
    cfg: ModelConfig,
    source_hw: tuple[int, int],
    conf_thres: float = 0.3,
    nms_thres: float = 0.5,
    max_det: int = 100,
    radar_minmax: bool = True,
) -> Callable:
    """-> jit'd fn(variables, image_u8 (B,H0,W0,3), radar_points (B,N,6),
    radar_valid (B,N)) -> (detections dict, seg probs)."""
    input_hw = cfg.input_size

    def pipeline(variables, image_u8, radar_points, radar_valid):
        img = jax.vmap(lambda x: device_letterbox(x, input_hw))(image_u8)
        radar = jax.vmap(
            lambda p, v: project_points_to_rvep(p, v, input_hw)
        )(radar_points, radar_valid)
        if radar_minmax:
            lo = jnp.min(radar, axis=(1, 2, 3), keepdims=True)
            hi = jnp.max(radar, axis=(1, 2, 3), keepdims=True)
            radar = (radar - lo) / (hi - lo + 1e-12) + 1e-13
        det, seg = model.apply(variables, img, radar, train=False)
        pred = decode_predictions(det, input_hw, cfg.head_strides)
        dets = non_max_suppression(
            pred, cfg.num_classes, conf_thres=conf_thres,
            nms_thres=nms_thres, max_out=max_det,
        )
        return dets, jax.nn.softmax(seg, axis=-1)

    return jax.jit(pipeline)
