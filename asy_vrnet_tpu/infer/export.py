"""Model export for serving (the capability the reference's broken
convert_to_onnx covers, yolo.py:353-389 / deeplab.py:279-315 — both export
with an image-only dummy input and fail on the dual-input model).

TPU-native equivalent: `jax.export` to StableHLO with BOTH inputs, plus an
optional AOT-compiled executable for the current device.  The exported
artifact is the full fused graph (forward, or forward+decode+NMS).
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.config import ModelConfig
from asy_vrnet_tpu.ops.boxes import decode_predictions
from asy_vrnet_tpu.ops.nms import non_max_suppression


def export_stablehlo(
    model,
    cfg: ModelConfig,
    variables: dict,
    path: str,
    batch_size: int = 1,
    with_postprocess: bool = True,
    conf_thres: float = 0.3,
    nms_thres: float = 0.5,
    max_det: int = 100,
) -> str:
    """Serialise the inference graph; returns the written file path."""
    from jax import export as jexport

    h, w = cfg.input_size

    if with_postprocess:
        def fn(image, radar):
            det, seg = model.apply(variables, image, radar, train=False)
            pred = decode_predictions(det, cfg.input_size, cfg.head_strides)
            out = non_max_suppression(
                pred, cfg.num_classes, conf_thres=conf_thres,
                nms_thres=nms_thres, max_out=max_det,
            )
            return out, jax.nn.softmax(seg, axis=-1)
    else:
        def fn(image, radar):
            return model.apply(variables, image, radar, train=False)

    image = jax.ShapeDtypeStruct((batch_size, h, w, cfg.image_channels), jnp.float32)
    radar = jax.ShapeDtypeStruct((batch_size, h, w, cfg.radar_channels), jnp.float32)
    exported = jexport.export(jax.jit(fn))(image, radar)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_exported(path: str) -> Callable:
    """Deserialise an exported graph; returns a callable(image, radar)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return lambda image, radar: exported.call(image, radar)
