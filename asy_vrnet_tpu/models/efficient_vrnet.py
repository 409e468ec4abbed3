"""EfficientVRNet model assembly (nets/efficient_vrnet.py:13-27).

__call__(image NHWC[B,H,W,3], radar NHWC[B,H,W,4]) ->
    (det_outputs: 3-tuple of NHWC [B,H/s,W/s,5+C] for s in (8,16,32),
     seg_logits: NHWC [B,H,W,num_seg_classes])
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from asy_vrnet_tpu.config import COC_VARIANTS, ModelConfig
from asy_vrnet_tpu.models.head import DecoupleHead
from asy_vrnet_tpu.models.neck import CoCFpnDual

Dtype = Any


class EfficientVRNet(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, image: jnp.ndarray, radar: jnp.ndarray, train: bool = False):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        image = image.astype(dtype)
        radar = radar.astype(dtype)

        fpn_outs, seg = CoCFpnDual(
            variant=cfg.coc,
            num_seg_classes=cfg.num_seg_classes,
            width=cfg.width,
            use_pallas=cfg.use_pallas_cluster,
            prestem_s2d=cfg.prestem_s2d,
            remat=cfg.train_remat,
            seg_signed_logits=cfg.seg_signed_logits,
            dtype=dtype,
            name="neck",
        )(image, radar, train=train)
        det = DecoupleHead(
            num_classes=cfg.num_classes, width=cfg.width,
            hidden=cfg.head_width, dtype=dtype, name="head",
        )(fpn_outs, train=train)
        # emit fp32 for the loss/postprocess stages
        det = tuple(o.astype(jnp.float32) for o in det)
        seg = seg.astype(jnp.float32)
        return det, seg


def create_model(cfg: ModelConfig) -> EfficientVRNet:
    return EfficientVRNet(config=cfg)


def init_model(model: EfficientVRNet, rng, input_size=None, batch_size=1):
    """Initialise params/batch_stats with dummy inputs.

    The init is jitted: on a slow host an eager init dispatches thousands of
    individually-compiled ops; one fused compile is much faster and is also
    what a production boot path wants.
    """
    import jax

    cfg = model.config
    h, w = input_size or cfg.input_size
    image = jnp.zeros((batch_size, h, w, cfg.image_channels), jnp.float32)
    radar = jnp.zeros((batch_size, h, w, cfg.radar_channels), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, image, radar, train=False
    )
    return variables["params"], variables.get("batch_stats", {})
