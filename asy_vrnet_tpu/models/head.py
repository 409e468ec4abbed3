"""YOLOX-style decoupled anchor-free detection head (head/decouplehead.py:7-88).

Per scale: dense 1x1 stem -> two parallel towers of 2x depthwise-separable 3x3
ConvBnAct -> 1x1 prediction convs; per-scale output is the channel concat
[reg(4), obj(1), cls(C)] in NHWC.  Parity note: the reference ctor accepts a
`depthwise` flag but its towers are unconditionally ds_conv=True
(decouplehead.py:24-33) — reproduced here.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from asy_vrnet_tpu.models.layers import ConvBnAct

Dtype = Any


class DecoupleHead(nn.Module):
    num_classes: int
    width: float = 1.0
    act: str = "relu"
    hidden: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        mid = int(self.hidden * self.width)
        outputs = []
        for k, x in enumerate(inputs):
            x = ConvBnAct(
                mid, 1, act=self.act, dtype=self.dtype, name=f"stem{k}",
            )(x, train=train)

            cls_feat = x
            for j in range(2):
                cls_feat = ConvBnAct(
                    mid, 3, act=self.act, ds_conv=True, dtype=self.dtype,
                    name=f"cls_conv{k}_{j}",
                )(cls_feat, train=train)
            cls_out = nn.Conv(
                self.num_classes, (1, 1), use_bias=True, dtype=self.dtype,
                name=f"cls_pred{k}",
            )(cls_feat)

            reg_feat = x
            for j in range(2):
                reg_feat = ConvBnAct(
                    mid, 3, act=self.act, ds_conv=True, dtype=self.dtype,
                    name=f"reg_conv{k}_{j}",
                )(reg_feat, train=train)
            reg_out = nn.Conv(
                4, (1, 1), use_bias=True, dtype=self.dtype, name=f"reg_pred{k}",
            )(reg_feat)
            obj_out = nn.Conv(
                1, (1, 1), use_bias=True, dtype=self.dtype, name=f"obj_pred{k}",
            )(reg_feat)

            outputs.append(jnp.concatenate([reg_out, obj_out, cls_out], axis=-1))
        return tuple(outputs)
