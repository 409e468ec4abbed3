"""Dual-branch neck: ASPP + segmentation decoder on the image stream, and a
radar-stream detection FPN (neck/coc_fpn_dual.py:15-224).

Structural parity notes:
  - the segmentation branch consumes the 4 *image*-stream taps; the detection
    FPN consumes the 3 deepest *radar*-stream taps (coc_fpn_dual.py:193-221);
  - concat order differs between levels (skip-first at seg4, upsample-first at
    seg3/seg2) — reproduced exactly;
  - the final seg projection is a ConvBnAct (so seg "logits" are post-ReLU,
    coc_fpn_dual.py:15-26,164) — a reference quirk kept for parity;
  - all upsampling is bilinear align_corners=True, implemented as interpolation
    matmuls (ops/resize.py) rather than gathers.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from asy_vrnet_tpu.config import CoCVariant
from asy_vrnet_tpu.models.cluster_block import ClusterBlock
from asy_vrnet_tpu.models.layers import BatchNorm2d, ConvBnAct, ShuffleAttention, channel_shuffle
from asy_vrnet_tpu.models.vr_coc import VRCoC
from asy_vrnet_tpu.ops.resize import global_avg_pool, resize_bilinear, upsample2x

Dtype = Any


class CoCUpsample(nn.Module):
    """1x1 ConvBnAct(relu) then bilinear x-scale upsample (coc_fpn_dual.py:15-26)."""

    features: int
    scale: int = 2
    ds_conv: bool = False
    act: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBnAct(
            self.features, 1, act=self.act, ds_conv=self.ds_conv,
            dtype=self.dtype, name="conv",
        )(x, train=train)
        return upsample2x(x, self.scale)


class CoCConv(nn.Module):
    """ClusterBlock (library defaults) + 1x1 ConvBnAct (coc_fpn_dual.py:29-39)."""

    features: int
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # ClusterBlock defaults from the single-modality library
        # (backbone/vision/context_cluster.py): fold 2x2, 4 heads, head_dim 24.
        x = ClusterBlock(
            dim=x.shape[-1], mlp_ratio=4.0,
            proposal_w=2, proposal_h=2, fold_w=2, fold_h=2,
            heads=4, head_dim=24, use_pallas=self.use_pallas,
            dtype=self.dtype, name="coc",
        )(x, train=train)
        return ConvBnAct(
            self.features, 1, act="relu", dtype=self.dtype, name="conv_att",
        )(x, train=train)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (coc_fpn_dual.py:46-104): 1x1, three
    dilated 3x3 (d6/d12/d18), and a global-pool branch; concat + 1x1."""

    features: int
    rate: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        _, h, w, _ = x.shape

        def branch(name, ksize, dilation):
            pad = 0 if ksize == 1 else dilation
            y = nn.Conv(
                self.features, (ksize, ksize), padding=pad,
                kernel_dilation=dilation, use_bias=True,
                dtype=self.dtype, name=f"{name}_conv",
            )(x)
            y = BatchNorm2d(dtype=self.dtype, name=f"{name}_bn")(y, train=train)
            return nn.relu(y)

        b1 = branch("branch1", 1, self.rate)
        b2 = branch("branch2", 3, 6 * self.rate)
        b3 = branch("branch3", 3, 12 * self.rate)
        b4 = branch("branch4", 3, 18 * self.rate)

        g = global_avg_pool(x)
        g = nn.Conv(
            self.features, (1, 1), use_bias=True, dtype=self.dtype,
            name="branch5_conv",
        )(g)
        g = BatchNorm2d(dtype=self.dtype, name="branch5_bn")(g, train=train)
        g = nn.relu(g)
        g = resize_bilinear(g, (h, w), align_corners=True)

        cat = jnp.concatenate([b1, b2, b3, b4, g], axis=-1)
        out = nn.Conv(
            self.features, (1, 1), use_bias=True, dtype=self.dtype,
            name="conv_cat_conv",
        )(cat)
        out = BatchNorm2d(dtype=self.dtype, name="conv_cat_bn")(out, train=train)
        return nn.relu(out)


class SpatialPyramidPooling(nn.Module):
    """SPP with stride-1 max pools (coc_fpn_dual.py:107-117; unused by the
    live path but part of the component inventory)."""

    pool_sizes: tuple[int, ...] = (5, 9, 13)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feats = []
        for ps in self.pool_sizes[::-1]:
            pad = ps // 2
            feats.append(
                nn.max_pool(
                    x, (ps, ps), strides=(1, 1),
                    padding=((pad, pad), (pad, pad)),
                )
            )
        return jnp.concatenate(feats + [x], axis=-1)


class CoCFpnDual(nn.Module):
    """Backbone + ASPP + seg decoder + radar det FPN (coc_fpn_dual.py:133-224).

    __call__(image, radar) -> ((p3, p4, p5), seg_logits)
    """

    variant: CoCVariant
    num_seg_classes: int = 9
    width: float = 1.0
    use_pallas: bool = False
    prestem_s2d: bool = True
    remat: str = "none"
    # parity: the reference's final seg projection is a ConvBnAct, so its
    # "logits" are post-ReLU (coc_fpn_dual.py:15-26,164) — the background
    # logit saturates at exactly 0 and cannot out-compete object-logit bleed
    # at upsampled boundaries (measured: 55% of halo false-positives have a
    # hard-zero bg logit).  seg_signed_logits=True is the corrected variant
    # (drop only the final ReLU; params identical, weights interchangeable).
    seg_signed_logits: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, radar: jnp.ndarray, train: bool = False):
        dims = self.variant.scaled_dims(self.width)
        c2, c3, c4, c5 = dims  # 64w / 128w / 320w / 512w

        outs, outs_radar = VRCoC(
            variant=self.variant, width=self.width,
            use_pallas=self.use_pallas, prestem_s2d=self.prestem_s2d,
            remat=self.remat,
            dtype=self.dtype, name="backbone",
        )(image, radar, train=train)

        x_s2, x_s3, x_s4, x_s5 = outs
        r_s2, r_s3, r_s4, r_s5 = outs_radar

        x_s5 = ASPP(c5, dtype=self.dtype, name="aspp")(x_s5, train=train)

        # ---------------- segmentation branch (image taps) ----------------
        up = CoCUpsample(c4, dtype=self.dtype, name="upsample5_4")(x_s5, train=train)
        y = jnp.concatenate([x_s4, up], axis=-1)            # skip first
        y = channel_shuffle(y)
        y = ShuffleAttention(groups=8, dtype=self.dtype, name="sc_attn_seg4")(y)

        up = CoCUpsample(c3, dtype=self.dtype, name="upsample4_3")(y, train=train)
        y = jnp.concatenate([up, x_s3], axis=-1)            # upsample first
        y = channel_shuffle(y)
        y = ShuffleAttention(groups=8, dtype=self.dtype, name="sc_attn_seg3")(y)

        up = CoCUpsample(c2, dtype=self.dtype, name="upsample3_2")(y, train=train)
        y = jnp.concatenate([up, x_s2], axis=-1)            # upsample first
        y = channel_shuffle(y)
        y = ShuffleAttention(groups=8, dtype=self.dtype, name="sc_attn_seg2")(y)

        seg = CoCUpsample(
            self.num_seg_classes, scale=4,
            act="none" if self.seg_signed_logits else "relu",
            dtype=self.dtype, name="upsample2_0",
        )(y, train=train)

        # ---------------- detection branch (radar taps) -------------------
        p5 = CoCConv(
            c5, use_pallas=self.use_pallas, dtype=self.dtype, name="p5_out_det",
        )(r_s5, train=train)

        up = CoCUpsample(c4, dtype=self.dtype, name="p5_4_det")(p5, train=train)
        p4 = CoCConv(
            c4, use_pallas=self.use_pallas, dtype=self.dtype, name="p4_out_det",
        )(jnp.concatenate([r_s4, up], axis=-1), train=train)

        up = CoCUpsample(c3, dtype=self.dtype, name="p4_3_det")(p4, train=train)
        p3 = CoCConv(
            c3, use_pallas=self.use_pallas, dtype=self.dtype, name="p3_out_det",
        )(jnp.concatenate([r_s3, up], axis=-1), train=train)

        return (p3, p4, p5), seg
