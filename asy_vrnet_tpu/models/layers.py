"""Primitive NN layers (NHWC, flax.linen).

TPU-native re-implementations of the reference's conv/attention primitives:
  - ConvBnAct / DepthwiseSeparableConv: backbone/conv_utils/normal_conv.py:5-52
  - ECA channel attention:              backbone/attention_modules/eca.py:6-22
  - ShuffleAttention:                   backbone/attention_modules/shuffle_attention.py:8-72
  - GroupNorm(1), Mlp, channel shuffle: backbone/fusion/vr_coc.py:70-80,105-111,195-223

Layout is NHWC (TPU conv-friendly); parameters are kept in fp32
(`param_dtype`) with a configurable compute dtype (bf16 by default).
Torch-parity notes are inline where semantics are subtle (BN momentum
direction, exact GELU, per-channel GroupNorm in ShuffleAttention).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from asy_vrnet_tpu.ops.resize import global_avg_pool

Dtype = Any


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    """Channel shuffle on NHWC; identity when C % groups != 0 (vr_coc.py:70-80)."""
    b, h, w, c = x.shape
    if c % groups:
        return x
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(b, h, w, c)


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name == "silu":
        return jax.nn.silu
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.1)
    if name == "gelu":
        # torch nn.GELU default is the exact erf formulation.
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(f"Unsupported act type: {name}")


class ConvBnAct(nn.Module):
    """Conv2d(bias=False) -> BatchNorm(eps 1e-3, torch momentum 0.03) -> act.

    Equivalent of BaseConv (normal_conv.py:36-52).  With ds_conv=True the conv
    is a depthwise k×k + pointwise 1×1 pair (DWConv, :23-33); BaseConv forwards
    its default bias=False into DWConv, so both convs are bias-free too (the
    real reference state_dict has no head.*_convs.*.conv.{d,p}conv.bias keys).
    """

    features: int
    kernel_size: int
    strides: int = 1
    act: str = "relu"
    ds_conv: bool = False
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel_size
        pad = (k - 1) // 2
        if self.ds_conv:
            in_ch = x.shape[-1]
            x = nn.Conv(
                in_ch, (k, k), strides=self.strides, padding=pad,
                feature_group_count=in_ch, use_bias=False,
                dtype=self.dtype, name="dconv",
            )(x)
            x = nn.Conv(
                self.features, (1, 1), use_bias=False, dtype=self.dtype, name="pconv",
            )(x)
        else:
            x = nn.Conv(
                self.features, (k, k), strides=self.strides, padding=pad,
                feature_group_count=self.groups, use_bias=False,
                dtype=self.dtype, name="conv",
            )(x)
        # torch BatchNorm2d(momentum=0.03): running = 0.97*running + 0.03*batch
        # -> flax momentum (decay) = 0.97.
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            dtype=self.dtype, name="bn",
        )(x)
        return get_activation(self.act)(x)


class BatchNorm2d(nn.Module):
    """Standalone torch-default BatchNorm2d (eps 1e-5, torch momentum 0.1)."""

    momentum: float = 0.1  # torch convention; flax decay = 1 - momentum
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=not train, momentum=1.0 - self.momentum,
            epsilon=self.epsilon, dtype=self.dtype, name="bn",
        )(x)


class GroupNorm1(nn.Module):
    """GroupNorm with a single group over all channels (vr_coc.py:105-111)."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.GroupNorm(
            num_groups=1, epsilon=self.epsilon, dtype=self.dtype, name="gn"
        )(x)


class Mlp(nn.Module):
    """1x1-conv MLP with exact GELU (vr_coc.py:195-223)."""

    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Conv(self.hidden_features, (1, 1), dtype=self.dtype, name="fc1")(x)
        x = get_activation("gelu")(x)
        if self.drop > 0.0:
            x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = nn.Conv(self.out_features, (1, 1), dtype=self.dtype, name="fc2")(x)
        if self.drop > 0.0:
            x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath equivalent)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape=shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


def eca_kernel_size(channels: int, b: int = 1, gamma: int = 2) -> int:
    """Adaptive 1D kernel size from channel count (eca.py:9-10)."""
    k = int(abs((math.log2(channels) + b) / gamma))
    return k if k % 2 else k + 1


class ECA(nn.Module):
    """Efficient Channel Attention: GAP -> 1D conv over channels -> sigmoid.

    Equivalent of eca_block (eca.py:6-22).  The 1D conv over the channel axis
    is expressed with lax.conv so XLA fuses it with the surrounding gating.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        k = eca_kernel_size(c)
        w = self.param(
            "conv_w",
            nn.initializers.lecun_normal(),
            (1, 1, k),
            jnp.float32,
        )
        pooled = global_avg_pool(x, keepdims=False)  # (B, C)
        # 1D conv over the channel axis: (N=batch, C=1, W=channels)
        y = jax.lax.conv_general_dilated(
            pooled[:, None, :].astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(1,),
            padding=[((k - 1) // 2, (k - 1) // 2)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        )[:, 0, :]
        gate = jax.nn.sigmoid(y)
        return x * gate[:, None, None, :]


class ShuffleAttention(nn.Module):
    """Shuffle Attention (shuffle_attention.py:8-72).

    Splits channels into G groups; each group's first half gets channel
    attention (GAP -> affine -> sigmoid), the second half spatial attention
    (per-channel GroupNorm -> affine -> sigmoid); halves are concatenated and
    channel-shuffled with 2 groups.
    """

    groups: int = 8  # G (G=4 inside the fusion modules, vr_coc.py:325)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        g = self.groups
        if c % (2 * g):
            # torch broadcast-fails identically (shuffle_attention.py:26-33);
            # the per-channel formulation below would otherwise silently run
            raise TypeError(
                f"ShuffleAttention: {c} channels not divisible by 2*groups={2 * g}"
            )
        c2g = c // (2 * g)
        # params mirror the torch module: cweight/cbias/sweight/sbias of shape
        # (c//(2G),) plus the GroupNorm's own per-channel gamma/beta.
        cweight = self.param("cweight", nn.initializers.zeros, (c2g,), jnp.float32)
        cbias = self.param("cbias", nn.initializers.ones, (c2g,), jnp.float32)
        sweight = self.param("sweight", nn.initializers.zeros, (c2g,), jnp.float32)
        sbias = self.param("sbias", nn.initializers.ones, (c2g,), jnp.float32)
        gn_scale = self.param("gn_scale", nn.initializers.ones, (c2g,), jnp.float32)
        gn_bias = self.param("gn_bias", nn.initializers.zeros, (c2g,), jnp.float32)

        # The (G, 2, c2g) grouping is just an interpretation of the channel
        # index (channel = gi*2*c2g + hi*c2g + ci), and both attention halves
        # reduce to per-CHANNEL (H,W) statistics — so the whole module runs
        # in the native NHWC layout with per-channel gates.  The round-1
        # reshape/slice/stack formulation forced ~256 MB f32 layout copies
        # per instance at stage-1 resolution (profiler trace, BENCH_NOTES).
        import numpy as np

        within = np.arange(c) % (2 * c2g)
        ci = within % c2g
        is_spatial = (within // c2g).astype(bool)           # hi: 0=channel-att

        def spread(p):
            # tiny constant-index gather of a (c2g,) param to (C,), fp32
            return p[ci]

        f32 = jnp.float32
        xf = x.astype(f32)
        # one-pass moments: sum and sum-of-squares fuse into a single HBM
        # read (jnp.var's two-pass form costs an extra full pass at 512²)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)      # (B,1,1,C)
        var = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True) - jnp.square(mean)

        # Both gates collapse to one per-channel affine-in-x logit:
        #   spatial half:  sigmoid(sw*GN(x)+sb) = sigmoid(a*x + t),
        #     a = sw*gs*rsqrt(var+eps),  t = sb + sw*gb - a*mean
        #   channel half:  sigmoid(cw*mean + cb)  (a = 0, t = that logit)
        rstd = jax.lax.rsqrt(var + 1e-5)
        a_sp = spread(sweight) * spread(gn_scale) * rstd
        t_sp = spread(sbias) + spread(sweight) * spread(gn_bias) - a_sp * mean
        t_ch = spread(cweight) * mean + spread(cbias)

        sel = jnp.asarray(is_spatial)
        a = jnp.where(sel, a_sp, 0.0).astype(x.dtype)        # (B,1,1,C)
        t = jnp.where(sel, t_sp, t_ch).astype(x.dtype)
        gate = jax.nn.sigmoid(x * a + t)
        return channel_shuffle(x * gate, 2)
