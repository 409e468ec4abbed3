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

import functools
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


def shuffle_perm(c: int, groups: int = 2):
    """The channel permutation channel_shuffle applies (out[j] = x[perm[j]]),
    as a numpy array; None when C % groups != 0 (identity)."""
    import numpy as np

    if c % groups:
        return None
    return np.arange(c).reshape(groups, c // groups).T.reshape(-1)


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name == "none":
        return lambda x: x
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


def space_to_depth(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """NHWC (B,H,W,C) -> (B,H/p,W/p,p*p*C); s2d channel (pi*p+pj)*C + c.

    The TPU-native layout for the 512^2 pre-stem: 3-7-channel full-res
    tensors are layout-hostile (lane padding + feature-major re-tilings cost
    ~20 ms/fwd at bs=64, round-3 trace); folding each pxp patch into
    channels runs the same math at H/p x W/p with p^2*C channels.  All
    pre-stem ops commute exactly: 1x1 convs and BatchNorm act per original
    channel (reshape-only), the 3x3 conv becomes a conv against an
    assembled tap-rearranged kernel, and the pxp/stride-p patch_embed
    becomes a plain matmul.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // p, w // p, p * p * c)


@functools.lru_cache(maxsize=None)
def _s2d_conv_placement(k: int, ph: int, pw: int):
    """Static 0/1 placement tensor mapping a (k,k,·,·) conv kernel into the
    equivalent s2d-space kernel for a (ph, pw) spatial fold: M has shape
    (k, k, ph*pw [p-index], kkh, kkw, ph*pw [s-index]) with at most one
    nonzero (di,dj) per output cell; kk* = 2*ceil((k//2)/p*)+1.  ph=pw gives
    the square space-to-depth geometry; (1, s) is the W-only lane fold
    (ops/block_pallas.py lane-folding note).  Channel blocks ride along
    untouched, so the kernel assembly is ONE einsum against M — the former
    element-wise scatter (and its gather transpose in the backward) cost
    ~2 ms/step of sort-scatter fusions at bs=64 (round-4 trace)."""
    import numpy as np

    r = k // 2
    kkh = 2 * ((r + ph - 1) // ph) + 1
    kkw = 2 * ((r + pw - 1) // pw) + 1
    offh, offw = kkh // 2, kkw // 2
    m = np.zeros((k, k, ph * pw, kkh, kkw, ph * pw), np.float32)
    for pi in range(ph):
        for pj in range(pw):
            for di in range(-r, r + 1):
                for dj in range(-r, r + 1):
                    DI, si = divmod(pi + di, ph)
                    DJ, sj = divmod(pj + dj, pw)
                    m[di + r, dj + r, pi * pw + pj,
                      DI + offh, DJ + offw, si * pw + sj] = 1.0
    return (kkh, kkw), m


def s2d_conv_kernel(w: jnp.ndarray, p, ) -> jnp.ndarray:
    """Assemble the s2d-space kernel from a canonical (k,k,cin,cout) kernel
    (differentiable — gradients flow back to the canonical param).
    `p` is an int (square pxp fold) or a (ph, pw) pair; (1, s) is the
    W-only lane fold."""
    k, _, cin, cout = w.shape
    ph, pw = (p, p) if isinstance(p, int) else p
    (kkh, kkw), m = _s2d_conv_placement(k, ph, pw)
    kk = jnp.einsum(
        "xypABs,xyio->ABsipo", jnp.asarray(m, w.dtype), w,
        precision=jax.lax.Precision.HIGHEST,
    )
    return kk.reshape(kkh, kkw, ph * pw * cin, ph * pw * cout)


def s2d_pointwise_kernel(w: jnp.ndarray, g: int, segments) -> jnp.ndarray:
    """Block-diagonal flat-s2d kernel for a canonical 1x1 conv kernel
    w (cin_total, cout); returns (g*cin_total, g*cout).  Differentiable.

    Input channels are a concat of s-major segments (each segment lists its
    orig-channel count; segment j's flat channel (s, ci) sits at
    offset_j*g + s*seg_j + ci and corresponds to canonical input channel
    sum(segments[:j]) + ci).  Output is flat s-major (s, co).  Built as
    per-segment Kronecker placements (einsum against eye(g)) instead of an
    element-wise scatter — see _s2d_conv_placement."""
    cin_total, cout = w.shape
    eye = jnp.eye(g, dtype=w.dtype)
    blocks = []
    coff = 0
    for seg in segments:
        wj = w[coff : coff + seg]                     # (seg, cout)
        blk = jnp.einsum(
            "sS,io->siSo", eye, wj,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(g * seg, g * cout)
        blocks.append(blk)
        coff += seg
    return jnp.concatenate(blocks, axis=0)


def _s2d_batchnorm(mod: nn.Module, x: jnp.ndarray, g: int, train: bool,
                   decay: float, eps: float, dtype) -> jnp.ndarray:
    """Hand-rolled BatchNorm reusing the module's canonical "bn" child
    params/stats (nn.BatchNorm-compatible variable tree).

    g > 0: the input is flat s2d with g sub-position groups and stats stay
    per ORIGINAL channel (the per-(group, channel) moments average — equal
    counts — to the full-resolution moments).  g == 0: plain per-channel BN.

    Why not nn.BatchNorm: in bf16 flax materialises f32 copies of the full
    tensor with relayouts (~6 ms/fwd at bs=128, round-3 trace); here the
    moments are one fused f32 reduce and the normalisation is a single
    compute-dtype elementwise pass against C-sized affine vectors."""
    p = mod.variables["params"]["bn"]
    gc = x.shape[-1]
    c = gc // g if g else gc
    if train:
        xf32 = x.astype(jnp.float32)
        m_gc = jnp.mean(xf32, axis=(0, 1, 2))
        m2_gc = jnp.mean(jnp.square(xf32), axis=(0, 1, 2))
        if g:
            m_gc = jnp.mean(m_gc.reshape(g, c), axis=0)
            m2_gc = jnp.mean(m2_gc.reshape(g, c), axis=0)
        mean = m_gc
        var = m2_gc - jnp.square(mean)
        stats = mod.variables["batch_stats"]["bn"]
        mod.put_variable(
            "batch_stats", "bn",
            {
                "mean": decay * stats["mean"] + (1.0 - decay) * mean,
                "var": decay * stats["var"] + (1.0 - decay) * var,
            },
        )
    else:
        stats = mod.variables["batch_stats"]["bn"]
        mean, var = stats["mean"], stats["var"]
    mul = p["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        var.astype(jnp.float32) + eps
    )                                                       # (c,)
    add = p["bias"].astype(jnp.float32) - mean.astype(jnp.float32) * mul
    if g:
        mul, add = jnp.tile(mul, g), jnp.tile(add, g)
    return x.astype(dtype) * mul.astype(dtype) + add.astype(dtype)


class ConvBnAct(nn.Module):
    """Conv2d(bias=False) -> BatchNorm(eps 1e-3, torch momentum 0.03) -> act.

    Equivalent of BaseConv (normal_conv.py:36-52).  With ds_conv=True the conv
    is a depthwise k×k + pointwise 1×1 pair (DWConv, :23-33); BaseConv forwards
    its default bias=False into DWConv, so both convs are bias-free too (the
    real reference state_dict has no head.*_convs.*.conv.{d,p}conv.bias keys).

    s2d > 0 marks the input as space-to-depth with s2d sub-position groups in
    the FLAT layout (channel (group, orig_channel) = g*C lanes — the whole
    point: 3-7-lane full-res tensors become 48-112-lane folded ones).
    s2d_segments describes an input that is a concat of s-major flat
    segments (e.g. (3, 4) for the pre-stem image|radar concat); default one
    segment.  The 1x1 conv becomes a matmul against a block-diagonal kernel,
    the kxk conv a conv against the tap-rearranged s2d kernel, BN stays per
    original channel via grouped moments.  Only valid after init (the
    standard path declares the canonical params).
    """

    features: int
    kernel_size: int
    strides: int = 1
    act: str = "relu"
    ds_conv: bool = False
    groups: int = 1
    s2d: int = 0
    s2d_segments: tuple = ()
    # s2d_geom: (ph, pw) spatial fold geometry of the s2d layout; default is
    # the square sqrt(g) x sqrt(g) space-to-depth.  (1, s) is the W-only
    # lane fold used by the folded fusion stages.
    s2d_geom: tuple = ()
    # in_perm: consume the input as if it had been channel-permuted by this
    # array (virtual x[j] = x_raw[in_perm_src[j]]) by indexing the canonical
    # kernel's rows at trace time — the actual permutation op never runs.
    # The array passed is R with kernel_eff = kernel[R] (R = argsort(perm)).
    # Composable with s2d for 1x1 convs (the perm relabels CANONICAL input
    # channels before the block-diagonal expansion).
    in_perm: tuple = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel_size
        pad = (k - 1) // 2
        if self.in_perm and not self.is_initializing() and not self.s2d:
            assert k == 1 and not self.ds_conv
            import numpy as np

            wk = self.variables["params"]["conv"]["kernel"][0, 0]
            wp = wk[np.asarray(self.in_perm)].astype(self.dtype)
            y = jnp.einsum("bhwc,cd->bhwd", x.astype(self.dtype), wp)
            y = _s2d_batchnorm(self, y, 0, train, 0.97, 1e-3, self.dtype)
            return get_activation(self.act)(y)
        if self.s2d:
            assert not self.ds_conv and self.strides == 1 and self.groups == 1
            assert not self.is_initializing()
            g = self.s2d
            wk = self.variables["params"]["conv"]["kernel"]
            if k == 1:
                import numpy as np

                w0 = wk[0, 0]
                if self.in_perm:
                    w0 = w0[np.asarray(self.in_perm)]
                segs = self.s2d_segments or (wk.shape[2],)
                kmat = s2d_pointwise_kernel(w0, g, segs).astype(self.dtype)
                y = jnp.einsum("bhwk,kc->bhwc", x.astype(self.dtype), kmat)
            else:
                assert not self.in_perm, "in_perm + s2d only for 1x1 convs"
                geom = self.s2d_geom or (int(g ** 0.5), int(g ** 0.5))
                kk = s2d_conv_kernel(wk, tuple(geom)).astype(self.dtype)
                offh, offw = kk.shape[0] // 2, kk.shape[1] // 2
                y = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), kk, (1, 1),
                    [(offh, offh), (offw, offw)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            y = _s2d_batchnorm(self, y, g, train, 0.97, 1e-3, self.dtype)
            return get_activation(self.act)(y)
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
        if jnp.dtype(self.dtype) == jnp.bfloat16 and not self.is_initializing():
            # fast hand-rolled BN (see _s2d_batchnorm) — f32 path keeps
            # nn.BatchNorm for bit-level reference parity
            x = _s2d_batchnorm(self, x, 0, train, 0.97, 1e-3, self.dtype)
        else:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.97, epsilon=1e-3,
                dtype=self.dtype, name="bn",
            )(x)
        return get_activation(self.act)(x)


class BatchNorm2d(nn.Module):
    """Standalone torch-default BatchNorm2d (eps 1e-5, torch momentum 0.1).

    s2d_groups > 0: the input is space-to-depth with that many sub-position
    groups; normalisation stays per ORIGINAL channel (exact same element
    sets and running-stat updates as the full-resolution layout)."""

    momentum: float = 0.1  # torch convention; flax decay = 1 - momentum
    epsilon: float = 1e-5
    s2d_groups: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        fast = jnp.dtype(self.dtype) == jnp.bfloat16 or self.s2d_groups
        if fast and not self.is_initializing():
            return _s2d_batchnorm(
                self, x, self.s2d_groups, train,
                1.0 - self.momentum, self.epsilon, self.dtype,
            )
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

    s2d: int = 0                # flat s2d groups (0 = standard NHWC)
    s2d_segments: tuple = ()    # s-major segment widths of a concat input
    # channel_perm: gate as if the input had been permuted by this channel
    # permutation (out[j] = x[perm[j]]) WITHOUT materialising the permuted
    # tensor — the permutation moves to the (B, C) pooled vector and the
    # gate, and the caller folds it into the next 1x1 conv's kernel rows.
    channel_perm: tuple = ()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.s2d:
            g = self.s2d
            segs = self.s2d_segments or (x.shape[-1] // self.s2d,)
            c = sum(segs)
        else:
            c = x.shape[-1]
        k = eca_kernel_size(c)
        w = self.param(
            "conv_w",
            nn.initializers.lecun_normal(),
            (1, 1, k),
            jnp.float32,
        )
        if self.s2d:
            # GAP per ORIGINAL channel: segment-wise grouped means (the
            # element sets match full resolution exactly)
            pooled_gc = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # (B, g*c)
            parts, off = [], 0
            for seg in segs:
                blk = pooled_gc[:, off : off + g * seg]
                parts.append(jnp.mean(blk.reshape(-1, g, seg), axis=1))
                off += g * seg
            pooled = jnp.concatenate(parts, axis=-1).astype(x.dtype)  # (B, c)
        else:
            pooled = global_avg_pool(x, keepdims=False)  # (B, C)
        if self.channel_perm:
            import numpy as np

            perm = np.asarray(self.channel_perm)
            pooled = pooled[:, perm]                     # tiny (B, C) gather
        # 1D conv over the channel axis: (N=batch, C=1, W=channels)
        y = jax.lax.conv_general_dilated(
            pooled[:, None, :].astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(1,),
            padding=[((k - 1) // 2, (k - 1) // 2)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        )[:, 0, :]
        gate = jax.nn.sigmoid(y)
        if self.channel_perm:
            gate = gate[:, np.argsort(perm)]             # back to raw order
        if self.s2d:
            parts, off = [], 0
            for seg in segs:
                parts.append(jnp.tile(gate[:, off : off + seg], (1, g)))
                off += seg
            full_gate = jnp.concatenate(parts, axis=-1)   # (B, g*c)
            return x * full_gate[:, None, None, :]
        return x * gate[:, None, None, :]


class ShuffleAttention(nn.Module):
    """Shuffle Attention (shuffle_attention.py:8-72).

    Splits channels into G groups; each group's first half gets channel
    attention (GAP -> affine -> sigmoid), the second half spatial attention
    (per-channel GroupNorm -> affine -> sigmoid); halves are concatenated and
    channel-shuffled with 2 groups.
    """

    groups: int = 8  # G (G=4 inside the fusion modules, vr_coc.py:325)
    # skip_final_shuffle: return the gated tensor WITHOUT the trailing
    # channel_shuffle(2); the caller folds that permutation into downstream
    # kernel rows (see RadarEnhanceByImage).
    skip_final_shuffle: bool = False
    # s2d: the input is a flat s2d/lane-fold layout with this many
    # sub-position groups (channel = p*C + c); per-ORIGINAL-channel stats
    # are the grouped moments (exact same element sets), gates tile back.
    s2d: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, cf = x.shape
        c = cf // self.s2d if self.s2d else cf
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
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)      # (B,1,1,Cf)
        m2 = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
        if self.s2d:
            # per-original-channel stats: average the phase blocks (equal
            # element counts -> exact full-resolution moments)
            s = self.s2d
            mean = jnp.mean(mean.reshape(b, 1, 1, s, c), axis=3)
            m2 = jnp.mean(m2.reshape(b, 1, 1, s, c), axis=3)
        var = m2 - jnp.square(mean)

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
        if self.s2d:
            assert self.skip_final_shuffle, (
                "folded ShuffleAttention requires the caller to fold the "
                "trailing shuffle into downstream kernels"
            )
            a = jnp.tile(a, (1, 1, 1, self.s2d))
            t = jnp.tile(t, (1, 1, 1, self.s2d))
            return x * jax.nn.sigmoid(x * a + t)
        gate = jax.nn.sigmoid(x * a + t)
        if self.skip_final_shuffle:
            return x * gate
        return channel_shuffle(x * gate, 2)
