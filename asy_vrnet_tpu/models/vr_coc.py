"""Dual-stream (vision + radar) Context-Cluster backbone with asymmetric fusion.

TPU-native rebuild of VRCoC (backbone/fusion/vr_coc.py:303-704): a 4-stage
dual Context-Cluster hierarchy where after each stage the image stream is
gated by a normalised radar projection (ImageEnhanceByRadar, :303-316) and the
radar stream is enhanced by the *already-enhanced* image via shuffle/ECA
attention and an inverse projection (RadarEnhanceByImage, :319-359).

Faithfully reproduced structural quirks (flagged `# parity:`):
  - the radar positional-embedding concat reuses the image grid (`fea_pos`,
    not `fea_pos_r`, vr_coc.py:585) — both grids are identical anyway;
  - the stage-3 tap is computed but discarded (vr_coc.py:655-656);
  - taps are [after stage-1 fusion, after reducer-1, after reducer-2, after
    stage-4 fusion] at strides 4/8/16/32.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from asy_vrnet_tpu.config import CoCVariant
from asy_vrnet_tpu.models.cluster_block import ClusterBlock
from asy_vrnet_tpu.models.layers import (
    BatchNorm2d,
    ConvBnAct,
    ECA,
    ShuffleAttention,
    channel_shuffle,
    space_to_depth,
)

Dtype = Any


def data_normal(x: jnp.ndarray) -> jnp.ndarray:
    """Global (whole-tensor) min-max normalisation to [0,1] (vr_coc.py:59-67)."""
    d_min = jnp.min(x)
    d_max = jnp.max(x)
    return (x - d_min) / (d_max - d_min)


def positional_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H,W,2) coordinate grid in [-0.5, 0.5]: ch0 = row coord, ch1 = col coord.

    Matches the registered `fea_pos` buffer (vr_coc.py:401-406): torch
    meshgrid(indexing='ij') stacked on the last dim then treated as (C,H,W).
    """
    rows = np.arange(h, dtype=np.float32) / max(h - 1.0, 1.0) - 0.5
    cols = np.arange(w, dtype=np.float32) / max(w - 1.0, 1.0) - 0.5
    grid = np.stack(np.meshgrid(rows, cols, indexing="ij"), axis=-1)
    return jnp.asarray(grid, dtype=dtype)


def _initial_fold_conv(params, x: jnp.ndarray, p: int, dtype) -> jnp.ndarray:
    """cast + space_to_depth(p) + 1x1 initial projection as ONE strided conv.

    `params` is a PointReducer(patch_size=1, stride=1) param tree
    ({'proj': {'kernel': (1,1,C,Co), 'bias': (Co,)}}).  Output channel
    (pi*p+pj)*Co + co matches the s-major flat-s2d order of
    layers.space_to_depth + s2d_pointwise_kernel exactly; each output
    contracts against a single input tap (0/1 placement), so the bf16 sums
    are bitwise those of the separate path."""
    import jax as _jax

    w = params["proj"]["kernel"][0, 0]                  # (C, Co)
    bias = params["proj"]["bias"]
    g = p * p
    eye = np.zeros((p, p, g), np.float32)
    for pi in range(p):
        for pj in range(p):
            eye[pi, pj, pi * p + pj] = 1.0
    k = jnp.einsum(
        "xys,io->xyiso", jnp.asarray(eye, w.dtype), w,
        precision=_jax.lax.Precision.HIGHEST,
    ).reshape(p, p, w.shape[0], g * w.shape[1])
    y = _jax.lax.conv_general_dilated(
        x.astype(dtype), k.astype(dtype), (p, p), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + jnp.tile(bias, g).astype(dtype)


class PointReducer(nn.Module):
    """Patch-embed / downsample as a strided conv (vr_coc.py:83-102).

    s2d > 0: the input is space-to-depth with s2d sub-position groups.
    A 1x1/stride-1 reducer folds the group axis into W (exact); a
    pxp/stride-p reducer with p^2 == s2d IS a plain matmul in this layout
    (its output lives at the reduced resolution already)."""

    features: int
    patch_size: int = 16
    stride: int = 16
    padding: int = 0
    s2d: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from asy_vrnet_tpu.models.layers import s2d_pointwise_kernel

        if self.s2d and self.patch_size == 1 and self.stride == 1:
            assert not self.is_initializing()
            g = self.s2d
            proj = self.variables["params"]["proj"]
            wk = proj["kernel"][0, 0]                     # (cin, cout)
            kmat = s2d_pointwise_kernel(wk, g, (wk.shape[0],)).astype(self.dtype)
            y = jnp.einsum("bhwk,kc->bhwc", x.astype(self.dtype), kmat)
            return y + jnp.tile(proj["bias"], g).astype(self.dtype)
        if self.s2d:
            # pxp/stride-p reducer == a plain matmul in the flat s2d layout.
            # Input is [x_flat (s-major, cin) | pos_flat (s-major, 2)]; the
            # canonical (p,p,cin+2,cout) kernel rows are re-ordered to match.
            assert (
                self.patch_size == self.stride
                and self.patch_size ** 2 == self.s2d
                and self.padding == 0
                and not self.is_initializing()
            )
            proj = self.variables["params"]["proj"]
            wk = proj["kernel"]                           # (p, p, ctot, cout)
            p_, _, ctot, cout = wk.shape
            g = self.s2d
            w_flat = wk.reshape(g * ctot, cout)           # rows (s, ci)
            import numpy as np

            cin = ctot - 2
            order = np.concatenate([
                (np.repeat(np.arange(g), cin) * ctot
                 + np.tile(np.arange(cin), g)),           # x rows (s, ci<cin)
                (np.repeat(np.arange(g), 2) * ctot
                 + np.tile(cin + np.arange(2), g)),       # pos rows (s, k)
            ])
            w2 = w_flat[order].astype(self.dtype)
            return jnp.einsum(
                "bhwk,kc->bhwc", x.astype(self.dtype), w2
            ) + proj["bias"].astype(self.dtype)
        return nn.Conv(
            self.features,
            (self.patch_size, self.patch_size),
            strides=self.stride,
            padding=self.padding,
            use_bias=True,
            dtype=self.dtype,
            name="proj",
        )(x)


class ImageEnhanceByRadar(nn.Module):
    """radar -> 3x3 ConvBnAct projection -> global min-max -> (1+norm)*image
    -> BatchNorm (vr_coc.py:303-316).

    s2d > 0: inputs are space-to-depth with s2d groups (pre-stem only); the
    gating/min-max are elementwise or whole-tensor and commute exactly."""

    image_channels: int
    s2d: int = 0
    s2d_geom: tuple = ()       # (ph, pw) fold geometry; (1, s) = lane fold
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, radar: jnp.ndarray, train: bool = False):
        key = ConvBnAct(
            self.image_channels, 3, act="relu", s2d=self.s2d,
            s2d_geom=self.s2d_geom, dtype=self.dtype,
            name="radar_projection",
        )(radar, train=train)
        gated = (1.0 + data_normal(key)) * image
        return BatchNorm2d(
            s2d_groups=self.s2d, dtype=self.dtype, name="norm"
        )(gated, train=train)


class RadarEnhanceByImage(nn.Module):
    """(ShuffleAttention on image) -> concat -> shuffle(2) -> ECA -> 1x1
    inverse projection -> +radar residual -> BatchNorm (vr_coc.py:319-359).

    `initial=True` (used once pre-stem on the raw 3/4-channel inputs,
    vr_coc.py:421) skips the ShuffleAttention.  s2d > 0 (initial only):
    concat happens per sub-position group; the 3+4=7-channel shuffle(2) is
    an identity in both layouts (7 % 2 != 0, vr_coc.py:70-80).
    """

    radar_channels: int
    initial: bool = False
    s2d: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, radar: jnp.ndarray, train: bool = False):
        if self.s2d and not self.initial:
            # Lane-folded stage fusion (W-only fold, s2d groups = 128/C):
            # the same perm-composition trick as the unfolded bf16 path
            # below, with every op running on the dense 128-lane layout.
            import numpy as np

            from asy_vrnet_tpu.models.layers import shuffle_perm

            g = self.s2d
            ci_img = image.shape[-1] // g
            ci_rad = radar.shape[-1] // g
            c_tot = ci_img + ci_rad
            s = shuffle_perm(c_tot, 2)
            assert s is not None, "stage fusion channel count must be even"
            image = ShuffleAttention(
                groups=4, skip_final_shuffle=True, s2d=g, dtype=self.dtype,
                name="image_attn",
            )(image)
            sa = shuffle_perm(ci_img, 2)
            q = s.copy()
            if sa is not None:
                img_part = q < ci_img
                q[img_part] = sa[q[img_part]]
            fused = jnp.concatenate([image, radar], axis=-1)  # flat segments
            fused = ECA(
                s2d=g, s2d_segments=(ci_img, ci_rad),
                channel_perm=tuple(int(v) for v in q), dtype=self.dtype,
                name="channel_attn",
            )(fused)
            fused = ConvBnAct(
                self.radar_channels, 1, act="relu", s2d=g,
                s2d_segments=(ci_img, ci_rad),
                in_perm=tuple(int(v) for v in np.argsort(q)),
                dtype=self.dtype, name="inverse_projection",
            )(fused, train=train)
            fused = fused + radar
            return BatchNorm2d(
                s2d_groups=g, dtype=self.dtype, name="norm"
            )(fused, train=train)
        if self.s2d:
            assert self.initial, "s2d fusion only exists pre-stem"
            g = self.s2d
            ci_img = image.shape[-1] // g
            ci_rad = radar.shape[-1] // g
            # channel_shuffle(2) over 3+4=7 original channels is the identity
            assert (ci_img + ci_rad) % 2 == 1
            fused = jnp.concatenate([image, radar], axis=-1)  # flat segments
            fused = ECA(
                s2d=g, s2d_segments=(ci_img, ci_rad), dtype=self.dtype,
                name="channel_attn",
            )(fused)
            fused = ConvBnAct(
                self.radar_channels, 1, act="relu", s2d=g,
                s2d_segments=(ci_img, ci_rad), dtype=self.dtype,
                name="inverse_projection",
            )(fused, train=train)
            fused = fused + radar
            return BatchNorm2d(
                s2d_groups=g, dtype=self.dtype, name="norm"
            )(fused, train=train)
        # bf16 production: the channel shuffles (ShuffleAttention's trailing
        # one and the fusion's own) are pure permutations between per-channel
        # ops — fold them into the ECA pooled vector and the 1x1 inverse
        # projection's kernel rows instead of materialising permuted copies
        # (~1.7 ms per stage-0 instance, round-3 trace).  f32 keeps the
        # literal ops for bit-level reference parity.
        import numpy as np

        from asy_vrnet_tpu.models.layers import shuffle_perm

        fold = (
            jnp.dtype(self.dtype) == jnp.bfloat16 and not self.is_initializing()
        )
        c_img = image.shape[-1]
        c_tot = c_img + radar.shape[-1]
        s = shuffle_perm(c_tot, 2)
        if fold and s is not None:
            if not self.initial:
                image = ShuffleAttention(
                    groups=4, skip_final_shuffle=True, dtype=self.dtype,
                    name="image_attn",
                )(image)
                sa = shuffle_perm(c_img, 2)
            else:
                sa = None
            fused = jnp.concatenate([image, radar], axis=-1)
            # composed virtual permutation: fusion shuffle after (optional)
            # SA shuffle on the image half
            q = s.copy()
            if sa is not None:
                img_part = q < c_img
                q[img_part] = sa[q[img_part]]
            fused = ECA(
                channel_perm=tuple(int(v) for v in q), dtype=self.dtype,
                name="channel_attn",
            )(fused)
            fused = ConvBnAct(
                self.radar_channels, 1, act="relu",
                in_perm=tuple(int(v) for v in np.argsort(q)),
                dtype=self.dtype, name="inverse_projection",
            )(fused, train=train)
            fused = fused + radar
            return BatchNorm2d(dtype=self.dtype, name="norm")(fused, train=train)

        if not self.initial:
            image = ShuffleAttention(groups=4, dtype=self.dtype, name="image_attn")(image)
        fused = jnp.concatenate([image, radar], axis=-1)
        fused = channel_shuffle(fused, 2)
        fused = ECA(dtype=self.dtype, name="channel_attn")(fused)
        fused = ConvBnAct(
            self.radar_channels, 1, act="relu", dtype=self.dtype,
            name="inverse_projection",
        )(fused, train=train)
        fused = fused + radar
        return BatchNorm2d(dtype=self.dtype, name="norm")(fused, train=train)


def stage_lane_fold(shape, v: CoCVariant, i: int, use_pallas: bool,
                    train: bool, initializing: bool) -> int:
    """Lane-fold factor for stage i at UNFOLDED `shape` (1 = don't fold).

    Lane folding (block_pallas.py lane-folding note): with C < 128 every
    NHWC HBM buffer / DMA / VPU pass of these stages is 128/C lane-padded;
    fold s = 128/C W-tokens into lanes ONCE, run all blocks' fused kernels
    (and optionally the stage fusion) in the dense layout, unfold after.
    Gated on every block in the stage taking the fused-kernel path."""
    from asy_vrnet_tpu.ops.block_pallas import (
        lane_fold_choice,
        mixer_block_supported,
        mlp_block_supported,
    )

    if not (
        use_pallas
        and not initializing
        and v.drop_rate == 0.0
        and (v.drop_path_rate == 0.0 or not train)
        and mixer_block_supported(
            shape, heads=v.heads[i], head_dim=v.head_dim[i],
            fold_h=v.fold_h[i], fold_w=v.fold_w[i],
            proposal_h=v.proposal_h[i], proposal_w=v.proposal_w[i],
        )
        and mlp_block_supported(shape)
    ):
        return 1
    return lane_fold_choice(
        shape, fold_h=v.fold_h[i], fold_w=v.fold_w[i],
        inner=v.heads[i] * v.head_dim[i],
    )


class _Stage(nn.Module):
    """layers[i] ClusterBlocks of one stream at one stage.

    lane_fold: 0 = auto (compute the fold factor, fold at entry, unfold at
    exit — standalone use); s >= 1 = the caller already folded the input by
    s (VRCoC keeps the folded layout across the stage AND its fusion)."""

    dim: int
    num_blocks: int
    stage_index: int
    variant: CoCVariant
    use_pallas: bool = False
    lane_fold: int = 0
    # "blocks" remat (config.py::train_remat): checkpoint each ClusterBlock —
    # only the block INPUT is stored; the backward re-runs the mixer-half
    # forward kernel to rebuild the MLP-half input (the block-half kernels'
    # custom VJPs already remat their interiors in-VMEM, so per-block remat
    # adds exactly one mixer forward kernel, no conv/fusion recompute).
    remat_blocks: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        v = self.variant
        i = self.stage_index
        total = sum(v.layers)
        prior = sum(v.layers[:i])
        auto = self.lane_fold == 0
        s = (
            stage_lane_fold(
                x.shape, v, i, self.use_pallas, train, self.is_initializing()
            )
            if auto
            else self.lane_fold
        )
        if auto and s > 1:
            b, h, w, c = x.shape
            x = x.reshape(b, h, w // s, s * c)
        Block = (
            nn.remat(ClusterBlock, static_argnums=(2,))
            if self.remat_blocks
            else ClusterBlock
        )
        for j in range(self.num_blocks):
            dpr = v.drop_path_rate * (j + prior) / max(total - 1, 1)
            x = Block(
                dim=self.dim,
                mlp_ratio=v.mlp_ratios[i],
                drop=v.drop_rate,
                drop_path=dpr,
                use_layer_scale=v.use_layer_scale,
                layer_scale_init_value=v.layer_scale_init_value,
                proposal_w=v.proposal_w[i], proposal_h=v.proposal_h[i],
                fold_w=v.fold_w[i], fold_h=v.fold_h[i],
                heads=v.heads[i], head_dim=v.head_dim[i],
                use_pallas=self.use_pallas,
                lane_fold=s,
                dtype=self.dtype,
                name=f"block{j}",
            )(x, train)  # positional: nn.remat static_argnums=(2,) is `train`
        if auto and s > 1:
            x = x.reshape(b, h, w, c)
        return x


class VRCoC(nn.Module):
    """The dual-stream backbone.  __call__(image, radar) -> (outs, outs_radar),
    each a 4-tuple of NHWC feature maps at strides 4/8/16/32."""

    variant: CoCVariant
    width: float = 1.0
    image_channels: int = 3
    radar_channels: int = 4
    use_pallas: bool = False
    prestem_s2d: bool = True       # ModelConfig.prestem_s2d
    remat: str = "none"            # ModelConfig.train_remat (see config.py)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, radar: jnp.ndarray, train: bool = False):
        v = self.variant
        dims = v.scaled_dims(self.width)
        num_stages = len(v.layers)

        # Rematerialised module variants: under grad only the span inputs are
        # stored; the span's internals (conv/BN/gating intermediates — at
        # 512^2 the dominant activation cost) are recomputed in the backward.
        # train (the last positional arg) gates python BN branches -> static.
        Enh, REnh, Stage = ImageEnhanceByRadar, RadarEnhanceByImage, _Stage
        if self.remat in ("fusion", "blocks", "stages"):
            Enh = nn.remat(ImageEnhanceByRadar, static_argnums=(3,))
            REnh = nn.remat(RadarEnhanceByImage, static_argnums=(3,))
        if self.remat == "stages":
            Stage = nn.remat(_Stage, static_argnums=(2,))

        # ---- input embedding (vr_coc.py:575-587) ----
        # Space-to-depth pre-stem (TPU layout rework, see layers.py::
        # space_to_depth): the full-resolution 3-7-channel stage runs folded
        # to H/p x W/p x p^2*C — exact math, canonical params (init traces
        # the standard path below to declare them).
        p = v.in_stride
        use_s2d = (
            self.prestem_s2d
            and not self.is_initializing()
            and v.in_patch_size == v.in_stride
            and v.in_pad == 0
            and image.shape[1] % p == 0
            and image.shape[2] % p == 0
        )
        if use_s2d:
            g = p * p
            b, h, w, _ = image.shape
            # Fold-conv entry (round-5): ONE strided conv computes
            # cast + space_to_depth + the initial 1x1 projection.  The
            # separate astype/transpose chain cost ~5 ms/step of layout
            # pins + 6-d transposes at bs=128 (round-5 trace: the
            # bf16[B,512,512,3/4] {0,2,3,1} pins and the layers.py:78 /
            # vr_coc.py:82 copies); XLA's strided-conv path emits the folded
            # layout directly.  Math is identical: the assembled kernel
            # K[pi,pj,ci,(pi*p+pj)*Co+co] = w1x1[ci,co] contracts each
            # output against exactly one input tap (0/1 placement, exact
            # in bf16), gradients flow to the canonical 1x1 kernel through
            # the placement einsum.  A/B: ASY_PRESTEM_FOLD_CONV=0.
            import os as _os

            fold_conv = _os.environ.get("ASY_PRESTEM_FOLD_CONV", "1") == "1"
            if fold_conv:
                image = _initial_fold_conv(
                    self.variables["params"]["image_initial"], image, p,
                    self.dtype,
                )
                radar = _initial_fold_conv(
                    self.variables["params"]["radar_initial"], radar, p,
                    self.dtype,
                )
            else:
                image = space_to_depth(image, p)
                radar = space_to_depth(radar, p)
                image = PointReducer(
                    self.image_channels, patch_size=1, stride=1, s2d=g,
                    dtype=self.dtype, name="image_initial",
                )(image)
                radar = PointReducer(
                    self.radar_channels, patch_size=1, stride=1, s2d=g,
                    dtype=self.dtype, name="radar_initial",
                )(radar)
            image = Enh(
                self.image_channels, s2d=g, dtype=self.dtype,
                name="image_enhance_by_radar1",
            )(image, radar, train)
            radar = REnh(
                self.radar_channels, initial=True, s2d=g, dtype=self.dtype,
                name="radar_enhance_by_image1",
            )(image, radar, train)

            pos_s2d = space_to_depth(
                positional_grid(h, w, dtype=image.dtype)[None], p
            )                                       # (1, h/p, w/p, g*2)
            hp, wp = h // p, w // p

            def cat_pos(x):
                # pos appended as a trailing s-major segment; the s2d
                # PointReducer re-orders the canonical kernel rows to match
                return jnp.concatenate(
                    [x, jnp.broadcast_to(pos_s2d, (b, hp, wp, g * 2))], axis=-1
                )

            image = PointReducer(
                dims[0], patch_size=v.in_patch_size, stride=v.in_stride,
                padding=v.in_pad, s2d=g, dtype=self.dtype, name="patch_embed",
            )(cat_pos(image))
            # parity: the reference concatenates `fea_pos` (the image grid)
            # to the radar stream as well (vr_coc.py:585); grids identical.
            radar = PointReducer(
                dims[0], patch_size=v.in_patch_size, stride=v.in_stride,
                padding=v.in_pad, s2d=g, dtype=self.dtype,
                name="patch_embed_radar",
            )(cat_pos(radar))
        else:
            image = PointReducer(
                self.image_channels, patch_size=1, stride=1, dtype=self.dtype,
                name="image_initial",
            )(image)
            radar = PointReducer(
                self.radar_channels, patch_size=1, stride=1, dtype=self.dtype,
                name="radar_initial",
            )(radar)

            image = Enh(
                self.image_channels, dtype=self.dtype,
                name="image_enhance_by_radar1",
            )(image, radar, train)
            radar = REnh(
                self.radar_channels, initial=True, dtype=self.dtype,
                name="radar_enhance_by_image1",
            )(image, radar, train)

            b, h, w, _ = image.shape
            pos = jnp.broadcast_to(
                positional_grid(h, w, dtype=image.dtype)[None], (b, h, w, 2)
            )
            image = PointReducer(
                dims[0], patch_size=v.in_patch_size, stride=v.in_stride,
                padding=v.in_pad, dtype=self.dtype, name="patch_embed",
            )(jnp.concatenate([image, pos], axis=-1))
            # parity: the reference concatenates `fea_pos` (the image grid) to
            # the radar stream as well (vr_coc.py:585); the grids are identical.
            radar = PointReducer(
                dims[0], patch_size=v.in_patch_size, stride=v.in_stride,
                padding=v.in_pad, dtype=self.dtype, name="patch_embed_radar",
            )(jnp.concatenate([radar, pos], axis=-1))

        # ---- stages: [blocks -> fusion -> reducer] x4 (vr_coc.py:589-675) ----
        outs: list[jnp.ndarray] = []
        outs_radar: list[jnp.ndarray] = []
        for i in range(num_stages):
            # Lane-folded span (stage blocks + fusion): with C < 128 the
            # whole span runs on the dense (B, H, W/s, s*C) layout — the
            # fused block kernels natively, the fusion via s2d-group forms
            # of conv/BN/ECA/ShuffleAttention (bf16 production path; f32
            # keeps the literal unfolded ops for bit-level parity).
            s = stage_lane_fold(
                image.shape, v, i, self.use_pallas, train,
                self.is_initializing(),
            )
            folded = s > 1 and jnp.dtype(self.dtype) == jnp.bfloat16
            if folded:
                b_, h_, w_, c_ = image.shape
                image = image.reshape(b_, h_, w_ // s, s * c_)
                radar = radar.reshape(b_, h_, w_ // s, s * c_)
            image = Stage(
                dims[i], v.layers[i], i, v, use_pallas=self.use_pallas,
                lane_fold=s if folded else 0,
                remat_blocks=self.remat == "blocks",
                dtype=self.dtype, name=f"stage{i}",
            )(image, train)
            radar = Stage(
                dims[i], v.layers[i], i, v, use_pallas=self.use_pallas,
                lane_fold=s if folded else 0,
                remat_blocks=self.remat == "blocks",
                dtype=self.dtype, name=f"stage{i}_radar",
            )(radar, train)

            # fusion: image first, radar uses the already-enhanced image.
            image = Enh(
                dims[i], s2d=s if folded else 0,
                s2d_geom=(1, s) if folded else (),
                dtype=self.dtype, name=f"fusion{i}_image",
            )(image, radar, train)
            radar = REnh(
                dims[i], s2d=s if folded else 0,
                dtype=self.dtype, name=f"fusion{i}_radar",
            )(image, radar, train)
            if folded:
                image = image.reshape(b_, h_, w_, c_)
                radar = radar.reshape(b_, h_, w_, c_)

            if i == 0:
                outs.append(image)          # stride-4 tap after stage-1 fusion
                outs_radar.append(radar)
            elif i == num_stages - 1:
                outs.append(image)          # stride-32 tap after stage-4 fusion
                outs_radar.append(radar)
            # parity: stage-3 (i==2) post-fusion tap is discarded
            # (vr_coc.py:655-656).

            if i < num_stages - 1 and (v.downsamples[i] or dims[i] != dims[i + 1]):
                image = PointReducer(
                    dims[i + 1], patch_size=v.down_patch_size,
                    stride=2, padding=v.down_pad,
                    dtype=self.dtype, name=f"reducer{i}",
                )(image)
                radar = PointReducer(
                    dims[i + 1], patch_size=v.down_patch_size,
                    stride=2, padding=v.down_pad,
                    dtype=self.dtype, name=f"reducer{i}_radar",
                )(radar)
                if i in (0, 1):
                    outs.append(image)      # stride-8/16 taps after reducers 1,2
                    outs_radar.append(radar)

        return tuple(outs), tuple(outs_radar)
