"""Cluster token-mixer module and the pre-norm residual ClusterBlock.

Reference semantics: backbone/fusion/vr_coc.py:128-300 (identical copy in
backbone/vision/context_cluster.py:100-230).  The module wraps the pure
`cluster_mix` op (asy_vrnet_tpu/ops/cluster.py) with the fc_v/fc1/fc2 1x1
projections and learned sigmoid affinity (alpha, beta); ClusterBlock adds
GroupNorm(1) pre-norm, LayerScale and DropPath residual wiring.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

import jax

from asy_vrnet_tpu.models.layers import DropPath, GroupNorm1, Mlp
from asy_vrnet_tpu.ops.block_pallas import (
    fused_mixer_block_stats,
    fused_mlp_block_pre,
    mixer_block_supported,
    mlp_block_supported,
)
from asy_vrnet_tpu.ops.cluster import cluster_mix
from asy_vrnet_tpu.ops.cluster_pallas import cluster_mix_pallas, pallas_supported

Dtype = Any


class Cluster(nn.Module):
    """Context-cluster token mixer (vr_coc.py:128-192)."""

    out_dim: int
    proposal_w: int = 2
    proposal_h: int = 2
    fold_w: int = 2
    fold_h: int = 2
    heads: int = 4
    head_dim: int = 24
    return_center: bool = False
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.heads * self.head_dim
        value = nn.Conv(inner, (1, 1), dtype=self.dtype, name="fc_v")(x)
        feat = nn.Conv(inner, (1, 1), dtype=self.dtype, name="fc1")(x)
        sim_alpha = self.param("sim_alpha", nn.initializers.ones, (), jnp.float32)
        sim_beta = self.param("sim_beta", nn.initializers.zeros, (), jnp.float32)
        # fold>1 in the reference gates region folding; fold==1 means a single
        # global region, which the same code path handles.
        kwargs = dict(
            heads=self.heads,
            fold_h=self.fold_h,
            fold_w=self.fold_w,
            proposal_h=self.proposal_h,
            proposal_w=self.proposal_w,
        )
        if (
            self.use_pallas
            and not self.return_center
            and pallas_supported(feat.shape, **kwargs)
        ):
            out = cluster_mix_pallas(feat, value, sim_alpha, sim_beta, **kwargs)
        else:
            out = cluster_mix(
                feat, value, sim_alpha, sim_beta,
                return_center=self.return_center, **kwargs,
            )
        return nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="fc2")(out)


class ClusterBlock(nn.Module):
    """Pre-norm residual block: GN1 -> Cluster -> LayerScale -> +x; GN1 ->
    1x1-conv MLP -> LayerScale -> +x; DropPath (vr_coc.py:226-275)."""

    dim: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path: float = 0.0
    use_layer_scale: bool = True
    layer_scale_init_value: float = 1e-5
    proposal_w: int = 2
    proposal_h: int = 2
    fold_w: int = 2
    fold_h: int = 2
    heads: int = 4
    head_dim: int = 24
    use_pallas: bool = False
    # lane_fold=s>1: x arrives lane-folded (B, H, W/s, s*C) — the stage folds
    # once at entry so every HBM/VMEM touch of the C<128 tensors is dense
    # instead of 128/C lane-padded (ops/block_pallas.py lane-folding note).
    # Only valid when the fused-kernel path is taken; the caller guarantees
    # the gating conditions (lane_fold_choice + the fused_ok terms below).
    lane_fold: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # Fully-fused path: each residual half of the block is ONE Pallas
        # kernel (ops/block_pallas.py) — GN statistics aside, the block input
        # is read from HBM exactly once per half instead of materialising the
        # GN output and the 8x-wider fc1/fc_v/MLP-hidden intermediates.
        # Gated on: Pallas enabled, supported tile shapes, no active
        # dropout/droppath (rate 0 in every published variant), and not
        # initialising (init runs the module path below to create params
        # under their canonical names; afterwards their values are read
        # directly from self.variables).
        s = self.lane_fold
        if s > 1:
            b_, h_, wf_, sc_ = x.shape
            ushape = (b_, h_, wf_ * s, sc_ // s)
        else:
            ushape = x.shape
        fused_ok = (
            self.use_pallas
            and self.drop == 0.0
            and (self.drop_path == 0.0 or not train)
            and not self.is_initializing()
            and mixer_block_supported(
                ushape, heads=self.heads, head_dim=self.head_dim,
                fold_h=self.fold_h, fold_w=self.fold_w,
                proposal_h=self.proposal_h, proposal_w=self.proposal_w,
            )
            and mlp_block_supported(ushape)
        )
        if s > 1 and not fused_ok:
            raise ValueError(
                "lane_fold > 1 requires the fused ClusterBlock kernel path "
                f"(shape {x.shape}, unfolded {ushape})"
            )
        if fused_ok:
            p = self.variables["params"]
            tm = p["token_mixer"]
            ones = jnp.ones((self.dim,), jnp.float32)
            ls1 = p["layer_scale_1"] if self.use_layer_scale else ones
            ls2 = p["layer_scale_2"] if self.use_layer_scale else ones
            # stats-chained pair: the mixer kernel reduces its output's GN
            # moments in VMEM and the MLP half consumes them, skipping one
            # full-tensor reduce pass per block
            x, stats = fused_mixer_block_stats(
                x,
                p["norm1"]["gn"]["scale"], p["norm1"]["gn"]["bias"],
                tm["fc1"]["kernel"][0, 0], tm["fc1"]["bias"],
                tm["fc_v"]["kernel"][0, 0], tm["fc_v"]["bias"],
                tm["fc2"]["kernel"][0, 0], tm["fc2"]["bias"],
                ls1, tm["sim_alpha"], tm["sim_beta"],
                self.heads, self.fold_h, self.fold_w,
                self.proposal_h, self.proposal_w, s,
            )
            mp = p["mlp"]
            return fused_mlp_block_pre(
                x, stats,
                p["norm2"]["gn"]["scale"], p["norm2"]["gn"]["bias"],
                mp["fc1"]["kernel"][0, 0], mp["fc1"]["bias"],
                mp["fc2"]["kernel"][0, 0], mp["fc2"]["bias"],
                ls2, s,
            )

        mixer = Cluster(
            out_dim=self.dim,
            proposal_w=self.proposal_w, proposal_h=self.proposal_h,
            fold_w=self.fold_w, fold_h=self.fold_h,
            heads=self.heads, head_dim=self.head_dim,
            use_pallas=self.use_pallas,
            dtype=self.dtype, name="token_mixer",
        )
        mlp = Mlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=self.dim, drop=self.drop,
            dtype=self.dtype, name="mlp",
        )
        drop_path = DropPath(self.drop_path)

        y = mixer(GroupNorm1(dtype=self.dtype, name="norm1")(x))
        if self.use_layer_scale:
            ls1 = self.param(
                "layer_scale_1",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,), jnp.float32,
            )
            y = y * ls1
        x = x + drop_path(y, deterministic=not train)

        y = mlp(GroupNorm1(dtype=self.dtype, name="norm2")(x), deterministic=not train)
        if self.use_layer_scale:
            ls2 = self.param(
                "layer_scale_2",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,), jnp.float32,
            )
            y = y * ls2
        x = x + drop_path(y, deterministic=not train)
        return x
