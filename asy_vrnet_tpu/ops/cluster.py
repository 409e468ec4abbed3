"""Context-Cluster token mixing as batched region matmuls.

This is the compute core of the VRCoC backbone (reference semantics:
backbone/fusion/vr_coc.py:114-192 `Cluster` / `pairwise_cos_sim`).  The
reference expresses it as an einops pipeline of fold/rearrange ops around two
matmuls; here it is one pure function over NHWC tensors with fully static
shapes, shaped so XLA tiles the two contractions onto the MXU:

    tokens:   (B, heads, R, N, D)   N = region tokens (256 for all stages of
    centers:  (B, heads, R, M, D)       the published variants), M = proposals
    sim     = sigmoid(beta + alpha * cos(centers, tokens))       [B,h,R,M,N]
    mask    = one_hot(argmax_M sim)                              hard assign
    out_c   = (simᵀ·v + v_centers) / (count + 1)                 aggregate
    out     = dispatch back to tokens via sim                    [B,h,R,N,D]

The fold-into-regions trick is the model's only long-sequence cost control
(SURVEY.md §5); it maps naturally onto a batched small-matmul, and onto a
Pallas grid (one program per (batch·head·region) tile) in cluster_pallas.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.ops.resize import _adaptive_avg_matrix


def _fold_tokens(x: jnp.ndarray, heads: int, fold_h: int, fold_w: int):
    """NHWC (B,H,W,heads*D) -> (B, heads, R, N, D) region tokens.

    Region grid: H = fold_h * rh, W = fold_w * rw;  R = fold_h*fold_w,
    N = rh*rw with tokens ordered row-major over (rh, rw) inside a region —
    matching the reference's reshape order so ported weights are bit-exact.
    """
    b, h, w, c = x.shape
    d = c // heads
    rh, rw = h // fold_h, w // fold_w
    x = x.reshape(b, fold_h, rh, fold_w, rw, heads, d)
    # -> (B, heads, fold_h, fold_w, rh, rw, D)
    x = x.transpose(0, 5, 1, 3, 2, 4, 6)
    return x.reshape(b, heads, fold_h * fold_w, rh * rw, d), (rh, rw)


def _unfold_tokens(x: jnp.ndarray, hw: tuple[int, int], fold_h: int, fold_w: int):
    """(B, heads, R, N, D) -> NHWC (B,H,W,heads*D); inverse of _fold_tokens."""
    b, heads, r, n, d = x.shape
    rh, rw = hw
    x = x.reshape(b, heads, fold_h, fold_w, rh, rw, d)
    x = x.transpose(0, 2, 4, 3, 5, 1, 6)  # (B, fold_h, rh, fold_w, rw, heads, D)
    return x.reshape(b, fold_h * rh, fold_w * rw, heads * d)


def _region_centers(tokens: jnp.ndarray, region_hw: tuple[int, int],
                    proposal_hw: tuple[int, int]) -> jnp.ndarray:
    """Adaptive-avg-pool region tokens (…, N, D) -> (…, M, D).

    Equivalent of AdaptiveAvgPool2d((pw,ph)) on each folded region
    (vr_coc.py:150,168), as a single static pooling matmul.
    """
    rh, rw = region_hw
    ph, pw = proposal_hw
    mh = _adaptive_avg_matrix(rh, ph)  # (ph, rh)
    mw = _adaptive_avg_matrix(rw, pw)  # (pw, rw)
    # pool matrix over flattened token index: (ph*pw, rh*rw)
    pool = jnp.asarray(
        (mh[:, None, :, None] * mw[None, :, None, :]).reshape(ph * pw, rh * rw),
        dtype=tokens.dtype,
    )
    return jnp.einsum("mn,...nd->...md", pool, tokens)


def cluster_mix(
    feat: jnp.ndarray,
    value: jnp.ndarray,
    sim_alpha: jnp.ndarray,
    sim_beta: jnp.ndarray,
    *,
    heads: int,
    fold_h: int,
    fold_w: int,
    proposal_h: int,
    proposal_w: int,
    return_center: bool = False,
) -> jnp.ndarray:
    """Pure cluster token mixing (between the fc1/fc_v and fc2 projections).

    feat, value: NHWC (B,H,W,heads*head_dim).  Returns the dispatched NHWC map
    (same shape), or the per-region center map if return_center.
    """
    b, h, w, c = feat.shape
    if h % fold_h or w % fold_w:
        raise ValueError(f"feature map {h}x{w} not divisible by fold {fold_h}x{fold_w}")
    x, region_hw = _fold_tokens(feat, heads, fold_h, fold_w)       # (B,h,R,N,D)
    v, _ = _fold_tokens(value, heads, fold_h, fold_w)

    centers = _region_centers(x, region_hw, (proposal_h, proposal_w))   # (B,h,R,M,D)
    v_centers = _region_centers(v, region_hw, (proposal_h, proposal_w))

    xn = x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
    cn = centers * jax.lax.rsqrt(jnp.sum(centers * centers, axis=-1, keepdims=True) + 1e-12)

    # TPU note: M (proposals per region) is tiny (4), so these batched
    # contractions lower to thousands of padded micro-matmuls and the MXU
    # idles — this jnp path is the reference/fallback implementation; the
    # production path is the fused Pallas kernel (ops/cluster_pallas.py),
    # ~10x faster on chip (see BENCH_NOTES.md).
    sim = jnp.einsum("bhrmd,bhrnd->bhrmn", cn, xn)
    sim = jax.nn.sigmoid(sim_beta + sim_alpha * sim)

    # hard assignment: each token to its max-similarity center (first-max ties,
    # matching torch .max semantics).
    m = sim.shape[-2]
    assign = jnp.argmax(sim, axis=-2)                               # (B,h,R,N)
    mask = jax.nn.one_hot(assign, m, dtype=sim.dtype, axis=-2)      # (B,h,R,M,N)
    sim = sim * mask

    counts = jnp.sum(mask, axis=-1, keepdims=True)                  # (B,h,R,M,1)
    agg = jnp.einsum("bhrmn,bhrnd->bhrmd", sim, v)                  # k=N: MXU-worthy
    out_centers = (agg + v_centers) / (counts + 1.0)                # (B,h,R,M,D)

    if return_center:
        return out_centers
    out = jnp.einsum("bhrmn,bhrmd->bhrnd", sim, out_centers)        # (B,h,R,N,D)
    return _unfold_tokens(out, region_hw, fold_h, fold_w)
