"""Fused Pallas kernels for the two halves of a ClusterBlock.

Round-1 profiling (BENCH_NOTES.md) showed the forward is HBM-bound: with the
cluster contraction fixed, the remaining cost is GroupNorm passes and the
materialisation of the 1x1-conv intermediates (the mixer's inner width and
the MLP hidden are up to 8x the block channel count, so every unfused matmul
round-trips 8x the block's traffic through HBM).

These kernels compute each residual half of ClusterBlock (vr_coc.py:226-275)
reading the block input from HBM exactly once and writing only the residual
output:

  mixer half : x + LayerScale1 * fc2( cluster_mix( fc1(GN1(x)), fc_v(GN1(x)) ) )
  MLP half   : x + LayerScale2 * fc2( GELU( fc1(GN2(x)) ) )

GroupNorm(1 group) needs per-sample global statistics — a cross-tile
reduction — so the (tiny) mean/rstd are computed by XLA first and passed in;
the GN affine, the 1x1-conv weights and the LayerScale fold into the matmul
operands at trace time:

  (xn*g + b) @ W + c  ==  xn @ (g[:,None]*W) + (b @ W + c)
  ls * (y @ W + c)    ==  y @ (W*ls) + c*ls

Backward = custom VJP via jax.vjp of the mathematically-identical traceable
composition, which routes the mixer segment through the existing fused
cluster backward kernel (ops/cluster_pallas.py) and everything else through
XLA — gradients flow to every original parameter.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from asy_vrnet_tpu.ops.cluster_pallas import (
    _cluster_fused,
    _group_w,
    _region_mask,
    _replication_and_masks,
    _tile_pool_matrix_t,
    pallas_supported,
)

_GN_EPS = 1e-5


def _block_compiler_params(grid_rank: int = 3):
    """Shared Mosaic params for the block kernels.  The stage-1 kernels keep
    ~12 MB of live (Hb, Nt)/(Nt, I) f32 planes — near the 16 MB default
    scoped-vmem budget, which squeezes the input/output double buffers; give
    them headroom (perf-tunable via ASY_BLOCK_VMEM_MB, 0 = Mosaic default)."""
    import os

    from jax.experimental.pallas import tpu as pltpu

    mb = int(os.environ.get("ASY_BLOCK_VMEM_MB", "64"))
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary",) * grid_rank,
        vmem_limit_bytes=mb * 1024 * 1024 if mb else None,
    )


def gn1_stats(x: jnp.ndarray) -> jnp.ndarray:
    """Per-sample GroupNorm(1) statistics over (H, W, C): (B, 2) f32
    [mean, rstd].  The only cross-tile reduction of the block."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(1, 2, 3))
    var = jnp.mean(jnp.square(xf), axis=(1, 2, 3)) - jnp.square(mu)
    return jnp.stack([mu, jax.lax.rsqrt(var + _GN_EPS)], axis=-1)


def _fold_in(gn_scale, gn_bias, w, b):
    """Fold the GN affine into an input-side matmul: returns (w_eff, b_eff)."""
    w_eff = gn_scale[:, None] * w
    b_eff = gn_bias @ w + b
    return w_eff, b_eff


def _fold_out(w, b, ls):
    """Fold LayerScale into an output-side matmul."""
    return w * ls[None, :], b * ls


# ---------------------------------------------------------------------------
# mixer half
# ---------------------------------------------------------------------------

def mixer_block_supported(shape, *, heads, head_dim, fold_h, fold_w,
                          proposal_h, proposal_w) -> bool:
    b, h, w, c = shape
    inner = heads * head_dim
    return pallas_supported(
        (b, h, w, inner), heads=heads, fold_h=fold_h, fold_w=fold_w,
        proposal_h=proposal_h, proposal_w=proposal_w,
    )


@functools.lru_cache(maxsize=None)
def _rowhead_matrix(gw: int, heads: int, m: int) -> np.ndarray:
    """(Hb, heads) 0/1: sim row (proposal, region, head) -> its head index.
    Used to expand the (Nt, heads) token inverse-norms to (Hb, Nt) rows with
    one K=heads matmul (Mosaic has no lane/sublane transpose for (Nt,H))."""
    hb = m * gw * heads
    rows = np.arange(hb)
    out = np.zeros((hb, heads), np.float32)
    out[rows, rows % heads] = 1.0
    return out


def _mixer_block_fwd_body(xn, xnb, alpha, beta, wf_ref, bf_ref, wv_ref,
                          bv_ref, pool_ref, rep_ref, hmask_ref, headsel_ref,
                          rmask_ref, rowhead_ref, *, heads, m, gw,
                          track_cbest=False):
    """Shared forward interior over flattened (Nt, C) tokens — the 7-pass
    formulation (down from 10 in round 2; VERDICT r2 #1):

      [1] feat = xn @ wf_e + bf_e            (the only materialised I-wide map)
      [2] cin  = pool^T @ xn                 centers pooled in INPUT space —
          pooling is linear with rows summing to 1, so
          pool(xn @ W + b) == (pool(xn)) @ W + b; projecting the Mb pooled
          rows is a tiny matmul, eliminating the second full-token pool pass
      [3] norm2 = feat^2 @ headsel           per-head token norms
      [4] invr = rowhead @ inv^T             row-expanded inverse norms
      [5] raw  = cn @ feat^T;  cos = raw * invr  (== cn @ (feat*inv)^T)
      [6] aggx = sim @ xn                    aggregation in INPUT space —
          sim @ (xn @ wv + 1 b) == (sim @ xn) @ wv + rowsum(sim) b, so
          `value` is never materialised and its weight grad becomes tiny
      [7] y    = sim^T @ (oc @ w2_e)         dispatch directly in OUTPUT
          space — fc2 folds into the (Hb, I) centers before the token pass

    Returns (y, feat, cin, cn, inv, invr, raw, cos, sgb, mask, sim, icnt, rs,
    aggx, oc, ocw) so the backward kernel can reuse the exact remat (sgb is
    the winner-plane sigmoid — the full sg plane is never built)."""
    f32 = jnp.float32
    mxu = xnb.dtype
    seg = gw * heads

    # [1] feat tokens (f32 accumulate; bf16 copy for MXU re-use)
    feat = jax.lax.dot_general(
        xnb, wf_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=f32,
    ) + bf_ref[0]                               # (Nt, I) f32
    featb = feat.astype(mxu)

    # [2] pooled input tokens -> centers via tiny projections
    cin = jax.lax.dot_general(
        pool_ref[:], xnb, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )                                           # (Mb, C)
    cinb = cin.astype(mxu)
    cp = jax.lax.dot_general(
        cinb, wf_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=f32,
    ) + bf_ref[0]                               # (Mb, I)
    vp = jax.lax.dot_general(
        cinb, wv_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=f32,
    ) + bv_ref[0]
    c_rep = jnp.dot(rep_ref[:], cp, preferred_element_type=f32) * hmask_ref[:]
    vc = jnp.dot(rep_ref[:], vp, preferred_element_type=f32) * hmask_ref[:]
    inv_c = jax.lax.rsqrt(jnp.sum(c_rep * c_rep, axis=1, keepdims=True) + 1e-12)
    cn = c_rep * inv_c                          # (Hb, I)

    # [3] per-head token norms
    f2 = (feat * feat).astype(mxu)
    norm2 = jax.lax.dot_general(
        f2, headsel_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                           # (Nt, heads)
    inv = jax.lax.rsqrt(norm2 + 1e-12)

    # [4] expand inverse norms to sim rows
    invr = jax.lax.dot_general(
        rowhead_ref[:], inv.astype(mxu), (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )                                           # (Hb, Nt)

    # [5] similarity
    raw = jax.lax.dot_general(
        cn.astype(mxu), featb, (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )                                           # (Hb, Nt)
    cos = raw * invr

    # first-max assignment over the m proposals of each (region, head).
    # r4 VPU diet: argmax on the PRE-sigmoid logit x = beta + alpha*cos —
    # sigmoid is strictly increasing in x (whatever alpha's sign does to cos,
    # it is inside x), so argmax_m sigmoid(x_m) == argmax_m x_m — and the
    # sigmoid itself is evaluated only on the m-times-smaller winner plane.
    rmask = rmask_ref[:]
    x_sim = beta + alpha * cos
    x_m = jnp.where(rmask > 0.0, x_sim, -1e30)
    best = x_m[0:seg]
    cbest = cos[0:seg] if track_cbest else None  # winner-plane cos residual
    arg = jnp.zeros_like(best, dtype=jnp.int32)
    for mm in range(1, m):
        part = x_m[mm * seg : (mm + 1) * seg]
        better = part > best                    # strict > keeps the first max
        best = jnp.where(better, part, best)
        if track_cbest:
            cbest = jnp.where(better, cos[mm * seg : (mm + 1) * seg], cbest)
        arg = jnp.where(better, mm, arg)
    sgb = jax.nn.sigmoid(best)                  # (seg, Nt) winner sigmoids
    mask = jnp.concatenate(
        [(arg == mm).astype(f32) for mm in range(m)], axis=0
    ) * rmask                                   # (Hb, Nt)
    sim = mask * jnp.concatenate([sgb] * m, axis=0)
    simb = sim.astype(mxu)
    counts = jnp.sum(mask, axis=1, keepdims=True)
    icnt = 1.0 / (counts + 1.0)

    # [6] aggregate in input space
    aggx = jax.lax.dot_general(
        simb, xnb, (((1,), (0,)), ((), ())), preferred_element_type=f32,
    )                                           # (Hb, C)
    rs = jnp.sum(sim, axis=1, keepdims=True)    # (Hb, 1)
    agg = jax.lax.dot_general(
        aggx.astype(mxu), wv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + rs * bv_ref[0]
    oc = ((agg + vc) * icnt) * hmask_ref[:]     # (Hb, I)
    return (feat, featb, cin, cinb, cn, inv_c, inv, invr, raw, cos, sgb, mask,
            sim, simb, icnt, rs, aggx, oc, c_rep, cbest, arg)


# ---------------------------------------------------------------------------
# lane folding (round 3): with c < 128 the NHWC minor dim pads to 128 lanes in
# BOTH HBM (T(8,128) tiling: the stage-1 c=16 buffers store 8x their bytes —
# the bs=128 OOM dump shows "8.0x expansion" pads) and VMEM, taxing every DMA
# and VPU pass by 128/c.  Folding s = 128/c consecutive W-tokens into the lane
# dim ((B,H,W,C) -> (B,H,W/s,s*C)) makes all x-shaped traffic dense.  MXU work
# is unchanged: the token projections become block-diagonal matmuls (same slab
# count), the (Hb, Nt) similarity plane keeps its size with a permuted token
# order (columns p-block-major: j = p*ntf + rf), and the p-indexed
# contractions are unrolled loops over 128-aligned lane slices.
# ---------------------------------------------------------------------------

def lane_fold_choice(shape, *, fold_h, fold_w, inner) -> int:
    """Largest usable lane-fold factor for a block stack at UNFOLDED `shape`
    (1 = don't fold).  Requirements: s*c == 128 exactly; tile width and token
    counts stay 128-aligned after folding so every in-kernel lane slice is
    vreg-aligned; inner is a multiple of 128 (feat lane blocks)."""
    b, h, w, c = shape
    if c >= 128 or 128 % c or h % fold_h or w % fold_w:
        return 1
    s = 128 // c
    rh, rw = h // fold_h, w // fold_w
    gw = _group_w(fold_w, rh * rw)
    wt = gw * rw
    if wt % s or (rh * wt // s) % 128 or inner % 128:
        return 1
    if (w // s) % (wt // s):
        return 1
    return s


@functools.lru_cache(maxsize=None)
def _fold_perm(rh: int, wt: int, s: int) -> np.ndarray:
    """Folded-order token j = p*ntf + (r*wtf + wf)  ->  original tile raster
    index r*wt + wf*s + p (the reshape (rh,wt,c)->(rh,wt/s,s*c) packs s
    consecutive W columns into lanes, p-major)."""
    wtf = wt // s
    ntf = rh * wtf
    j = np.arange(rh * wt)
    p, rf = j // ntf, j % ntf
    r, wf = rf // wtf, rf % wtf
    return r * wt + wf * s + p


@functools.lru_cache(maxsize=None)
def _pool_perm(region_hw, proposal_hw, gw: int, s: int) -> np.ndarray:
    pool = _tile_pool_matrix_t(region_hw, proposal_hw, gw)     # (Nt, Mb)
    rh, rw = region_hw
    return np.ascontiguousarray(pool[_fold_perm(rh, gw * rw, s)])


@functools.lru_cache(maxsize=None)
def _rmask_perm(gw, heads, m, rh, rw, s) -> np.ndarray:
    rmask = _region_mask(gw, heads, m, rh, rw)                 # (Hb, Nt)
    return np.ascontiguousarray(rmask[:, _fold_perm(rh, gw * rw, s)])


@functools.lru_cache(maxsize=None)
def _fold_blockmask(nt: int, s: int, c: int) -> np.ndarray:
    """(Nt, s*C) 0/1: row j = p*ntf + rf exposes only lane block p.  Masks the
    sublane-tiled xn copy so full-width Nt contractions see each token's
    channels exactly once."""
    ntf = nt // s
    out = np.zeros((nt, s * c), np.float32)
    for p in range(s):
        out[p * ntf : (p + 1) * ntf, p * c : (p + 1) * c] = 1.0
    return out


@functools.lru_cache(maxsize=None)
def _headsel_bd(gw: int, heads: int, m: int, inner: int, s: int) -> np.ndarray:
    """(s*inner, s*heads) block-diagonal head selector: column (p*heads + h)
    sums the head-h channel block of sub-position p.  One full-width matmul
    against it computes all s*heads per-token head norms at once
    (normalize-first similarity, r4)."""
    sel = np.asarray(_replication_and_masks(gw, heads, m, inner)[2],
                     np.float32)                       # (inner, heads)
    out = np.zeros((s * inner, s * heads), np.float32)
    for p in range(s):
        out[p * inner : (p + 1) * inner, p * heads : (p + 1) * heads] = sel
    return out


def _bd_expand(w: jnp.ndarray, s: int) -> jnp.ndarray:
    """(a, b) -> (s*a, s*b) block-diagonal (trace-time, tiny operands)."""
    import jax.scipy.linalg as jsl

    return jsl.block_diag(*([w] * s))


def _row_tile(w: jnp.ndarray, s: int) -> jnp.ndarray:
    return jnp.tile(w, (s, 1))


def _mixer_block_fwd_body_folded(xn_f, xnb_f, alpha, beta, wfbd_ref, bft_ref,
                                 wfrt_ref, bf_ref, wvrt_ref, bv_ref, pool_ref,
                                 rep_ref, hmask_ref, selbd_ref, rmask_ref,
                                 selbdT_ref, blockmask_ref, *, heads, m, gw,
                                 s, inner, track_cbest=False):
    """Folded-token forward interior over (ntf, s*C) rows (see the lane
    folding note above).  Numerically the same contractions as
    _mixer_block_fwd_body up to f32 reassociation of the token order and the
    normalize-first similarity (r4): tokens are normalised per head BEFORE
    the cos matmuls (two full-width matmuls + one multiply), so the former
    per-p norm2/inverse-row-expand small-matmul chain — 2 serialized small
    dots + an (Hb, ntf) f32 multiply per sub-position — disappears.  Exact
    up to bf16 reassociation: the center rows are hmask-ed to their head's
    channel block, so cross-head inv factors multiply exact zeros.  Measured
    (tools/ablate_mixer_fwd.py, stage-0 production geometry): the similarity
    chain drops 1.87 -> 0.95 ms/invocation, kernel 2.57 -> 1.70 ms."""
    f32 = jnp.float32
    mxu = xnb_f.dtype
    seg = gw * heads
    ntf, sc = xn_f.shape

    # [1] feat tokens: one block-diagonal matmul -> (ntf, s*I), p-major
    feat_f = jax.lax.dot_general(
        xnb_f, wfbd_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + bft_ref[0]

    # sublane-tiled + block-masked token copy for full-width Nt contractions
    xn_blk = jnp.concatenate([xnb_f] * s, axis=0) * blockmask_ref[:]  # (Nt, sc)

    # [2] pooled centers in expanded (Mb, s*C) form; the row-tiled weights
    # fold the p-blocks back: cin_exp @ rowtile(W) == (sum_p cin_p) @ W
    cin_exp = jax.lax.dot_general(
        pool_ref[:], xn_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                            # (Mb, sc)
    cin_expb = cin_exp.astype(mxu)
    cp = jax.lax.dot_general(
        cin_expb, wfrt_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + bf_ref[0]                                # (Mb, I)
    vp = jax.lax.dot_general(
        cin_expb, wvrt_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + bv_ref[0]
    c_rep = jnp.dot(rep_ref[:], cp, preferred_element_type=f32) * hmask_ref[:]
    vc = jnp.dot(rep_ref[:], vp, preferred_element_type=f32) * hmask_ref[:]
    inv_c = jax.lax.rsqrt(jnp.sum(c_rep * c_rep, axis=1, keepdims=True) + 1e-12)
    cn = c_rep * inv_c                           # (Hb, I)
    cnb = cn.astype(mxu)

    # [3][4] normalize-first: all s*heads per-token norms in ONE matmul, the
    # head-inverse expansion in ONE matmul, one full-width multiply
    f2 = (feat_f * feat_f).astype(mxu)           # (ntf, s*I)
    norm2 = jax.lax.dot_general(
        f2, selbd_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                            # (ntf, s*heads)
    inv = jax.lax.rsqrt(norm2 + 1e-12)
    headexp = jax.lax.dot_general(
        inv.astype(mxu), selbdT_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                            # (ntf, s*I)
    featn_f = feat_f * headexp
    featn_b = featn_f.astype(mxu)

    # [5] similarity: one clean (Hb, ntf) matmul per sub-position
    cos_ps = [
        jax.lax.dot_general(
            cnb, featn_b[:, p * inner : (p + 1) * inner],
            (((1,), (1,)), ((), ())), preferred_element_type=f32,
        )
        for p in range(s)
    ]
    cos = jnp.concatenate(cos_ps, axis=1)        # (Hb, Nt) permuted order

    # r4 VPU diet: argmax on the pre-sigmoid logit (see the unfolded body) —
    # sigmoid only touches the m-times-smaller winner plane.
    rmask = rmask_ref[:]
    x_sim = beta + alpha * cos
    x_m = jnp.where(rmask > 0.0, x_sim, -1e30)
    best = x_m[0:seg]
    cbest = cos[0:seg] if track_cbest else None  # winner-plane cos residual
    arg = jnp.zeros_like(best, dtype=jnp.int32)
    for mm in range(1, m):
        part = x_m[mm * seg : (mm + 1) * seg]
        better = part > best                     # strict > keeps the first max
        best = jnp.where(better, part, best)
        if track_cbest:
            cbest = jnp.where(better, cos[mm * seg : (mm + 1) * seg], cbest)
        arg = jnp.where(better, mm, arg)
    sgb = jax.nn.sigmoid(best)                   # (seg, Nt) winner sigmoids
    mask = jnp.concatenate(
        [(arg == mm).astype(f32) for mm in range(m)], axis=0
    ) * rmask                                    # (Hb, Nt)
    sim = mask * jnp.concatenate([sgb] * m, axis=0)
    simb = sim.astype(mxu)
    counts = jnp.sum(mask, axis=1, keepdims=True)
    icnt = 1.0 / (counts + 1.0)

    # [6] aggregate against the block-masked tokens: aggx_exp[:, p*C+c] is
    # the per-p partial; row-tiled wv folds the p-sum into the projection
    aggx_exp = jax.lax.dot_general(
        simb, xn_blk, (((1,), (0,)), ((), ())), preferred_element_type=f32,
    )                                            # (Hb, sc)
    rs = jnp.sum(sim, axis=1, keepdims=True)     # (Hb, 1)
    agg = jax.lax.dot_general(
        aggx_exp.astype(mxu), wvrt_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + rs * bv_ref[0]
    oc = ((agg + vc) * icnt) * hmask_ref[:]      # (Hb, I)
    return (feat_f, featn_b, cin_exp, cin_expb, cn, cnb, inv_c, inv,
            headexp, cos, sgb, mask, sim, simb, icnt, rs, aggx_exp,
            oc, xn_blk, c_rep, cbest, arg)


def _mixer_block_kernel_folded(params_ref, stats_ref, x_ref, wfbd_ref,
                               bft_ref, wfrt_ref, bf_ref, wvrt_ref, bv_ref,
                               w2t_ref, b2t_ref, pool_ref, rep_ref, hmask_ref,
                               selbd_ref, rmask_ref, selbdT_ref,
                               blockmask_ref, out_ref, osum_ref, *res_refs,
                               heads, m, gw, s, inner):
    """With res_refs (cbest, argf, crep, ocr) present, this is the TRAIN
    forward: it additionally stores the tiny per-tile residuals the
    residual backward kernel consumes instead of rematerialising the
    expensive similarity/centers passes (VERDICT r4 #3)."""
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    alpha = params_ref[0]
    beta = params_ref[1]
    blk = x_ref[0]                               # (rh, wtf, s*C)
    rh, wtf, sc = blk.shape
    ntf = rh * wtf
    c = sc // s
    mxu = blk.dtype
    xf = blk.reshape(ntf, sc).astype(f32)
    bi = pl.program_id(0)
    gi = pl.program_id(1)
    gj = pl.program_id(2)
    xn_f = (xf - stats_ref[bi, 0]) * stats_ref[bi, 1]
    xnb_f = xn_f.astype(mxu)

    (feat_f, featn_b, cin_exp, cin_expb, cn, cnb, inv_c, inv, headexp,
     cos, sgb, mask, sim, simb, icnt, rs, aggx_exp, oc, xn_blk,
     c_rep, cbest, arg) = (
        _mixer_block_fwd_body_folded(
            xn_f, xnb_f, alpha, beta, wfbd_ref, bft_ref, wfrt_ref, bf_ref,
            wvrt_ref, bv_ref, pool_ref, rep_ref, hmask_ref, selbd_ref,
            rmask_ref, selbdT_ref, blockmask_ref,
            heads=heads, m=m, gw=gw, s=s, inner=inner,
            track_cbest=bool(res_refs),
        ))
    if res_refs:
        cbest_ref, argf_ref, crep_ref, ocr_ref = res_refs
        cbest_ref[0, 0] = cbest.astype(cbest_ref.dtype)
        argf_ref[0, 0] = arg.astype(argf_ref.dtype)
        crep_ref[0, 0] = c_rep.astype(crep_ref.dtype)
        ocr_ref[0, 0] = oc.astype(ocr_ref.dtype)

    # [7] dispatch via the lane-tiled fc2 weights (w2t: every p lane block ==
    # w2), loop-free (r4 diet): one full-width dot against the WHOLE permuted
    # sim plane — per-token contraction over Hb is unchanged, the dead lane
    # blocks are masked off and the p row blocks fold by contiguous-slice
    # sums (adding exact zeros), so the output is bit-identical to the former
    # per-p identity-extraction loop.
    ocw_t = jax.lax.dot_general(
        oc.astype(mxu), w2t_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(mxu)                                # (Hb, sc) lane-tiled
    y_blk = jax.lax.dot_general(
        simb, ocw_t, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    ) * blockmask_ref[:]                         # (Nt, sc)
    y_f = sum(y_blk[p * ntf : (p + 1) * ntf, :] for p in range(s))
    out = xf + (y_f + b2t_ref[0])
    out_ref[0] = out.reshape(rh, wtf, sc).astype(out_ref.dtype)
    ob = out.astype(out_ref.dtype).astype(f32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    psum = jnp.where(
        lane == 0, jnp.sum(ob), jnp.where(lane == 1, jnp.sum(ob * ob), 0.0)
    )
    first = (gi == 0) & (gj == 0)

    @pl.when(first)
    def _init():
        osum_ref[0] = psum

    @pl.when(jnp.logical_not(first))
    def _accum():
        osum_ref[0] += psum


def _mixer_block_kernel(params_ref, stats_ref, x_ref, wf_ref, bf_ref, wv_ref,
                        bv_ref, w2_ref, b2_ref, pool_ref, rep_ref, hmask_ref,
                        headsel_ref, rmask_ref, rowhead_ref, out_ref,
                        osum_ref, *res_refs, heads, m, gw, rw):
    """With res_refs (cbest, argf, crep, ocr) present, this is the TRAIN
    forward: it additionally stores the per-tile residuals the residual
    backward consumes (see _mixer_block_kernel_folded)."""
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    alpha = params_ref[0]
    beta = params_ref[1]
    blk = x_ref[0]                              # (rh, wt, C)
    rh, wt, c = blk.shape
    nt = rh * wt
    mxu = blk.dtype
    x = blk.reshape(nt, c)
    xf = x.astype(f32)
    bi = pl.program_id(0)
    gi = pl.program_id(1)
    gj = pl.program_id(2)
    mu = stats_ref[bi, 0]
    rstd = stats_ref[bi, 1]
    xn = (xf - mu) * rstd                       # GN1 sans affine (folded)
    xnb = xn.astype(mxu)

    (feat, featb, cin, cinb, cn, inv_c, inv, invr, raw, cos, sgb, mask, sim,
     simb, icnt, rs, aggx, oc, c_rep, cbest, arg) = _mixer_block_fwd_body(
        xn, xnb, alpha, beta, wf_ref, bf_ref, wv_ref, bv_ref, pool_ref,
        rep_ref, hmask_ref, headsel_ref, rmask_ref, rowhead_ref,
        heads=heads, m=m, gw=gw, track_cbest=bool(res_refs),
    )
    if res_refs:
        cbest_ref, argf_ref, crep_ref, ocr_ref = res_refs
        cbest_ref[0, 0] = cbest.astype(cbest_ref.dtype)
        argf_ref[0, 0] = arg.astype(argf_ref.dtype)
        crep_ref[0, 0] = c_rep.astype(crep_ref.dtype)
        ocr_ref[0, 0] = oc.astype(ocr_ref.dtype)

    # [7] dispatch in output space: fc2 applied to the Hb centers first
    ocw = jax.lax.dot_general(
        oc.astype(mxu), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                           # (Hb, C)
    y = jax.lax.dot_general(
        simb, ocw.astype(mxu), (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b2_ref[0]                               # (Nt, C)
    out = xf + y
    out_ref[0] = out.reshape(rh, wt, c).astype(out_ref.dtype)
    # per-sample moments of the OUTPUT (as stored, i.e. after the dtype
    # cast), so the chained MLP half can skip its own GN-stats reduce pass
    ob = out.astype(out_ref.dtype).astype(f32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    psum = jnp.where(
        lane == 0, jnp.sum(ob), jnp.where(lane == 1, jnp.sum(ob * ob), 0.0)
    )
    first = (gi == 0) & (gj == 0)

    @pl.when(first)
    def _init():
        osum_ref[0] = psum

    @pl.when(jnp.logical_not(first))
    def _accum():
        osum_ref[0] += psum


@functools.partial(
    jax.jit,
    static_argnames=("heads", "fold_h", "fold_w", "proposal_h", "proposal_w",
                     "fold", "interpret", "residuals"),
)
def _mixer_block_pallas(x, stats, wf, bf, wv, bv, w2, b2, alpha, beta,
                        heads, fold_h, fold_w, proposal_h, proposal_w,
                        fold=1, interpret=False, residuals=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if fold > 1:
        return _mixer_block_pallas_folded(
            x, stats, wf, bf, wv, bv, w2, b2, alpha, beta, heads, fold_h,
            fold_w, proposal_h, proposal_w, fold, interpret=interpret,
            residuals=residuals,
        )
    b, h, w, c = x.shape
    inner = wf.shape[1]
    rh, rw = h // fold_h, w // fold_w
    n = rh * rw
    m = proposal_h * proposal_w
    gw = _group_w(fold_w, n)
    wt = gw * rw
    nt = rh * wt
    mb = gw * m
    hb = gw * heads * m

    mxu = x.dtype
    pool_t = jnp.asarray(
        _tile_pool_matrix_t((rh, rw), (proposal_h, proposal_w), gw), mxu)
    rep_np, hmask_np, headsel_np = _replication_and_masks(gw, heads, m, inner)
    rowhead = jnp.asarray(_rowhead_matrix(gw, heads, m), mxu)
    rmask = jnp.asarray(_region_mask(gw, heads, m, rh, rw))
    params = jnp.stack([alpha.astype(jnp.float32), beta.astype(jnp.float32)])

    kernel = functools.partial(_mixer_block_kernel, heads=heads, m=m, gw=gw, rw=rw)
    tile = pl.BlockSpec((1, rh, wt, c), lambda bi, i, j: (bi, i, j, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda bi, i, j: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    flops_per = (
        2 * nt * c * (inner + mb + 2 * hb)     # feat + pool + aggx + dispatch
        + 2 * nt * inner * (heads + hb)        # norm2 + sim
        + 2 * hb * nt * heads                  # invr expansion
    )
    fwg = fold_w // gw
    seg = gw * heads
    out_specs = [
        tile,
        pl.BlockSpec((1, 1, 128), lambda bi, i, j: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct((b, 1, 128), jnp.float32),
    ]
    if residuals:
        rtile = lambda rows, cols: pl.BlockSpec(
            (1, 1, rows, cols), lambda bi, i, j: (bi, i * fwg + j, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_specs += [rtile(seg, nt), rtile(seg, nt),
                      rtile(hb, inner), rtile(hb, inner)]
        out_shape += [
            jax.ShapeDtypeStruct((b, fold_h * fwg, seg, nt), x.dtype),
            jax.ShapeDtypeStruct((b, fold_h * fwg, seg, nt), x.dtype),
            jax.ShapeDtypeStruct((b, fold_h * fwg, hb, inner), x.dtype),
            jax.ShapeDtypeStruct((b, fold_h * fwg, hb, inner), x.dtype),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(b, fold_h, fwg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile,
            const((c, inner)), const((1, inner)),
            const((c, inner)), const((1, inner)),
            const((inner, c)), const((1, c)),
            const((nt, mb)), const((hb, mb)), const((hb, inner)),
            const((inner, heads)), const((hb, nt)), const((hb, heads)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=b * fold_h * fwg * flops_per,
            bytes_accessed=b * h * w * c * x.dtype.itemsize * 2,
            transcendentals=b * fold_h * fwg * hb * nt,
        ),
        compiler_params=_block_compiler_params(),
        interpret=interpret,
    )(params, stats, x.astype(mxu),
      wf.astype(mxu), bf[None].astype(jnp.float32),
      wv.astype(mxu), bv[None].astype(jnp.float32),
      w2.astype(mxu), b2[None].astype(jnp.float32),
      pool_t, jnp.asarray(rep_np), jnp.asarray(hmask_np),
      jnp.asarray(headsel_np, mxu), rmask, rowhead)
    if residuals:
        return outs[0], outs[1], tuple(outs[2:])
    return outs


def _mixer_block_pallas_folded(x, stats, wf, bf, wv, bv, w2, b2, alpha, beta,
                               heads, fold_h, fold_w, proposal_h, proposal_w,
                               s, interpret=False, residuals=False):
    """Lane-folded mixer forward: x is (B, H, W/s, s*C) with s*C == 128."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, wfo, sc = x.shape
    c = sc // s
    w = wfo * s
    inner = wf.shape[1]
    rh, rw = h // fold_h, w // fold_w
    n = rh * rw
    m = proposal_h * proposal_w
    gw = _group_w(fold_w, n)
    wt = gw * rw
    wtf = wt // s
    nt = rh * wt
    ntf = nt // s
    mb = gw * m
    hb = gw * heads * m
    f32 = jnp.float32

    mxu = x.dtype
    pool_p = jnp.asarray(_pool_perm((rh, rw), (proposal_h, proposal_w), gw, s),
                         mxu)
    rep_np, hmask_np, _ = _replication_and_masks(gw, heads, m, inner)
    selbd_np = _headsel_bd(gw, heads, m, inner, s)
    rmask = jnp.asarray(_rmask_perm(gw, heads, m, rh, rw, s))
    blockmask = jnp.asarray(_fold_blockmask(nt, s, c), mxu)
    params = jnp.stack([alpha.astype(f32), beta.astype(f32)])

    wfb = wf.astype(mxu)
    wvb = wv.astype(mxu)
    kernel = functools.partial(_mixer_block_kernel_folded, heads=heads, m=m,
                               gw=gw, s=s, inner=inner)
    tile = pl.BlockSpec((1, rh, wtf, sc), lambda bi, i, j: (bi, i, j, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda bi, i, j: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    flops_per = (
        2 * nt * c * (inner + mb + 2 * hb)
        + 2 * nt * inner * (heads + hb)
        + 2 * hb * nt * heads
    )
    fwg = fold_w // gw
    seg = gw * heads
    out_specs = [
        tile,
        pl.BlockSpec((1, 1, 128), lambda bi, i, j: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct((b, 1, 128), jnp.float32),
    ]
    if residuals:
        rtile = lambda rows, cols: pl.BlockSpec(
            (1, 1, rows, cols), lambda bi, i, j: (bi, i * fwg + j, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_specs += [rtile(seg, nt), rtile(seg, nt),
                      rtile(hb, inner), rtile(hb, inner)]
        out_shape += [
            jax.ShapeDtypeStruct((b, fold_h * fwg, seg, nt), x.dtype),
            jax.ShapeDtypeStruct((b, fold_h * fwg, seg, nt), x.dtype),
            jax.ShapeDtypeStruct((b, fold_h * fwg, hb, inner), x.dtype),
            jax.ShapeDtypeStruct((b, fold_h * fwg, hb, inner), x.dtype),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(b, fold_h, fwg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile,
            const((sc, s * inner)), const((1, s * inner)),
            const((sc, inner)), const((1, inner)),
            const((sc, inner)), const((1, inner)),
            const((inner, sc)), const((1, sc)),
            const((nt, mb)), const((hb, mb)), const((hb, inner)),
            const((s * inner, s * heads)), const((hb, nt)),
            const((s * heads, s * inner)),
            const((nt, sc)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=b * fold_h * fwg * flops_per,
            bytes_accessed=b * h * w * c * x.dtype.itemsize * 2,
            transcendentals=b * fold_h * fwg * hb * nt,
        ),
        compiler_params=_block_compiler_params(),
        interpret=interpret,
    )(params, stats, x.astype(mxu),
      _bd_expand(wfb, s), jnp.tile(bf, s)[None].astype(f32),
      _row_tile(wfb, s), bf[None].astype(f32),
      _row_tile(wvb, s), bv[None].astype(f32),
      jnp.tile(w2.astype(mxu), (1, s)), jnp.tile(b2, s)[None].astype(f32),
      pool_p, jnp.asarray(rep_np), jnp.asarray(hmask_np),
      jnp.asarray(selbd_np, mxu), rmask, jnp.asarray(selbd_np.T, mxu),
      blockmask)
    if residuals:
        return outs[0], outs[1], tuple(outs[2:])
    return outs


def _mixer_block_ref(x, gn_scale, gn_bias, wf, bf, wv, bv, w2, b2, ls1,
                     alpha, beta, heads, fold_h, fold_w, proposal_h,
                     proposal_w):
    """Traceable composition, numerically aligned with the fused kernel
    (same weight folding, same bf16 MXU operand casts, same Pallas mixer)."""
    f32 = jnp.float32
    mxu = x.dtype
    stats = gn1_stats(x)
    wf_e, bf_e = _fold_in(gn_scale, gn_bias, wf, bf)
    wv_e, bv_e = _fold_in(gn_scale, gn_bias, wv, bv)
    w2_e, b2_e = _fold_out(w2, b2, ls1)
    xf = x.astype(f32)
    xn = (xf - stats[:, None, None, None, 0]) * stats[:, None, None, None, 1]
    xnb = xn.astype(mxu)
    feat = (jnp.einsum("bhwc,cd->bhwd", xnb, wf_e.astype(mxu),
                       preferred_element_type=f32) + bf_e).astype(mxu)
    value = (jnp.einsum("bhwc,cd->bhwd", xnb, wv_e.astype(mxu),
                        preferred_element_type=f32) + bv_e).astype(mxu)
    mixed = _cluster_fused(feat, value, alpha, beta, heads, fold_h, fold_w,
                           proposal_h, proposal_w)
    y = jnp.einsum("bhwd,dc->bhwc", mixed.astype(mxu), w2_e.astype(mxu),
                   preferred_element_type=f32) + b2_e
    return (xf + y).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16))
def fused_mixer_block(x, gn_scale, gn_bias, wf, bf, wv, bv, w2, b2, ls1,
                      alpha, beta, heads, fold_h, fold_w, proposal_h,
                      proposal_w):
    """Mixer half of ClusterBlock as ONE Pallas kernel (+ the XLA stats
    reduction).  Weight layouts: wf/wv (C, inner), w2 (inner, C)."""
    out, _ = _mixer_fwd_impl(x, gn_scale, gn_bias, wf, bf, wv, bv, w2, b2,
                             ls1, alpha, beta, heads, fold_h, fold_w,
                             proposal_h, proposal_w, gn1_stats(x))
    return out


def _mixer_fwd_impl(x, gn_scale, gn_bias, wf, bf, wv, bv, w2, b2, ls1, alpha,
                    beta, heads, fold_h, fold_w, proposal_h, proposal_w,
                    stats, lane_fold=1, want_residuals=False):
    """Shared forward: returns (out, out_stats[, residuals]) where out_stats
    are the GN statistics of the OUTPUT, reduced inside the kernel (the
    chained MLP half consumes them instead of re-reading out from HBM).
    With lane_fold=s>1, x is (B, H, W/s, s*C) lane-folded and out stays
    folded.  want_residuals=True (the TRAIN forward under the custom VJP)
    additionally returns the per-tile (cbest, argf, c_rep, oc) residuals
    consumed by the residual backward kernels (VERDICT r4 #3)."""
    interpret = jax.default_backend() != "tpu"
    wf_e, bf_e = _fold_in(gn_scale, gn_bias, wf, bf)
    wv_e, bv_e = _fold_in(gn_scale, gn_bias, wv, bv)
    w2_e, b2_e = _fold_out(w2, b2, ls1)
    outs = _mixer_block_pallas(
        x, stats, wf_e, bf_e, wv_e, bv_e, w2_e, b2_e,
        jnp.asarray(alpha), jnp.asarray(beta),
        heads, fold_h, fold_w, proposal_h, proposal_w, fold=lane_fold,
        interpret=interpret, residuals=want_residuals,
    )
    out, osum = outs[0], outs[1]
    n = float(x.shape[1] * x.shape[2] * x.shape[3])
    mu = osum[:, 0, 0] / n
    var = osum[:, 0, 1] / n - jnp.square(mu)
    out_stats = jnp.stack([mu, jax.lax.rsqrt(var + _GN_EPS)], axis=-1)
    if want_residuals:
        return out, out_stats, outs[2]
    return out, out_stats


def _use_bwd_residuals() -> bool:
    """Residual backward (VERDICT r4 #3): the train forward kernels store
    small per-tile residuals (winner cos/argmax plane, raw + mixed centers)
    and the backward kernels consume them instead of rematerialising the
    similarity/centers passes.  A/B kill switch: ASY_MIXER_BWD_RESIDUALS=0."""
    import os

    return os.environ.get("ASY_MIXER_BWD_RESIDUALS", "1") != "0"


def _fused_mixer_block_fwd(x, gn_scale, gn_bias, wf, bf, wv, bv, w2, b2, ls1,
                           alpha, beta, heads, fold_h, fold_w, proposal_h,
                           proposal_w):
    # compute stats once and thread them through the residuals — the bwd
    # would otherwise redo a full reduce pass over x per block
    stats = gn1_stats(x)
    if _use_bwd_residuals():
        out, _, rpack = _mixer_fwd_impl(
            x, gn_scale, gn_bias, wf, bf, wv, bv, w2, b2, ls1, alpha, beta,
            heads, fold_h, fold_w, proposal_h, proposal_w, stats,
            want_residuals=True,
        )
    else:
        out, _ = _mixer_fwd_impl(x, gn_scale, gn_bias, wf, bf, wv, bv, w2,
                                 b2, ls1, alpha, beta, heads, fold_h, fold_w,
                                 proposal_h, proposal_w, stats)
        rpack = None
    return out, (x, gn_scale, gn_bias, wf, bf, wv, bv, w2, b2, ls1, alpha,
                 beta, stats, rpack)


def _mixer_bwd_kernel_folded(params_ref, stats_ref, x_ref, g_ref, wfbd_ref,
                             bft_ref, wfrt_ref, bf_ref, wvrt_ref, bv_ref,
                             w2trt_ref, pool_ref, rep_ref, hmask_ref,
                             selbd_ref, rmask_ref, selbdT_ref,
                             blockmask_ref, eye_ref, dxn_ref, dwftok_ref,
                             dwfcin_ref, dbftok_ref, dbfcin_ref, dwv_ref,
                             dbv_ref, dw2_ref, db2_ref, dab_ref, *, heads, m,
                             gw, s, inner):
    """Lane-folded backward of the mixer half (see the lane folding note).

    Same dataflow as _mixer_bwd_kernel with token-indexed contractions
    unrolled over the s sub-positions (lane placement via identity-row
    slices); weight-gradient partials accumulate in EXPANDED form —
    dwf_tok (s*C, s*I), dwf_cin/dwv (s*C, I), dw2 (I, s*C) — and the XLA
    wrapper folds their p-blocks back to the original shapes."""
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    alpha = params_ref[0]
    beta = params_ref[1]
    blk = x_ref[0]                                   # (rh, wtf, s*C)
    rh, wtf, sc = blk.shape
    ntf = rh * wtf
    c = sc // s
    mxu = blk.dtype
    bi = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    xf = blk.reshape(ntf, sc).astype(f32)
    gout = g_ref[0].reshape(ntf, sc).astype(f32)
    xn = (xf - stats_ref[bi, 0]) * stats_ref[bi, 1]
    xnb = xn.astype(mxu)

    (feat_f, featn_b, cin_exp, cin_expb, cn, cnb, inv_c, inv, headexp,
     cos, sgb, mask, sim, simb, icnt, rs, aggx_exp, oc, xn_blk,
     _c_rep, _cbest, _arg) = (
        _mixer_block_fwd_body_folded(
            xn, xnb, alpha, beta, wfbd_ref, bft_ref, wfrt_ref, bf_ref,
            wvrt_ref, bv_ref, pool_ref, rep_ref, hmask_ref, selbd_ref,
            rmask_ref, selbdT_ref, blockmask_ref,
            heads=heads, m=m, gw=gw, s=s, inner=inner,
        ))
    _mixer_bwd_tail_folded(
        gout, xn, xnb, alpha, cos, feat_f, featn_b, cin_expb, cn, cnb, inv_c,
        inv, headexp, sgb, mask, simb, icnt, rs, aggx_exp, oc, xn_blk,
        wfbd_ref, wfrt_ref, wvrt_ref, bv_ref, w2trt_ref, pool_ref, rep_ref,
        hmask_ref, selbd_ref, selbdT_ref, blockmask_ref, eye_ref,
        dxn_ref, dwftok_ref, dwfcin_ref, dbftok_ref, dbfcin_ref, dwv_ref,
        dbv_ref, dw2_ref, db2_ref, dab_ref, first=(i == 0) & (j == 0),
        m=m, s=s, inner=inner,
    )


def _mixer_bwd_tail_folded(gout, xn, xnb, alpha, cosw, feat_f, featn_b,
                           cin_expb, cn, cnb, inv_c, inv, headexp, sgb, mask,
                           simb, icnt, rs, aggx_exp, oc, xn_blk,
                           wfbd_ref, wfrt_ref, wvrt_ref, bv_ref, w2trt_ref,
                           pool_ref, rep_ref, hmask_ref, selbd_ref,
                           selbdT_ref, blockmask_ref, eye_ref,
                           dxn_ref, dwftok_ref, dwfcin_ref, dbftok_ref,
                           dbfcin_ref, dwv_ref, dbv_ref, dw2_ref, db2_ref,
                           dab_ref, *, first, m, s, inner):
    """Backward dataflow of the lane-folded mixer half, shared by the
    full-remat kernel (cosw = the full remat cos plane) and the residual
    kernel (cosw = the stored winner-plane cos tiled over m — identical
    d_alpha because sig is winner-masked)."""
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    ntf, sc = xn.shape
    c = sc // s
    mxu = xnb.dtype
    # lane-tiled fc2 centers (every p-block == the compact (Hb, C) ocw): the
    # row-tiled w2^T gives it in ONE dot, replacing the per-p identity-slice
    # extraction loops below (r4 diet)
    ocw_t = jax.lax.dot_general(
        oc.astype(mxu), w2trt_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ).astype(mxu)                                    # (Hb, sc)
    gb = gout.astype(mxu)
    g_blk = jnp.concatenate([gb] * s, axis=0) * blockmask_ref[:]  # (Nt, sc)

    # y_f = sum_p sim_p^T @ place_p(ocw) + b2: cotangents of sim and ocw
    docw_exp = jax.lax.dot_general(
        simb, g_blk, (((1,), (0,)), ((), ())), preferred_element_type=f32,
    )                                                # (Hb, sc)

    # ocw = oc @ w2_e  (row-tiled w2^T folds the p-blocks of docw_exp)
    docw_expb = docw_exp.astype(mxu)
    doc = jax.lax.dot_general(
        docw_expb, w2trt_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (Hb, I)
    pdw2 = jax.lax.dot_general(
        oc.astype(mxu), docw_expb, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (I, sc)

    # oc = ((agg + vc) * icnt) * hmask; agg = aggx @ wv_e + rs * bv_e
    dagg = doc * icnt * hmask_ref[:]                 # (Hb, I) — also dvc
    daggb = dagg.astype(mxu)
    pdwv = jax.lax.dot_general(
        aggx_exp.astype(mxu), daggb, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (sc, I)
    drs = jnp.sum(dagg * bv_ref[:], axis=1, keepdims=True)   # (Hb, 1)
    pdbv = jax.lax.dot_general(
        rs.astype(mxu), daggb, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (1, I)

    # dsim (dispatch + aggregation cotangents) and the aggregation dxn,
    # loop-free (r4 diet): the block-masked token copies g_blk/xn_blk confine
    # each token row's contraction to its own p lane block, so ONE full-width
    # dot per term replaces the former s-iteration extraction loop (per-token
    # dot shapes unchanged — contraction stays over the live C block).
    daggx_t = jax.lax.dot_general(
        daggb, wvrt_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ).astype(mxu)                                    # (Hb, sc) lane-tiled
    dsim = jax.lax.dot_general(
        ocw_t, g_blk, (((1,), (1,)), ((), ())), preferred_element_type=f32,
    ) + jax.lax.dot_general(
        daggx_t, xn_blk, (((1,), (1,)), ((), ())), preferred_element_type=f32,
    ) + drs                                          # (Hb, Nt) permuted order
    # dxn in block layout, folded by masked contiguous row-block sums
    dxn_blk = jax.lax.dot_general(
        simb, daggx_t, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    ) * blockmask_ref[:]                             # (Nt, sc)
    dxn = sum(dxn_blk[p * ntf : (p + 1) * ntf, :] for p in range(s))

    # sim = sigmoid(x) * mask with x = beta + alpha*cos (mask, counts
    # constant); sigmoid' only lives on the winner plane (r4 VPU diet)
    sgg = sgb * (1.0 - sgb)
    sig = dsim * mask * jnp.concatenate([sgg] * m, axis=0)
    dcos = sig * alpha
    d_alpha = jnp.sum(sig * cosw)
    d_beta = jnp.sum(sig)

    # normalize-first backward (r4): per-p work is just the two cos-matmul
    # cotangents; the norm chain is full-width through headexp/inv.
    # dcn here carries cross-head inv factors the old per-p form didn't, but
    # both downstream uses (dot_c against the hmask-ed cn, dcp through the
    # hmask multiply) zero exactly those entries — same gradients.
    dcosb = dcos.astype(mxu)
    dcn = None
    dfeatn_ps = []
    for p in range(s):
        dcos_p = dcosb[:, p * ntf : (p + 1) * ntf]
        dcn_p = jax.lax.dot_general(
            dcos_p, featn_b[:, p * inner : (p + 1) * inner],
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        )                                            # (Hb, I)
        dcn = dcn_p if dcn is None else dcn + dcn_p
        dfeatn_ps.append(jax.lax.dot_general(
            dcos_p, cnb, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        ))                                           # (ntf, I)
    dfeatn = jnp.concatenate(dfeatn_ps, axis=1)      # (ntf, s*I)
    # featn = feat * headexp; headexp = inv @ selbd^T; inv = rsqrt(norm2);
    # norm2 = feat^2 @ selbd
    dfeat_f = dfeatn * headexp
    dinv = jax.lax.dot_general(
        (dfeatn * feat_f).astype(mxu), selbd_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (ntf, s*heads)
    dnorm2 = dinv * (-0.5) * inv * inv * inv
    df2 = jax.lax.dot_general(
        dnorm2.astype(mxu), selbdT_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (ntf, s*I)
    dfeat_f = dfeat_f + 2.0 * feat_f * df2

    # cn = c_rep * inv_c; c_rep = (rep @ cp) * hmask
    dot_c = jnp.sum(cn * dcn, axis=1, keepdims=True)
    d_c_rep = inv_c * (dcn - cn * dot_c)
    dcp = jax.lax.dot_general(
        rep_ref[:], d_c_rep * hmask_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (Mb, I)
    dvp = jax.lax.dot_general(
        rep_ref[:], dagg, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (Mb, I)

    # cp = cin @ wf_e + bf_e; vp = cin @ wv_e + bv_e; cin = pool^T @ xn
    dcpb = dcp.astype(mxu)
    dvpb = dvp.astype(mxu)
    pdwf_cin = jax.lax.dot_general(
        cin_expb, dcpb, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )                                                # (sc, I)
    pdwv = pdwv + jax.lax.dot_general(
        cin_expb, dvpb, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )
    pdbf_cin = jnp.sum(dcp, axis=0, keepdims=True)   # (1, I)
    pdbv = pdbv + jnp.sum(dvp, axis=0, keepdims=True)
    dcin = jax.lax.dot_general(
        dcpb, wfrt_ref[0:c, :], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) + jax.lax.dot_general(
        dvpb, wvrt_ref[0:c, :], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (Mb, C)
    # pool-transpose placement, loop-free (r4 diet): lane-tile dcin (summed
    # identity rows of eye give the (C, sc) tiler), one full-pool dot, then
    # the same masked row-block fold as dxn_blk above
    eyet = sum(eye_ref[p * c : (p + 1) * c, :] for p in range(s))  # (C, sc)
    dcin_t = jax.lax.dot_general(
        dcin.astype(mxu), eyet, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(mxu)                                    # (Mb, sc) lane-tiled
    dcin_blk = jax.lax.dot_general(
        pool_ref[:], dcin_t, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) * blockmask_ref[:]                             # (Nt, sc)
    dxn = dxn + sum(dcin_blk[p * ntf : (p + 1) * ntf, :] for p in range(s))

    # feat = xn @ wf_bd + bf_t
    dfb = dfeat_f.astype(mxu)
    dxn = dxn + jax.lax.dot_general(
        dfb, wfbd_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=f32,
    )
    pdwf_tok = jax.lax.dot_general(
        xnb, dfb, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )                                                # (sc, s*I)
    pdbf_tok = jnp.sum(dfeat_f, axis=0, keepdims=True)   # (1, s*I)

    dxn_ref[0] = dxn.reshape(dxn_ref.shape[1:]).astype(dxn_ref.dtype)
    s1 = jnp.sum(dxn)
    s2 = jnp.sum(dxn * xn)
    pdb2 = jnp.sum(gout, axis=0, keepdims=True)      # (1, sc)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    dab_ref[0, 0] = jnp.where(
        lane == 0, d_alpha,
        jnp.where(lane == 1, d_beta,
                  jnp.where(lane == 2, s1, jnp.where(lane == 3, s2, 0.0))),
    )

    @pl.when(first)
    def _init():
        dwftok_ref[0] = pdwf_tok
        dwfcin_ref[0] = pdwf_cin
        dbftok_ref[0] = pdbf_tok
        dbfcin_ref[0] = pdbf_cin
        dwv_ref[0] = pdwv
        dbv_ref[0] = pdbv
        dw2_ref[0] = pdw2
        db2_ref[0] = pdb2

    @pl.when(jnp.logical_not(first))
    def _accum():
        dwftok_ref[0] += pdwf_tok
        dwfcin_ref[0] += pdwf_cin
        dbftok_ref[0] += pdbf_tok
        dbfcin_ref[0] += pdbf_cin
        dwv_ref[0] += pdwv
        dbv_ref[0] += pdbv
        dw2_ref[0] += pdw2
        db2_ref[0] += pdb2


def _mixer_bwd_kernel_folded_res(params_ref, stats_ref, x_ref, g_ref,
                                 wfbd_ref, bft_ref, wfrt_ref, bf_ref,
                                 wvrt_ref, bv_ref, w2trt_ref, pool_ref,
                                 rep_ref, hmask_ref, selbd_ref, rmask_ref,
                                 selbdT_ref, blockmask_ref, eye_ref,
                                 cbest_ref, argf_ref, crep_ref, ocr_ref,
                                 dxn_ref, dwftok_ref, dwfcin_ref, dbftok_ref,
                                 dbfcin_ref, dwv_ref, dbv_ref, dw2_ref,
                                 db2_ref, dab_ref, *, heads, m, gw, s, inner):
    """Residual backward of the lane-folded mixer half (VERDICT r4 #3).

    Instead of rematerialising the full 7-pass forward, this consumes the
    per-tile residuals stored by the train forward kernel — cbest/argf (the
    winner-plane cos values and proposal indices), c_rep (unnormalised
    centers) and oc (mixed centers) — and recomputes only the cheap
    input-side passes the backward genuinely contracts against (feat tokens
    + their norms, pooled tokens, the sim plane rebuilt from the winner
    residuals, the aggregation plane).  Eliminated vs the full remat: both
    cos matmuls (the dominant similarity chain), the centers projection/
    replication chain, the argmax scan and the aggregation projection."""
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    alpha = params_ref[0]
    beta = params_ref[1]
    blk = x_ref[0]                                   # (rh, wtf, s*C)
    rh, wtf, sc = blk.shape
    ntf = rh * wtf
    mxu = blk.dtype
    bi = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    xf = blk.reshape(ntf, sc).astype(f32)
    gout = g_ref[0].reshape(ntf, sc).astype(f32)
    xn = (xf - stats_ref[bi, 0]) * stats_ref[bi, 1]
    xnb = xn.astype(mxu)

    # --- slim remat: feat tokens + per-head norms (contracted against the
    # dcos cotangents below, so they must exist in VMEM either way)
    feat_f = jax.lax.dot_general(
        xnb, wfbd_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + bft_ref[0]                                   # (ntf, s*I)
    f2 = (feat_f * feat_f).astype(mxu)
    norm2 = jax.lax.dot_general(
        f2, selbd_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    inv = jax.lax.rsqrt(norm2 + 1e-12)               # (ntf, s*heads)
    headexp = jax.lax.dot_general(
        inv.astype(mxu), selbdT_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    featn_b = (feat_f * headexp).astype(mxu)
    xn_blk = jnp.concatenate([xnb] * s, axis=0) * blockmask_ref[:]
    cin_exp = jax.lax.dot_general(
        pool_ref[:], xn_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    cin_expb = cin_exp.astype(mxu)

    # --- stored residuals -> sim plane / centers, no similarity chain
    cbest = cbest_ref[0, 0].astype(f32)              # (seg, Nt) winner cos
    argf = argf_ref[0, 0].astype(f32)                # (seg, Nt) winner index
    x_best = beta + alpha * cbest
    sgb = jax.nn.sigmoid(x_best)                     # garbage off-region,
    mask = jnp.concatenate(                          # killed by mask below
        [(argf == float(mm)).astype(f32) for mm in range(m)], axis=0
    ) * rmask_ref[:]                                 # (Hb, Nt)
    sim = mask * jnp.concatenate([sgb] * m, axis=0)
    simb = sim.astype(mxu)
    counts = jnp.sum(mask, axis=1, keepdims=True)
    icnt = 1.0 / (counts + 1.0)
    rs = jnp.sum(sim, axis=1, keepdims=True)
    aggx_exp = jax.lax.dot_general(
        simb, xn_blk, (((1,), (0,)), ((), ())), preferred_element_type=f32,
    )                                                # (Hb, sc)
    c_rep = crep_ref[0, 0].astype(f32)               # (Hb, I)
    inv_c = jax.lax.rsqrt(jnp.sum(c_rep * c_rep, axis=1, keepdims=True)
                          + 1e-12)
    cn = c_rep * inv_c
    cnb = cn.astype(mxu)
    oc = ocr_ref[0, 0].astype(f32)                   # (Hb, I)
    cosw = jnp.concatenate([cbest] * m, axis=0)      # d_alpha plane (sig is
                                                     # winner-masked)
    _mixer_bwd_tail_folded(
        gout, xn, xnb, alpha, cosw, feat_f, featn_b, cin_expb, cn, cnb,
        inv_c, inv, headexp, sgb, mask, simb, icnt, rs, aggx_exp, oc, xn_blk,
        wfbd_ref, wfrt_ref, wvrt_ref, bv_ref, w2trt_ref, pool_ref, rep_ref,
        hmask_ref, selbd_ref, selbdT_ref, blockmask_ref, eye_ref,
        dxn_ref, dwftok_ref, dwfcin_ref, dbftok_ref, dbfcin_ref, dwv_ref,
        dbv_ref, dw2_ref, db2_ref, dab_ref, first=(i == 0) & (j == 0),
        m=m, s=s, inner=inner,
    )


def _mixer_bwd_kernel(params_ref, stats_ref, x_ref, g_ref, wf_ref, bf_ref,
                      wv_ref, bv_ref, w2_ref, pool_ref, rep_ref, hmask_ref,
                      headsel_ref, rmask_ref, rowhead_ref, dxn_ref, dwf_ref,
                      dbf_ref, dwv_ref, dbv_ref, dw2_ref, db2_ref, dab_ref, *,
                      heads, m, gw, rw):
    """Phase-1 fused backward of the mixer half (7-pass forward remat +
    input-space backward, VERDICT r2 #1).

    Rematerialises the forward interior with _mixer_block_fwd_body (bit-same
    Mosaic dots as the production forward kernel, so the argmax assignment
    matches the actual forward in bf16), then back-propagates entirely in
    INPUT channel space: since `value` and `mixed` are never materialised,
    their weight grads collapse to tiny (Hb/Mb)-row products and two full
    K-passes disappear vs the round-2 kernel.  Emits dxn plus folded-weight
    gradient partials accumulated across each batch row's tiles
    (GSPMD-partitionable; XLA sums over batch).  The hard assignment mask
    and counts are constants (identical to autograd through argmax/one_hot);
    GroupNorm input gradient is completed outside via the s1/s2 sums."""
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    alpha = params_ref[0]
    beta = params_ref[1]
    blk = x_ref[0]                                   # (rh, wt, C)
    rh, wt, c = blk.shape
    nt = rh * wt
    mxu = blk.dtype
    bi = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    xf = blk.reshape(nt, c).astype(f32)
    gout = g_ref[0].reshape(nt, c).astype(f32)
    xn = (xf - stats_ref[bi, 0]) * stats_ref[bi, 1]
    xnb = xn.astype(mxu)

    (feat, featb, cin, cinb, cn, inv_c, inv, invr, raw, cos, sgb, mask, sim,
     simb, icnt, rs, aggx, oc, _c_rep, _cbest, _arg) = _mixer_block_fwd_body(
        xn, xnb, alpha, beta, wf_ref, bf_ref, wv_ref, bv_ref, pool_ref,
        rep_ref, hmask_ref, headsel_ref, rmask_ref, rowhead_ref,
        heads=heads, m=m, gw=gw,
    )
    _mixer_bwd_tail(
        gout, xn, xnb, alpha, cos, raw, feat, featb, cinb, cn, inv_c, inv,
        invr, sgb, mask, simb, icnt, rs, aggx, oc,
        wf_ref, wv_ref, bv_ref, w2_ref, pool_ref, rep_ref, hmask_ref,
        headsel_ref, rowhead_ref,
        dxn_ref, dwf_ref, dbf_ref, dwv_ref, dbv_ref, dw2_ref, db2_ref,
        dab_ref, first=(i == 0) & (j == 0), m=m,
    )


def _mixer_bwd_tail(gout, xn, xnb, alpha, cosw, raw, feat, featb, cinb, cn,
                    inv_c, inv, invr, sgb, mask, simb, icnt, rs, aggx, oc,
                    wf_ref, wv_ref, bv_ref, w2_ref, pool_ref, rep_ref,
                    hmask_ref, headsel_ref, rowhead_ref,
                    dxn_ref, dwf_ref, dbf_ref, dwv_ref, dbv_ref, dw2_ref,
                    db2_ref, dab_ref, *, first, m):
    """Backward dataflow of the unfolded mixer half, shared by the
    full-remat kernel (cosw/raw = the remat planes) and the residual kernel
    (cosw = the stored winner cos tiled over m, raw = None — the raw-plane
    cotangent is reconstructed as cosw/invr on the winner support, identical
    because dcos is winner-masked)."""
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    mxu = xnb.dtype
    ocw = jax.lax.dot_general(
        oc.astype(mxu), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (Hb, C)

    gb = gout.astype(mxu)
    # y = sim^T @ ocw (+ b2): cotangents of sim and ocw
    dsim = jax.lax.dot_general(
        ocw.astype(mxu), gb, (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (Hb, Nt)
    docw = jax.lax.dot_general(
        simb, gb, (((1,), (0,)), ((), ())), preferred_element_type=f32,
    )                                                # (Hb, C)

    # ocw = oc @ w2_e
    docwb = docw.astype(mxu)
    doc = jax.lax.dot_general(
        docwb, w2_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=f32,
    )                                                # (Hb, I)
    pdw2 = jax.lax.dot_general(
        oc.astype(mxu), docwb, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (I, C)

    # oc = ((agg + vc) * icnt) * hmask; agg = aggx @ wv_e + rs * bv_e
    dagg = doc * icnt * hmask_ref[:]                 # (Hb, I) — also dvc
    daggb = dagg.astype(mxu)
    daggx = jax.lax.dot_general(
        daggb, wv_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=f32,
    )                                                # (Hb, C)
    pdwv = jax.lax.dot_general(
        aggx.astype(mxu), daggb, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (C, I)
    # f32 multiply-reduce, not a dot: a bf16 x f32 mixed-dtype dot_general
    # trips an invalid Mosaic vector.broadcast at small (Hb, I) shapes
    drs = jnp.sum(dagg * bv_ref[:], axis=1, keepdims=True)   # (Hb, 1)
    pdbv = jax.lax.dot_general(
        rs.astype(mxu), daggb, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (1, I)

    # aggx = sim @ xn; rs = rowsum(sim)
    daggxb = daggx.astype(mxu)
    dsim = dsim + jax.lax.dot_general(
        daggxb, xnb, (((1,), (1,)), ((), ())), preferred_element_type=f32,
    ) + drs
    dxn = jax.lax.dot_general(
        simb, daggxb, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )                                                # (Nt, C)

    # sim = sigmoid(x) * mask with x = beta + alpha*cos (mask, counts
    # constant); sigmoid' only lives on the winner plane (r4 VPU diet)
    sgg = sgb * (1.0 - sgb)
    sig = dsim * mask * jnp.concatenate([sgg] * m, axis=0)
    dcos = sig * alpha
    d_alpha = jnp.sum(sig * cosw)
    d_beta = jnp.sum(sig)
    draw = dcos * invr
    # raw == cos/invr; dcos is winner-masked, so the residual path (raw is
    # None) reconstructs exactly the entries that matter from the winner cos
    dinvr = dcos * (raw if raw is not None else cosw * (1.0 / invr))

    # raw = cn @ feat^T
    drawb = draw.astype(mxu)
    dcn = jax.lax.dot_general(
        drawb, featb, (((1,), (0,)), ((), ())), preferred_element_type=f32,
    )                                                # (Hb, I)
    dfeat = jax.lax.dot_general(
        drawb, cn.astype(mxu), (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (Nt, I)

    # invr = rowhead @ inv^T; inv = rsqrt(norm2 + eps); norm2 = feat^2 @ hsel
    dinv = jax.lax.dot_general(
        dinvr.astype(mxu), rowhead_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (Nt, heads)
    dnorm2 = dinv * (-0.5) * inv * inv * inv
    dfeat = dfeat + 2.0 * feat * jax.lax.dot_general(
        dnorm2.astype(mxu), headsel_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (Nt, I)

    # cn = c_rep * inv_c (rowwise normalise); c_rep = (rep @ cp) * hmask
    dot_c = jnp.sum(cn * dcn, axis=1, keepdims=True)
    d_c_rep = inv_c * (dcn - cn * dot_c)
    dcp = jax.lax.dot_general(
        rep_ref[:], d_c_rep * hmask_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (Mb, I)
    dvp = jax.lax.dot_general(
        rep_ref[:], dagg, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (Mb, I) — dvc == dagg

    # cp = cin @ wf_e + bf_e; vp = cin @ wv_e + bv_e; cin = pool^T @ xn
    dcpb = dcp.astype(mxu)
    dvpb = dvp.astype(mxu)
    pdwf = jax.lax.dot_general(
        cinb, dcpb, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )                                                # (C, I)
    pdwv = pdwv + jax.lax.dot_general(
        cinb, dvpb, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )
    pdbf = jnp.sum(dcp, axis=0, keepdims=True)       # (1, I)
    pdbv = pdbv + jnp.sum(dvp, axis=0, keepdims=True)
    dcin = jax.lax.dot_general(
        dcpb, wf_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=f32,
    ) + jax.lax.dot_general(
        dvpb, wv_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=f32,
    )                                                # (Mb, C)
    dxn = dxn + jax.lax.dot_general(
        pool_ref[:], dcin.astype(mxu), (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (Nt, C)

    # feat = xn @ wf_e + bf_e
    dfb = dfeat.astype(mxu)
    dxn = dxn + jax.lax.dot_general(
        dfb, wf_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=f32,
    )
    pdwf = pdwf + jax.lax.dot_general(
        xnb, dfb, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )
    pdbf = pdbf + jnp.sum(dfeat, axis=0, keepdims=True)

    dxn_ref[0] = dxn.reshape(dxn_ref.shape[1:]).astype(dxn_ref.dtype)
    # per-sample GN-backward partials (lanes 2/3 of the dab row):
    s1 = jnp.sum(dxn)
    s2 = jnp.sum(dxn * xn)
    pdb2 = jnp.sum(gout, axis=0, keepdims=True)      # (1, C)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    dab_ref[0, 0] = jnp.where(
        lane == 0, d_alpha,
        jnp.where(lane == 1, d_beta,
                  jnp.where(lane == 2, s1, jnp.where(lane == 3, s2, 0.0))),
    )

    @pl.when(first)
    def _init():
        dwf_ref[0] = pdwf
        dbf_ref[0] = pdbf
        dwv_ref[0] = pdwv
        dbv_ref[0] = pdbv
        dw2_ref[0] = pdw2
        db2_ref[0] = pdb2

    @pl.when(jnp.logical_not(first))
    def _accum():
        dwf_ref[0] += pdwf
        dbf_ref[0] += pdbf
        dwv_ref[0] += pdwv
        dbv_ref[0] += pdbv
        dw2_ref[0] += pdw2
        db2_ref[0] += pdb2


def _mixer_bwd_kernel_res(params_ref, stats_ref, x_ref, g_ref, wf_ref,
                          bf_ref, wv_ref, bv_ref, w2_ref, pool_ref, rep_ref,
                          hmask_ref, headsel_ref, rmask_ref, rowhead_ref,
                          cbest_ref, argf_ref, crep_ref, ocr_ref,
                          dxn_ref, dwf_ref, dbf_ref, dwv_ref, dbv_ref,
                          dw2_ref, db2_ref, dab_ref, *, heads, m, gw, rw):
    """Residual backward of the unfolded mixer half — see
    _mixer_bwd_kernel_folded_res for the residual protocol."""
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    alpha = params_ref[0]
    beta = params_ref[1]
    blk = x_ref[0]                                   # (rh, wt, C)
    rh, wt, c = blk.shape
    nt = rh * wt
    mxu = blk.dtype
    bi = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    xf = blk.reshape(nt, c).astype(f32)
    gout = g_ref[0].reshape(nt, c).astype(f32)
    xn = (xf - stats_ref[bi, 0]) * stats_ref[bi, 1]
    xnb = xn.astype(mxu)

    # --- slim remat: feat tokens + norms + pooled tokens
    feat = jax.lax.dot_general(
        xnb, wf_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=f32,
    ) + bf_ref[0]                                    # (Nt, I)
    featb = feat.astype(mxu)
    f2 = (feat * feat).astype(mxu)
    norm2 = jax.lax.dot_general(
        f2, headsel_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    inv = jax.lax.rsqrt(norm2 + 1e-12)               # (Nt, heads)
    invr = jax.lax.dot_general(
        rowhead_ref[:], inv.astype(mxu), (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )                                                # (Hb, Nt)
    cin = jax.lax.dot_general(
        pool_ref[:], xnb, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )
    cinb = cin.astype(mxu)

    # --- stored residuals -> sim plane / centers
    cbest = cbest_ref[0, 0].astype(f32)              # (seg, Nt)
    argf = argf_ref[0, 0].astype(f32)
    x_best = beta + alpha * cbest
    sgb = jax.nn.sigmoid(x_best)
    mask = jnp.concatenate(
        [(argf == float(mm)).astype(f32) for mm in range(m)], axis=0
    ) * rmask_ref[:]                                 # (Hb, Nt)
    sim = mask * jnp.concatenate([sgb] * m, axis=0)
    simb = sim.astype(mxu)
    counts = jnp.sum(mask, axis=1, keepdims=True)
    icnt = 1.0 / (counts + 1.0)
    rs = jnp.sum(sim, axis=1, keepdims=True)
    aggx = jax.lax.dot_general(
        simb, xnb, (((1,), (0,)), ((), ())), preferred_element_type=f32,
    )                                                # (Hb, C)
    c_rep = crep_ref[0, 0].astype(f32)
    inv_c = jax.lax.rsqrt(jnp.sum(c_rep * c_rep, axis=1, keepdims=True)
                          + 1e-12)
    cn = c_rep * inv_c
    oc = ocr_ref[0, 0].astype(f32)
    cosw = jnp.concatenate([cbest] * m, axis=0)

    _mixer_bwd_tail(
        gout, xn, xnb, alpha, cosw, None, feat, featb, cinb, cn, inv_c, inv,
        invr, sgb, mask, simb, icnt, rs, aggx, oc,
        wf_ref, wv_ref, bv_ref, w2_ref, pool_ref, rep_ref, hmask_ref,
        headsel_ref, rowhead_ref,
        dxn_ref, dwf_ref, dbf_ref, dwv_ref, dbv_ref, dw2_ref, db2_ref,
        dab_ref, first=(i == 0) & (j == 0), m=m,
    )


@functools.partial(
    jax.jit,
    static_argnames=("heads", "fold_h", "fold_w", "proposal_h", "proposal_w",
                     "fold", "interpret"),
)
def _mixer_bwd_pallas(x, g, stats, wf_e, bf_e, wv_e, bv_e, w2_e, alpha, beta,
                      heads, fold_h, fold_w, proposal_h, proposal_w,
                      fold=1, interpret=False, residuals=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if fold > 1:
        return _mixer_bwd_pallas_folded(
            x, g, stats, wf_e, bf_e, wv_e, bv_e, w2_e, alpha, beta, heads,
            fold_h, fold_w, proposal_h, proposal_w, fold, interpret=interpret,
            residuals=residuals,
        )
    b, h, w, c = x.shape
    inner = wf_e.shape[1]
    rh, rw = h // fold_h, w // fold_w
    n = rh * rw
    m = proposal_h * proposal_w
    gw = _group_w(fold_w, n)
    wt = gw * rw
    nt = rh * wt
    mb = gw * m
    hb = gw * heads * m
    fwg = fold_w // gw
    f32 = jnp.float32
    mxu = x.dtype

    pool_t = jnp.asarray(
        _tile_pool_matrix_t((rh, rw), (proposal_h, proposal_w), gw), mxu)
    rep_np, hmask_np, headsel_np = _replication_and_masks(gw, heads, m, inner)
    rowhead = jnp.asarray(_rowhead_matrix(gw, heads, m), mxu)
    rmask = jnp.asarray(_region_mask(gw, heads, m, rh, rw))
    params = jnp.stack([alpha.astype(f32), beta.astype(f32)])

    kernel = functools.partial(
        _mixer_bwd_kernel_res if residuals is not None else _mixer_bwd_kernel,
        heads=heads, m=m, gw=gw, rw=rw)
    tile = pl.BlockSpec((1, rh, wt, c), lambda bi, i, j: (bi, i, j, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda bi, i, j: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda bi, i, j: (bi,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    seg = gw * heads
    res_specs, res_args = [], []
    if residuals is not None:
        rtile = lambda rows, cols: pl.BlockSpec(
            (1, 1, rows, cols), lambda bi, i, j: (bi, i * fwg + j, 0, 0),
            memory_space=pltpu.VMEM,
        )
        res_specs = [rtile(seg, nt), rtile(seg, nt),
                     rtile(hb, inner), rtile(hb, inner)]
        res_args = list(residuals)
    return pl.pallas_call(
        kernel,
        grid=(b, fold_h, fwg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile, tile,
            const((c, inner)), const((1, inner)),
            const((c, inner)), const((1, inner)),
            const((inner, c)),
            const((nt, mb)), const((hb, mb)), const((hb, inner)),
            const((inner, heads)), const((hb, nt)), const((hb, heads)),
        ] + res_specs,
        out_specs=[
            tile,
            acc((c, inner)), acc((1, inner)),
            acc((c, inner)), acc((1, inner)),
            acc((inner, c)), acc((1, c)),
            pl.BlockSpec((1, 1, 1, 128), lambda bi, i, j: (bi, i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, c, inner), f32),
            jax.ShapeDtypeStruct((b, 1, inner), f32),
            jax.ShapeDtypeStruct((b, c, inner), f32),
            jax.ShapeDtypeStruct((b, 1, inner), f32),
            jax.ShapeDtypeStruct((b, inner, c), f32),
            jax.ShapeDtypeStruct((b, 1, c), f32),
            jax.ShapeDtypeStruct((b, fold_h, fwg, 128), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * fold_h * fwg * (
                2 * nt * c * (inner + mb + 2 * hb)      # fwd remat
                + 2 * nt * inner * (heads + hb)
                + 2 * hb * nt * heads
                + 2 * nt * c * (3 + 2 * hb + inner)     # bwd token passes
                + 2 * nt * inner * (2 * hb + c + heads)
            ),
            bytes_accessed=b * h * w * c * (2 * x.dtype.itemsize + 4),
            transcendentals=2 * b * fold_h * fwg * hb * nt,
        ),
        compiler_params=_block_compiler_params(),
        interpret=interpret,
    )(params, stats, x.astype(mxu), g.astype(mxu),
      wf_e.astype(mxu), bf_e[None].astype(f32),
      wv_e.astype(mxu), bv_e[None].astype(f32),
      w2_e.astype(mxu),
      pool_t, jnp.asarray(rep_np), jnp.asarray(hmask_np),
      jnp.asarray(headsel_np, mxu), rmask,
      jnp.asarray(rowhead, mxu), *res_args)


def _mixer_bwd_pallas_folded(x, g, stats, wf_e, bf_e, wv_e, bv_e, w2_e,
                             alpha, beta, heads, fold_h, fold_w, proposal_h,
                             proposal_w, s, interpret=False, residuals=None):
    """Lane-folded mixer backward: x/g are (B, H, W/s, s*C).  Returns the
    expanded-form weight-grad accumulators (folded to original shapes by
    _fused_mixer_block_bwd)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, wfo, sc = x.shape
    c = sc // s
    w = wfo * s
    inner = wf_e.shape[1]
    rh, rw = h // fold_h, w // fold_w
    n = rh * rw
    m = proposal_h * proposal_w
    gw = _group_w(fold_w, n)
    wt = gw * rw
    wtf = wt // s
    nt = rh * wt
    ntf = nt // s
    mb = gw * m
    hb = gw * heads * m
    fwg = fold_w // gw
    f32 = jnp.float32
    mxu = x.dtype

    pool_p = jnp.asarray(_pool_perm((rh, rw), (proposal_h, proposal_w), gw, s),
                         mxu)
    rep_np, hmask_np, _ = _replication_and_masks(gw, heads, m, inner)
    selbd_np = _headsel_bd(gw, heads, m, inner, s)
    rmask = jnp.asarray(_rmask_perm(gw, heads, m, rh, rw, s))
    blockmask = jnp.asarray(_fold_blockmask(nt, s, c), mxu)
    eye_sc = jnp.eye(sc, dtype=mxu)
    params = jnp.stack([alpha.astype(f32), beta.astype(f32)])
    wfb = wf_e.astype(mxu)
    wvb = wv_e.astype(mxu)
    w2b = w2_e.astype(mxu)

    kernel = functools.partial(
        _mixer_bwd_kernel_folded_res if residuals is not None
        else _mixer_bwd_kernel_folded,
        heads=heads, m=m, gw=gw, s=s, inner=inner)
    tile = pl.BlockSpec((1, rh, wtf, sc), lambda bi, i, j: (bi, i, j, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda bi, i, j: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda bi, i, j: (bi,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    seg = gw * heads
    res_specs, res_args = [], []
    if residuals is not None:
        rtile = lambda rows, cols: pl.BlockSpec(
            (1, 1, rows, cols), lambda bi, i, j: (bi, i * fwg + j, 0, 0),
            memory_space=pltpu.VMEM,
        )
        res_specs = [rtile(seg, nt), rtile(seg, nt),
                     rtile(hb, inner), rtile(hb, inner)]
        res_args = list(residuals)
    return pl.pallas_call(
        kernel,
        grid=(b, fold_h, fwg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile, tile,
            const((sc, s * inner)), const((1, s * inner)),
            const((sc, inner)), const((1, inner)),
            const((sc, inner)), const((1, inner)),
            const((sc, inner)),
            const((nt, mb)), const((hb, mb)), const((hb, inner)),
            const((s * inner, s * heads)), const((hb, nt)),
            const((s * heads, s * inner)),
            const((nt, sc)), const((sc, sc)),
        ] + res_specs,
        out_specs=[
            tile,
            acc((sc, s * inner)), acc((sc, inner)),
            acc((1, s * inner)), acc((1, inner)),
            acc((sc, inner)), acc((1, inner)),
            acc((inner, sc)), acc((1, sc)),
            pl.BlockSpec((1, 1, 1, 128), lambda bi, i, j: (bi, i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, sc, s * inner), f32),
            jax.ShapeDtypeStruct((b, sc, inner), f32),
            jax.ShapeDtypeStruct((b, 1, s * inner), f32),
            jax.ShapeDtypeStruct((b, 1, inner), f32),
            jax.ShapeDtypeStruct((b, sc, inner), f32),
            jax.ShapeDtypeStruct((b, 1, inner), f32),
            jax.ShapeDtypeStruct((b, inner, sc), f32),
            jax.ShapeDtypeStruct((b, 1, sc), f32),
            jax.ShapeDtypeStruct((b, fold_h, fwg, 128), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * fold_h * fwg * (
                2 * nt * c * (inner + mb + 2 * hb)
                + 2 * nt * inner * (heads + hb)
                + 2 * hb * nt * heads
                + 2 * nt * c * (3 + 2 * hb + inner)
                + 2 * nt * inner * (2 * hb + c + heads)
            ),
            bytes_accessed=b * h * w * c * (2 * x.dtype.itemsize + 4),
            transcendentals=2 * b * fold_h * fwg * hb * nt,
        ),
        compiler_params=_block_compiler_params(),
        interpret=interpret,
    )(params, stats, x.astype(mxu), g.astype(mxu),
      _bd_expand(wfb, s), jnp.tile(bf_e, s)[None].astype(f32),
      _row_tile(wfb, s), bf_e[None].astype(f32),
      _row_tile(wvb, s), bv_e[None].astype(f32),
      _row_tile(w2b.T, s),
      pool_p, jnp.asarray(rep_np), jnp.asarray(hmask_np),
      jnp.asarray(selbd_np, mxu), rmask, jnp.asarray(selbd_np.T, mxu),
      blockmask, eye_sc, *res_args)


def _fold_diag_blocks(w_exp, s):
    """(s*a, s*b) expanded grad -> (a, b): sum of the s diagonal blocks."""
    sa, sb = w_exp.shape
    a, bdim = sa // s, sb // s
    return sum(
        w_exp[p * a : (p + 1) * a, p * bdim : (p + 1) * bdim]
        for p in range(s)
    )


def _fold_row_blocks(w_exp, s):
    """(s*a, b) -> (a, b): sum of the s row blocks."""
    sa = w_exp.shape[0]
    a = sa // s
    return sum(w_exp[p * a : (p + 1) * a, :] for p in range(s))


def _fold_lane_blocks(w_exp, s):
    """(..., s*b) -> (..., b): sum of the s lane blocks."""
    sb = w_exp.shape[-1]
    bdim = sb // s
    return sum(w_exp[..., p * bdim : (p + 1) * bdim] for p in range(s))


def _fused_mixer_block_bwd(heads, fold_h, fold_w, proposal_h, proposal_w,
                           res, g, lane_fold=1):
    """Fused backward of the mixer half: one Pallas kernel (remat + cluster
    bwd core + folded-weight grad accumulators) + XLA GroupNorm backward +
    trace-time grad unfolding.  Replaces jax.vjp through the ref composition
    (~55 ms/step of XLA remat+grad chains at bs=64, BENCH_NOTES)."""
    (x, gn_scale, gn_bias, wf, bf, wv, bv, w2, b2, ls1, alpha, beta, stats,
     rpack) = res
    interpret = jax.default_backend() != "tpu"
    f32 = jnp.float32
    wf_e, bf_e = _fold_in(gn_scale, gn_bias, wf, bf)
    wv_e, bv_e = _fold_in(gn_scale, gn_bias, wv, bv)
    w2_e, _ = _fold_out(w2, b2, ls1)

    if lane_fold > 1:
        s = lane_fold
        (dxn, dwftok, dwfcin, dbftok, dbfcin, dwvp, dbvp, dw2p, db2p,
         dab) = _mixer_bwd_pallas(
            x, g, stats, wf_e, bf_e, wv_e, bv_e, w2_e,
            jnp.asarray(alpha), jnp.asarray(beta),
            heads, fold_h, fold_w, proposal_h, proposal_w, fold=s,
            interpret=interpret, residuals=rpack,
        )
        dwf_e = (_fold_diag_blocks(jnp.sum(dwftok, axis=0), s)
                 + _fold_row_blocks(jnp.sum(dwfcin, axis=0), s))
        dbf_e = (_fold_lane_blocks(jnp.sum(dbftok, axis=(0, 1)), s)
                 + jnp.sum(dbfcin, axis=(0, 1)))
        dwv_e = _fold_row_blocks(jnp.sum(dwvp, axis=0), s)
        dbv_e = jnp.sum(dbvp, axis=(0, 1))
        dw2_e = _fold_lane_blocks(jnp.sum(dw2p, axis=0), s)
        db2_e = _fold_lane_blocks(jnp.sum(db2p, axis=(0, 1)), s)
    else:
        (dxn, dwfp, dbfp, dwvp, dbvp, dw2p, db2p, dab) = _mixer_bwd_pallas(
            x, g, stats, wf_e, bf_e, wv_e, bv_e, w2_e,
            jnp.asarray(alpha), jnp.asarray(beta),
            heads, fold_h, fold_w, proposal_h, proposal_w,
            interpret=interpret, residuals=rpack,
        )
        dwf_e = jnp.sum(dwfp, axis=0)
        dbf_e = jnp.sum(dbfp, axis=(0, 1))
        dwv_e = jnp.sum(dwvp, axis=0)
        dbv_e = jnp.sum(dbvp, axis=(0, 1))
        dw2_e = jnp.sum(dw2p, axis=0)
        db2_e = jnp.sum(db2p, axis=(0, 1))
    d_alpha = jnp.sum(dab[..., 0]).astype(jnp.asarray(alpha).dtype)
    d_beta = jnp.sum(dab[..., 1]).astype(jnp.asarray(beta).dtype)
    s1 = jnp.sum(dab[..., 2], axis=(1, 2))           # (B,) per-sample GN sums
    s2 = jnp.sum(dab[..., 3], axis=(1, 2))

    # unfold: w_eff = gs[:,None]*w, b_eff = gb@w + b (both fc1 and fc_v);
    # w2_eff = w2*ls1, b2_eff = b2*ls1
    gsf = gn_scale.astype(f32)
    gbf = gn_bias.astype(f32)
    wff = wf.astype(f32)
    wvf = wv.astype(f32)
    w2f = w2.astype(f32)
    dwf = gsf[:, None] * dwf_e + gbf[:, None] * dbf_e[None, :]
    dwv = gsf[:, None] * dwv_e + gbf[:, None] * dbv_e[None, :]
    dgs = jnp.sum(dwf_e * wff, axis=1) + jnp.sum(dwv_e * wvf, axis=1)
    dgb = wff @ dbf_e + wvf @ dbv_e
    dw2 = dw2_e * ls1.astype(f32)[None, :]
    db2 = db2_e * ls1.astype(f32)
    dls1 = jnp.sum(dw2_e * w2f, axis=0) + db2_e * b2.astype(f32)

    # GroupNorm(1) input gradient + residual (see _fused_mlp_block_bwd),
    # with the per-sample sums already accumulated by the kernel
    n = float(x.shape[1] * x.shape[2] * x.shape[3])
    mu = stats[:, 0][:, None, None, None]
    rstd = stats[:, 1][:, None, None, None]
    xn = (x.astype(f32) - mu) * rstd
    m1 = (s1 / n)[:, None, None, None]
    m2 = (s2 / n)[:, None, None, None]
    dx = (g.astype(f32) + rstd * (dxn.astype(f32) - m1 - xn * m2)).astype(x.dtype)

    cast = lambda v, p: v.astype(jnp.asarray(p).dtype)
    return (dx, cast(dgs, gn_scale), cast(dgb, gn_bias), cast(dwf, wf),
            cast(dbf_e, bf), cast(dwv, wv), cast(dbv_e, bv), cast(dw2, w2),
            cast(db2, b2), cast(dls1, ls1), d_alpha, d_beta)


fused_mixer_block.defvjp(_fused_mixer_block_fwd, _fused_mixer_block_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16, 17))
def fused_mixer_block_stats(x, gn_scale, gn_bias, wf, bf, wv, bv, w2, b2, ls1,
                            alpha, beta, heads, fold_h, fold_w, proposal_h,
                            proposal_w, lane_fold=1):
    """Mixer half returning (out, gn_stats_of_out) for stats chaining:
    the kernel reduces the output moments in VMEM, so the chained MLP half
    (fused_mlp_block_pre) skips its own full-pass GN-stats reduce.

    With lane_fold=s>1 the input/output ride the lane-folded layout
    (B, H, W/s, s*C) — see lane_fold_choice; weights keep original shapes.

    INTERNAL protocol: the stats output must only feed fused_mlp_block_pre,
    whose backward returns a zero cotangent for it (the stats' dependence on
    x is reconstructed analytically inside each half's GroupNorm backward)."""
    return _mixer_fwd_impl(x, gn_scale, gn_bias, wf, bf, wv, bv, w2, b2, ls1,
                           alpha, beta, heads, fold_h, fold_w, proposal_h,
                           proposal_w, gn1_stats(x), lane_fold)


def _fused_mixer_block_stats_fwd(x, gn_scale, gn_bias, wf, bf, wv, bv, w2,
                                 b2, ls1, alpha, beta, heads, fold_h, fold_w,
                                 proposal_h, proposal_w, lane_fold=1):
    stats = gn1_stats(x)
    if _use_bwd_residuals():
        out, ostats, rpack = _mixer_fwd_impl(
            x, gn_scale, gn_bias, wf, bf, wv, bv, w2, b2, ls1, alpha, beta,
            heads, fold_h, fold_w, proposal_h, proposal_w, stats, lane_fold,
            want_residuals=True,
        )
    else:
        out, ostats = _mixer_fwd_impl(
            x, gn_scale, gn_bias, wf, bf, wv, bv, w2, b2, ls1, alpha, beta,
            heads, fold_h, fold_w, proposal_h, proposal_w, stats, lane_fold,
        )
        rpack = None
    return (out, ostats), (x, gn_scale, gn_bias, wf, bf, wv, bv, w2, b2, ls1,
                           alpha, beta, stats, rpack)


def _fused_mixer_block_stats_bwd(heads, fold_h, fold_w, proposal_h,
                                 proposal_w, lane_fold, res, g):
    gout, _gstats = g  # stats cotangent is zero under the chaining protocol
    return _fused_mixer_block_bwd(
        heads, fold_h, fold_w, proposal_h, proposal_w, res, gout,
        lane_fold=lane_fold,
    )


fused_mixer_block_stats.defvjp(
    _fused_mixer_block_stats_fwd, _fused_mixer_block_stats_bwd
)


# ---------------------------------------------------------------------------
# MLP half
# ---------------------------------------------------------------------------

def _mlp_rows(h: int, w: int, hidden: int = 128) -> int:
    """Rows per program: ~2048 tokens per tile, dividing H evenly.

    ASY_MLP_VMEM_MB (perf A/B knob, default off) instead bounds the live
    (nt, hidden) activation planes to that many MB at ~16 B/element (the bwd
    kernel's z1/act/grad chains at peak) — relevant for the lane-folded
    stage-1/2 MLPs whose hidden' = s*hidden = 1024 lanes make the fixed-2048
    tile carry ~30 MB of planes."""
    import os

    mb = int(os.environ.get("ASY_MLP_VMEM_MB", "0"))
    nt_cap = 2048
    if mb:
        nt_cap = max(128, (mb * 1024 * 1024) // (16 * hidden))
    th = max(1, nt_cap // w)
    while h % th:
        th -= 1
    return th


def mlp_block_supported(shape) -> bool:
    b, h, w, c = shape
    return h * w >= 8


def _erf_poly(x):
    """erf via Abramowitz-Stegun 7.1.26 (|error| <= 1.5e-7): Mosaic has no
    erf/erfc primitive.  The ~1e-7 absolute error on the exact-GELU parity
    path is far below bf16 activation resolution."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exactish(x):
    """Exact-erf GELU with the polynomial erf (torch nn.GELU parity)."""
    return 0.5 * x * (1.0 + _erf_poly(x * 0.7071067811865476))


def _mlp_block_kernel(stats_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      out_ref, *res_refs):
    """With a res_ref present, this is the TRAIN forward: it also stores the
    pre-GELU activations z1, which the residual backward consumes instead of
    re-running the fc1 matmul (VERDICT r4 #3)."""
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    blk = x_ref[0]                              # (th, W, C)
    th, w, c = blk.shape
    nt = th * w
    mxu = blk.dtype
    xf = blk.reshape(nt, c).astype(f32)
    bi = pl.program_id(0)
    xn = (xf - stats_ref[bi, 0]) * stats_ref[bi, 1]
    z1 = jax.lax.dot_general(
        xn.astype(mxu), w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b1_ref[0]
    if res_refs:
        res_refs[0][0, 0] = z1.astype(res_refs[0].dtype)
    h = _gelu_exactish(z1)
    y = jax.lax.dot_general(
        h.astype(mxu), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b2_ref[0]
    out_ref[0] = (xf + y).reshape(th, w, c).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "residuals"))
def _mlp_block_pallas(x, stats, w1, b1, w2, b2, interpret=False,
                      residuals=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    hidden = w1.shape[1]
    th = _mlp_rows(h, w, hidden)
    mxu = x.dtype
    tile = pl.BlockSpec((1, th, w, c), lambda bi, i: (bi, i, 0, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    nt = th * w
    out_specs = [tile]
    out_shape = [jax.ShapeDtypeStruct(x.shape, x.dtype)]
    if residuals:
        out_specs.append(pl.BlockSpec(
            (1, 1, nt, hidden), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        out_shape.append(
            jax.ShapeDtypeStruct((b, h // th, nt, hidden), x.dtype))
    outs = pl.pallas_call(
        _mlp_block_kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile,
            const((c, hidden)), const((1, hidden)),
            const((hidden, c)), const((1, c)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=b * (h // th) * 4 * nt * c * hidden,
            bytes_accessed=b * h * w * c * x.dtype.itemsize * 2,
            transcendentals=b * h * w * hidden,
        ),
        compiler_params=_block_compiler_params(2),
        interpret=interpret,
    )(stats, x.astype(mxu), w1.astype(mxu), b1[None].astype(jnp.float32),
      w2.astype(mxu), b2[None].astype(jnp.float32))
    if residuals:
        return outs[0], outs[1]
    return outs[0]


def _gelu_grad(z):
    """d/dz of exact GELU: Phi(z) + z*phi(z) with the polynomial erf.

    Note this is the analytic derivative of EXACT GELU, not of the
    `_erf_poly`-approximated forward the kernel computes, so the fused
    backward is not bit-exactly the VJP of its forward.  The mismatch is
    bounded by the polynomial's |erf - _erf_poly| <= ~1.5e-7 (times |z| for
    the pdf term), far below bf16 resolution — harmless, kept deliberately."""
    cdf = 0.5 * (1.0 + _erf_poly(z * 0.7071067811865476))
    pdf = jnp.exp(-0.5 * z * z) * 0.3989422804014327
    return cdf + z * pdf


def _gelu_act_and_grad(z):
    """(GELU(z), GELU'(z)) sharing ONE erf_poly evaluation.

    The A&S 7.1.26 polynomial's exp(-x^2) term at x = z/sqrt(2) IS the
    Gaussian pdf's exp(-z^2/2), so activation + derivative together cost one
    exp and one divide instead of the three exp / two divides of calling
    _gelu_exactish and _gelu_grad separately — the backward kernel's VPU
    transcendental budget halves.  The activation is bit-identical to
    _gelu_exactish; the derivative matches _gelu_grad to ~1e-8 rel (the
    0.7071...^2 vs 0.5 rounding of the exponent), inside the documented
    _gelu_grad tolerance above."""
    x = z * 0.7071067811865476
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    e = jnp.exp(-ax * ax)
    cdf = 0.5 * (1.0 + sign * (1.0 - poly * e))
    pdf = 0.3989422804014327 * e
    return z * cdf, cdf + z * pdf


def _mlp_bwd_kernel(stats_ref, x_ref, g_ref, w1_ref, b1_ref, w2_ref,
                    *refs):
    """Phase-1 fused backward of the MLP half.

    Per tile: rematerialise xn/z1/h in VMEM, compute dh -> dz1 -> dxn and the
    folded-weight gradient partials.  Weight-grad partials accumulate across
    the row tiles of each batch element (output blocks revisit (bi,0,0)), so
    the outputs stay batch-sharded and GSPMD-partitionable; XLA sums over
    batch afterwards.  The GroupNorm input gradient (a cross-tile reduction)
    is left to XLA — it fuses the remaining elementwise chain well.

    With a z1 residual ref present (7 trailing refs instead of 6), the
    stored pre-GELU activations replace the fc1 remat matmul
    (VERDICT r4 #3)."""
    from jax.experimental import pallas as pl

    if len(refs) == 7:
        z_ref, dxn_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dsum_ref = refs
    else:
        z_ref = None
        dxn_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dsum_ref = refs

    f32 = jnp.float32
    blk = x_ref[0]                                  # (th, W, C)
    th, w, c = blk.shape
    nt = th * w
    mxu = blk.dtype
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    xf = blk.reshape(nt, c).astype(f32)
    gout = g_ref[0].reshape(nt, c).astype(f32)
    xn = (xf - stats_ref[bi, 0]) * stats_ref[bi, 1]
    xnb = xn.astype(mxu)
    if z_ref is not None:
        z1 = z_ref[0, 0].astype(f32)
    else:
        z1 = jax.lax.dot_general(
            xnb, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + b1_ref[0]
    hact, dgelu = _gelu_act_and_grad(z1)

    gb = gout.astype(mxu)
    dh = jax.lax.dot_general(                        # dy @ w2^T -> (nt, hid)
        gb, w2_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=f32,
    )
    dz1 = dh * dgelu
    dz1b = dz1.astype(mxu)
    dxn = jax.lax.dot_general(                       # dz1 @ w1^T -> (nt, C)
        dz1b, w1_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=f32,
    )
    # dxn ships in the compute dtype (halves its HBM traffic in bf16); the
    # GroupNorm-backward sums are accumulated here in f32 first
    dxn_ref[0] = dxn.reshape(th, w, c).astype(dxn_ref.dtype)

    pdw1 = jax.lax.dot_general(                      # xn^T @ dz1 -> (C, hid)
        xnb, dz1b, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )
    pdw2 = jax.lax.dot_general(                      # h^T @ dy -> (hid, C)
        hact.astype(mxu), gb, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    pdb1 = jnp.sum(dz1, axis=0, keepdims=True)       # (1, hid)
    pdb2 = jnp.sum(gout, axis=0, keepdims=True)      # (1, C)
    # per-sample GN-backward partials: lane0 = sum dxn, lane1 = sum dxn*xn
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    psum = jnp.where(
        lane == 0, jnp.sum(dxn),
        jnp.where(lane == 1, jnp.sum(dxn * xn), 0.0),
    )

    @pl.when(ti == 0)
    def _init():
        dw1_ref[0] = pdw1
        db1_ref[0] = pdb1
        dw2_ref[0] = pdw2
        db2_ref[0] = pdb2
        dsum_ref[0] = psum

    @pl.when(ti != 0)
    def _accum():
        dw1_ref[0] += pdw1
        db1_ref[0] += pdb1
        dw2_ref[0] += pdw2
        db2_ref[0] += pdb2
        dsum_ref[0] += psum


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mlp_bwd_pallas(x, g, stats, w1_eff, b1_eff, w2_eff, interpret=False,
                    z_res=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    hidden = w1_eff.shape[1]
    th = _mlp_rows(h, w, hidden)
    mxu = x.dtype
    f32 = jnp.float32
    tile = pl.BlockSpec((1, th, w, c), lambda bi, ti: (bi, ti, 0, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda bi, ti: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec((1,) + shape, lambda bi, ti: (bi,) + (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    nt = th * w
    res_specs, res_args = [], []
    if z_res is not None:
        res_specs = [pl.BlockSpec((1, 1, nt, hidden),
                                  lambda bi, ti: (bi, ti, 0, 0),
                                  memory_space=pltpu.VMEM)]
        res_args = [z_res]
    return pl.pallas_call(
        _mlp_bwd_kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile, tile,
            const((c, hidden)), const((1, hidden)), const((hidden, c)),
        ] + res_specs,
        out_specs=[
            tile,
            acc((c, hidden)), acc((1, hidden)), acc((hidden, c)), acc((1, c)),
            acc((1, 128)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, c, hidden), f32),
            jax.ShapeDtypeStruct((b, 1, hidden), f32),
            jax.ShapeDtypeStruct((b, hidden, c), f32),
            jax.ShapeDtypeStruct((b, 1, c), f32),
            jax.ShapeDtypeStruct((b, 1, 128), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * (h // th) * 8 * nt * c * hidden,
            bytes_accessed=b * h * w * c * (2 * x.dtype.itemsize + 4),
            transcendentals=2 * b * h * w * hidden,
        ),
        compiler_params=_block_compiler_params(2),
        interpret=interpret,
    )(stats, x.astype(mxu), g.astype(mxu),
      w1_eff.astype(mxu), b1_eff[None].astype(f32), w2_eff.astype(mxu),
      *res_args)


def _mlp_block_ref(x, gn_scale, gn_bias, w1, b1, w2, b2, ls2):
    f32 = jnp.float32
    mxu = x.dtype
    stats = gn1_stats(x)
    w1_e, b1_e = _fold_in(gn_scale, gn_bias, w1, b1)
    w2_e, b2_e = _fold_out(w2, b2, ls2)
    xf = x.astype(f32)
    xn = (xf - stats[:, None, None, None, 0]) * stats[:, None, None, None, 1]
    h = jnp.einsum("bhwc,cd->bhwd", xn.astype(mxu), w1_e.astype(mxu),
                   preferred_element_type=f32) + b1_e
    h = jax.nn.gelu(h, approximate=False)
    y = jnp.einsum("bhwd,dc->bhwc", h.astype(mxu), w2_e.astype(mxu),
                   preferred_element_type=f32) + b2_e
    return (xf + y).astype(x.dtype)


def _use_mlp_residuals() -> bool:
    """z1 residual for the MLP backward (VERDICT r4 #3): the train forward
    stores the pre-GELU activations and the backward skips the fc1 remat
    matmul.  DEFAULT OFF (round-5 measurement): z1 is the FULL hidden
    activation plane (B*H*W*hidden bf16 ~ 4 MB/img/block, ~27 blocks), which
    OOMs the bs=128-without-remat production config on a 16 GB chip, and its
    bs=64 step gain is inside chained-protocol noise (~6 ms of 154 on grad,
    ~0 on step) — the HBM write+read of the plane costs about what the fc1
    remat matmul saves.  The MIXER residuals (cbest/argf/c_rep/oc, KB-scale)
    stay on: mixer bwd 59.86 -> 53.56 ms at bs=128 (trace, round 5).
    A/B switch: ASY_MLP_BWD_RESIDUALS=1 opts back in."""
    import os

    return os.environ.get("ASY_MLP_BWD_RESIDUALS", "0") == "1"


@jax.custom_vjp
def fused_mlp_block(x, gn_scale, gn_bias, w1, b1, w2, b2, ls2):
    """MLP half of ClusterBlock as ONE Pallas kernel (+ XLA stats).
    Weight layouts: w1 (C, hidden), w2 (hidden, C)."""
    interpret = jax.default_backend() != "tpu"
    stats = gn1_stats(x)
    w1_e, b1_e = _fold_in(gn_scale, gn_bias, w1, b1)
    w2_e, b2_e = _fold_out(w2, b2, ls2)
    return _mlp_block_pallas(x, stats, w1_e, b1_e, w2_e, b2_e,
                             interpret=interpret)


def _fused_mlp_block_fwd(x, gn_scale, gn_bias, w1, b1, w2, b2, ls2):
    # stats threaded through the residuals (see _fused_mixer_block_fwd)
    interpret = jax.default_backend() != "tpu"
    stats = gn1_stats(x)
    w1_e, b1_e = _fold_in(gn_scale, gn_bias, w1, b1)
    w2_e, b2_e = _fold_out(w2, b2, ls2)
    if _use_mlp_residuals():
        out, z_res = _mlp_block_pallas(x, stats, w1_e, b1_e, w2_e, b2_e,
                                       interpret=interpret, residuals=True)
    else:
        out = _mlp_block_pallas(x, stats, w1_e, b1_e, w2_e, b2_e,
                                interpret=interpret)
        z_res = None
    return out, (x, gn_scale, gn_bias, w1, b1, w2, b2, ls2, stats, z_res)


def _fused_mlp_block_bwd(res, g, lane_fold=1):
    """Fused backward: phase-1 Pallas kernel (dxn + folded-weight grad
    accumulators, one read of x and g) + XLA phase 2 (GroupNorm(1) input
    gradient — a per-sample cross-tile reduction — fused with the residual
    add) + trace-time unfolding of the folded-weight grads to the original
    parameters.  Replaces jax.vjp through the ref composition, which cost
    ~35 ms/step at bs=64 in unfused XLA remat+grad chains (BENCH_NOTES).

    With lane_fold=s>1 x/g are lane-folded and the kernel runs on
    block-diagonal expanded weights; grads fold back here."""
    x, gn_scale, gn_bias, w1, b1, w2, b2, ls2, stats, z_res = res
    interpret = jax.default_backend() != "tpu"
    f32 = jnp.float32
    w1_e, b1_e = _fold_in(gn_scale, gn_bias, w1, b1)
    w2_e, _ = _fold_out(w2, b2, ls2)

    if lane_fold > 1:
        s = lane_fold
        dxn, dw1p, db1p, dw2p, db2p, dsump = _mlp_bwd_pallas(
            x, g, stats, _bd_expand(w1_e, s), jnp.tile(b1_e, s),
            _bd_expand(w2_e, s), interpret=interpret, z_res=z_res,
        )
        dw1_e = _fold_diag_blocks(jnp.sum(dw1p, axis=0), s)
        db1_e = _fold_lane_blocks(jnp.sum(db1p, axis=(0, 1)), s)
        dw2_e = _fold_diag_blocks(jnp.sum(dw2p, axis=0), s)
        db2_e = _fold_lane_blocks(jnp.sum(db2p, axis=(0, 1)), s)
    else:
        dxn, dw1p, db1p, dw2p, db2p, dsump = _mlp_bwd_pallas(
            x, g, stats, w1_e, b1_e, w2_e, interpret=interpret, z_res=z_res
        )
        dw1_e = jnp.sum(dw1p, axis=0)                # (C, hid)
        db1_e = jnp.sum(db1p, axis=(0, 1))           # (hid,)
        dw2_e = jnp.sum(dw2p, axis=0)                # (hid, C)
        db2_e = jnp.sum(db2p, axis=(0, 1))           # (C,)

    # unfold to the original params:
    #   w1_eff = gs[:,None]*w1,  b1_eff = gb@w1 + b1,
    #   w2_eff = w2*ls,          b2_eff = b2*ls
    w1f = w1.astype(f32)
    w2f = w2.astype(f32)
    dw1 = gn_scale.astype(f32)[:, None] * dw1_e + gn_bias.astype(f32)[:, None] * db1_e[None, :]
    dgs = jnp.sum(dw1_e * w1f, axis=1)
    dgb = w1f @ db1_e
    db1 = db1_e
    dw2 = dw2_e * ls2.astype(f32)[None, :]
    db2 = db2_e * ls2.astype(f32)
    dls2 = jnp.sum(dw2_e * w2f, axis=0) + db2_e * b2.astype(f32)

    # phase 2: GroupNorm(1) input gradient + the residual path, with the
    # per-sample sums already accumulated by the kernel:
    #   dx = g + rstd * (dxn - mean(dxn) - xn * mean(dxn*xn))
    n = float(x.shape[1] * x.shape[2] * x.shape[3])
    mu = stats[:, 0][:, None, None, None]
    rstd = stats[:, 1][:, None, None, None]
    xn = (x.astype(f32) - mu) * rstd
    m1 = (dsump[:, 0, 0] / n)[:, None, None, None]
    m2 = (dsump[:, 0, 1] / n)[:, None, None, None]
    dx = (g.astype(f32) + rstd * (dxn.astype(f32) - m1 - xn * m2)).astype(x.dtype)

    cast = lambda v, p: v.astype(p.dtype)
    return (dx, cast(dgs, gn_scale), cast(dgb, gn_bias), cast(dw1, w1),
            cast(db1, b1), cast(dw2, w2), cast(db2, b2), cast(dls2, ls2))


fused_mlp_block.defvjp(_fused_mlp_block_fwd, _fused_mlp_block_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def fused_mlp_block_pre(x, stats, gn_scale, gn_bias, w1, b1, w2, b2, ls2,
                        lane_fold=1):
    """MLP half consuming pre-reduced GN stats of x (stats chaining — see
    fused_mixer_block_stats).  `stats` MUST equal gn1_stats(x) numerically;
    its cotangent is zero because the GroupNorm backward reconstructs the
    stats' dependence on x analytically.

    With lane_fold=s>1, x is lane-folded (B, H, W/s, s*C): the kernel interior
    is layout-agnostic, so folding is just block-diagonal weight expansion."""
    interpret = jax.default_backend() != "tpu"
    w1_e, b1_e = _fold_in(gn_scale, gn_bias, w1, b1)
    w2_e, b2_e = _fold_out(w2, b2, ls2)
    if lane_fold > 1:
        s = lane_fold
        w1_e, b1_e = _bd_expand(w1_e, s), jnp.tile(b1_e, s)
        w2_e, b2_e = _bd_expand(w2_e, s), jnp.tile(b2_e, s)
    return _mlp_block_pallas(x, stats, w1_e, b1_e, w2_e, b2_e,
                             interpret=interpret)


def _fused_mlp_block_pre_fwd(x, stats, gn_scale, gn_bias, w1, b1, w2, b2, ls2,
                             lane_fold=1):
    interpret = jax.default_backend() != "tpu"
    w1_e, b1_e = _fold_in(gn_scale, gn_bias, w1, b1)
    w2_e, b2_e = _fold_out(w2, b2, ls2)
    if lane_fold > 1:
        s = lane_fold
        w1_e, b1_e = _bd_expand(w1_e, s), jnp.tile(b1_e, s)
        w2_e, b2_e = _bd_expand(w2_e, s), jnp.tile(b2_e, s)
    if _use_mlp_residuals():
        out, z_res = _mlp_block_pallas(x, stats, w1_e, b1_e, w2_e, b2_e,
                                       interpret=interpret, residuals=True)
    else:
        out = _mlp_block_pallas(x, stats, w1_e, b1_e, w2_e, b2_e,
                                interpret=interpret)
        z_res = None
    return out, (x, gn_scale, gn_bias, w1, b1, w2, b2, ls2, stats, z_res)


def _fused_mlp_block_pre_bwd(lane_fold, res, g):
    stats = res[8]
    dx, dgs, dgb, dw1, db1, dw2, db2, dls2 = _fused_mlp_block_bwd(
        res, g, lane_fold=lane_fold)
    return dx, jnp.zeros_like(stats), dgs, dgb, dw1, db1, dw2, db2, dls2


fused_mlp_block_pre.defvjp(_fused_mlp_block_pre_fwd, _fused_mlp_block_pre_bwd)
