"""Fused Pallas TPU kernel for the cluster token mixer.

Three generations of lowering, measured on a v5e chip (stage-1 shape,
batch 32: (B,128,128,128), 4 heads, fold 8, 2x2 proposals):

  1. XLA batched einsums (ops/cluster.py): ~19 ms.  M=4 proposals makes the
     centers/dispatch contractions thousands of micro-matmuls; the MXU idles.
  2. Pallas with host-side fold into (G, D, Nb) region groups: kernel itself
     ~1.7 ms but the host fold/unfold transposes cost ~8 ms — the data
     movement dominated.
  3. THIS kernel: no host reshapes at all.  The grid tiles the NHWC array
     directly — one program per (batch, region-row, region-column-group)
     rectangular tile — and all per-head/per-region structure is expressed as
     dense matmuls over the full channel axis with precomputed masks:

       X            : (Nt, C) tile tokens (Nt = rh * gw*rw, flattened raster)
       C_pre        = P @ X          P: (Mb, Nt) block pooling matrix (dense)
       cn_full      : (Hb, C) per-(region, head, proposal) centers, zero
                      outside the head's channel slice, L2-normalised on it
       xn_full      : (Nt, C) tokens with per-head inverse norms baked in
       S            = sigmoid(b + a * cn_full @ xn_full^T)   k = C >= 128
       mask to the (region, head) block-diagonal; per-head first-max assign
       OC           = (S @ V + VC) / (count + 1), channel-masked
       OUT          = S^T @ OC                               k = Hb

     Every contraction has k in {C, Nt, Hb} >= 128: the MXU stays dense.  The
     cross-head/cross-region entries are wasted flops at full MXU rate —
     ~16x redundancy that still beats 95%-idle micro-matmuls by an order of
     magnitude.  Measured: stage-1 mix 19 ms -> ~1.5 ms.

Backward: custom VJP rematerialising through the jnp reference
(ops/cluster.py) — identical gradients, no saved intermediates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from asy_vrnet_tpu.ops.cluster import cluster_mix
from asy_vrnet_tpu.ops.resize import _adaptive_avg_matrix

_TARGET_TOKENS = 2048
_MAX_TOKENS_PER_REGION = 8192
_MAX_SIM_ROWS = 512


def _group_w(fold_w: int, region_tokens: int) -> int:
    """Regions grouped along W per program: largest divisor of fold_w with
    group tokens <= max(_TARGET_TOKENS, region_tokens)."""
    best = 1
    cap = max(_TARGET_TOKENS, region_tokens)
    for gw in range(1, fold_w + 1):
        if fold_w % gw == 0 and gw * region_tokens <= cap:
            best = gw
    return best


def pallas_supported(shape, *, heads, fold_h, fold_w, proposal_h, proposal_w) -> bool:
    b, h, w, c = shape
    if h % fold_h or w % fold_w or c % heads:
        return False
    rh, rw = h // fold_h, w // fold_w
    n = rh * rw
    if not (8 <= n <= _MAX_TOKENS_PER_REGION):
        return False
    d = c // heads
    if d < 8:
        return False
    gw = _group_w(fold_w, n)
    hb = gw * heads * proposal_h * proposal_w
    return hb <= _MAX_SIM_ROWS


@functools.lru_cache(maxsize=None)
def _tile_pool_matrix_t(region_hw, proposal_hw, gw: int) -> np.ndarray:
    """(Nt, Mb) pooling matrix over the flattened (rh, gw*rw) tile raster.

    Center row order: (proposal, region-in-group) — proposal-major so the
    kernel can take contiguous row slices per proposal index.
    """
    rh, rw = region_hw
    ph, pw = proposal_hw
    mh = _adaptive_avg_matrix(rh, ph)   # (ph, rh)
    mw = _adaptive_avg_matrix(rw, pw)   # (pw, rw)
    m = ph * pw
    nt = rh * gw * rw
    out = np.zeros((m * gw, nt), np.float32)
    for g in range(gw):
        for pi in range(ph):
            for pj in range(pw):
                mm = pi * pw + pj
                row = mm * gw + g
                w_col = np.zeros((rh, gw * rw), np.float32)
                w_col[:, g * rw : (g + 1) * rw] = np.outer(mh[pi], mw[pj])
                out[row] = w_col.reshape(-1)
    return np.ascontiguousarray(out.T)


@functools.lru_cache(maxsize=None)
def _region_mask(gw: int, heads: int, m: int, rh: int, rw: int) -> np.ndarray:
    """(Hb, Nt) 1/0 mask: sim row (proposal, region, head) sees only the
    tokens of its own region.  Precomputed once — computing it in-kernel
    costs several VPU passes of iota/mod/div/compare per program."""
    wt = gw * rw
    nt = rh * wt
    seg = gw * heads
    hb = m * seg
    rows = np.arange(hb)
    row_region = (rows % seg) // heads
    cols = np.arange(nt)
    col_region = (cols % wt) // rw
    return (row_region[:, None] == col_region[None, :]).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _replication_and_masks(gw: int, heads: int, m: int, c: int):
    """Static matrices for the kernel, all row-ordered (proposal, region, head):

      rep   (Hb, Mb): 0/1, replicates C_pre row (mm, r) to rows (mm, r, h)
      hmask (Hb, C) : 1.0 where the channel belongs to the row's head
      headsel (C, heads): channel -> head indicator (for per-head token norms)
    """
    d = c // heads
    mb = m * gw
    hb = m * gw * heads
    rep = np.zeros((hb, mb), np.float32)
    hmask = np.zeros((hb, c), np.float32)
    for mm in range(m):
        for g in range(gw):
            for h in range(heads):
                row = (mm * gw + g) * heads + h
                rep[row, mm * gw + g] = 1.0
                hmask[row, h * d : (h + 1) * d] = 1.0
    headsel = np.zeros((c, heads), np.float32)
    for ch in range(c):
        headsel[ch, ch // d] = 1.0
    return rep, hmask, headsel


def _mixer_core(xb, vb, alpha, beta, pool_t, rep, hmask, headsel, rmask, *,
                heads: int, m: int, gw: int, rw: int, wt: int):
    """Shared mixer body over flattened (Nt, C) tokens in the MXU dtype.

    Rows are ordered (proposal, region, head) so all per-proposal row groups
    are CONTIGUOUS slices — Mosaic supports neither lane- nor
    sublane-splitting reshapes, so replication and per-head norms are matmuls
    and the per-(region,head) argmax is an unrolled max over m static slices.
    `xb`/`vb` carry the model compute dtype (bf16 in production; f32 exact);
    every contraction accumulates in f32.  `rmask` is the precomputed (Hb,Nt)
    region mask.  Returns the mixed (Nt, C) f32 tokens.
    """
    f32 = jnp.float32
    nt, c = xb.shape
    mxu = xb.dtype
    seg = gw * heads                            # rows per proposal index

    # pooling with mxu-dtype operands (the jnp reference path also pools in
    # the compute dtype); f32 accumulation
    c_pre = jax.lax.dot_general(
        pool_t, xb, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )                                           # (Mb, C)
    vc_pre = jax.lax.dot_general(
        pool_t, vb, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )
    c_rep = jnp.dot(rep, c_pre, preferred_element_type=f32) * hmask     # (Hb, C)
    vc_full = jnp.dot(rep, vc_pre, preferred_element_type=f32) * hmask

    cn = c_rep * jax.lax.rsqrt(jnp.sum(c_rep * c_rep, axis=1, keepdims=True) + 1e-12)
    # per-head token norms via the head-indicator matmul
    xf = xb.astype(f32)
    norm2 = jnp.dot(xf * xf, headsel, preferred_element_type=f32)       # (Nt, heads)
    inv_full = jax.lax.dot_general(
        jax.lax.rsqrt(norm2 + 1e-12), headsel, (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )                                           # (Nt, C)
    xn = xf * inv_full

    s = jax.nn.sigmoid(
        beta + alpha * jax.lax.dot_general(
            cn.astype(mxu), xn.astype(mxu), (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
    )                                           # (Hb, Nt)

    # out-of-region entries -> -1 so they can never win the assignment
    sim = s * rmask + (rmask - 1.0)

    # first-max assignment over the m proposals of each (region, head):
    # proposal mm owns contiguous rows [mm*seg, (mm+1)*seg)
    best = sim[0:seg]
    arg = jnp.zeros_like(best, dtype=jnp.int32)
    for mm in range(1, m):
        part = sim[mm * seg : (mm + 1) * seg]
        better = part > best                    # strict > keeps the first max
        best = jnp.where(better, part, best)
        arg = jnp.where(better, mm, arg)
    mask = jnp.concatenate(
        [(arg == mm).astype(f32) for mm in range(m)], axis=0
    ) * rmask                                   # (Hb, Nt)
    sim = s * mask

    counts = jnp.sum(mask, axis=1, keepdims=True)       # (Hb, 1)
    agg = jax.lax.dot_general(
        sim.astype(mxu), vb, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                   # (Hb, C)
    oc = ((agg + vc_full) / (counts + 1.0)) * hmask

    out = jax.lax.dot_general(
        sim.astype(mxu), oc.astype(mxu), (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                   # (Nt, C)
    return out


def _cluster_kernel(params_ref, x_ref, v_ref, pool_ref, rep_ref, hmask_ref,
                    headsel_ref, rmask_ref, out_ref, *, heads: int, m: int,
                    gw: int, rw: int):
    alpha = params_ref[0]
    beta = params_ref[1]
    blk = x_ref[0]                              # (rh, gw*rw, C)
    rh, wt, c = blk.shape
    nt = rh * wt
    x = blk.reshape(nt, c)
    v = v_ref[0].reshape(nt, c)

    out = _mixer_core(
        x, v, alpha, beta,
        pool_ref[:], rep_ref[:], hmask_ref[:], headsel_ref[:], rmask_ref[:],
        heads=heads, m=m, gw=gw, rw=rw, wt=wt,
    )
    out_ref[0] = out.reshape(rh, wt, c).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "fold_h", "fold_w", "proposal_h", "proposal_w",
                     "interpret"),
)
def _cluster_nhwc_pallas(
    feat: jnp.ndarray,      # (B, H, W, C) NHWC
    value: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: jnp.ndarray,
    heads: int,
    fold_h: int,
    fold_w: int,
    proposal_h: int,
    proposal_w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = feat.shape
    rh, rw = h // fold_h, w // fold_w
    n = rh * rw
    m = proposal_h * proposal_w
    gw = _group_w(fold_w, n)
    wt = gw * rw
    nt = rh * wt
    mb = gw * m
    hb = gw * heads * m

    mxu = feat.dtype
    pool_t = jnp.asarray(
        _tile_pool_matrix_t((rh, rw), (proposal_h, proposal_w), gw), mxu)
    rep_np, hmask_np, headsel_np = _replication_and_masks(gw, heads, m, c)
    rep = jnp.asarray(rep_np)
    hmask = jnp.asarray(hmask_np)
    headsel = jnp.asarray(headsel_np)
    rmask = jnp.asarray(_region_mask(gw, heads, m, rh, rw))
    params = jnp.stack([alpha.astype(jnp.float32), beta.astype(jnp.float32)])

    kernel = functools.partial(_cluster_kernel, heads=heads, m=m, gw=gw, rw=rw)
    grid = (b, fold_h, fold_w // gw)
    flops_per = 2 * nt * c * (mb + 2 * hb) + 2 * hb * nt
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rh, wt, c), lambda bi, i, j: (bi, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rh, wt, c), lambda bi, i, j: (bi, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, mb), lambda bi, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, mb), lambda bi, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, c), lambda bi, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, heads), lambda bi, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, nt), lambda bi, i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rh, wt, c), lambda bi, i, j: (bi, i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(feat.shape, feat.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * fold_h * (fold_w // gw) * flops_per,
            bytes_accessed=b * h * w * c * feat.dtype.itemsize * 3,
            transcendentals=b * fold_h * (fold_w // gw) * hb * nt,
        ),
        interpret=interpret,
    )(params, feat, value, pool_t, rep, hmask, headsel, rmask)


def _mixer_core_bwd(xb, vb, g, alpha, beta, pool_t, rep, hmask, headsel,
                    rmask, *, heads: int, m: int, gw: int, rw: int):
    """Shared fused-backward body over flattened (Nt, C) tokens.

    Recomputes the forward's sim/mask (rematerialisation in VMEM), then
    propagates the cotangent through dispatch -> aggregate -> sigmoid ->
    cosine-sim -> normalisations -> pooling as dense matmuls against the
    same precomputed mask matrices.  The hard assignment is treated as a
    constant (identical to autograd through argmax/one_hot).  Returns
    (dx (Nt,C) f32, dv (Nt,C) f32, d_alpha scalar, d_beta scalar).
    Reused by the standalone cluster bwd kernel and the fused mixer-block
    bwd kernel (ops/block_pallas.py)."""
    f32 = jnp.float32
    nt, c = xb.shape
    x = xb.astype(f32)
    v = vb.astype(f32)
    seg = gw * heads

    # ---- recompute forward (pooling with the same mxu-dtype operands as
    # the forward kernel) ----
    c_pre = jax.lax.dot_general(pool_t, xb, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
    vc_pre = jax.lax.dot_general(pool_t, vb, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
    c_rep = jnp.dot(rep, c_pre, preferred_element_type=f32) * hmask
    vc_full = jnp.dot(rep, vc_pre, preferred_element_type=f32) * hmask

    inv_c = jax.lax.rsqrt(jnp.sum(c_rep * c_rep, axis=1, keepdims=True) + 1e-12)
    cn = c_rep * inv_c
    norm2 = jnp.dot(x * x, headsel, preferred_element_type=f32)
    inv_full = jax.lax.dot_general(
        jax.lax.rsqrt(norm2 + 1e-12), headsel, (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    xn = x * inv_full

    # Rematerialise sim with the SAME operand casts as the forward kernel
    # (bf16 MXU operands when the model runs bf16): near-tie tokens must not
    # flip their argmax proposal between forward and backward, or gradients
    # would flow through a different assignment than the actual output used.
    mxu = xb.dtype
    raw = jax.lax.dot_general(cn.astype(mxu), xn.astype(mxu),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)       # (Hb, Nt)
    s = jax.nn.sigmoid(beta + alpha * raw)

    s_m = s * rmask + (rmask - 1.0)
    best = s_m[0:seg]
    arg = jnp.zeros_like(best, dtype=jnp.int32)
    for mm in range(1, m):
        part = s_m[mm * seg : (mm + 1) * seg]
        better = part > best
        best = jnp.where(better, part, best)
        arg = jnp.where(better, mm, arg)
    mask = jnp.concatenate([(arg == mm).astype(f32) for mm in range(m)], axis=0)
    mask = mask * rmask
    sim = s * mask

    counts = jnp.sum(mask, axis=1, keepdims=True)
    inv_cnt = 1.0 / (counts + 1.0)
    agg = jax.lax.dot_general(sim.astype(mxu), vb, (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
    oc = ((agg + vc_full) * inv_cnt) * hmask

    # ---- backward ----
    # OUT = sim^T @ oc
    d_oc = jnp.dot(sim, g, preferred_element_type=f32)          # (Hb, C)
    d_sim = jax.lax.dot_general(oc, g, (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)     # (Hb, Nt)
    # oc = ((agg + vc_full) * inv_cnt) * hmask
    d_num = d_oc * hmask * inv_cnt                              # (Hb, C)
    # agg = sim @ v
    d_sim = d_sim + jax.lax.dot_general(
        d_num, v, (((1,), (1,)), ((), ())), preferred_element_type=f32,
    )
    dv = jax.lax.dot_general(sim, d_num, (((0,), (0,)), ((), ())),
                             preferred_element_type=f32)        # (Nt, C)
    # vc path: vc_full = (rep @ (pool^T v)) * hmask; d_num already hmask'd
    d_vc_pre = jax.lax.dot_general(rep, d_num, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)  # (Mb, C)
    pool_f32 = pool_t.astype(f32)
    dv = dv + jnp.dot(pool_f32, d_vc_pre, preferred_element_type=f32)

    # sim = sigmoid(beta + alpha*raw) * mask (mask, counts constant)
    d_s = d_sim * mask
    sig_grad = d_s * s * (1.0 - s)
    d_raw = sig_grad * alpha
    d_alpha = jnp.sum(sig_grad * raw)
    d_beta = jnp.sum(sig_grad)

    # raw = cn @ xn^T
    d_cn = jnp.dot(d_raw, xn, preferred_element_type=f32)       # (Hb, C)
    d_xn = jax.lax.dot_general(d_raw, cn, (((0,), (0,)), ((), ())),
                               preferred_element_type=f32)      # (Nt, C)

    # xn = x * inv_full (per-head L2 normalise)
    dot_h = jnp.dot(xn * d_xn, headsel, preferred_element_type=f32)  # (Nt, heads)
    dot_full = jax.lax.dot_general(dot_h, headsel, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)  # (Nt, C)
    dx = inv_full * (d_xn - xn * dot_full)

    # cn = c_rep * inv_c (rows single-head; rowwise normalise)
    dot_c = jnp.sum(cn * d_cn, axis=1, keepdims=True)
    d_c_rep = inv_c * (d_cn - cn * dot_c)
    d_c_pre = jax.lax.dot_general(rep, d_c_rep * hmask, (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)   # (Mb, C)
    dx = dx + jnp.dot(pool_f32, d_c_pre, preferred_element_type=f32)
    return dx, dv, d_alpha, d_beta


def _cluster_bwd_kernel(params_ref, x_ref, v_ref, g_ref, pool_ref, rep_ref,
                        hmask_ref, headsel_ref, rmask_ref, dx_ref, dv_ref,
                        dab_ref, *, heads: int, m: int, gw: int, rw: int):
    """Standalone cluster bwd kernel: the shared core + per-program dab
    partials packed into lanes 0/1 of a (1,128) row."""
    alpha = params_ref[0]
    beta = params_ref[1]
    blk = x_ref[0]
    rh, wt, c = blk.shape
    nt = rh * wt
    dx, dv, d_alpha, d_beta = _mixer_core_bwd(
        blk.reshape(nt, c), v_ref[0].reshape(nt, c),
        g_ref[0].reshape(nt, c).astype(jnp.float32), alpha, beta,
        pool_ref[:], rep_ref[:], hmask_ref[:], headsel_ref[:], rmask_ref[:],
        heads=heads, m=m, gw=gw, rw=rw,
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    dab_ref[0, 0] = jnp.where(
        lane == 0, d_alpha, jnp.where(lane == 1, d_beta, 0.0)
    )
    dx_ref[0] = dx.reshape(rh, wt, c).astype(dx_ref.dtype)
    dv_ref[0] = dv.reshape(rh, wt, c).astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "fold_h", "fold_w", "proposal_h", "proposal_w",
                     "interpret"),
)
def _cluster_nhwc_pallas_bwd(feat, value, g, alpha, beta, heads, fold_h,
                             fold_w, proposal_h, proposal_w, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = feat.shape
    rh, rw = h // fold_h, w // fold_w
    n = rh * rw
    m = proposal_h * proposal_w
    gw = _group_w(fold_w, n)
    wt = gw * rw
    nt = rh * wt
    mb = gw * m
    hb = gw * heads * m
    fwg = fold_w // gw

    pool_t = jnp.asarray(
        _tile_pool_matrix_t((rh, rw), (proposal_h, proposal_w), gw), feat.dtype)
    rep_np, hmask_np, headsel_np = _replication_and_masks(gw, heads, m, c)
    rmask = jnp.asarray(_region_mask(gw, heads, m, rh, rw))
    params = jnp.stack([alpha.astype(jnp.float32), beta.astype(jnp.float32)])

    kernel = functools.partial(_cluster_bwd_kernel, heads=heads, m=m, gw=gw, rw=rw)
    tile_spec = pl.BlockSpec((1, rh, wt, c), lambda bi, i, j: (bi, i, j, 0),
                             memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda bi, i, j: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    dx, dv, dab = pl.pallas_call(
        kernel,
        grid=(b, fold_h, fwg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile_spec, tile_spec, tile_spec,
            const((nt, mb)), const((hb, mb)), const((hb, c)), const((c, heads)),
            const((hb, nt)),
        ],
        out_specs=(
            tile_spec, tile_spec,
            pl.BlockSpec((1, 1, 1, 128), lambda bi, i, j: (bi, i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(feat.shape, feat.dtype),
            jax.ShapeDtypeStruct(feat.shape, feat.dtype),
            jax.ShapeDtypeStruct((b, fold_h, fwg, 128), jnp.float32),
        ),
        interpret=interpret,
    )(params, feat, value, g, pool_t, jnp.asarray(rep_np),
      jnp.asarray(hmask_np), jnp.asarray(headsel_np), rmask)
    dalpha = jnp.sum(dab[..., 0]).astype(alpha.dtype)
    dbeta = jnp.sum(dab[..., 1]).astype(beta.dtype)
    return dx, dv, dalpha, dbeta


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(4, 5, 6, 7, 8),
)
def _cluster_fused(feat, value, alpha, beta, heads, fold_h, fold_w,
                   proposal_h, proposal_w):
    interpret = jax.default_backend() != "tpu"
    return _cluster_nhwc_pallas(
        feat, value, alpha, beta, heads, fold_h, fold_w,
        proposal_h, proposal_w, interpret=interpret,
    )


def _cluster_fused_fwd(feat, value, alpha, beta, heads, fold_h, fold_w,
                       proposal_h, proposal_w):
    out = _cluster_fused(
        feat, value, alpha, beta, heads, fold_h, fold_w, proposal_h, proposal_w
    )
    return out, (feat, value, alpha, beta)


def _cluster_fused_bwd(heads, fold_h, fold_w, proposal_h, proposal_w, res, g):
    feat, value, alpha, beta = res
    interpret = jax.default_backend() != "tpu"
    return _cluster_nhwc_pallas_bwd(
        feat, value, g.astype(feat.dtype), alpha, beta,
        heads, fold_h, fold_w, proposal_h, proposal_w, interpret=interpret,
    )


_cluster_fused.defvjp(_cluster_fused_fwd, _cluster_fused_bwd)


def cluster_mix_pallas(feat, value, sim_alpha, sim_beta, *, heads, fold_h,
                       fold_w, proposal_h, proposal_w):
    """Public entry: fused kernel with jnp fallback for unsupported shapes."""
    if not pallas_supported(
        feat.shape, heads=heads, fold_h=fold_h, fold_w=fold_w,
        proposal_h=proposal_h, proposal_w=proposal_w,
    ):
        return cluster_mix(
            feat, value, sim_alpha, sim_beta,
            heads=heads, fold_h=fold_h, fold_w=fold_w,
            proposal_h=proposal_h, proposal_w=proposal_w,
        )
    return _cluster_fused(
        feat, value, jnp.asarray(sim_alpha), jnp.asarray(sim_beta),
        heads, fold_h, fold_w, proposal_h, proposal_w,
    )
