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
    _mixer_core,
    _group_w,
    _region_mask,
    _replication_and_masks,
    _tile_pool_matrix_t,
    pallas_supported,
)

_GN_EPS = 1e-5


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


def _mixer_block_kernel(params_ref, stats_ref, x_ref, wf_ref, bf_ref, wv_ref,
                        bv_ref, w2_ref, b2_ref, pool_ref, rep_ref, hmask_ref,
                        headsel_ref, rmask_ref, out_ref, *, heads, m, gw, rw):
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
    mu = stats_ref[bi, 0]
    rstd = stats_ref[bi, 1]
    xn = (xf - mu) * rstd                       # GN1 sans affine (folded)

    xnb = xn.astype(mxu)
    feat = (jax.lax.dot_general(
        xnb, wf_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=f32,
    ) + bf_ref[0]).astype(mxu)                  # (Nt, inner)
    value = (jax.lax.dot_general(
        xnb, wv_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=f32,
    ) + bv_ref[0]).astype(mxu)

    mixed = _mixer_core(
        feat, value, alpha, beta,
        pool_ref[:], rep_ref[:], hmask_ref[:], headsel_ref[:], rmask_ref[:],
        heads=heads, m=m, gw=gw, rw=rw, wt=wt,
    )                                           # (Nt, inner)

    y = jax.lax.dot_general(
        mixed.astype(mxu), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b2_ref[0]                               # (Nt, C)
    out = xf + y
    out_ref[0] = out.reshape(rh, wt, c).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "fold_h", "fold_w", "proposal_h", "proposal_w",
                     "interpret"),
)
def _mixer_block_pallas(x, stats, wf, bf, wv, bv, w2, b2, alpha, beta,
                        heads, fold_h, fold_w, proposal_h, proposal_w,
                        interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
    rmask = jnp.asarray(_region_mask(gw, heads, m, rh, rw))
    params = jnp.stack([alpha.astype(jnp.float32), beta.astype(jnp.float32)])

    kernel = functools.partial(_mixer_block_kernel, heads=heads, m=m, gw=gw, rw=rw)
    tile = pl.BlockSpec((1, rh, wt, c), lambda bi, i, j: (bi, i, j, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda bi, i, j: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    flops_per = (
        2 * nt * c * 2 * inner                 # fc1 + fc_v
        + 2 * nt * inner * (mb + 2 * hb)       # pooling + sim + dispatch
        + 2 * hb * nt
        + 2 * nt * inner * c                   # fc2
    )
    return pl.pallas_call(
        kernel,
        grid=(b, fold_h, fold_w // gw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile,
            const((c, inner)), const((1, inner)),
            const((c, inner)), const((1, inner)),
            const((inner, c)), const((1, c)),
            const((nt, mb)), const((hb, mb)), const((hb, inner)),
            const((inner, heads)), const((hb, nt)),
        ],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * fold_h * (fold_w // gw) * flops_per,
            bytes_accessed=b * h * w * c * x.dtype.itemsize * 2,
            transcendentals=b * fold_h * (fold_w // gw) * hb * nt,
        ),
        interpret=interpret,
    )(params, stats, x.astype(mxu),
      wf.astype(mxu), bf[None].astype(jnp.float32),
      wv.astype(mxu), bv[None].astype(jnp.float32),
      w2.astype(mxu), b2[None].astype(jnp.float32),
      pool_t, jnp.asarray(rep_np), jnp.asarray(hmask_np),
      jnp.asarray(headsel_np), rmask)


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
    interpret = jax.default_backend() != "tpu"
    stats = gn1_stats(x)
    wf_e, bf_e = _fold_in(gn_scale, gn_bias, wf, bf)
    wv_e, bv_e = _fold_in(gn_scale, gn_bias, wv, bv)
    w2_e, b2_e = _fold_out(w2, b2, ls1)
    return _mixer_block_pallas(
        x, stats, wf_e, bf_e, wv_e, bv_e, w2_e, b2_e,
        jnp.asarray(alpha), jnp.asarray(beta),
        heads, fold_h, fold_w, proposal_h, proposal_w, interpret=interpret,
    )


def _fused_mixer_block_fwd(x, gn_scale, gn_bias, wf, bf, wv, bv, w2, b2, ls1,
                           alpha, beta, heads, fold_h, fold_w, proposal_h,
                           proposal_w):
    out = fused_mixer_block(x, gn_scale, gn_bias, wf, bf, wv, bv, w2, b2, ls1,
                            alpha, beta, heads, fold_h, fold_w, proposal_h,
                            proposal_w)
    return out, (x, gn_scale, gn_bias, wf, bf, wv, bv, w2, b2, ls1, alpha, beta)


def _fused_mixer_block_bwd(heads, fold_h, fold_w, proposal_h, proposal_w,
                           res, g):
    _, pullback = jax.vjp(
        lambda *p: _mixer_block_ref(*p, heads, fold_h, fold_w, proposal_h,
                                    proposal_w),
        *res,
    )
    return pullback(g)


fused_mixer_block.defvjp(_fused_mixer_block_fwd, _fused_mixer_block_bwd)


# ---------------------------------------------------------------------------
# MLP half
# ---------------------------------------------------------------------------

def _mlp_rows(h: int, w: int) -> int:
    """Rows per program: keep ~2048 tokens per tile, divide H evenly."""
    th = max(1, 2048 // w)
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
                      out_ref):
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    blk = x_ref[0]                              # (th, W, C)
    th, w, c = blk.shape
    nt = th * w
    mxu = blk.dtype
    xf = blk.reshape(nt, c).astype(f32)
    bi = pl.program_id(0)
    xn = (xf - stats_ref[bi, 0]) * stats_ref[bi, 1]
    h = jax.lax.dot_general(
        xn.astype(mxu), w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b1_ref[0]
    h = _gelu_exactish(h)
    y = jax.lax.dot_general(
        h.astype(mxu), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b2_ref[0]
    out_ref[0] = (xf + y).reshape(th, w, c).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mlp_block_pallas(x, stats, w1, b1, w2, b2, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    hidden = w1.shape[1]
    th = _mlp_rows(h, w)
    mxu = x.dtype
    tile = pl.BlockSpec((1, th, w, c), lambda bi, i: (bi, i, 0, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    nt = th * w
    return pl.pallas_call(
        _mlp_block_kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile,
            const((c, hidden)), const((1, hidden)),
            const((hidden, c)), const((1, c)),
        ],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * (h // th) * 4 * nt * c * hidden,
            bytes_accessed=b * h * w * c * x.dtype.itemsize * 2,
            transcendentals=b * h * w * hidden,
        ),
        interpret=interpret,
    )(stats, x.astype(mxu), w1.astype(mxu), b1[None].astype(jnp.float32),
      w2.astype(mxu), b2[None].astype(jnp.float32))


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
    out = fused_mlp_block(x, gn_scale, gn_bias, w1, b1, w2, b2, ls2)
    return out, (x, gn_scale, gn_bias, w1, b1, w2, b2, ls2)


def _fused_mlp_block_bwd(res, g):
    _, pullback = jax.vjp(_mlp_block_ref, *res)
    return pullback(g)


fused_mlp_block.defvjp(_fused_mlp_block_fwd, _fused_mlp_block_bwd)
