"""Fused Pallas TPU kernel for the cluster token mixer.

The jnp formulation (ops/cluster.py) runs as several XLA fusions with the
folded tokens, the (M,N) similarity and the dispatched output round-tripping
through HBM.  This kernel computes pool -> cosine-sim -> sigmoid ->
hard-assign -> aggregate -> dispatch for one (batch, head, region) per grid
program, entirely in VMEM:

    X, V:    (N, D) region tokens / values
    C  = P @ X,  VC = P @ V          P: static (M, N) adaptive-pool matrix
    S  = sigmoid(beta + alpha * norm(C) @ norm(X)^T)        (M, N)
    A  = one_hot(argmax_M S); S *= A
    OC = (S @ V + VC) / (rowsum(A) + 1)                     (M, D)
    OUT= S^T @ OC                                           (N, D)

All shapes are static; the host-side wrapper does the fold/unfold reshapes
(free under XLA) and flattens (B, heads, R) into the grid.  The backward pass
is a custom VJP that rematerialises through the jnp reference implementation
— one extra forward in exchange for zero saved intermediates.

Parity: bit-identical semantics to ops/cluster.py (validated in
tests/test_cluster_pallas.py); first-max tie-breaking via explicit index
minimisation over the tiny M axis.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from asy_vrnet_tpu.ops.cluster import (
    _fold_tokens,
    _unfold_tokens,
    cluster_mix,
)
from asy_vrnet_tpu.ops.resize import _adaptive_avg_matrix

_MAX_VMEM_TOKENS = 4096  # largest region (N) the kernel accepts


def pallas_supported(shape, *, heads, fold_h, fold_w, proposal_h, proposal_w) -> bool:
    """Whether the fused kernel handles this configuration."""
    b, h, w, c = shape
    if h % fold_h or w % fold_w or c % heads:
        return False
    n = (h // fold_h) * (w // fold_w)
    m = proposal_h * proposal_w
    d = c // heads
    return 8 <= n <= _MAX_VMEM_TOKENS and m <= 64 and d >= 8


def _pool_matrix(region_hw, proposal_hw) -> np.ndarray:
    rh, rw = region_hw
    ph, pw = proposal_hw
    mh = _adaptive_avg_matrix(rh, ph)
    mw = _adaptive_avg_matrix(rw, pw)
    return (mh[:, None, :, None] * mw[None, :, None, :]).reshape(ph * pw, rh * rw)


def _cluster_kernel(params_ref, x_ref, v_ref, pool_ref, out_ref):
    """One (batch*head*region) program.  params = [alpha, beta] in SMEM."""
    alpha = params_ref[0]
    beta = params_ref[1]
    x = x_ref[0]            # (N, D) f32
    v = v_ref[0]
    pool = pool_ref[:]      # (M, N)

    c = jnp.dot(pool, x, preferred_element_type=jnp.float32)    # (M, D)
    vc = jnp.dot(pool, v, preferred_element_type=jnp.float32)

    xn = x * jax.lax.rsqrt(jnp.sum(x * x, axis=1, keepdims=True) + 1e-12)
    cn = c * jax.lax.rsqrt(jnp.sum(c * c, axis=1, keepdims=True) + 1e-12)
    sim = jax.nn.sigmoid(
        beta + alpha * jax.lax.dot_general(
            cn, xn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )                                                            # (M, N)

    m = sim.shape[0]
    # hard assignment with first-max tie-break: smallest row index achieving
    # the column max
    col_max = jnp.max(sim, axis=0, keepdims=True)                # (1, N)
    is_max = sim >= col_max
    row_ids = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
    first_max = jnp.min(jnp.where(is_max, row_ids, m), axis=0, keepdims=True)
    mask = (row_ids == first_max).astype(sim.dtype)              # (M, N)
    sim = sim * mask

    counts = jnp.sum(mask, axis=1, keepdims=True)                # (M, 1)
    agg = jnp.dot(sim, v, preferred_element_type=jnp.float32)    # (M, D)
    out_c = (agg + vc) / (counts + 1.0)

    out_ref[0] = jax.lax.dot_general(
        sim, out_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                            # (N, D)


@functools.partial(
    jax.jit, static_argnames=("region_hw", "proposal_hw", "interpret")
)
def _cluster_regions_pallas(
    tokens: jnp.ndarray,     # (G, N, D) f32 — G = B*heads*R flattened
    values: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: jnp.ndarray,
    region_hw: tuple[int, int],
    proposal_hw: tuple[int, int],
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g, n, d = tokens.shape
    m = proposal_hw[0] * proposal_hw[1]
    pool = jnp.asarray(_pool_matrix(region_hw, proposal_hw), jnp.float32)
    params = jnp.stack([alpha.astype(jnp.float32), beta.astype(jnp.float32)])

    flops_per = 2 * n * d * (2 * m) + 2 * m * n * d * 2
    return pl.pallas_call(
        _cluster_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g, n, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=g * flops_per,
            bytes_accessed=g * n * d * 4 * 3,
            transcendentals=g * m * n,
        ),
        interpret=interpret,
    )(params, tokens, values, pool)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(4, 5, 6, 7, 8),
)
def _cluster_fused(feat, value, alpha, beta, heads, fold_h, fold_w,
                   proposal_h, proposal_w):
    b, h, w, c = feat.shape
    x, region_hw = _fold_tokens(feat.astype(jnp.float32), heads, fold_h, fold_w)
    v, _ = _fold_tokens(value.astype(jnp.float32), heads, fold_h, fold_w)
    bh, hd, r, n, d = x.shape[0], x.shape[1], x.shape[2], x.shape[3], x.shape[4]
    interpret = jax.default_backend() != "tpu"
    out = _cluster_regions_pallas(
        x.reshape(-1, n, d), v.reshape(-1, n, d), alpha, beta,
        region_hw, (proposal_h, proposal_w), interpret=interpret,
    )
    out = out.reshape(bh, hd, r, n, d)
    return _unfold_tokens(out, region_hw, fold_h, fold_w).astype(feat.dtype)


def _cluster_fused_fwd(feat, value, alpha, beta, heads, fold_h, fold_w,
                       proposal_h, proposal_w):
    out = _cluster_fused(
        feat, value, alpha, beta, heads, fold_h, fold_w, proposal_h, proposal_w
    )
    return out, (feat, value, alpha, beta)


def _cluster_fused_bwd(heads, fold_h, fold_w, proposal_h, proposal_w, res, g):
    feat, value, alpha, beta = res
    _, vjp = jax.vjp(
        lambda f, v, a, b: cluster_mix(
            f, v, a, b, heads=heads, fold_h=fold_h, fold_w=fold_w,
            proposal_h=proposal_h, proposal_w=proposal_w,
        ),
        feat, value, alpha, beta,
    )
    return vjp(g)


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
