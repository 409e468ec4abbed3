"""Parameter sharding rules for the ('data', 'model') mesh.

The reference never shards parameters (SURVEY.md §2.6: TP/PP absent — the
model is nano-scale).  For larger variants this module provides simple
Megatron-style rules under GSPMD: conv kernels with enough output channels
are sharded over 'model' on their output-feature axis; everything else is
replicated.  XLA inserts the all-gathers/reduce-scatters; correctness is
independent of the rules (they are layout annotations only), verified by the
equality test against the fully-replicated run.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_sharding_rules(
    params: Any, mesh: Mesh, min_channels: int = 64
) -> Any:
    """Pytree of NamedShardings matching `params`."""
    model_size = mesh.shape["model"]

    def rule(path, leaf):
        if model_size > 1 and leaf.ndim >= 2:
            out_ch = leaf.shape[-1]
            if out_ch >= min_channels and out_ch % model_size == 0:
                spec = [None] * (leaf.ndim - 1) + ["model"]
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params: Any, mesh: Mesh, min_channels: int = 64) -> Any:
    shardings = param_sharding_rules(params, mesh, min_channels)
    return jax.tree.map(jax.device_put, params, shardings)
