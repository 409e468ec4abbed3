"""Device mesh and sharding rules.

The reference scales with single-node DDP/NCCL (train.py:276-287): per-rank
processes, DistributedSampler, implicit gradient allreduce.  The TPU-native
equivalent is GSPMD: one jit'd train step over a `jax.sharding.Mesh`, batch
sharded over the 'data' axis, params/optimizer state replicated (or sharded
over 'model' for larger variants).  XLA inserts the gradient psum over ICI;
BatchNorm batch statistics are computed over the *global* batch (a mean over
a sharded axis lowers to a collective), so cross-replica SyncBN
(train.py:356-359) falls out for free.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """('data', 'model') mesh; model_parallel=1 gives pure data parallelism."""
    devices = devices if devices is not None else jax.devices()
    n = num_devices or len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    dev_array = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(dev_array, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def build_parallel_train_step(train_step, mesh: Mesh):
    """jit the step with explicit shardings: state replicated, batch sharded
    over 'data', outputs replicated."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    state_sh = rep
    batch_sh = bsh
    return jax.jit(
        train_step,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, rep),
        # the previous state is dead after each step; donating it lets XLA
        # update params/momentum/EMA in place instead of allocating fresh
        # buffers every step
        donate_argnums=(0,),
    )


def build_parallel_eval_step(eval_step, mesh: Mesh):
    rep = replicated(mesh)
    return jax.jit(
        eval_step,
        in_shardings=(rep, batch_sharding(mesh)),
        out_shardings=rep,
    )
