"""Data-parallel training over a virtual 8-device CPU mesh (GSPMD path)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.config import Config, LossConfig, ModelConfig, OptimConfig
from asy_vrnet_tpu.data.synthetic import make_batch
from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model
from asy_vrnet_tpu.parallel.mesh import (
    build_parallel_train_step,
    make_mesh,
    replicate_state,
    shard_batch,
)
from asy_vrnet_tpu.train.optim import set_learning_rate
from asy_vrnet_tpu.train.state import create_train_state
from asy_vrnet_tpu.train.train_step import build_train_step


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_data_parallel_train_step_runs_and_matches_single():
    cfg = Config(
        model=ModelConfig(
            phi="nano", compute_dtype="float32", use_pallas_cluster=False,
            input_size=(64, 64),
        ),
        loss=LossConfig(max_boxes=8),
        optim=OptimConfig(init_lr=1e-2, ema=False),
    )
    model = create_model(cfg.model)
    params, bstats = init_model(model, jax.random.PRNGKey(0), input_size=(64, 64))
    state, tx = create_train_state(cfg, params, bstats)
    state = state.replace(opt_state=set_learning_rate(state.opt_state, 1e-3))

    batch = jax.tree.map(
        jnp.asarray, make_batch(np.random.default_rng(0), 8, (64, 64), max_boxes=8)
    )

    # single-device reference
    step1 = jax.jit(build_train_step(model, cfg, tx))
    s_ref, m_ref = step1(state, batch)

    # 8-way data parallel
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "model": 1}
    pstate = replicate_state(state, mesh)
    pbatch = shard_batch(batch, mesh)
    pstep = build_parallel_train_step(build_train_step(model, cfg, tx), mesh)
    s_par, m_par = pstep(pstate, pbatch)

    # same global batch -> identical loss and identical updated params
    np.testing.assert_allclose(
        float(m_par["loss"]), float(m_ref["loss"]), rtol=1e-4
    )
    ref_leaf = np.asarray(jax.tree.leaves(s_ref.params)[0])
    par_leaf = np.asarray(jax.tree.leaves(s_par.params)[0])
    np.testing.assert_allclose(par_leaf, ref_leaf, atol=1e-5)

    # BN stats are global-batch (SyncBN-for-free): must also match
    ref_bn = np.asarray(jax.tree.leaves(s_ref.batch_stats)[0])
    par_bn = np.asarray(jax.tree.leaves(s_par.batch_stats)[0])
    np.testing.assert_allclose(par_bn, ref_bn, atol=1e-5)


def test_mesh_with_model_axis():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
