"""Single-chip fused train step: loss decreases, EMA/BN/optimizer behave."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.config import Config, LossConfig, ModelConfig, OptimConfig, TrainConfig
from asy_vrnet_tpu.data.synthetic import make_batch
from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model
from asy_vrnet_tpu.train.optim import (
    adaptive_lr,
    get_learning_rate,
    make_lr_schedule,
    set_learning_rate,
    yolox_warm_cos_lr,
)
from asy_vrnet_tpu.train.state import create_train_state, eval_variables
from asy_vrnet_tpu.train.train_step import build_eval_step, build_train_step


def _cfg(multitask_mode="fixed"):
    return Config(
        model=ModelConfig(
            phi="nano", compute_dtype="float32", use_pallas_cluster=False,
            input_size=(64, 64),
        ),
        loss=LossConfig(multitask_mode=multitask_mode, max_boxes=16),
        optim=OptimConfig(init_lr=1e-2),
        train=TrainConfig(batch_size=2),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    model = create_model(cfg.model)
    params, bstats = init_model(model, jax.random.PRNGKey(0), input_size=(64, 64))
    state, tx = create_train_state(cfg, params, bstats)
    return cfg, model, state, tx


def test_train_step_loss_decreases(setup):
    cfg, model, state, tx = setup
    step = jax.jit(build_train_step(model, cfg, tx))
    rng = np.random.default_rng(0)
    batch = jax.tree.map(jnp.asarray, make_batch(rng, 2, (64, 64)))
    state = state.replace(opt_state=set_learning_rate(state.opt_state, 1e-2))
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    # overfitting a fixed batch must reduce the loss
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_device_onehot_matches_host_onehot(setup):
    """Batches without seg_onehot (the lean pipeline) produce identical
    metrics to batches carrying the host-precomputed one-hot."""
    cfg, model, state, tx = setup
    eval_step = jax.jit(build_eval_step(model, cfg))
    rng = np.random.default_rng(3)
    batch = jax.tree.map(jnp.asarray, make_batch(rng, 2, (64, 64)))
    lean = {k: v for k, v in batch.items() if k != "seg_onehot"}
    m_host = eval_step({"params": state.params, "batch_stats": state.batch_stats}, batch)
    m_dev = eval_step({"params": state.params, "batch_stats": state.batch_stats}, lean)
    for k in m_host:
        np.testing.assert_allclose(
            np.asarray(m_host[k]), np.asarray(m_dev[k]), rtol=0, atol=0, err_msg=k
        )


def test_ema_tracks_params(setup):
    cfg, model, state, tx = setup
    step = jax.jit(build_train_step(model, cfg, tx))
    batch = jax.tree.map(jnp.asarray, make_batch(np.random.default_rng(1), 2, (64, 64)))
    state = state.replace(opt_state=set_learning_rate(state.opt_state, 1e-2))
    s1, _ = step(state, batch)
    # EMA moved toward new params but is not equal to them
    p = jax.tree.leaves(s1.params)[0]
    e = jax.tree.leaves(s1.ema_params)[0]
    p0 = jax.tree.leaves(state.params)[0]
    assert not np.allclose(np.asarray(p), np.asarray(e))
    assert float(s1.ema_updates) == 1.0
    # ramped decay at t=1 is tiny -> EMA ~ new params at first update
    d = 0.9999 * (1 - np.exp(-1 / 2000.0))
    np.testing.assert_allclose(
        np.asarray(e), d * np.asarray(p0) + (1 - d) * np.asarray(p), rtol=1e-5
    )


def test_freeze_backbone_blocks_updates(setup):
    cfg, model, state, tx = setup
    step = jax.jit(build_train_step(model, cfg, tx, freeze_backbone=True))
    batch = jax.tree.map(jnp.asarray, make_batch(np.random.default_rng(2), 2, (64, 64)))
    state = state.replace(opt_state=set_learning_rate(state.opt_state, 1e-2))
    s1, _ = step(state, batch)
    before = state.params["neck"]["backbone"]
    after = s1.params["neck"]["backbone"]
    diffs = jax.tree.leaves(jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), before, after))
    assert max(diffs) == 0.0
    # head must still train
    hb = jax.tree.leaves(jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                                      state.params["head"], s1.params["head"]))
    assert max(hb) > 0.0


def test_freeze_backbone_keeps_optimizer_state_clean(setup):
    """Frozen params must accumulate NOTHING in the optimizer state — the
    optax chain's decayed-weights term would otherwise feed wd*param into the
    momentum trace even with zeroed grads, giving unfreeze a stale kick the
    reference freeze never has (round-1 ADVICE).

    The optimizer is flattened (make_optimizer), so the momentum trace is one
    vector in ravel_pytree leaf order; frozen positions are located with the
    same mask the train step uses."""
    from asy_vrnet_tpu.train.train_step import _flat_frozen_mask

    cfg, model, state, tx = setup
    step = jax.jit(build_train_step(model, cfg, tx, freeze_backbone=True))
    batch = jax.tree.map(jnp.asarray, make_batch(np.random.default_rng(3), 2, (64, 64)))
    state = state.replace(opt_state=set_learning_rate(state.opt_state, 1e-2))
    s1, _ = step(state, batch)

    mask = np.asarray(_flat_frozen_mask(state.params)) > 0
    assert mask.any() and not mask.all()

    def flat_vectors(opt_state):
        return [
            np.asarray(leaf)
            for leaf in jax.tree.leaves(opt_state)
            if getattr(leaf, "ndim", None) == 1 and leaf.shape == mask.shape
        ]

    before = flat_vectors(state.opt_state)
    after = flat_vectors(s1.opt_state)
    assert before, "expected a flat momentum trace inside the opt state"
    moved = False
    for b, a in zip(before, after):
        np.testing.assert_array_equal(b[mask], a[mask])
        moved = moved or bool(np.any(a[~mask] != b[~mask]))
    # unfrozen momentum must still move
    assert moved


def test_uncertainty_multitask_updates_log_var():
    cfg = _cfg("uncertainty")
    model = create_model(cfg.model)
    params, bstats = init_model(model, jax.random.PRNGKey(0), input_size=(64, 64))
    state, tx = create_train_state(cfg, params, bstats)
    state = state.replace(opt_state=set_learning_rate(state.opt_state, 1e-2))
    step = jax.jit(build_train_step(model, cfg, tx))
    batch = jax.tree.map(jnp.asarray, make_batch(np.random.default_rng(3), 2, (64, 64)))
    s1, _ = step(state, batch)
    assert float(s1.log_var) != 0.0  # the reference's bug (never trained) is fixed


def test_eval_step(setup):
    cfg, model, state, tx = setup
    ev = jax.jit(build_eval_step(model, cfg))
    batch = jax.tree.map(jnp.asarray, make_batch(np.random.default_rng(4), 2, (64, 64)))
    m = ev(eval_variables(state), batch)
    assert np.isfinite(float(m["loss"]))
    assert 0.0 <= float(m["f_score"]) <= 1.0


def test_lr_schedule_parity():
    # spot values of the yolox warmup-cos schedule
    f = yolox_warm_cos_lr(1e-2, 1e-4, 100)
    assert f(0) == pytest.approx(1e-3)                # warmup start
    assert f(3) == pytest.approx(1e-2)                # end of warmup
    assert f(99) == pytest.approx(1e-4)               # no-aug floor
    mid = f(50)
    assert 1e-4 < mid < 1e-2
    init_lr, min_lr = adaptive_lr(OptimConfig(init_lr=1e-2), batch_size=16)
    assert init_lr == pytest.approx(min(max(16 / 64 * 1e-2, 5e-4), 5e-2))


def test_set_get_learning_rate(setup):
    cfg, model, state, tx = setup
    st = set_learning_rate(state.opt_state, 3.14e-3)
    assert get_learning_rate(st) == pytest.approx(3.14e-3)
