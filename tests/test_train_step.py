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
    optax chain's add_decayed_weights would otherwise feed wd*param into the
    momentum trace even with zeroed grads, giving unfreeze a stale kick the
    reference freeze never has (round-1 ADVICE)."""
    cfg, model, state, tx = setup
    step = jax.jit(build_train_step(model, cfg, tx, freeze_backbone=True))
    batch = jax.tree.map(jnp.asarray, make_batch(np.random.default_rng(3), 2, (64, 64)))
    state = state.replace(opt_state=set_learning_rate(state.opt_state, 1e-2))
    s1, _ = step(state, batch)

    def frozen_leaves(opt_state):
        out = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(opt_state)[0]:
            keys = [p.key for p in path if hasattr(p, "key")]
            if any(keys[i] == "neck" and keys[i + 1] == "backbone"
                   for i in range(len(keys) - 1)):
                out[tuple(str(p) for p in path)] = np.asarray(leaf)
        return out

    before = frozen_leaves(state.opt_state)
    after = frozen_leaves(s1.opt_state)
    assert before, "expected frozen-subtree leaves inside the opt state"
    for k in before:
        np.testing.assert_array_equal(before[k], after[k], err_msg=str(k))
    # unfrozen (head) momentum must still move
    moved = False
    for path, leaf in jax.tree_util.tree_flatten_with_path(s1.opt_state)[0]:
        keys = [p.key for p in path if hasattr(p, "key")]
        if "head" in keys and np.any(np.asarray(leaf) != 0):
            moved = True
            break
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
