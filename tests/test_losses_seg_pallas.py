"""Fused seg-loss Pallas kernel vs the jnp oracle (value + gradient).

The kernel runs in interpret mode on CPU; parity must hold in f32 exactly-ish
(reassociated reductions only) and in bf16 I/O to rounding.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.ops.losses_seg import (
    ce_loss,
    dice_loss,
    f_score,
    focal_loss,
)
from asy_vrnet_tpu.ops.losses_seg_pallas import fused_seg_loss_and_fscore


def _data(c=9, hw=(16, 128), b=2, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, *hw, c)).astype(np.float32)
    target = rng.integers(0, c + 1, size=(b, *hw)).astype(np.int32)
    onehot = np.eye(c + 1)[target].astype(np.float32)
    return jnp.asarray(logits), jnp.asarray(target), jnp.asarray(onehot)


def _oracle(logits, target, onehot, weights, c, use_focal=True, use_dice=True):
    if use_focal:
        loss = focal_loss(logits, target, weights, c, 0.5, 2.0)
    else:
        loss = ce_loss(logits, target, weights, c)
    if use_dice:
        loss = loss + dice_loss(logits, onehot)
    return loss, f_score(logits, onehot)


@pytest.mark.parametrize("use_focal", [True, False])
@pytest.mark.parametrize("use_dice", [True, False])
def test_fused_value_parity(use_focal, use_dice):
    c = 9
    logits, target, onehot = _data(c)
    weights = jnp.asarray(np.linspace(0.5, 2.0, c).astype(np.float32))
    want_loss, want_fs = _oracle(logits, target, onehot, weights, c,
                                 use_focal, use_dice)
    got_loss, got_fs = fused_seg_loss_and_fscore(
        logits, target, weights, c, use_focal=use_focal, use_dice=use_dice,
        use_pallas=True,
    )
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=2e-6)
    np.testing.assert_allclose(float(got_fs), float(want_fs), rtol=2e-6)


@pytest.mark.parametrize("use_focal", [True, False])
def test_fused_grad_parity(use_focal):
    c = 9
    logits, target, onehot = _data(c, seed=3)
    weights = jnp.asarray(np.linspace(0.5, 2.0, c).astype(np.float32))

    def f_or(lg):
        return _oracle(lg, target, onehot, weights, c, use_focal, True)[0]

    def f_ku(lg):
        return fused_seg_loss_and_fscore(
            lg, target, weights, c, use_focal=use_focal, use_pallas=True)[0]

    g_or = jax.grad(f_or)(logits)
    g_ku = jax.grad(f_ku)(logits)
    np.testing.assert_allclose(np.asarray(g_ku), np.asarray(g_or),
                               rtol=1e-4, atol=1e-7)


def test_fused_bf16_io():
    """bf16 logits round-trip: value close to the f32 oracle, grads bf16."""
    c = 9
    logits, target, onehot = _data(c, seed=5)
    weights = None
    want_loss, want_fs = _oracle(logits, target, onehot, None, c, True, True)
    lb = logits.astype(jnp.bfloat16)
    got_loss, got_fs = fused_seg_loss_and_fscore(
        lb, target, None, c, use_pallas=True)
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=2e-2)
    np.testing.assert_allclose(float(got_fs), float(want_fs), rtol=2e-2)
    g = jax.grad(
        lambda x: fused_seg_loss_and_fscore(x, target, None, c,
                                            use_pallas=True)[0]
    )(lb)
    assert g.dtype == jnp.bfloat16
    g_or = jax.grad(
        lambda x: _oracle(x, target, onehot, None, c, True, True)[0]
    )(logits)
    np.testing.assert_allclose(np.asarray(g, np.float32), np.asarray(g_or),
                               rtol=0.1, atol=2e-6)


def test_train_step_fused_matches_oracle():
    """One real train step with use_pallas_seg forced on vs off: identical
    seg loss / f_score and matching grads through the whole model."""
    from asy_vrnet_tpu.config import (
        Config, LossConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from asy_vrnet_tpu.data.synthetic import make_batch
    from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model
    from asy_vrnet_tpu.train.state import create_train_state
    from asy_vrnet_tpu.train.train_step import build_train_step

    def cfg_with(use_pallas_seg):
        return Config(
            model=ModelConfig(phi="nano", compute_dtype="float32",
                              use_pallas_cluster=False, input_size=(64, 64)),
            loss=LossConfig(max_boxes=16, use_pallas_seg=use_pallas_seg),
            optim=OptimConfig(init_lr=1e-2),
            train=TrainConfig(batch_size=2),
        )

    cfg = cfg_with(False)
    model = create_model(cfg.model)
    params, bstats = init_model(model, jax.random.PRNGKey(0),
                                input_size=(64, 64))
    rng = np.random.default_rng(0)
    batch = jax.tree.map(jnp.asarray, make_batch(rng, 2, (64, 64)))

    outs = {}
    for tag, flag in (("oracle", False), ("fused", True)):
        c = cfg_with(flag)
        state, tx = create_train_state(c, params, bstats)
        step = jax.jit(build_train_step(model, c, tx))
        new_state, metrics = step(state, batch)
        outs[tag] = (new_state, metrics)
    m0, m1 = outs["oracle"][1], outs["fused"][1]
    np.testing.assert_allclose(float(m1["loss_seg"]), float(m0["loss_seg"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["f_score"]), float(m0["f_score"]),
                               rtol=1e-5)
    p0 = outs["oracle"][0].params
    p1 = outs["fused"][0].params
    flat0 = jax.tree_util.tree_leaves(p0)
    flat1 = jax.tree_util.tree_leaves(p1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-6)


def test_fused_no_weights_uneven_tiles():
    """Odd H forces a th < H tile split; no weights exercises the ones path."""
    c = 5
    logits, target, onehot = _data(c, hw=(24, 128), seed=7)
    want_loss, want_fs = _oracle(logits, target, onehot, None, c, True, True)
    got_loss, got_fs = fused_seg_loss_and_fscore(
        logits, target, None, c, use_pallas=True)
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=2e-6)
    np.testing.assert_allclose(float(got_fs), float(want_fs), rtol=2e-6)
