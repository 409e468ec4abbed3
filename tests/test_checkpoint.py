"""Checkpoint/restore, weights export, partial load."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.train.checkpoint import (
    latest_checkpoint,
    load_weights,
    partial_load,
    restore_checkpoint,
    save_checkpoint,
    save_weights,
)


def _tiny_state():
    from asy_vrnet_tpu.config import Config, LossConfig, ModelConfig
    from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model
    from asy_vrnet_tpu.train.state import create_train_state

    cfg = Config(
        model=ModelConfig(phi="nano", compute_dtype="float32",
                          use_pallas_cluster=False, input_size=(64, 64)),
        loss=LossConfig(max_boxes=8),
    )
    model = create_model(cfg.model)
    params, bstats = init_model(model, jax.random.PRNGKey(0), input_size=(64, 64))
    state, tx = create_train_state(cfg, params, bstats)
    return cfg, model, state, tx


@pytest.fixture(scope="module")
def tiny_state():
    return _tiny_state()


def test_save_restore_roundtrip(tiny_state, tmp_path):
    cfg, model, state, tx = tiny_state
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    path = save_checkpoint(str(tmp_path / "ckpt"), state)
    assert latest_checkpoint(str(tmp_path / "ckpt")) == path
    restored = restore_checkpoint(path, jax.tree.map(jnp.zeros_like, state))
    assert int(restored.step) == 7
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_weights_export_and_partial_load(tiny_state, tmp_path):
    cfg, model, state, tx = tiny_state
    path = str(tmp_path / "w.npz")
    save_weights(path, state.params, state.batch_stats)
    tree = load_weights(path)
    assert "params" in tree and "batch_stats" in tree

    # partial load into a zeroed clone: every leaf restored
    zeroed = jax.tree.map(jnp.zeros_like, state.params)
    loaded, ok, skipped = partial_load(zeroed, tree["params"], verbose=False)
    assert not skipped
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(loaded)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # shape-mismatched source leaves are kept from the target
    bad = jax.tree.map(lambda x: np.zeros((1, 1), np.float32), tree["params"])
    loaded, ok, skipped = partial_load(zeroed, bad, verbose=False)
    assert ok == [] or len(skipped) > 0
