"""Segmentation-only train step."""
import numpy as np

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.config import Config, LossConfig, ModelConfig, OptimConfig
from asy_vrnet_tpu.data.synthetic import make_batch
from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model
from asy_vrnet_tpu.train.optim import set_learning_rate
from asy_vrnet_tpu.train.seg_only import build_seg_train_step
from asy_vrnet_tpu.train.state import create_train_state


def test_seg_only_step_decreases_loss():
    cfg = Config(
        model=ModelConfig(phi="nano", compute_dtype="float32",
                          use_pallas_cluster=False, input_size=(64, 64)),
        loss=LossConfig(max_boxes=8),
        optim=OptimConfig(init_lr=1e-2, ema=False),
    )
    model = create_model(cfg.model)
    params, bstats = init_model(model, jax.random.PRNGKey(0), input_size=(64, 64))
    state, tx = create_train_state(cfg, params, bstats)
    state = state.replace(opt_state=set_learning_rate(state.opt_state, 1e-2))
    step = jax.jit(build_seg_train_step(model, cfg, tx))
    batch = jax.tree.map(jnp.asarray, make_batch(np.random.default_rng(0), 2, (64, 64)))
    losses = []
    for _ in range(5):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses

    # camera-only: works without radar in the batch (zero radar map)
    step2 = jax.jit(build_seg_train_step(model, cfg, tx))
    _, m2 = step2(state, {k: v for k, v in batch.items() if k != "radar"})
    assert np.isfinite(float(m2["loss"]))
