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


def test_seg_signed_logits_variant():
    """Corrected seg head (drop only the final ReLU): identical param tree —
    weights interchangeable with the parity model — and signed logits."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from asy_vrnet_tpu.config import ModelConfig
    from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model

    kw = dict(phi="nano", compute_dtype="float32", use_pallas_cluster=False,
              input_size=(64, 64))
    m_par = create_model(ModelConfig(**kw))
    m_sig = create_model(ModelConfig(seg_signed_logits=True, **kw))
    params, bstats = init_model(m_par, jax.random.PRNGKey(0), input_size=(64, 64))
    p2, b2 = init_model(m_sig, jax.random.PRNGKey(0), input_size=(64, 64))
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        assert a.shape == b.shape

    img = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 64, 3)), jnp.float32)
    rad = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 64, 4)), jnp.float32)
    fwd = lambda m: jax.jit(lambda: m.apply(
        {"params": params, "batch_stats": bstats}, img, rad, train=False)[1])()
    seg_par, seg_sig = fwd(m_par), fwd(m_sig)
    # parity head clamps at 0; corrected head must produce negative logits
    assert float(jnp.min(seg_par)) >= 0.0
    assert float(jnp.min(seg_sig)) < 0.0
    # same weights: both heads share the pre-ReLU field; align_corners
    # upsampling maps corners exactly, so relu(signed) == parity there
    for ij in ((0, 0), (0, -1), (-1, 0), (-1, -1)):
        np.testing.assert_allclose(
            np.asarray(jnp.maximum(seg_sig, 0.0)[:, ij[0], ij[1]]),
            np.asarray(seg_par[:, ij[0], ij[1]]), atol=1e-5, rtol=1e-5)
