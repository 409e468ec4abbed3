"""End-to-end model structure tests (tiny 64x64 inputs to keep CPU time sane)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.config import ModelConfig
from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model


@pytest.fixture(scope="module")
def nano_model():
    cfg = ModelConfig(
        phi="nano", compute_dtype="float32", use_pallas_cluster=False,
        input_size=(64, 64),
    )
    model = create_model(cfg)
    params, bstats = init_model(model, jax.random.PRNGKey(0), input_size=(64, 64))
    return cfg, model, params, bstats


def test_forward_shapes(nano_model):
    cfg, model, params, bstats = nano_model
    img = jnp.ones((2, 64, 64, 3))
    rad = jnp.ones((2, 64, 64, 4))
    fwd = jax.jit(
        lambda p, b, i, r: model.apply({"params": p, "batch_stats": b}, i, r, train=False)
    )
    det, seg = fwd(params, bstats, img, rad)
    # strides 8/16/32; channels 5+num_classes
    assert det[0].shape == (2, 8, 8, 9)
    assert det[1].shape == (2, 4, 4, 9)
    assert det[2].shape == (2, 2, 2, 9)
    assert seg.shape == (2, 64, 64, cfg.num_seg_classes)
    assert all(np.all(np.isfinite(np.asarray(o))) for o in det)
    assert np.all(np.isfinite(np.asarray(seg)))


def test_param_count_nano(nano_model):
    """Width-0.25 nano model should be a ~4M-param network (reference scale)."""
    _, _, params, _ = nano_model
    n = sum(x.size for x in jax.tree.leaves(params))
    assert 3_000_000 < n < 6_000_000, n


def test_train_mode_mutates_batch_stats(nano_model):
    cfg, model, params, bstats = nano_model
    img = jnp.ones((1, 64, 64, 3)) * 0.5
    rad = jnp.ones((1, 64, 64, 4)) * 0.2
    step = jax.jit(
        lambda p, b, i, r: model.apply(
            {"params": p, "batch_stats": b}, i, r, train=True,
            mutable=["batch_stats"],
        )
    )
    (det, seg), mutated = step(params, bstats, img, rad)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), bstats, mutated["batch_stats"]
    )
    assert max(jax.tree.leaves(diffs)) > 0.0


def test_bfloat16_compute_path():
    cfg = ModelConfig(
        phi="nano", compute_dtype="bfloat16", use_pallas_cluster=False,
        input_size=(64, 64),
    )
    model = create_model(cfg)
    params, bstats = init_model(model, jax.random.PRNGKey(0), input_size=(64, 64))
    # params stay fp32
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(params))
    fwd = jax.jit(
        lambda p, b, i, r: model.apply({"params": p, "batch_stats": b}, i, r, train=False)
    )
    det, seg = fwd(params, bstats, jnp.ones((1, 64, 64, 3)), jnp.ones((1, 64, 64, 4)))
    # outputs are fp32 (cast at the head)
    assert det[0].dtype == jnp.float32
    assert seg.dtype == jnp.float32
    assert all(np.all(np.isfinite(np.asarray(o))) for o in det)
