"""Tensor-parallel parameter sharding over the 'model' mesh axis: layout
annotations must not change results vs the replicated run."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from asy_vrnet_tpu.config import ModelConfig
from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model
from asy_vrnet_tpu.parallel.mesh import make_mesh
from asy_vrnet_tpu.parallel.sharding_rules import param_sharding_rules, shard_params


def test_rules_shard_wide_kernels_only():
    cfg = ModelConfig(phi="nano", compute_dtype="float32",
                      use_pallas_cluster=False, input_size=(64, 64))
    model = create_model(cfg)
    params, bstats = init_model(model, jax.random.PRNGKey(0), input_size=(64, 64))
    mesh = make_mesh(8, model_parallel=2)
    rules = param_sharding_rules(params, mesh, min_channels=64)
    leaves = jax.tree.leaves(rules)
    specs = {str(s.spec) for s in leaves}
    assert any("model" in s for s in specs), specs       # some kernels sharded
    # biases/norm scales stay replicated
    head_bias_rule = rules["head"]["cls_pred0"]["bias"]
    assert head_bias_rule.spec == P()


def test_tp_forward_matches_replicated():
    cfg = ModelConfig(phi="nano", compute_dtype="float32",
                      use_pallas_cluster=False, input_size=(64, 64))
    model = create_model(cfg)
    params, bstats = init_model(model, jax.random.PRNGKey(0), input_size=(64, 64))
    img = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32)
    rad = jnp.asarray(np.random.default_rng(1).standard_normal((2, 64, 64, 4)), jnp.float32)

    fwd = jax.jit(lambda p, b, i, r: model.apply({"params": p, "batch_stats": b}, i, r))
    det_ref, seg_ref = fwd(params, bstats, img, rad)

    mesh = make_mesh(8, model_parallel=4)
    sp = shard_params(params, mesh, min_channels=32)
    sb = jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), bstats)
    si = jax.device_put(img, NamedSharding(mesh, P("data")))
    sr = jax.device_put(rad, NamedSharding(mesh, P("data")))
    det_tp, seg_tp = fwd(sp, sb, si, sr)

    for a, b in zip(det_ref, det_tp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(seg_tp), np.asarray(seg_ref), atol=1e-5)
