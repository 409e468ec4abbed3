"""Activation-remat knob (ModelConfig.train_remat): gradient equivalence.

"fusion" wraps only conv/BN/gating spans — deterministic recompute, grads
must match the unremated model exactly (f32).  "stages" additionally replays
the cluster blocks, whose hard argmax assignment can flip on near-tie f32
reassociation between the saved and replayed XLA programs — loss must still
match exactly (same forward) and grads must be finite and close in bulk.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.config import ModelConfig
from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model


@pytest.fixture(scope="module")
def grad_by_mode():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    rad = jnp.asarray(rng.standard_normal((2, 64, 64, 4)), jnp.float32)
    out = {}
    for remat in ("none", "fusion", "blocks"):
        # prestem_s2d off: remat replay of the s2d assembled-kernel conv can
        # reassociate f32 sums enough to flip downstream cluster argmax ties,
        # which is the known "stages"-mode fuzz — this test isolates the
        # remat mechanism itself, which must be exact.
        cfg = ModelConfig(
            phi="nano", compute_dtype="float32", use_pallas_cluster=False,
            input_size=(64, 64), train_remat=remat, prestem_s2d=False,
        )
        model = create_model(cfg)
        params, bstats = init_model(model, jax.random.PRNGKey(0), input_size=(64, 64))

        def loss(p):
            (det, seg), _ = model.apply(
                {"params": p, "batch_stats": bstats}, img, rad,
                train=True, mutable=["batch_stats"],
            )
            return sum(jnp.sum(d ** 2) for d in det) + jnp.sum(seg ** 2)

        val, g = jax.jit(jax.value_and_grad(loss))(params)
        out[remat] = (
            float(val),
            np.asarray(jnp.concatenate([x.ravel() for x in jax.tree.leaves(g)])),
        )
    return out


def test_fusion_remat_grads_exact(grad_by_mode):
    l0, g0 = grad_by_mode["none"]
    l1, g1 = grad_by_mode["fusion"]
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    assert np.isfinite(g1).all()
    # remat and no-remat are separately-compiled XLA programs: f32
    # reassociation can flip near-tie cluster argmax assignments, causing
    # isolated elementwise grad differences — compare in aggregate
    a = np.asarray(g0, np.float64)
    b = np.asarray(g1, np.float64)
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.01, f"whole-gradient relative L2 {rel}"


def test_blocks_remat_grads_match(grad_by_mode):
    """'blocks' checkpoints each ClusterBlock: the replayed mixer forward is
    the same XLA program shape as the saved one, so loss must match exactly
    and grads in aggregate (same near-tie argmax caveat as 'fusion')."""
    l0, g0 = grad_by_mode["none"]
    l1, g1 = grad_by_mode["blocks"]
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    assert np.isfinite(g1).all()
    a = np.asarray(g0, np.float64)
    b = np.asarray(g1, np.float64)
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.01, f"whole-gradient relative L2 {rel}"
