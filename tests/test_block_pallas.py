"""Fused ClusterBlock kernels (ops/block_pallas.py) vs the module path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.models.cluster_block import ClusterBlock
from asy_vrnet_tpu.ops.block_pallas import (
    _mixer_block_ref,
    _mlp_block_ref,
    fused_mixer_block,
    fused_mlp_block,
    mixer_block_supported,
)

B, H, W, C = 2, 32, 32, 16
HEADS, HEAD_DIM, FOLD, PROP = 4, 32, 2, 2
INNER = HEADS * HEAD_DIM


def _mk_block(use_pallas):
    return ClusterBlock(
        dim=C, mlp_ratio=8.0, heads=HEADS, head_dim=HEAD_DIM,
        fold_h=FOLD, fold_w=FOLD, proposal_h=PROP, proposal_w=PROP,
        use_pallas=use_pallas, dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def block_setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    params = _mk_block(True).init(jax.random.PRNGKey(0), x)["params"]
    # non-trivial affine/scale params so folding is actually exercised
    params = jax.tree.map(
        lambda v: v + jnp.asarray(
            np.random.default_rng(1).normal(0, 0.05, v.shape), v.dtype),
        params,
    )
    return params, x


def test_fused_path_is_taken(block_setup):
    assert mixer_block_supported(
        (B, H, W, C), heads=HEADS, head_dim=HEAD_DIM, fold_h=FOLD,
        fold_w=FOLD, proposal_h=PROP, proposal_w=PROP)


def test_mixer_kernel_matches_ref(block_setup):
    params, x = block_setup
    rng = np.random.default_rng(2)
    args = (
        x,
        jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1 + 1.0,
        jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1,
        jnp.asarray(rng.standard_normal((C, INNER)), jnp.float32) * 0.2,
        jnp.asarray(rng.standard_normal(INNER), jnp.float32) * 0.1,
        jnp.asarray(rng.standard_normal((C, INNER)), jnp.float32) * 0.2,
        jnp.asarray(rng.standard_normal(INNER), jnp.float32) * 0.1,
        jnp.asarray(rng.standard_normal((INNER, C)), jnp.float32) * 0.2,
        jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1,
        jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.05 + 1.0,
        jnp.float32(1.0), jnp.float32(0.0),
    )
    out_k = fused_mixer_block(*args, HEADS, FOLD, FOLD, PROP, PROP)
    out_r = _mixer_block_ref(*args, HEADS, FOLD, FOLD, PROP, PROP)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-5, rtol=1e-5)


def test_mlp_kernel_matches_ref(block_setup):
    _, x = block_setup
    rng = np.random.default_rng(3)
    hid = 64
    args = (
        x,
        jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1 + 1.0,
        jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1,
        jnp.asarray(rng.standard_normal((C, hid)), jnp.float32) * 0.2,
        jnp.asarray(rng.standard_normal(hid), jnp.float32) * 0.1,
        jnp.asarray(rng.standard_normal((hid, C)), jnp.float32) * 0.2,
        jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1,
        jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.05 + 1.0,
    )
    out_k = fused_mlp_block(*args)
    out_r = _mlp_block_ref(*args)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-5, rtol=1e-5)


def test_fused_block_matches_module_path(block_setup):
    """ClusterBlock(use_pallas=True) (fused kernels) == use_pallas=False
    (module composition) with identical params, values and gradients."""
    params, x = block_setup
    out_f = _mk_block(True).apply({"params": params}, x)
    out_u = _mk_block(False).apply({"params": params}, x)
    assert out_f.shape == x.shape
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               atol=5e-5, rtol=1e-4)

    def loss(mod):
        def f(p, xx):
            return jnp.sum(mod.apply({"params": p}, xx) ** 2)
        return f

    gf_p, gf_x = jax.grad(loss(_mk_block(True)), argnums=(0, 1))(params, x)
    gu_p, gu_x = jax.grad(loss(_mk_block(False)), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gu_x),
                               atol=1e-3, rtol=1e-3)
    flat_f = jax.tree_util.tree_flatten_with_path(gf_p)[0]
    flat_u = dict(jax.tree_util.tree_flatten_with_path(gu_p)[0])
    assert flat_f
    for kp, v in flat_f:
        ref = flat_u[kp]
        scale = max(float(jnp.max(jnp.abs(ref))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref), atol=2e-3 * scale, rtol=2e-3,
            err_msg=str(kp),
        )
        # every param receives real gradient signal through the fused path
        assert bool(jnp.any(v != 0)), kp


def test_fused_block_bf16():
    rng = np.random.default_rng(5)
    x32 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    blk16 = ClusterBlock(
        dim=C, mlp_ratio=8.0, heads=HEADS, head_dim=HEAD_DIM,
        fold_h=FOLD, fold_w=FOLD, proposal_h=PROP, proposal_w=PROP,
        use_pallas=True, dtype=jnp.bfloat16,
    )
    blk16_ref = ClusterBlock(
        dim=C, mlp_ratio=8.0, heads=HEADS, head_dim=HEAD_DIM,
        fold_h=FOLD, fold_w=FOLD, proposal_h=PROP, proposal_w=PROP,
        use_pallas=False, dtype=jnp.bfloat16,
    )
    params = blk16.init(jax.random.PRNGKey(0), x32.astype(jnp.bfloat16))["params"]
    x = x32.astype(jnp.bfloat16)
    out_f = blk16.apply({"params": params}, x)
    out_u = blk16_ref.apply({"params": params}, x)
    assert out_f.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_f, np.float32), np.asarray(out_u, np.float32),
        atol=0.05, rtol=0.05,
    )
