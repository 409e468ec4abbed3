"""Space-to-depth pre-stem (ModelConfig.prestem_s2d) vs the standard layout.

The s2d pre-stem is a pure layout rework — same parameters, same math, the
only differences are fp32 summation order inside convs.  Forward outputs,
gradients and BN batch-stat updates must match the full-resolution path to
reassociation tolerance.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.config import ModelConfig
from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model


@pytest.fixture(scope="module")
def both_paths():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    rad = jnp.asarray(rng.standard_normal((2, 64, 64, 4)), jnp.float32)
    out = {}
    params0 = None
    for s2d in (False, True):
        cfg = ModelConfig(
            phi="nano", compute_dtype="float32", use_pallas_cluster=False,
            input_size=(64, 64), prestem_s2d=s2d,
        )
        model = create_model(cfg)
        params, bstats = init_model(model, jax.random.PRNGKey(0), input_size=(64, 64))
        if params0 is None:
            params0, bstats0 = params, bstats
        else:
            # identical init: the s2d path declares the exact same tree
            assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params0)
        def fwd(p, bs):
            (det, seg), mut = model.apply(
                {"params": p, "batch_stats": bs}, img, rad,
                train=True, mutable=["batch_stats"],
            )
            return det, seg, mut["batch_stats"]

        det, seg, new_bs = jax.jit(fwd)(params0, bstats0)

        def loss(p):
            (d, s), _ = model.apply(
                {"params": p, "batch_stats": bstats0}, img, rad,
                train=True, mutable=["batch_stats"],
            )
            return sum(jnp.sum(x ** 2) for x in d) + jnp.sum(s ** 2)

        g = jax.jit(jax.grad(loss))(params0)
        out[s2d] = (det, seg, new_bs, g)
    return out


def test_s2d_forward_matches(both_paths):
    det0, seg0, bs0, _ = both_paths[False]
    det1, seg1, bs1, _ = both_paths[True]
    for a, b in zip(det0, det1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(seg0), np.asarray(seg1), atol=2e-4, rtol=1e-4)


def test_s2d_batch_stats_match(both_paths):
    bs0 = both_paths[False][2]
    bs1 = both_paths[True][2]
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(bs0)[0],
        jax.tree_util.tree_flatten_with_path(bs1)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4, err_msg=str(kp)
        )


def test_s2d_grads_match(both_paths):
    g0 = both_paths[False][3]
    g1 = both_paths[True][3]
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    norms = [float(np.linalg.norm(np.asarray(a, np.float64))) for _, a in flat0]
    # floor: leaves whose gradient is essentially zero (ReLU/BN cancellation
    # leaves bias grads at ~1e-5 of the typical scale) carry no direction to
    # compare — only reassociation noise
    floor = 1e-4 * max(norms)
    whole0 = np.concatenate([np.asarray(a, np.float64).ravel() for _, a in flat0])
    whole1 = np.concatenate([np.asarray(b, np.float64).ravel() for _, b in flat1])
    total_rel = np.linalg.norm(whole0 - whole1) / np.linalg.norm(whole0)
    assert total_rel < 0.01, f"whole-gradient relative L2 {total_rel}"
    for (kp, a), (_, b), na in zip(flat0, flat1, norms):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        rel = np.linalg.norm(a - b) / max(na, floor)
        assert rel < 0.02, f"{kp}: relative L2 {rel}"


def test_fold_conv_matches_literal_s2d(monkeypatch):
    """Round-5 fold-conv entry (ASY_PRESTEM_FOLD_CONV): ONE strided conv
    computing cast+space_to_depth+initial 1x1 must equal the literal
    astype -> space_to_depth -> s2d PointReducer chain to reassociation
    tolerance, in both compute dtypes, including gradients."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    rad = jnp.asarray(rng.standard_normal((2, 64, 64, 4)), jnp.float32)
    for dtype in ("float32", "bfloat16"):
        cfg = ModelConfig(
            phi="nano", compute_dtype=dtype, use_pallas_cluster=False,
            input_size=(64, 64), prestem_s2d=True,
        )
        model = create_model(cfg)
        params, bstats = init_model(
            model, jax.random.PRNGKey(0), input_size=(64, 64)
        )

        def loss(p):
            (d, s), _ = model.apply(
                {"params": p, "batch_stats": bstats}, img, rad,
                train=True, mutable=["batch_stats"],
            )
            return sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in d) \
                + jnp.sum(s.astype(jnp.float32) ** 2)

        outs = {}
        for flag in ("1", "0"):
            monkeypatch.setenv("ASY_PRESTEM_FOLD_CONV", flag)
            fwd = jax.jit(
                lambda p, b, i, r: model.apply(
                    {"params": p, "batch_stats": b}, i, r, train=False
                )
            )
            det, seg = fwd(params, bstats, img, rad)
            g = jax.jit(jax.grad(loss))(params)
            jax.clear_caches()  # env is baked into the trace
            outs[flag] = (det, seg, g)
        tol = 1e-5 if dtype == "float32" else 3e-2
        for a, b in zip(outs["1"][0], outs["0"][0]):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=tol, rtol=tol, err_msg=dtype,
            )
        np.testing.assert_allclose(
            np.asarray(outs["1"][1], np.float32),
            np.asarray(outs["0"][1], np.float32),
            atol=tol, rtol=tol, err_msg=dtype,
        )
        fa = jax.tree_util.tree_flatten_with_path(outs["1"][2])[0]
        fb = jax.tree_util.tree_flatten_with_path(outs["0"][2])[0]
        wa = np.concatenate([np.asarray(a, np.float64).ravel() for _, a in fa])
        wb = np.concatenate([np.asarray(b, np.float64).ravel() for _, b in fb])
        rel = np.linalg.norm(wa - wb) / np.linalg.norm(wa)
        # f32: the conv backward's weight-grad reduction order differs from
        # the einsum path's (measured 1.3e-5 whole-gradient relative L2)
        assert rel < (1e-4 if dtype == "float32" else 1e-2), (dtype, rel)
