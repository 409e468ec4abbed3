"""Residual backward kernels (VERDICT r4 #3) vs the full-remat backward.

The train forward kernels store small per-tile residuals — the winner-plane
cos/argmax (cbest/argf), the unnormalised centers (c_rep), the mixed centers
(oc) and the MLP's pre-GELU activations (z1) — and the backward kernels
consume them instead of rematerialising the whole 7-pass forward in-kernel.
These tests pin the A/B guarantee: with ASY_MIXER_BWD_RESIDUALS /
ASY_MLP_BWD_RESIDUALS toggled, gradients through the SAME fused entry points
must agree to f32 rounding tolerance (the only reassociations are
raw == cos/invr on the winner support and the re-derived inv_c).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.ops.block_pallas import (
    fused_mixer_block,
    fused_mixer_block_stats,
    fused_mlp_block,
    fused_mlp_block_pre,
    gn1_stats,
)

B, H, W, C = 2, 32, 32, 16
HEADS, FOLD, PROP = 4, 2, 2
INNER = 128
HID = 4 * C


def _mixer_args(seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.5, jnp.float32),
        jnp.asarray(rng.standard_normal(C) * 0.1 + 1.0, jnp.float32),
        jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((C, INNER)) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal(INNER) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((C, INNER)) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal(INNER) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((INNER, C)) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal(C) * 0.1 + 0.5, jnp.float32),
        jnp.asarray(1.3, jnp.float32),
        jnp.asarray(-0.2, jnp.float32),
    )


def _grads_both_paths(monkeypatch, flag, loss, args, argnums):
    out = {}
    for on in ("1", "0"):
        monkeypatch.setenv(flag, on)
        out[on] = jax.grad(loss, argnums=argnums)(*args)
    return out["1"], out["0"]


def test_mixer_residual_grads_match_remat(monkeypatch):
    args = _mixer_args()

    def loss(*a):
        out = fused_mixer_block(*a, HEADS, FOLD, FOLD, PROP, PROP)
        return jnp.sum(out * jnp.cos(out * 0.1))

    g_res, g_remat = _grads_both_paths(
        monkeypatch, "ASY_MIXER_BWD_RESIDUALS", loss, args, tuple(range(12)))
    for a, b in zip(g_res, g_remat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_mixer_residual_grads_match_remat_folded(monkeypatch):
    rng = np.random.default_rng(1)
    s = 8
    args = _mixer_args(1)
    x = jnp.asarray(rng.standard_normal((B, 64, 64, C)) * 0.5, jnp.float32)

    def loss(x, *rest):
        xf = x.reshape(B, 64, 64 // s, s * C)
        out, _ = fused_mixer_block_stats(
            xf, *rest, HEADS, 4, 4, PROP, PROP, s)
        return jnp.sum(out * jnp.cos(out * 0.1))

    g_res, g_remat = _grads_both_paths(
        monkeypatch, "ASY_MIXER_BWD_RESIDUALS", loss, (x,) + args[1:],
        tuple(range(12)))
    for a, b in zip(g_res, g_remat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_mlp_residual_grads_match_remat(monkeypatch):
    rng = np.random.default_rng(2)
    args = (
        jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.5, jnp.float32),
        jnp.asarray(rng.standard_normal(C) * 0.1 + 1.0, jnp.float32),
        jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((C, HID)) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal(HID) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((HID, C)) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal(C) * 0.1 + 0.5, jnp.float32),
    )

    def loss(*a):
        out = fused_mlp_block(*a)
        return jnp.sum(out * jnp.cos(out * 0.1))

    g_res, g_remat = _grads_both_paths(
        monkeypatch, "ASY_MLP_BWD_RESIDUALS", loss, args, tuple(range(8)))
    for a, b in zip(g_res, g_remat):
        # z1 residual is stored/reloaded in f32 here -> bitwise-equal remat
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_mlp_pre_residual_grads_match_remat(monkeypatch):
    rng = np.random.default_rng(3)
    s = 8
    x = jnp.asarray(rng.standard_normal((B, 64, 64, C)) * 0.5, jnp.float32)
    args = (
        jnp.asarray(rng.standard_normal(C) * 0.1 + 1.0, jnp.float32),
        jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((C, HID)) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal(HID) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((HID, C)) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal(C) * 0.1 + 0.5, jnp.float32),
    )

    def loss(x, *rest):
        xf = x.reshape(B, 64, 64 // s, s * C)
        stats = gn1_stats(xf)
        out = fused_mlp_block_pre(xf, stats, *rest, s)
        return jnp.sum(out * jnp.cos(out * 0.1))

    g_res, g_remat = _grads_both_paths(
        monkeypatch, "ASY_MLP_BWD_RESIDUALS", loss, (x,) + args,
        tuple(range(8)))
    for a, b in zip(g_res, g_remat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)
