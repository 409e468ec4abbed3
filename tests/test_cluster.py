"""The cluster token-mixer op against an independent per-region numpy oracle."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.ops.cluster import cluster_mix


def _oracle(feat, value, alpha, beta, heads, fold_h, fold_w, ph, pw):
    """Slow, loop-based re-statement of the Context-Cluster op.

    Works per (batch, head, region) with explicit token loops; independent of
    the vectorised implementation under test.
    """
    b, h, w, c = feat.shape
    d = c // heads
    rh, rw = h // fold_h, w // fold_w
    out = np.zeros_like(feat)

    def pool_windows(n, p):
        return [((i * n) // p, -((-(i + 1) * n) // p)) for i in range(p)]

    for bi in range(b):
        for e in range(heads):
            for fi in range(fold_h):
                for fj in range(fold_w):
                    # region tokens (rh*rw, d)
                    reg = feat[bi, fi * rh:(fi + 1) * rh, fj * rw:(fj + 1) * rw,
                               e * d:(e + 1) * d].reshape(-1, d)
                    val = value[bi, fi * rh:(fi + 1) * rh, fj * rw:(fj + 1) * rw,
                                e * d:(e + 1) * d].reshape(-1, d)
                    reg2d = reg.reshape(rh, rw, d)
                    val2d = val.reshape(rh, rw, d)
                    centers, vcenters = [], []
                    for (r0, r1) in pool_windows(rh, ph):
                        for (c0, c1) in pool_windows(rw, pw):
                            centers.append(reg2d[r0:r1, c0:c1].mean(axis=(0, 1)))
                            vcenters.append(val2d[r0:r1, c0:c1].mean(axis=(0, 1)))
                    centers = np.stack(centers)   # (M, d)
                    vcenters = np.stack(vcenters)

                    cn = centers / (np.linalg.norm(centers, axis=-1, keepdims=True) + 1e-12)
                    tn = reg / (np.linalg.norm(reg, axis=-1, keepdims=True) + 1e-12)
                    sim = 1.0 / (1.0 + np.exp(-(beta + alpha * cn @ tn.T)))  # (M,N)
                    assign = np.argmax(sim, axis=0)
                    mask = np.zeros_like(sim)
                    mask[assign, np.arange(sim.shape[1])] = 1.0
                    sim = sim * mask
                    counts = mask.sum(axis=1, keepdims=True)
                    out_c = (sim @ val + vcenters) / (counts + 1.0)   # (M,d)
                    disp = sim.T @ out_c                              # (N,d)
                    out[bi, fi * rh:(fi + 1) * rh, fj * rw:(fj + 1) * rw,
                        e * d:(e + 1) * d] = disp.reshape(rh, rw, d)
    return out


@pytest.mark.parametrize("hw,heads,fold,prop", [
    ((16, 16), 4, (2, 2), (2, 2)),
    ((16, 16), 2, (4, 4), (2, 2)),
    ((8, 8), 1, (1, 1), (2, 2)),
    ((12, 8), 2, (2, 2), (2, 2)),   # non-square map
    ((8, 8), 2, (2, 2), (3, 2)),    # asymmetric proposals, non-divisible pool
])
def test_cluster_matches_oracle(hw, heads, fold, prop):
    rng = np.random.default_rng(7)
    h, w = hw
    d = 8
    c = heads * d
    feat = rng.standard_normal((2, h, w, c)).astype(np.float32)
    value = rng.standard_normal((2, h, w, c)).astype(np.float32)
    alpha, beta = 1.3, -0.2
    ours = np.asarray(
        jax.jit(
            lambda f, v: cluster_mix(
                f, v, jnp.float32(alpha), jnp.float32(beta),
                heads=heads, fold_h=fold[0], fold_w=fold[1],
                proposal_h=prop[0], proposal_w=prop[1],
            )
        )(feat, value)
    )
    ref = _oracle(feat, value, alpha, beta, heads, fold[0], fold[1], prop[0], prop[1])
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_cluster_return_center_shape():
    rng = np.random.default_rng(8)
    feat = rng.standard_normal((1, 8, 8, 8)).astype(np.float32)
    out = cluster_mix(
        jnp.asarray(feat), jnp.asarray(feat), jnp.float32(1.0), jnp.float32(0.0),
        heads=2, fold_h=2, fold_w=2, proposal_h=2, proposal_w=2,
        return_center=True,
    )
    assert out.shape == (1, 2, 4, 4, 4)  # (B, heads, R, M, D)


def test_cluster_grad_flows():
    feat = jnp.ones((1, 8, 8, 8)) * 0.3
    value = jnp.ones((1, 8, 8, 8)) * 0.1

    def loss(f, v):
        return jnp.sum(
            cluster_mix(
                f, v, jnp.float32(1.0), jnp.float32(0.0),
                heads=2, fold_h=2, fold_w=2, proposal_h=2, proposal_w=2,
            ) ** 2
        )

    g = jax.grad(loss, argnums=(0, 1))(feat, value)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in g)
