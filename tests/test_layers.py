"""Layer-primitive parity tests (torch used as a generic numerical oracle)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.models.layers import (
    ConvBnAct,
    ECA,
    GroupNorm1,
    Mlp,
    ShuffleAttention,
    channel_shuffle,
    eca_kernel_size,
)

torch = pytest.importorskip("torch")


def test_channel_shuffle_matches_torch_semantics():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 3, 8)).astype(np.float32)
    ours = np.asarray(channel_shuffle(jnp.asarray(x), 2))
    # torch formulation: view(b, g, c/g, h, w).transpose(1,2).reshape
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    b, c, h, w = t.shape
    ref = t.view(b, 2, c // 2, h, w).transpose(1, 2).reshape(b, c, h, w)
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, ref)
    # non-divisible channel count is the identity
    x5 = rng.standard_normal((1, 2, 2, 5)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(channel_shuffle(jnp.asarray(x5), 2)), x5)


def test_eca_kernel_size_table():
    # hand-computed from eca.py:9-10
    assert eca_kernel_size(8) == 3       # (3+1)/2 = 2 -> 3
    assert eca_kernel_size(64) == 3      # (6+1)/2 = 3 (odd)
    assert eca_kernel_size(160) == 5     # (7.32+1)/2 = 4 -> 5
    assert eca_kernel_size(512) == 5     # (9+1)/2 = 5


def test_eca_matches_manual():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    mod = ECA()
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(mod.apply(v, jnp.asarray(x)))
    w = np.asarray(v["params"]["conv_w"])[0, 0]  # (k,)
    k = w.shape[0]
    pooled = x.mean(axis=(1, 2))  # (B, C)
    pad = np.pad(pooled, ((0, 0), (k // 2, k // 2)))
    conv = np.stack(
        [sum(w[j] * pad[:, i + j] for j in range(k)) for i in range(x.shape[-1])],
        axis=-1,
    )
    gate = 1.0 / (1.0 + np.exp(-conv))
    ref = x * gate[:, None, None, :]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_shuffle_attention_identity_at_init_structure():
    """At init (cweight=0,cbias=1,sweight=0,sbias=1) both gates are
    sigmoid(1)≈0.731, so out == shuffle(x)*0.731... verify against manual."""
    rng = np.random.default_rng(2)
    c, g = 32, 4
    x = rng.standard_normal((2, 4, 4, c)).astype(np.float32)
    mod = ShuffleAttention(groups=g)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(mod.apply(v, jnp.asarray(x)))
    s = 1.0 / (1.0 + np.exp(-1.0))
    expected = np.asarray(channel_shuffle(jnp.asarray(x * s), 2))
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_shuffle_attention_matches_torch_module():
    """Full parity against an inline torch statement of SA (random params)."""
    rng = np.random.default_rng(3)
    c, g = 16, 2
    c2g = c // (2 * g)
    x = rng.standard_normal((2, 5, 5, c)).astype(np.float32)
    mod = ShuffleAttention(groups=g)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = dict(v["params"])
    for key in params:
        params[key] = jnp.asarray(rng.standard_normal(c2g).astype(np.float32))
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    b, _, h, w = t.shape
    tg = t.reshape(b * g, -1, h, w)
    x0, x1 = tg.chunk(2, dim=1)
    cw = torch.from_numpy(np.asarray(params["cweight"])).view(1, -1, 1, 1)
    cb = torch.from_numpy(np.asarray(params["cbias"])).view(1, -1, 1, 1)
    sw = torch.from_numpy(np.asarray(params["sweight"])).view(1, -1, 1, 1)
    sb = torch.from_numpy(np.asarray(params["sbias"])).view(1, -1, 1, 1)
    gn = torch.nn.GroupNorm(c2g, c2g)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(np.asarray(params["gn_scale"])))
        gn.bias.copy_(torch.from_numpy(np.asarray(params["gn_bias"])))
    xc = x0 * torch.sigmoid(cw * torch.nn.functional.adaptive_avg_pool2d(x0, 1) + cb)
    xs = x1 * torch.sigmoid(sw * gn(x1) + sb)
    out = torch.cat([xc, xs], dim=1).view(b, -1, h, w)
    out = out.view(b, 2, c // 2, h, w).transpose(1, 2).reshape(b, c, h, w)
    ref = np.transpose(out.detach().numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_convbnact_train_vs_eval_and_momentum():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    mod = ConvBnAct(features=6, kernel_size=3, act="relu")
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    # train step mutates batch_stats with torch momentum 0.03
    out, mutated = mod.apply(
        v, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )
    assert out.shape == (4, 8, 8, 6)
    old_mean = np.asarray(v["batch_stats"]["bn"]["mean"])
    new_mean = np.asarray(mutated["batch_stats"]["bn"]["mean"])
    # conv output batch mean
    conv_out = mod.apply(v, jnp.asarray(x), train=True, mutable=["batch_stats"])[0]
    assert not np.allclose(old_mean, new_mean)
    # eval path uses running stats: deterministic, no mutation needed
    out_eval = mod.apply(v, jnp.asarray(x), train=False)
    assert np.all(np.isfinite(np.asarray(out_eval)))


def test_groupnorm1_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 4, 4, 6)).astype(np.float32)
    mod = GroupNorm1()
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(mod.apply(v, jnp.asarray(x)))
    gn = torch.nn.GroupNorm(1, 6)
    ref = np.transpose(gn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).detach().numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mlp_exact_gelu():
    """torch nn.GELU is erf-based; verify our Mlp uses the exact variant."""
    x = jnp.linspace(-3, 3, 13).reshape(1, 1, 1, 13)
    mod = Mlp(hidden_features=13, out_features=13)
    v = mod.init(jax.random.PRNGKey(0), x)
    # identity-ish check via the activation itself
    from asy_vrnet_tpu.models.layers import get_activation
    ours = np.asarray(get_activation("gelu")(x))
    ref = torch.nn.functional.gelu(torch.from_numpy(np.asarray(x))).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)
