"""Lane-folded block kernels: equality with the unfolded kernels.

Folding packs s = 128/C consecutive W tokens into lanes ((B,H,W,C) ->
(B,H,W/s,s*C)) so stage-1/2 tensors stop paying the 128/C lane-padding tax
on every HBM/VMEM touch (round-3 trace: 8x padded stage-1 buffers).  The MXU
contractions are reassociated (permuted token order / block-diagonal
weights), so outputs match to f32-reassociation tolerance, not bit-exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.ops.block_pallas import (
    fused_mixer_block_stats,
    fused_mlp_block_pre,
    gn1_stats,
    lane_fold_choice,
)

B, H, W, C = 2, 64, 64, 16
HEADS, FOLD, PROP = 4, 4, 2
INNER = 128
HID = 4 * C


def _mixer_args(dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.5, dtype)
    gs = jnp.asarray(rng.standard_normal(C) * 0.1 + 1.0, jnp.float32)
    gb = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    wf = jnp.asarray(rng.standard_normal((C, INNER)) * 0.2, jnp.float32)
    bf = jnp.asarray(rng.standard_normal(INNER) * 0.1, jnp.float32)
    wv = jnp.asarray(rng.standard_normal((C, INNER)) * 0.2, jnp.float32)
    bv = jnp.asarray(rng.standard_normal(INNER) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((INNER, C)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    ls = jnp.asarray(rng.standard_normal(C) * 0.1 + 0.5, jnp.float32)
    al = jnp.asarray(1.3, jnp.float32)
    be = jnp.asarray(-0.2, jnp.float32)
    return x, gs, gb, wf, bf, wv, bv, w2, b2, ls, al, be


def _fold(x, s):
    b, h, w, c = x.shape
    return x.reshape(b, h, w // s, s * c)


def _unfold(x, s):
    b, h, wf, sc = x.shape
    return x.reshape(b, h, wf * s, sc // s)


def test_lane_fold_choice():
    assert lane_fold_choice((2, 64, 64, 16), fold_h=4, fold_w=4,
                            inner=128) == 8
    # production stage shapes (nano 512^2)
    assert lane_fold_choice((2, 128, 128, 16), fold_h=8, fold_w=8,
                            inner=128) == 8
    assert lane_fold_choice((2, 64, 64, 32), fold_h=4, fold_w=4,
                            inner=128) == 4
    assert lane_fold_choice((2, 32, 32, 80), fold_h=2, fold_w=2,
                            inner=256) == 1
    # inner not 128-aligned -> no fold
    assert lane_fold_choice((2, 64, 64, 16), fold_h=4, fold_w=4,
                            inner=96) == 1
    # token count too small after folding -> no fold
    assert lane_fold_choice((2, 32, 32, 16), fold_h=2, fold_w=2,
                            inner=128) == 1


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_mixer_folded_matches_unfolded(dtype):
    args = _mixer_args(dtype)
    x = args[0]
    s = lane_fold_choice(x.shape, fold_h=FOLD, fold_w=FOLD, inner=INNER)
    assert s == 8
    out, ostats = fused_mixer_block_stats(
        *args, HEADS, FOLD, FOLD, PROP, PROP)
    outf, ostatsf = fused_mixer_block_stats(
        _fold(x, s), *args[1:], HEADS, FOLD, FOLD, PROP, PROP, s)
    a = np.asarray(_unfold(outf, s), np.float32)
    b = np.asarray(out, np.float32)
    if dtype == jnp.float32:
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ostatsf, np.float32), np.asarray(ostats, np.float32),
            atol=1e-5, rtol=1e-5)
    else:
        # bf16: the folded token order reassociates the f32 similarity sums,
        # which can flip per-(region,head) argmax dispatch decisions at exact
        # ties — a handful of tokens then legitimately take the other
        # proposal's aggregate.  Require the bulk within bf16 tolerance and
        # the flip fraction tiny.
        close = np.isclose(a, b, atol=3e-2, rtol=3e-2)
        assert close.mean() > 0.99, f"bulk mismatch: {1 - close.mean():.4%}"
        assert np.abs(a[~close] - b[~close]).max() < 1.0
        np.testing.assert_allclose(
            np.asarray(ostatsf, np.float32), np.asarray(ostats, np.float32),
            atol=5e-2, rtol=5e-2)


def test_mixer_folded_grads_match():
    args = _mixer_args(jnp.float32)
    x = args[0]
    s = 8

    def loss_unfolded(*a):
        out, _ = fused_mixer_block_stats(*a, HEADS, FOLD, FOLD, PROP, PROP)
        return jnp.sum(out * jnp.cos(out * 0.1))

    def loss_folded(x, *rest):
        out, _ = fused_mixer_block_stats(
            _fold(x, s), *rest, HEADS, FOLD, FOLD, PROP, PROP, s)
        return jnp.sum(out * jnp.cos(out * 0.1))

    g0 = jax.grad(loss_unfolded, argnums=tuple(range(12)))(*args)
    g1 = jax.grad(loss_folded, argnums=tuple(range(12)))(*args)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_mlp_folded_matches_unfolded(dtype):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.5, dtype)
    gs = jnp.asarray(rng.standard_normal(C) * 0.1 + 1.0, jnp.float32)
    gb = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((C, HID)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(HID) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((HID, C)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    ls = jnp.asarray(rng.standard_normal(C) * 0.1 + 0.5, jnp.float32)
    s = 8
    stats = gn1_stats(x)
    out = fused_mlp_block_pre(x, stats, gs, gb, w1, b1, w2, b2, ls)
    outf = fused_mlp_block_pre(_fold(x, s), stats, gs, gb, w1, b1, w2, b2,
                               ls, s)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(_unfold(outf, s), np.float32),
        np.asarray(out, np.float32), atol=tol, rtol=tol)

    def loss(fold):
        def f(x, gs, gb, w1, b1, w2, b2, ls):
            xx = _fold(x, s) if fold else x
            st = gn1_stats(xx)
            o = fused_mlp_block_pre(xx, st, gs, gb, w1, b1, w2, b2, ls,
                                    s if fold else 1)
            return jnp.sum(o * jnp.cos(o * 0.1))
        return f

    if dtype == jnp.float32:
        a0 = (x, gs, gb, w1, b1, w2, b2, ls)
        g0 = jax.grad(loss(False), argnums=tuple(range(8)))(*a0)
        g1 = jax.grad(loss(True), argnums=tuple(range(8)))(*a0)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-4, rtol=2e-4)


def test_stage_folding_matches_unfused():
    """_Stage with use_pallas=True lane-folds at entry; results match the
    unfused module path (f32, CPU interpret kernels)."""
    from asy_vrnet_tpu.config import CoCVariant
    from asy_vrnet_tpu.models.vr_coc import _Stage

    v = CoCVariant(
        layers=(2,), embed_dims=(16,), mlp_ratios=(4,), downsamples=(True,),
        proposal_w=(2,), proposal_h=(2,), fold_w=(4,), fold_h=(4,),
        heads=(4,), head_dim=(32,),
    )
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 16)) * 0.5, jnp.float32)
    stage_p = _Stage(16, 2, 0, v, use_pallas=True, dtype=jnp.float32)
    stage_u = _Stage(16, 2, 0, v, use_pallas=False, dtype=jnp.float32)
    params = stage_u.init(jax.random.PRNGKey(0), x)["params"]
    out_p = stage_p.apply({"params": params}, x)
    out_u = stage_u.apply({"params": params}, x)
    assert out_p.shape == x.shape
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_u),
                               atol=5e-5, rtol=1e-4)

    def loss(fn):
        return lambda p: jnp.sum(
            fn.apply({"params": p}, x) * jnp.cos(0.1 * x))

    gp = jax.grad(loss(stage_p))(params)
    gu = jax.grad(loss(stage_u))(params)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_u = dict(jax.tree_util.tree_leaves_with_path(gu))
    for kp, vv in flat_p:
        np.testing.assert_allclose(
            np.asarray(vv), np.asarray(flat_u[kp]), atol=2e-3, rtol=2e-3,
            err_msg=str(kp))


def test_shuffle_attention_s2d_matches():
    from asy_vrnet_tpu.models.layers import ShuffleAttention

    rng = np.random.default_rng(3)
    c, s = 16, 8
    x = jnp.asarray(rng.standard_normal((2, 8, 32, c)), jnp.float32)
    sa = ShuffleAttention(groups=4, skip_final_shuffle=True)
    params = sa.init(jax.random.PRNGKey(0), x)["params"]
    ref = sa.apply({"params": params}, x)
    xf = x.reshape(2, 8, 32 // s, s * c)
    sa_f = ShuffleAttention(groups=4, skip_final_shuffle=True, s2d=s)
    out = sa_f.apply({"params": params}, xf).reshape(2, 8, 32, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_w_fold_conv_kernel_matches():
    """(1, s) s2d conv kernel: folded 3x3 conv == unfolded 3x3 conv."""
    from asy_vrnet_tpu.models.layers import s2d_conv_kernel

    rng = np.random.default_rng(4)
    cin, cout, s = 4, 16, 8
    x = jnp.asarray(rng.standard_normal((2, 8, 32, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.2, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xf = x.reshape(2, 8, 32 // s, s * cin)
    kk = s2d_conv_kernel(w, (1, s))
    offh, offw = kk.shape[0] // 2, kk.shape[1] // 2
    out = jax.lax.conv_general_dilated(
        xf, kk, (1, 1), [(offh, offh), (offw, offw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out.reshape(2, 8, 32, cout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_folded_fusion_backbone_matches():
    """VRCoC bf16 with folded stage+fusion spans == bf16 with folding
    disabled (use_pallas=False path), to bf16/argmax-tie tolerance."""
    from asy_vrnet_tpu.config import CoCVariant
    from asy_vrnet_tpu.models.vr_coc import VRCoC

    v = CoCVariant(
        layers=(1, 1), embed_dims=(16, 32), mlp_ratios=(4, 4),
        downsamples=(True, True), proposal_w=(2, 2), proposal_h=(2, 2),
        fold_w=(4, 2), fold_h=(4, 2), heads=(4, 4), head_dim=(32, 32),
        in_patch_size=4, in_stride=4, in_pad=0,
    )
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.standard_normal((2, 256, 256, 3)), jnp.float32)
    rad = jnp.asarray(rng.standard_normal((2, 256, 256, 4)), jnp.float32)
    net_p = VRCoC(variant=v, use_pallas=True, dtype=jnp.bfloat16)
    net_u = VRCoC(variant=v, use_pallas=False, dtype=jnp.bfloat16)
    variables = net_u.init(jax.random.PRNGKey(0), img, rad)
    outs_p = jax.jit(lambda vr: net_p.apply(vr, img, rad))(variables)
    outs_u = jax.jit(lambda vr: net_u.apply(vr, img, rad))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(outs_p),
                    jax.tree_util.tree_leaves(outs_u)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        close = np.isclose(a, b, atol=0.08, rtol=0.08)
        assert close.mean() > 0.98, f"{a.shape}: {1 - close.mean():.4%}"


def test_folded_fusion_grads_flow():
    """Folded fusion backward == unfolded backward: exact in f32 (jittered
    params — at the symmetric init several true grads are 0 and noise-vs-
    noise comparison is meaningless); bf16 checked for flow/finiteness."""
    from asy_vrnet_tpu.models.vr_coc import ImageEnhanceByRadar, RadarEnhanceByImage

    rng = np.random.default_rng(6)
    c, s = 16, 8
    img32 = jnp.asarray(rng.standard_normal((2, 8, 64, c)), jnp.float32)
    rad32 = jnp.asarray(rng.standard_normal((2, 8, 64, c)), jnp.float32)

    def jitter(tree, key):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        keys = jax.random.split(key, len(leaves))
        return treedef.unflatten([
            l + 0.3 * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, keys)
        ])

    for dt, tol in ((jnp.float32, 2e-4), (jnp.bfloat16, 0.12)):
        img, rad = img32.astype(dt), rad32.astype(dt)
        imgf = img.reshape(2, 8, 64 // s, s * c)
        radf = rad.reshape(2, 8, 64 // s, s * c)
        enh_u = ImageEnhanceByRadar(c, dtype=dt)
        renh_u = RadarEnhanceByImage(c, dtype=dt)
        enh_f = ImageEnhanceByRadar(c, s2d=s, s2d_geom=(1, s), dtype=dt)
        renh_f = RadarEnhanceByImage(c, s2d=s, dtype=dt)
        ve = enh_u.init(jax.random.PRNGKey(0), img, rad, True)
        vr = renh_u.init(jax.random.PRNGKey(1), img, rad, True)
        ve = {**ve, "params": jitter(ve["params"], jax.random.PRNGKey(7))}
        vr = {**vr, "params": jitter(vr["params"], jax.random.PRNGKey(8))}

        def loss(mods, p, fold):
            enh, renh = mods
            i = imgf if fold else img
            r = radf if fold else rad
            i2, _ = enh.apply({"params": p[0], "batch_stats": ve["batch_stats"]},
                              i, r, True, mutable=["batch_stats"])
            r2, _ = renh.apply({"params": p[1], "batch_stats": vr["batch_stats"]},
                               i2, r, True, mutable=["batch_stats"])
            return (jnp.sum(i2.astype(jnp.float32) ** 2)
                    + jnp.sum(r2.astype(jnp.float32) ** 2))

        p0 = (ve["params"], vr["params"])
        gu = jax.jit(jax.grad(lambda p: loss((enh_u, renh_u), p, False)))(p0)
        gf = jax.jit(jax.grad(lambda p: loss((enh_f, renh_f), p, True)))(p0)
        lu = jax.tree_util.tree_leaves_with_path(gu)
        lf = dict(jax.tree_util.tree_leaves_with_path(gf))
        assert len(lu) == len(lf)
        gscale = max(np.abs(np.asarray(x, np.float32)).max() for _, x in lu)
        assert np.isfinite(gscale) and gscale > 0
        for kp, a in lu:
            b = lf[kp]
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            np.testing.assert_allclose(b / gscale, a / gscale, atol=tol,
                                       err_msg=f"{dt.__name__} {kp}")
