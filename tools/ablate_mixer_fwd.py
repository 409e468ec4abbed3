"""Ablation microbench of the folded mixer forward kernel (stage-0 geometry).

Times pallas kernels that run successive PREFIXES of the mixer forward body
(_mixer_block_fwd_body_folded) to attribute the per-tile cost between the
matmul passes, the similarity-plane VPU chain, and the dispatch.  Used to aim
the round-4 kernel diet: the r4 sigmoid/argmax rework measured ~neutral, so
the binding constraint is NOT the removed elementwise passes — this tool
shows which prefix step actually pays.

Stages:
  gn       GN-normalise + write-through (I/O + stats floor)
  feat     + [1] block-diagonal token projection
  centers  + [2] pooled centers (xn_blk build, pool matmul, cn)
  sim      + [3-5] norms, similarity, argmax/mask/sim plane
  agg      + [6] aggregation, oc
  full     + [7] dispatch + output moments (== production kernel)

Usage: python tools/ablate_mixer_fwd.py [--batch 64] [--iters 5]
"""
from __future__ import annotations

import argparse
import functools


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--width", type=float, default=0.25)
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--gw", type=int, default=0, help="override region group width")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="/tmp/jaxtrace_ablate")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from asy_vrnet_tpu.config import COC_VARIANTS
    from asy_vrnet_tpu.ops import block_pallas as bp

    v = COC_VARIANTS["coc_small"]
    dims = v.scaled_dims(args.width)
    i = args.stage
    hw = args.hw // (4 * 2 ** i)
    c = dims[i]
    inner = v.heads[i] * v.head_dim[i]
    heads = v.heads[i]
    fold_h, fold_w = v.fold_h[i], v.fold_w[i]
    ph, pw = v.proposal_h[i], v.proposal_w[i]
    s = bp.lane_fold_choice((args.batch, hw, hw, c), fold_h=fold_h,
                            fold_w=fold_w, inner=inner)
    assert s > 1, "ablation targets the folded kernel"
    b = args.batch
    h, w = hw, hw
    rh, rw = h // fold_h, w // fold_w
    n = rh * rw
    m = ph * pw
    gw = args.gw or bp._group_w(fold_w, n)
    assert fold_w % gw == 0
    wt = gw * rw
    wtf = wt // s
    nt = rh * wt
    ntf = nt // s
    mb = gw * m
    hb = gw * heads * m
    sc = s * c
    f32 = jnp.float32
    mxu = jnp.bfloat16

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w // s, sc)), mxu)
    mk = lambda *shp: jnp.asarray(rng.standard_normal(shp) * 0.1, f32)
    wf, bf = mk(c, inner), mk(inner)
    wv, bv = mk(c, inner), mk(inner)
    w2, b2 = mk(inner, c), mk(c)
    stats = bp.gn1_stats(x)
    params = jnp.stack([jnp.float32(1.0), jnp.float32(0.0)])

    pool_p = jnp.asarray(bp._pool_perm((rh, rw), (ph, pw), gw, s), mxu)
    rep_np, hmask_np, headsel_np = bp._replication_and_masks(gw, heads, m, inner)
    rowhead = jnp.asarray(bp._rowhead_matrix(gw, heads, m), mxu)
    rmask = jnp.asarray(bp._rmask_perm(gw, heads, m, rh, rw, s))
    blockmask = jnp.asarray(bp._fold_blockmask(nt, s, c), mxu)
    wfb, wvb = wf.astype(mxu), wv.astype(mxu)

    selbd_np = np.zeros((s * inner, s * heads), np.float32)
    for p in range(s):
        selbd_np[p * inner : (p + 1) * inner, p * heads : (p + 1) * heads] = (
            np.asarray(bp._replication_and_masks(gw, heads, m, inner)[2]))
    selbd = jnp.asarray(selbd_np, mxu)
    selbdT = jnp.asarray(selbd_np.T, mxu)

    def kernel(params_ref, stats_ref, x_ref, wfbd_ref, bft_ref, wfrt_ref,
               bf_ref, wvrt_ref, bv_ref, w2t_ref, b2t_ref, pool_ref, rep_ref,
               hmask_ref, headsel_ref, rmask_ref, rowhead_ref, blockmask_ref,
               selbd_ref, selbdT_ref, out_ref, *, stop, variant="base"):
        alpha = params_ref[0]
        beta = params_ref[1]
        blk = x_ref[0]
        rhk, wtfk, sck = blk.shape
        ntfk = rhk * wtfk
        bi = pl.program_id(0)
        xf = blk.reshape(ntfk, sck).astype(f32)
        xn_f = (xf - stats_ref[bi, 0]) * stats_ref[bi, 1]
        xnb_f = xn_f.astype(mxu)
        seg = gw * heads

        if stop == "gn":
            out_ref[0] = xn_f.reshape(rhk, wtfk, sck).astype(out_ref.dtype)
            return
        feat_f = jax.lax.dot_general(
            xnb_f, wfbd_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32) + bft_ref[0]
        featb_f = feat_f.astype(mxu)
        if stop == "feat":
            out_ref[0] = (xf + jnp.sum(feat_f)).reshape(
                rhk, wtfk, sck).astype(out_ref.dtype)
            return
        xn_blk = jnp.concatenate([xnb_f] * s, axis=0) * blockmask_ref[:]
        cin_exp = jax.lax.dot_general(
            pool_ref[:], xn_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        cin_expb = cin_exp.astype(mxu)
        cp = jax.lax.dot_general(
            cin_expb, wfrt_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32) + bf_ref[0]
        vp = jax.lax.dot_general(
            cin_expb, wvrt_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32) + bv_ref[0]
        c_rep = jnp.dot(rep_ref[:], cp, preferred_element_type=f32) * hmask_ref[:]
        vc = jnp.dot(rep_ref[:], vp, preferred_element_type=f32) * hmask_ref[:]
        inv_c = jax.lax.rsqrt(jnp.sum(c_rep * c_rep, axis=1, keepdims=True) + 1e-12)
        cn = c_rep * inv_c
        cnb = cn.astype(mxu)
        if stop == "centers":
            out_ref[0] = (xf + jnp.sum(cn) + jnp.sum(vc)).reshape(
                rhk, wtfk, sck).astype(out_ref.dtype)
            return
        if variant in ("nf", "nfb"):
            # normalize-first: ONE full-width norm2 matmul + ONE head-expand
            # matmul + ONE multiply; per-p work shrinks to the cos matmul.
            # (mirrors production _mixer_block_fwd_body_folded post-r4)
            f2 = ((feat_f * feat_f)).astype(mxu)          # (ntf, s*I)
            norm2 = jax.lax.dot_general(
                f2, selbd_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)               # (ntf, s*heads)
            inv = jax.lax.rsqrt(norm2 + 1e-12)
            headexp = jax.lax.dot_general(
                inv.astype(mxu), selbdT_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)               # (ntf, s*I)
            featn = (feat_f * headexp).astype(mxu)
            if stop == "featn":
                out_ref[0] = (xf + jnp.sum(featn.astype(f32))).reshape(
                    rhk, wtfk, sck).astype(out_ref.dtype)
                return
            cos_ps = []
            for p in range(s):
                cp_ = jax.lax.dot_general(
                    cnb, featn[:, p * inner : (p + 1) * inner],
                    (((1,), (1,)), ((), ())), preferred_element_type=f32)
                cos_ps.append(cp_.astype(mxu) if variant == "nfb" else cp_)
            cos = jnp.concatenate(cos_ps, axis=1)
            if stop == "cosm":
                out_ref[0] = (xf + jnp.sum(cos.astype(f32))).reshape(
                    rhk, wtfk, sck).astype(out_ref.dtype)
                return
        else:
            inv_ps, invr_ps, raw_ps, cos_ps = [], [], [], []
            for p in range(s):
                feat_p = featb_f[:, p * inner : (p + 1) * inner]
                fp32 = feat_f[:, p * inner : (p + 1) * inner]
                f2_p = (fp32 * fp32).astype(mxu)
                norm2_p = jax.lax.dot_general(
                    f2_p, headsel_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                inv_p = jax.lax.rsqrt(norm2_p + 1e-12)
                invr_p = jax.lax.dot_general(
                    rowhead_ref[:], inv_p.astype(mxu), (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
                raw_p = jax.lax.dot_general(
                    cnb, feat_p, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
                inv_ps.append(inv_p)
                invr_ps.append(invr_p)
                raw_ps.append(raw_p)
                cos_ps.append(raw_p * invr_p)
            cos = jnp.concatenate(cos_ps, axis=1)
        rmask_k = rmask_ref[:]
        pt = cos.dtype
        x_sim = beta.astype(pt) + alpha.astype(pt) * cos
        x_m = jnp.where(rmask_k.astype(pt) > 0.0, x_sim, pt.type(-1e30))
        best = x_m[0:seg]
        arg = jnp.zeros_like(best, dtype=jnp.int32)
        for mm in range(1, m):
            part = x_m[mm * seg : (mm + 1) * seg]
            better = part > best
            best = jnp.where(better, part, best)
            arg = jnp.where(better, mm, arg)
        sgb = jax.nn.sigmoid(best.astype(f32)).astype(pt)
        mask = jnp.concatenate(
            [(arg == mm).astype(pt) for mm in range(m)], axis=0
        ) * rmask_k.astype(pt)
        sim = mask * jnp.concatenate([sgb] * m, axis=0)
        simb = sim.astype(mxu)
        counts = jnp.sum(mask, axis=1, keepdims=True, dtype=f32)
        icnt = 1.0 / (counts + 1.0)
        if stop == "sim":
            out_ref[0] = (xf + jnp.sum(sim, dtype=f32) + jnp.sum(icnt)
                          + jnp.sum(vc)).reshape(
                rhk, wtfk, sck).astype(out_ref.dtype)
            return
        aggx_exp = jax.lax.dot_general(
            simb, xn_blk, (((1,), (0,)), ((), ())), preferred_element_type=f32)
        rs = jnp.sum(sim, axis=1, keepdims=True, dtype=f32)
        agg = jax.lax.dot_general(
            aggx_exp.astype(mxu), wvrt_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32) + rs * bv_ref[0]
        oc = ((agg + vc) * icnt) * hmask_ref[:]
        if stop == "agg":
            out_ref[0] = (xf + jnp.sum(oc)).reshape(
                rhk, wtfk, sck).astype(out_ref.dtype)
            return
        ocw_t = jax.lax.dot_general(
            oc.astype(mxu), w2t_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(mxu)
        y_blk = jax.lax.dot_general(
            simb, ocw_t, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        ) * blockmask_ref[:]
        y_f = sum(y_blk[p * ntfk : (p + 1) * ntfk, :] for p in range(s))
        out = xf + y_f
        out_ref[0] = out.reshape(rhk, wtfk, sck).astype(out_ref.dtype)

    tile = pl.BlockSpec((1, rh, wtf, sc), lambda bi, i_, j_: (bi, i_, j_, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda bi, i_, j_: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)

    def build(stop, variant="base"):
        name = f"ablate_{variant}_{stop}" if variant != "base" else f"ablate_{stop}"

        def k(*a, _stop=stop, _v=variant):
            return kernel(*a, stop=_stop, variant=_v)
        k.__name__ = name

        def run(xx):
            return pl.pallas_call(
            k,
            grid=(b, fold_h, fold_w // gw),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                tile,
                const((sc, s * inner)), const((1, s * inner)),
                const((sc, inner)), const((1, inner)),
                const((sc, inner)), const((1, inner)),
                const((inner, sc)), const((1, sc)),
                const((nt, mb)), const((hb, mb)), const((hb, inner)),
                const((inner, heads)), const((hb, nt)), const((hb, heads)),
                const((nt, sc)),
                const((s * inner, s * heads)), const((s * heads, s * inner)),
            ],
            out_specs=tile,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=bp._block_compiler_params(),
        )(params, stats, xx,
          bp._bd_expand(wfb, s), jnp.tile(bf, s)[None],
          bp._row_tile(wfb, s), bf[None],
          bp._row_tile(wvb, s), bv[None],
          jnp.tile(w2.astype(mxu), (1, s)), jnp.tile(b2, s)[None],
          pool_p, jnp.asarray(rep_np), jnp.asarray(hmask_np),
          jnp.asarray(headsel_np, mxu), rmask, rowhead, blockmask,
          selbd, selbdT)

        run.__name__ = name
        return jax.jit(run)

    jobs = [("gn", "base"), ("feat", "base"), ("centers", "base"),
            ("sim", "base"), ("agg", "base"), ("full", "base"),
            ("featn", "nf"), ("cosm", "nf"), ("sim", "nf"),
            ("agg", "nf"), ("full", "nf")]
    progs = []
    for stop, variant in jobs:
        fn = build(stop, variant)
        jax.block_until_ready(fn(x))
        progs.append((f"{variant}_{stop}", fn))
        print("compiled", variant, stop)

    # numerics: nf vs base full outputs (bf16 path; assignments may flip on
    # exact ties only)
    byname = dict(progs)
    yb = np.asarray(byname["base_full"](x), np.float32)
    yn = np.asarray(byname["nf_full"](x), np.float32)
    d = np.abs(yb - yn)
    print(f"nf-vs-base max|diff| = {d.max():.3e}  mean|y| = {np.abs(yb).mean():.3e}")
    print(f"  frac > 1e-2: {(d > 1e-2).mean():.2e}   frac > 1e-1: {(d > 1e-1).mean():.2e}"
          f"   (tie-flip signature: tiny fraction, token-block sparsity)")

    import shutil
    shutil.rmtree(args.out, ignore_errors=True)
    jax.profiler.start_trace(args.out)
    for _ in range(args.iters):
        for _stop, fn in progs:
            out = fn(x)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    import sys
    sys.path.insert(0, "/root/repo/tools")
    from bench_kernels import kernel_table

    table = kernel_table(args.out, args.iters)
    rows = [(k2, v) for k2, v in table.items() if "ablate" in k2[0] or
            "_mixer" in k2[0] or "wrapped" in k2[0] or "pallas" in k2[0]]
    # pallas kernels all share a name; they appear in submission order per
    # iteration — print everything big instead and rely on the count column
    print(f"\n{'op class':<46}{'shape':<42}{'ms/iter':>9} {'count':>6}")
    for (nm, shape), (ms, kcnt) in sorted(table.items(), key=lambda t: -t[1][0]):
        if ms < 0.05:
            continue
        print(f"{nm:<46}{shape:<42}{ms:9.3f} {kcnt:6.1f}")


if __name__ == "__main__":
    main()
