"""Per-stage device-time breakdown of the fused train step.

Answers VERDICT.md "What's weak" #2: where do the ~14 ms/img of train-step
time go?  Uses the chained-fori_loop device-time protocol from bench.py /
BENCH_NOTES.md (the only honest timing through the axon relay): each stage is
chained N times inside one jit program with a data dependency between
iterations, and we difference N=NCHAIN vs N=1 so upload/round-trip costs
cancel.

Stages measured (each includes everything the previous rows include, so the
table also prints the *increments*, which are the per-component costs):

  fwd_eval    forward, train=False (the bench.py number)
  fwd_train   forward, train=True, mutable batch_stats
  loss_seg    + focal+dice segmentation loss at 512^2 (fp32)
  loss_det    + SimOTA assignment + YOLOX loss (fp32)  [measured vs fwd_train]
  loss_full   + both losses + multitask combine
  grad_fwd    value_and_grad of sum(outputs)  -> pure backward cost
  grad_seg    value_and_grad of fwd+seg loss
  grad_det    value_and_grad of fwd+det loss
  grad_full   value_and_grad of the full loss
  step_full   the real train_step: grad + optimiser + EMA update

Usage:  python tools/profile_train.py [--batch 16] [--chain 3]
"""
from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chain", type=int, default=3)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument(
        "--stages", type=str, default="",
        help="comma-separated subset of stage names to run",
    )
    ap.add_argument("--remat", default="none",
                    choices=["none", "fusion", "blocks", "stages"],
                    help="ModelConfig.train_remat mode to profile")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from asy_vrnet_tpu.config import Config, ModelConfig
    from asy_vrnet_tpu.data.synthetic import make_batch
    from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model
    from asy_vrnet_tpu.train.state import create_train_state
    from asy_vrnet_tpu.train.train_step import (
        build_train_step,
        detection_loss,
        segmentation_loss,
    )

    cfg = Config(model=ModelConfig(input_size=(args.hw, args.hw),
                                   train_remat=args.remat))
    model = create_model(cfg.model)
    params, bstats = init_model(model, jax.random.PRNGKey(0), batch_size=1)
    state, tx = create_train_state(cfg, params, bstats)
    train_step = build_train_step(model, cfg, tx)

    rng = np.random.default_rng(0)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_batch(
            rng, args.batch, (args.hw, args.hw), max_boxes=cfg.loss.max_boxes,
            boxes_per_image=8,
        ).items()
    }

    def perturbed(b, acc):
        b = dict(b)
        b["image"] = b["image"] + acc * 1e-12
        return b

    def fwd(params_, bstats_, b, train):
        if train:
            (det, seg), mut = model.apply(
                {"params": params_, "batch_stats": bstats_},
                b["image"], b["radar"], train=True, mutable=["batch_stats"],
            )
        else:
            det, seg = model.apply(
                {"params": params_, "batch_stats": bstats_},
                b["image"], b["radar"], train=False,
            )
        return det, seg

    def outsum(det, seg):
        return sum(jnp.sum(d.astype(jnp.float32)) for d in det) + jnp.sum(
            seg.astype(jnp.float32)
        )

    # ---- scalar-valued stages: chained via an accumulator ------------------
    def mk_scalar_stage(fn):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chained(state_, b, n):
            def body(k, acc):
                return acc + fn(state_, perturbed(b, acc))

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return chained

    def s_fwd_eval(st, b):
        return outsum(*fwd(st.params, st.batch_stats, b, False))

    def s_fwd_train(st, b):
        return outsum(*fwd(st.params, st.batch_stats, b, True))

    def s_loss_seg(st, b):
        det, seg = fwd(st.params, st.batch_stats, b, True)
        return outsum(det, seg) * 0 + segmentation_loss(
            cfg, seg, b["seg_target"], b["seg_onehot"]
        ) + sum(jnp.sum(d.astype(jnp.float32)) * 1e-12 for d in det)

    def s_loss_det(st, b):
        det, seg = fwd(st.params, st.batch_stats, b, True)
        loss, _ = detection_loss(cfg, det, b)
        return loss + jnp.sum(seg.astype(jnp.float32)) * 1e-12

    def s_loss_full(st, b):
        det, seg = fwd(st.params, st.batch_stats, b, True)
        lseg = segmentation_loss(cfg, seg, b["seg_target"], b["seg_onehot"])
        ldet, _ = detection_loss(cfg, det, b)
        return ldet + cfg.loss.seg_weight * lseg

    def mk_grad_stage(loss_of_params):
        def stage(st, b):
            g = jax.grad(lambda p: loss_of_params(p, st, b))(st.params)
            return jax.tree.reduce(
                lambda a, x: a + jnp.sum(jnp.abs(x.astype(jnp.float32))) * 1e-12,
                g,
                jnp.float32(0.0),
            )

        return stage

    def l_fwd(p, st, b):
        return outsum(*fwd(p, st.batch_stats, b, True))

    def l_seg(p, st, b):
        det, seg = fwd(p, st.batch_stats, b, True)
        return segmentation_loss(cfg, seg, b["seg_target"], b["seg_onehot"]) + outsum(
            det, seg
        ) * 1e-12

    def l_det(p, st, b):
        det, seg = fwd(p, st.batch_stats, b, True)
        loss, _ = detection_loss(cfg, det, b)
        return loss + jnp.sum(seg.astype(jnp.float32)) * 1e-12

    def l_full(p, st, b):
        det, seg = fwd(p, st.batch_stats, b, True)
        lseg = segmentation_loss(cfg, seg, b["seg_target"], b["seg_onehot"])
        ldet, _ = detection_loss(cfg, det, b)
        return ldet + cfg.loss.seg_weight * lseg

    # ---- full step: chained by threading the state --------------------------
    @functools.partial(jax.jit, static_argnames=("n",))
    def chained_step(state_, b, n):
        def body(k, carry):
            st, acc = carry
            st, metrics = train_step(st, perturbed(b, acc))
            return (st, acc + metrics["loss"] * 1e-12)

        _, acc = jax.lax.fori_loop(0, n, body, (state_, jnp.float32(0.0)))
        return acc

    # grad + trivial param update (no optimiser, no EMA): isolates the cost of
    # params CHANGING between chained iterations (bf16 casts + fused-kernel
    # weight folding re-run per step; loop-invariant in the grad_* stages)
    @functools.partial(jax.jit, static_argnames=("n",))
    def chained_step_noopt(state_, b, n):
        def body(k, carry):
            p, acc = carry
            val, g = jax.value_and_grad(
                lambda q: l_full(q, state_, perturbed(b, acc))
            )(p)
            p = jax.tree.map(lambda x, gg: x - 1e-12 * gg, p, g)
            return (p, acc + val * 1e-12)

        p, acc = jax.lax.fori_loop(0, n, body, (state_.params, jnp.float32(0.0)))
        return acc + jnp.sum(jax.tree.leaves(p)[0].astype(jnp.float32)) * 1e-12

    stages = {
        "fwd_eval": mk_scalar_stage(s_fwd_eval),
        "fwd_train": mk_scalar_stage(s_fwd_train),
        "loss_seg": mk_scalar_stage(s_loss_seg),
        "loss_det": mk_scalar_stage(s_loss_det),
        "loss_full": mk_scalar_stage(s_loss_full),
        "grad_fwd": mk_scalar_stage(mk_grad_stage(l_fwd)),
        "grad_seg": mk_scalar_stage(mk_grad_stage(l_seg)),
        "grad_det": mk_scalar_stage(mk_grad_stage(l_det)),
        "grad_full": mk_scalar_stage(mk_grad_stage(l_full)),
        "step_full": chained_step,
        "step_noopt": chained_step_noopt,
    }
    if args.stages:
        keep = set(args.stages.split(","))
        stages = {k: v for k, v in stages.items() if k in keep}

    def run(fn, n: int) -> float:
        float(fn(state, batch, n))  # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(fn(state, batch, n))
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}
    print(f"batch={args.batch} hw={args.hw} chain={args.chain}")
    print(f"{'stage':<12} {'ms/iter':>9} {'ms/img':>8}")
    for name, fn in stages.items():
        try:
            t1 = run(fn, 1)
            tn = run(fn, args.chain)
            ms = (tn - t1) / (args.chain - 1) * 1e3
        except Exception as e:  # OOM etc. — report and continue
            print(f"{name:<12} FAILED: {type(e).__name__}: {str(e)[:120]}")
            continue
        results[name] = ms
        print(f"{name:<12} {ms:9.2f} {ms / args.batch:8.3f}")

    def diff(a, b, label):
        if a in results and b in results:
            print(f"  {label:<34} {results[a] - results[b]:8.2f} ms")

    print("\nincrements:")
    diff("fwd_train", "fwd_eval", "train-mode fwd extra (BN stats)")
    diff("loss_seg", "fwd_train", "seg loss fwd")
    diff("loss_det", "fwd_train", "det loss fwd (SimOTA)")
    diff("grad_fwd", "fwd_train", "pure backward")
    diff("grad_seg", "grad_fwd", "seg loss fwd+bwd")
    diff("grad_det", "grad_fwd", "det loss fwd+bwd")
    diff("grad_full", "grad_fwd", "both losses fwd+bwd")
    diff("step_full", "grad_full", "optimiser + EMA")
    if "step_full" in results:
        ms = results["step_full"]
        print(f"\nstep_full: {ms:.1f} ms/step = {args.batch / ms * 1e3:.1f} img/s/chip")


if __name__ == "__main__":
    main()
