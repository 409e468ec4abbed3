"""Per-stage microbench of the fused ClusterBlock Pallas kernels (fwd + bwd).

Times each stage's mixer-half and MLP-half kernels in isolation at production
geometry (default bs=64 @ 512^2, the bench.py train sweet spot), via the
jax.profiler trace (the only honest TPU timing through the axon relay — see
BENCH_NOTES.md).  Use to attribute the kernel share of the train step and to
A/B backward-kernel changes (VERDICT r3 #2) without re-running a full step.

Usage:
  python tools/bench_kernels.py [--batch 64] [--hw 512] [--iters 5] [--stages 0,1,2,3]
"""
from __future__ import annotations

import argparse
import collections
import glob
import re


def _trace_device_events(trace_dir: str):
    """Per-op device events from the trace, json-first, xplane.pb fallback."""
    import gzip
    import json
    import os
    import sys

    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    allev = []
    if files:
        with gzip.open(files[-1]) as f:
            d = json.load(f)
        dev_pid = None
        for e in d["traceEvents"]:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                if "TPU" in str(e["args"].get("name")):
                    dev_pid = e["pid"]
        allev = [
            e for e in d["traceEvents"]
            if e.get("ph") == "X" and e.get("pid") == dev_pid
        ]
    if not allev:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from xplane import load_xspace

        pbs = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
        for plane in load_xspace(pbs[-1]) if pbs else []:
            if "TPU" not in plane["name"]:
                continue
            for line in plane["lines"]:
                for name, _off, dur in line["events"]:
                    allev.append({"name": name, "dur": dur / 1e6})
    return allev


def kernel_table(trace_dir: str, iters: int):
    """Aggregate device time by (op class, result shape).

    Keying on the shape separates THIS process's kernels from any concurrent
    TPU client's (the trace records the whole device timeline — a training
    run sharing the chip lands its same-named kernels in the window; its
    batch/tile shapes differ).  Shape is "?" for xplane.pb-fallback events.
    """
    klass = lambda n: re.sub(r"\.\d+$", "", n)
    g = collections.Counter()
    cnt = collections.Counter()
    for e in _trace_device_events(trace_dir):
        n = e["name"]
        if n.isdigit() or n.startswith("jit_"):
            continue
        shape = str(e.get("args", {}).get("shape_with_layout", "?"))[:40]
        key = (klass(n), shape)
        g[key] += e["dur"]
        cnt[key] += 1
    return {k: (us / iters / 1e3, cnt[k] / iters) for k, us in g.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--width", type=float, default=0.25,
                    help="backbone width multiplier (0.25 = phi=nano, the "
                         "flagship/bench geometry; 1.0 = unscaled coc_small)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--stages", default="0,1,2,3")
    ap.add_argument("--mlp", action="store_true", help="also bench the MLP half")
    ap.add_argument("--out", default="/tmp/jaxtrace_kernels")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from asy_vrnet_tpu.config import COC_VARIANTS
    from asy_vrnet_tpu.ops.block_pallas import (
        fused_mixer_block_stats,
        fused_mlp_block_pre,
        gn1_stats,
        lane_fold_choice,
    )

    v = COC_VARIANTS["coc_small"]
    dims = v.scaled_dims(args.width)
    stages = [int(s) for s in args.stages.split(",")]
    rng = np.random.default_rng(0)
    mxu = jnp.bfloat16

    progs = []  # (label, jitted fn, args)
    for i in stages:
        hw = args.hw // (4 * 2 ** i)
        c = dims[i]
        inner = v.heads[i] * v.head_dim[i]
        s = lane_fold_choice((args.batch, hw, hw, c),
                             fold_h=v.fold_h[i], fold_w=v.fold_w[i], inner=inner)
        shape = (args.batch, hw, hw // s, s * c) if s > 1 else (args.batch, hw, hw, c)
        x = jnp.asarray(rng.standard_normal(shape), mxu)
        mk = lambda *sh: jnp.asarray(rng.standard_normal(sh) * 0.1, jnp.float32)
        wts = dict(
            gn_scale=mk(c) + 1.0, gn_bias=mk(c),
            wf=mk(c, inner), bf=mk(inner), wv=mk(c, inner), bv=mk(inner),
            w2=mk(inner, c), b2=mk(c), ls1=mk(c) + 1.0,
        )
        alpha = jnp.float32(1.0)
        beta = jnp.float32(0.0)
        static = (v.heads[i], v.fold_h[i], v.fold_w[i],
                  v.proposal_h[i], v.proposal_w[i], s)

        def mixer_fwd(x, w, _s=static):
            out, stats = fused_mixer_block_stats(
                x, w["gn_scale"], w["gn_bias"], w["wf"], w["bf"], w["wv"],
                w["bv"], w["w2"], w["b2"], w["ls1"], alpha, beta, *_s)
            return out, stats

        def mixer_loss(x, w, _s=static):
            out, _ = mixer_fwd(x, w, _s)
            return jnp.sum(out.astype(jnp.float32))

        progs.append((f"stage{i} mixer fwd", jax.jit(mixer_fwd), (x, wts)))
        progs.append((f"stage{i} mixer f+b",
                      jax.jit(jax.grad(mixer_loss, argnums=(0, 1))), (x, wts)))

        if args.mlp:
            hid = int(c * v.mlp_ratios[i])
            mwts = dict(
                gn_scale=mk(c) + 1.0, gn_bias=mk(c),
                w1=mk(c, hid), b1=mk(hid), w2=mk(hid, c), b2=mk(c),
                ls2=mk(c) + 1.0,
            )
            stats = gn1_stats(x)

            def mlp_fwd(x, st, w, _lf=s):
                return fused_mlp_block_pre(
                    x, st, w["gn_scale"], w["gn_bias"], w["w1"], w["b1"],
                    w["w2"], w["b2"], w["ls2"], _lf)

            def mlp_loss(x, st, w, _lf=s):
                return jnp.sum(mlp_fwd(x, st, w, _lf).astype(jnp.float32))

            progs.append((f"stage{i} mlp fwd", jax.jit(mlp_fwd), (x, stats, mwts)))
            progs.append((f"stage{i} mlp f+b",
                          jax.jit(jax.grad(mlp_loss, argnums=(0, 2))),
                          (x, stats, mwts)))

    # compile + warm everything first so the trace holds steady-state runs
    for label, fn, a in progs:
        jax.block_until_ready(fn(*a))
        print(f"compiled {label}")

    import shutil
    shutil.rmtree(args.out, ignore_errors=True)
    jax.profiler.start_trace(args.out)
    for _ in range(args.iters):
        for _label, fn, a in progs:
            out = fn(*a)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    table = kernel_table(args.out, args.iters)
    print(f"\n{'op class':<46}{'shape':<42}{'ms/iter':>9} {'count':>6}")
    for (n, shape), (ms, k) in sorted(table.items(), key=lambda t: -t[1][0]):
        if ms < 0.02:
            continue
        print(f"{n:<46}{shape:<42}{ms:9.3f} {k:6.1f}")


if __name__ == "__main__":
    main()
