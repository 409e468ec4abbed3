"""Capture a real TPU device trace of the forward (or train step) and print a
per-op-class cost table.

jax.profiler traces DO come back through the axon relay (round-2 discovery)
— this is ground truth per-op device time with file:line attribution, far
sharper than the chained-differencing protocol (which it agrees with: 82.0
ms/iter vs 78.9 ms chained at bs=64).

Usage:
  python tools/trace_forward.py [--batch 64] [--train] [--top 30] [--copies]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re


def _device_events_from_xplane(trace_dir: str):
    """Fallback: read the device plane straight from *.xplane.pb.

    The chrome-trace json export caps at 1e6 events; the relay's host planes
    can exhaust that alone, silently dropping the TPU plane (seen round 3).
    The pb keeps everything.  Returns events in the json-event dict shape."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from xplane import load_xspace

    pbs = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not pbs:
        return []
    out = []
    for plane in load_xspace(pbs[-1]):
        if "TPU" not in plane["name"]:
            continue
        for line in plane["lines"]:
            for name, _off, dur in line["events"]:
                out.append({"name": name, "dur": dur / 1e6, "args": {}})
    return out


def summarize(trace_dir: str, iters: int, top: int, show_copies: bool) -> None:
    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
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
        allev = _device_events_from_xplane(trace_dir)
        if allev:
            print("(device plane absent from trace.json — read from xplane.pb)")
    # numeric-named spans are the per-dispatch parent regions: the honest
    # per-step device time (the chained-loop protocol overstates a step that
    # carries the full TrainState — see BENCH_NOTES round 2)
    parents = [e["dur"] for e in allev if e["name"].isdigit()]
    if parents:
        ms = sum(parents) / len(parents) / 1e3
        print(f"per-dispatch device span: {ms:.2f} ms ({len(parents)} dispatches)")
    ev = [
        e for e in allev
        if not e["name"].startswith("jit_") and not e["name"].isdigit()
    ]
    total = sum(e["dur"] for e in ev)
    print(f"device ops total: {total / iters / 1e3:.2f} ms/iter ({len(ev)} events)")

    klass = lambda n: re.sub(r"\.\d+$", "", n)
    g = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        g[klass(e["name"])] += e["dur"]
        cnt[klass(e["name"])] += 1
    print(f"{'class':<44}{'ms/iter':>9} {'count':>6}")
    for nm, us in g.most_common(top):
        print(f"{nm:<44}{us / iters / 1e3:9.2f} {cnt[nm] // iters:6d}")

    if show_copies:
        for kind, label in (("copy", "largest copies"), ("fusion", "largest fusions")):
            agg = collections.Counter()
            info = {}
            for e in ev:
                if klass(e["name"]) == kind or e["name"].startswith(kind + "."):
                    agg[e["name"]] += e["dur"]
                    a = e.get("args", {})
                    src = (a.get("source_stack") or a.get("source") or "").split("\n")[0]
                    info[e["name"]] = f'{a.get("shape_with_layout", "?")[:60]}  {src}'
            print(f"\n{label}:")
            for nm, us in agg.most_common(15):
                print(f"{us / iters / 1e3:7.2f} ms  {info[nm]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--train", action="store_true", help="trace the train step")
    ap.add_argument("--copies", action="store_true", help="list largest copies")
    ap.add_argument("--remat", default="none",
                    choices=["none", "fusion", "blocks", "stages"])
    ap.add_argument("--out", default="/tmp/jaxtrace_fwd")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from asy_vrnet_tpu.config import Config, ModelConfig
    from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model

    cfg = Config(model=ModelConfig(input_size=(args.hw, args.hw),
                                   train_remat=args.remat))
    model = create_model(cfg.model)
    params, bstats = init_model(model, jax.random.PRNGKey(0), batch_size=1)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((args.batch, args.hw, args.hw, 3)), jnp.float32)
    rad = jnp.asarray(rng.standard_normal((args.batch, args.hw, args.hw, 4)), jnp.float32)

    if args.train:
        from asy_vrnet_tpu.data.synthetic import make_batch
        from asy_vrnet_tpu.train.state import create_train_state
        from asy_vrnet_tpu.train.train_step import build_train_step

        state, tx = create_train_state(cfg, params, bstats)
        step = jax.jit(build_train_step(model, cfg, tx))
        batch = {
            k: jnp.asarray(v) for k, v in make_batch(
                rng, args.batch, (args.hw, args.hw), max_boxes=cfg.loss.max_boxes
            ).items()
        }
        state, _ = step(state, batch)  # compile + warm
        jax.block_until_ready(state.params)
        jax.profiler.start_trace(args.out)
        for _ in range(args.iters):
            state, m = step(state, batch)
        jax.block_until_ready(state.params)
        jax.profiler.stop_trace()
    else:
        v = {"params": params, "batch_stats": bstats}
        f = jax.jit(lambda v, i, r: model.apply(v, i, r, train=False))
        out = f(v, img, rad)
        jax.block_until_ready(out)
        jax.profiler.start_trace(args.out)
        for _ in range(args.iters):
            out = f(v, img, rad)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()

    summarize(args.out, args.iters, args.top, args.copies)


if __name__ == "__main__":
    main()
