"""End-to-end training throughput: host pipeline + H2D + device step.

VERDICT.md item 10: device-only img/s is an upper bound; this measures the
whole loop — native-IO dataset -> DataLoader prefetch -> device_put ->
jit train step — and shows how much of the device rate the host pipeline
sustains.

Three rows:
  host_only    iterate the DataLoader for a full epoch, no device work
  device_only  chained-fori_loop device time per step (the honest protocol,
               see BENCH_NOTES.md)
  end_to_end   real training epochs over on-disk data; per-step loss pull
               (the reference logs losses every step, utils/utils_fit.py:126)
               and a lighter every-K variant

Caveat recorded in BENCH_NOTES.md: through the axon relay, per-step host
round trips cost ~30 ms that a directly-attached TPU would not pay; the
every-K row bounds that artifact.

Usage: python tools/bench_e2e.py [--batch 16] [--images 64] [--epochs 3]
"""
from __future__ import annotations

import argparse
import functools
import os
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--pull-every", type=int, default=8)
    ap.add_argument("--cache-gb", type=float, default=2.0,
                    help="decoded-sample cache budget (0 = off)")
    ap.add_argument("--radar-dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="radar wire dtype (bfloat16 halves the largest "
                         "H2D tensor; fp32 is reference parity)")
    ap.add_argument("--root", type=str, default="/tmp/asyvrnet_e2e_data")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from asy_vrnet_tpu.config import Config, ModelConfig
    from asy_vrnet_tpu.data.dataset import (
        DataLoader,
        WaterScenesDataset,
        device_prefetch,
        read_annotation_file,
    )
    from asy_vrnet_tpu.data.synthetic import write_synthetic_voc_dataset
    from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model
    from asy_vrnet_tpu.train.state import create_train_state
    from asy_vrnet_tpu.train.train_step import build_train_step

    hw = 512
    marker = os.path.join(args.root, f"ok_{args.images}_{hw}")
    if not os.path.exists(marker):
        print(f"writing {args.images} synthetic 512x512 samples to {args.root} ...")
        paths = write_synthetic_voc_dataset(
            args.root, num_images=args.images, hw=(hw, hw)
        )
        open(marker, "w").close()
    paths = {
        "annotation_path": os.path.join(args.root, "train.txt"),
        "radar_root": os.path.join(args.root, "radar"),
        "seg_dataset_path": args.root,
    }

    cfg = Config(model=ModelConfig(input_size=(hw, hw)))
    lines = read_annotation_file(paths["annotation_path"])
    ds = WaterScenesDataset(
        lines, (hw, hw), cfg.model.num_classes, cfg.model.num_seg_classes,
        paths["radar_root"], paths["seg_dataset_path"],
        max_boxes=cfg.loss.max_boxes,
        cache_bytes=int(args.cache_gb * (1 << 30)),
        radar_dtype=args.radar_dtype,
    )
    loader = DataLoader(ds, args.batch, shuffle=True, prefetch=2)
    steps_per_epoch = len(loader)
    print(
        f"dataset: {len(ds)} images, {steps_per_epoch} steps/epoch @ bs={args.batch}, "
        f"native_io={'yes' if ds._native_npz else 'no'}"
    )

    # ---- host-only ---------------------------------------------------------
    for _ in loader:  # warm the page cache
        pass
    t0 = time.perf_counter()
    n = 0
    for batch in loader:
        n += batch["image"].shape[0]
    host_s = time.perf_counter() - t0
    host_rate = n / host_s
    print(f"host_only    {host_s / steps_per_epoch * 1e3:7.1f} ms/step  {host_rate:7.1f} img/s")

    # ---- device-only (chained protocol) ------------------------------------
    model = create_model(cfg.model)
    params, bstats = init_model(model, jax.random.PRNGKey(0), batch_size=1)
    state, tx = create_train_state(cfg, params, bstats)
    train_step = build_train_step(model, cfg, tx)
    jit_step = jax.jit(train_step, donate_argnums=(0,))

    first = next(iter(loader))
    first.pop("image_id", None)
    dev_batch = {k: jnp.asarray(v) for k, v in first.items()}

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(state_, b, n):
        def body(k, carry):
            st, acc = carry
            bb = dict(b)
            bb["image"] = bb["image"] + acc * 1e-12
            st, metrics = train_step(st, bb)
            return (st, acc + metrics["loss"] * 1e-12)

        _, acc = jax.lax.fori_loop(0, n, body, (state_, jnp.float32(0.0)))
        return acc

    def run_chained(nn: int) -> float:
        float(chained(state, dev_batch, nn))
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            float(chained(state, dev_batch, nn))
            best = min(best, time.perf_counter() - t)
        return best

    t1, t3 = run_chained(1), run_chained(3)
    dev_ms = (t3 - t1) / 2 * 1e3
    dev_rate = args.batch / dev_ms * 1e3
    print(f"device_only  {dev_ms:7.1f} ms/step  {dev_rate:7.1f} img/s")

    # ---- end-to-end ---------------------------------------------------------
    def epoch(pull_every: int) -> float:
        nonlocal state
        t0 = time.perf_counter()
        last = None
        for i, db in enumerate(device_prefetch(iter(loader))):
            db.pop("image_id", None)
            state, metrics = jit_step(state, db)
            last = metrics
            if (i + 1) % pull_every == 0:
                float(metrics["loss"])
        float(last["loss"])
        return time.perf_counter() - t0

    epoch(args.pull_every)  # compile + warm
    for label, pull in (("e2e_pull_1", 1), (f"e2e_pull_{args.pull_every}", args.pull_every)):
        best = min(epoch(pull) for _ in range(max(1, args.epochs - 1)))
        rate = n / best
        print(
            f"{label:<12} {best / steps_per_epoch * 1e3:7.1f} ms/step  {rate:7.1f} img/s"
            f"  ({rate / dev_rate * 100:.0f}% of device-only)"
        )


if __name__ == "__main__":
    main()
