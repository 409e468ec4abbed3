"""Benchmark: fused image+radar inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); its measurement harness is a
wall-clock FPS loop over forward passes (yolo.py:229-286,
nets/efficient_vrnet.py:35-40).  This benchmark follows the same protocol on
TPU — bf16 batched forward of the flagship nano model at 512x512, steady-state
wall clock with block_until_ready — and reports frames/sec/chip.

vs_baseline is measured against bench_baseline.json if present (written on
first run), so rounds track speedups against the first recorded number.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BATCH = 8
WARMUP = 5
ITERS = 30
BASELINE_FILE = os.path.join(os.path.dirname(__file__), "bench_baseline.json")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from asy_vrnet_tpu.config import ModelConfig
    from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model

    cfg = ModelConfig(phi="nano", compute_dtype="bfloat16", input_size=(512, 512))
    model = create_model(cfg)
    params, bstats = init_model(model, jax.random.PRNGKey(0), batch_size=BATCH)

    @jax.jit
    def fwd(params, bstats, image, radar):
        return model.apply(
            {"params": params, "batch_stats": bstats}, image, radar, train=False
        )

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((BATCH, 512, 512, 3)), jnp.float32)
    radar = jnp.asarray(rng.standard_normal((BATCH, 512, 512, 4)), jnp.float32)

    for _ in range(WARMUP):
        jax.block_until_ready(fwd(params, bstats, image, radar))

    # best of 3 repeats: the TPU tunnel in this environment has high relay
    # variance; the max is the closest estimate of steady-state throughput
    fps = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fwd(params, bstats, image, radar)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        fps = max(fps, BATCH * ITERS / dt)

    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)["value"]
    else:
        baseline = fps
        with open(BASELINE_FILE, "w") as f:
            json.dump({"value": fps, "note": "first recorded run (round 1)"}, f)

    print(
        json.dumps(
            {
                "metric": "fused image+radar inference throughput (nano, 512x512, bf16, batch 8)",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
