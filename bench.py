"""Benchmark: fused image+radar inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement protocol: this environment reaches the TPU through a relay whose
`block_until_ready` resolves before device execution completes and whose
per-call host round trip re-uploads inputs, so naive wall-clock loops are
meaningless in both directions (measured "240x peak FLOPs" one way and
"30 ms scalar latency" the other).  The honest number is *device* time per
forward, measured by chaining N forwards inside one jit program (a fori_loop
with a data dependency between iterations) and differencing N=5 vs N=1 —
upload and round-trip costs cancel exactly.

The reference publishes no numbers (BASELINE.md); its own harness is a
wall-clock FPS loop (yolo.py:229-286).  vs_baseline tracks bench_baseline.json
(written on first run) so later rounds record speedups against round 1.
"""
from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

# 128 is the single-chip throughput sweet spot (64: 811 fps, 128: 927 fps,
# 256: 882 fps — BENCH_NOTES.md round-2 table)
BATCH = 128
N_CHAIN = 5
REPEATS = 3
BASELINE_FILE = os.path.join(os.path.dirname(__file__), "bench_baseline.json")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from asy_vrnet_tpu.config import ModelConfig
    from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model

    cfg = ModelConfig(phi="nano", compute_dtype="bfloat16", input_size=(512, 512))
    model = create_model(cfg)
    params, bstats = init_model(model, jax.random.PRNGKey(0), batch_size=1)
    variables = {"params": params, "batch_stats": bstats}

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((BATCH, 512, 512, 3)), jnp.float32)
    radar = jnp.asarray(rng.standard_normal((BATCH, 512, 512, 4)), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(v, i, r, n):
        def body(k, acc):
            det, seg = model.apply(v, i + acc * 1e-12, r, train=False)
            return acc + sum(jnp.sum(d) for d in det) + jnp.sum(seg)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def run(n: int) -> float:
        float(chained(variables, image, radar, n))  # compile + warm
        ts = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            float(chained(variables, image, radar, n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = run(1)
    tn = run(N_CHAIN)
    per_forward = (tn - t1) / (N_CHAIN - 1)
    fps = BATCH / per_forward

    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)["value"]
    else:
        baseline = fps
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {"value": fps, "note": "round-1 device-time protocol"}, f
            )

    print(
        json.dumps(
            {
                "metric": "fused image+radar inference throughput (nano, 512x512, bf16, device time)",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
