"""Microbench: device cost of the input cast+space-to-depth fold.

The round-5 bs=128 train trace shows ~5 ms/step around the model entry:
input layout pins (1.2 + 0.9 ms), forward s2d transposes (0.9 + 0.7 ms,
layers.py:78) and their backward mirrors (vr_coc.py:82).  This compares
formulations of `space_to_depth(x.astype(bf16), 4)` for (B,512,512,3/4)
inputs by TRACING one 5-chained dispatch per formulation and reading the
per-dispatch device span from the xplane (jax.profiler works through the
axon relay and is immune to its early-block_until_ready / re-upload traps;
pause any co-running trainer first).

  s2d      astype + reshape/transpose/reshape (current model path)
  conv     one lax.conv_general_dilated with a 0/1 identity kernel
           (4x4 / stride 4, Cin -> 16*Cin) - XLA's strided-conv path

Usage: python tools/bench_fold.py [--batch 32]
"""
from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def device_span_ms(trace_dir: str, reps: int) -> float:
    """Mean duration of the numeric-named per-dispatch parent spans."""
    from xplane import load_xspace

    pbs = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    spans = []
    for plane in load_xspace(pbs[-1]):
        if "TPU" not in plane["name"]:
            continue
        for line in plane["lines"]:
            for name, _off, dur in line["events"]:
                if name.isdigit():
                    spans.append(dur / 1e6)
    spans.sort()
    return spans[-1] / reps  # largest parent = our chained program


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from asy_vrnet_tpu.models.layers import space_to_depth

    p = 4
    B = args.batch
    rng = np.random.default_rng(0)

    def measure(tag, fn, *xs):
        @jax.jit
        def run(*xs):
            def body(i, carry):
                acc, xs = carry
                out = fn(*[x + acc * 1e-12 for x in xs])
                return jnp.sum(out.astype(jnp.float32)) * 1e-20, xs

            acc, _ = lax.fori_loop(0, args.reps, body, (jnp.float32(0.0), xs))
            return acc

        float(run(*xs))  # compile + upload + drain (the only real sync)
        tdir = f"/tmp/fold_trace_{tag}"
        shutil.rmtree(tdir, ignore_errors=True)
        jax.profiler.start_trace(tdir)
        float(run(*xs))
        jax.profiler.stop_trace()
        return device_span_ms(tdir, args.reps)

    for c in (3, 4):
        x = jnp.asarray(rng.standard_normal((B, 512, 512, c)), jnp.float32)

        def f_s2d(x):
            return space_to_depth(x.astype(jnp.bfloat16), p)

        k = np.zeros((p, p, c, p * p * c), np.float32)
        for pi in range(p):
            for pj in range(p):
                for ci in range(c):
                    k[pi, pj, ci, (pi * p + pj) * c + ci] = 1.0
        kb = jnp.asarray(k, jnp.bfloat16)

        def f_conv(x):
            return lax.conv_general_dilated(
                x.astype(jnp.bfloat16), kb, (p, p), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        res = {}
        for name, fn in (("s2d", f_s2d), ("conv", f_conv)):
            res[name] = measure(f"{name}{c}", fn, x)
        gb = B * 512 * 512 * c * (4 + 2) / 1e9
        print(f"C={c} bs={B} ({gb:.2f} GB min traffic):"
              + "".join(f"  {n}={ms:7.2f} ms" for n, ms in res.items()),
              flush=True)


if __name__ == "__main__":
    main()
