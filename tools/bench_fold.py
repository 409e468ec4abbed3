"""Microbench: device cost of the input cast+space-to-depth fold at bs=128.

The round-5 bs=128 train trace shows ~11 ms/step around the model entry:
input layout pins (3.61 + 2.67 ms), forward s2d transposes (2.71 + 2.04 ms,
layers.py:78) and their backward mirrors (vr_coc.py:82).  This bench compares
formulations of `space_to_depth(x.astype(bf16), 4)` for the (B,512,512,3/4)
inputs under the chained-fori_loop device-time protocol (BENCH_NOTES.md):

  s2d      astype + reshape/transpose/reshape (current model path)
  conv     one lax.conv_general_dilated with a 0/1 identity kernel
           (4x4 / stride 4, Cin -> 16*Cin) - XLA's strided-conv path
  dot      reshape (B,H,WO,4C) + dot_general against a (4C x 16C)
           placement matrix batched over (B,H) + H-fold transpose

Usage: python tools/bench_fold.py [--batch 128]
"""
from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from asy_vrnet_tpu.models.layers import space_to_depth

    p = 4
    B = args.batch
    rng = np.random.default_rng(0)

    def timed(fn, *xs, n=5):
        """Chained device-time protocol: difference n vs 1 reps."""

        def chain(reps):
            @jax.jit
            def run(*xs):
                def body(i, carry):
                    acc, xs = carry
                    outs = fn(*[x + acc * 1e-12 for x in xs])
                    acc = sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(outs))
                    return acc * 1e-20, xs

                acc, _ = lax.fori_loop(0, reps, body, (jnp.float32(0.0), xs))
                return acc

            run(*xs).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(3):
                float(run(*xs))
            return (time.perf_counter() - t0) / 3

        t1, tn = chain(1), chain(n)
        return (tn - t1) / (n - 1) * 1e3

    for c in (3, 4):
        x = jnp.asarray(rng.standard_normal((B, 512, 512, c)), jnp.float32)

        def f_s2d(x):
            return space_to_depth(x.astype(jnp.bfloat16), p)

        # one conv: out[(pi*p+pj)*C+c] = in[c] at tap (pi,pj)
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

        # dot: split W only (free-ish reshape), W-fold via placement matmul,
        # then H-fold as a transpose at WO granularity
        m = np.zeros((p * c, p * p * c), np.float32)  # (pj,c) -> (pi? no: w-fold only)
        # w-fold: (B,H,WO,p*C) -> want lanes (pj*C+c) kept; h-fold moves pi later
        mb = jnp.asarray(np.eye(p * c), jnp.bfloat16)

        def f_dot(x):
            xb = x.astype(jnp.bfloat16)
            b, h, w, cc = xb.shape
            y = xb.reshape(b, h, w // p, p * cc)          # W-fold (reshape only)
            y = y.reshape(b, h // p, p, w // p, p * cc)   # split H
            y = y.transpose(0, 1, 3, 2, 4)                # (B,HO,WO,pi,p*C)
            return y.reshape(b, h // p, w // p, p * p * cc)

        rows = []
        for name, fn in (("s2d", f_s2d), ("conv", f_conv), ("dot", f_dot)):
            try:
                ms = timed(fn, x)
            except Exception as e:  # pragma: no cover
                ms = float("nan")
                print(f"C={c} {name}: FAILED {type(e).__name__}: {e}")
            rows.append((name, ms))
        gb = B * 512 * 512 * c * (4 + 2) / 1e9
        print(f"C={c} ({gb:.2f} GB min traffic):"
              + "".join(f"  {n}={ms:7.2f} ms" for n, ms in rows), flush=True)


if __name__ == "__main__":
    main()
