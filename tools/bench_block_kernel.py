"""Microbench one fused block-kernel call at a given stage shape (TPU).

Chained-fori device-time protocol (BENCH_NOTES.md): N kernel calls chained
with a data dependency inside one jit; difference iters=N vs iters=1 so
upload/dispatch costs cancel.

Usage:
  python tools/bench_block_kernel.py [--batch 64] [--hw 128] [--c 16]
      [--heads 4] [--fold 8] [--kind mixer|mlp] [--bwd]
"""
from __future__ import annotations

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--c", type=int, default=16)
    ap.add_argument("--inner", type=int, default=128)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--fold", type=int, default=8)
    ap.add_argument("--kind", default="mixer", choices=["mixer", "mlp"])
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from asy_vrnet_tpu.ops import block_pallas as bp

    b, hw, c, inner = args.batch, args.hw, args.c, args.inner
    heads, fold = args.heads, args.fold
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c)) * 0.1, jnp.bfloat16)
    gn_s = jnp.ones((c,), jnp.float32)
    gn_b = jnp.zeros((c,), jnp.float32)
    ls = jnp.full((c,), 0.5, jnp.float32)

    if args.kind == "mixer":
        wf = jnp.asarray(rng.standard_normal((c, inner)) * 0.1, jnp.float32)
        bf = jnp.zeros((inner,), jnp.float32)
        wv = jnp.asarray(rng.standard_normal((c, inner)) * 0.1, jnp.float32)
        bv = jnp.zeros((inner,), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((inner, c)) * 0.1, jnp.float32)
        b2 = jnp.zeros((c,), jnp.float32)
        al = jnp.asarray(1.0, jnp.float32)
        be = jnp.asarray(0.0, jnp.float32)

        def one(xx):
            y, _ = bp.fused_mixer_block_stats(
                xx, gn_s, gn_b, wf, bf, wv, bv, w2, b2, ls, al, be,
                heads, fold, fold, 2, 2)
            return y
    else:
        hidden = 4 * c
        w1 = jnp.asarray(rng.standard_normal((c, hidden)) * 0.1, jnp.float32)
        b1 = jnp.zeros((hidden,), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((hidden, c)) * 0.1, jnp.float32)
        b2 = jnp.zeros((c,), jnp.float32)

        def one(xx):
            return bp.fused_mlp_block(xx, gn_s, gn_b, w1, b1, w2, b2, ls)

    if args.bwd:
        g = jnp.ones_like(x)

        def call(xx):
            _, vjp = jax.vjp(one, xx)
            return vjp(g)[0]
    else:
        call = one

    def chain(n):
        @jax.jit
        def f(xx):
            def body(i, acc):
                return call(acc * (1.0 + 1e-12 * i)).astype(xx.dtype)
            return jax.lax.fori_loop(0, n, body, xx)
        return f

    f1, fn = chain(1), chain(args.n)
    r = f1(x); jax.block_until_ready(r)
    r = fn(x); jax.block_until_ready(r)

    def t(f):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(jnp.sum(f(x)))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tn = t(f1), t(fn)
    per = (tn - t1) / (args.n - 1) * 1e3
    print(f"kind={args.kind} bwd={args.bwd} b={b} hw={hw} c={c}: "
          f"{per:.3f} ms/call  (t1={t1*1e3:.1f} tn={tn*1e3:.1f})")


if __name__ == "__main__":
    main()
