"""Profiling / timing utilities (the reference has only wall-clock FPS loops,
SURVEY.md §5 — here: block_until_ready-bracketed timing, jax.profiler traces,
and compiled-cost introspection)."""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax


def time_fn(fn: Callable, *args, iters: int = 30, warmup: int = 5) -> dict:
    """Steady-state timing of a jitted function; returns seconds/call stats."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "min": times[0],
        "median": times[len(times) // 2],
        "mean": sum(times) / len(times),
        "iters": iters,
    }


def chained_device_time(
    fn: Callable, *args, n: int = 5, repeats: int = 3
) -> float:
    """Device seconds per `fn(*args)` call via the chained-fori_loop protocol
    (BENCH_NOTES.md): N calls are chained inside ONE jit program with a
    data dependency between iterations (float inputs perturbed by acc*1e-12),
    and we difference N vs 1 so host round-trip and upload costs cancel.

    This is the only honest timing through a relay whose block_until_ready
    returns early; it is also correct on directly-attached devices.
    """
    import functools

    import jax.numpy as jnp

    def perturb(a, acc):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return a + (acc * 1e-12).astype(a.dtype)
        return a

    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(a, k):
        def body(_, acc):
            out = fn(*jax.tree.map(lambda x: perturb(x, acc), a))
            leaves = [
                jnp.sum(l.astype(jnp.float32))
                for l in jax.tree.leaves(out)
                if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
            ]
            return acc + sum(leaves) * 1e-12

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    def run(k: int) -> float:
        float(chained(args, k))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(chained(args, k))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(n) - run(1)) / (n - 1)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn: Callable, *args) -> dict[str, Any]:
    """XLA cost analysis of a jitted function at these example args."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return dict(cost or {})


def flops_estimate(fn: Callable, *args) -> float:
    return float(cost_analysis(fn, *args).get("flops", -1.0))


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
