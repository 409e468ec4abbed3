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
