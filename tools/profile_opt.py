"""Microbenchmark of the optimiser/EMA plumbing on the real TPU.

The train-step profile shows ~38 ms/step of optimiser+EMA cost on a 4.1M-param
model — pure per-op overhead across ~729 leaves.  This isolates the pieces:

  ravel        ravel_pytree(params) (one 729-input concat)
  unravel      unravel(flat) (729 slices + reshapes)
  tx_update    tx.update(grads, opt_state, params)   [flattened chain]
  apply_upd    optax.apply_updates(params, updates)  [per-leaf adds]
  ema          ema_update(params_tree, params_tree, d) [flat math + unravel]
  opt_ema_all  the full post-grad block as in train_step

Usage: python tools/profile_opt.py
"""
from __future__ import annotations

import functools
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax
    from jax.flatten_util import ravel_pytree

    from asy_vrnet_tpu.config import Config, ModelConfig
    from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model
    from asy_vrnet_tpu.train.optim import ema_update
    from asy_vrnet_tpu.train.state import create_train_state

    cfg = Config(model=ModelConfig(input_size=(512, 512)))
    model = create_model(cfg.model)
    params, bstats = init_model(model, jax.random.PRNGKey(0), batch_size=1)
    state, tx = create_train_state(cfg, params, bstats)
    grads = jax.tree.map(lambda p: jnp.full_like(p, 1e-4), params)
    flat, unravel = ravel_pytree(params)
    print(f"leaves={len(jax.tree.leaves(params))} flat={flat.size}")

    def tsum(t):
        return jax.tree.reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), t, jnp.float32(0.0)
        )

    def perturb(t, acc):
        return jax.tree.map(lambda x: x + (acc * 1e-20).astype(x.dtype), t)

    stages = {}

    def stage(name):
        def deco(fn):
            @functools.partial(jax.jit, static_argnames=("n",))
            def chained(n):
                def body(_, acc):
                    return acc + fn(acc) * 1e-20

                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            stages[name] = chained
            return fn

        return deco

    @stage("ravel")
    def _ravel(acc):
        return jnp.sum(ravel_pytree(perturb(params, acc))[0])

    @stage("unravel")
    def _unravel(acc):
        return tsum(unravel(flat + acc * 1e-20))

    @stage("tx_update")
    def _tx(acc):
        upd, _ = tx.update(perturb(grads, acc), state.opt_state, params)
        return tsum(upd)

    @stage("apply_upd")
    def _apply(acc):
        return tsum(optax.apply_updates(params, perturb(grads, acc)))

    @stage("ema")
    def _ema(acc):
        return tsum(ema_update(params, perturb(params, acc), jnp.float32(0.99)))

    @stage("opt_ema_all")
    def _all(acc):
        g = perturb(grads, acc)
        upd, new_opt = tx.update(g, state.opt_state, params)
        new_params = optax.apply_updates(params, upd)
        e1 = ema_update(state.ema_params, new_params, jnp.float32(0.99))
        e2 = ema_update(state.ema_batch_stats, state.batch_stats, jnp.float32(0.99))
        return tsum(new_params) + tsum(e1) + tsum(e2) + tsum(
            jax.tree.leaves(new_opt)[0] if jax.tree.leaves(new_opt) else 0.0
        )

    for name, fn in stages.items():
        float(fn(1))
        def run(n):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(n))
                best = min(best, time.perf_counter() - t0)
            return best
        float(fn(8))
        ms = (run(8) - run(1)) / 7 * 1e3
        print(f"{name:<12} {ms:8.3f} ms")


if __name__ == "__main__":
    main()
