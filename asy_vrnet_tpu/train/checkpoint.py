"""Checkpointing: full train-state (orbax) + weights-only export + partial load.

The reference saves weights-only state_dicts (utils/utils_fit.py:213-226) and
resumes by key+shape matching (train.py:309-326).  Here the default is a full
orbax checkpoint of params/batch_stats/opt_state/EMA/step — true resume — plus
a weights-only save and the same partial, shape-checked load for transfer.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from asy_vrnet_tpu.train.state import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState, step: Optional[int] = None) -> str:
    path = os.path.abspath(
        os.path.join(ckpt_dir, f"step_{int(step if step is not None else state.step)}")
    )
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def restore_checkpoint(path: str, target: TrainState) -> TrainState:
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), target)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_") and name[5:].isdigit():
            steps.append(int(name[5:]))
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"step_{max(steps)}")


def save_weights(path: str, params: Any, batch_stats: Any) -> None:
    """Weights-only .npz export (flat {'params/...': arr, 'batch_stats/...'})."""
    flat = {}
    for prefix, tree in (("params", params), ("batch_stats", batch_stats)):
        for keypath, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = prefix + "/" + "/".join(
                k.key if hasattr(k, "key") else str(k) for k in keypath
            )
            flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def load_weights(path: str) -> dict:
    """-> nested {'params': ..., 'batch_stats': ...} trees."""
    flat = dict(np.load(path))
    out: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


def partial_load(target_params: Any, source: Any, verbose: bool = True):
    """Load leaves from `source` into `target_params` when the path exists and
    the shape matches; keep the target leaf otherwise (train.py:309-326)."""
    loaded, skipped = [], []

    def walk(tgt, src, path=""):
        if isinstance(tgt, dict):
            out = {}
            for k, v in tgt.items():
                sub = src.get(k) if isinstance(src, dict) else None
                out[k] = walk(v, sub, f"{path}/{k}")
            return out
        if src is not None and np.shape(src) == np.shape(tgt):
            loaded.append(path)
            return jax.numpy.asarray(src, dtype=tgt.dtype)
        skipped.append(path)
        return tgt

    result = walk(target_params, source or {})
    if verbose:
        print(f"partial_load: {len(loaded)} loaded, {len(skipped)} kept")
    return result, loaded, skipped
