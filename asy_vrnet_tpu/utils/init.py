"""Reference-style weight re-initialisation.

Equivalent of `weights_init` (nets/yolo_training.py:482-501, wired at
train.py:298): every Conv weight gets normal/xavier/kaiming/orthogonal init
and every BatchNorm2d gets weight ~ N(1, 0.02), bias = 0; everything else
(GroupNorm, LayerScale, sim_alpha/beta, attention affines, biases) keeps its
framework default.  Needed for from-scratch training runs comparable to the
reference; flax defaults remain the... default (`init_type='none'`).

Fan computations follow torch's conv layout (O, I, kh, kw) translated to our
NHWC kernels (kh, kw, I, O): fan_in = kh*kw*I, fan_out = kh*kw*O.
"""
from __future__ import annotations

import numpy as np

import jax

INIT_TYPES = ("none", "normal", "xavier", "kaiming", "orthogonal")


def _conv_init(rng: np.random.Generator, shape, init_type: str,
               gain: float) -> np.ndarray:
    if len(shape) == 4:           # (kh, kw, I, O)
        fan_in = shape[0] * shape[1] * shape[2]
        fan_out = shape[0] * shape[1] * shape[3]
        rows, cols = shape[3], shape[0] * shape[1] * shape[2]
    else:                         # ECA Conv1d weight (1, 1, k): fan = k
        fan_in = int(np.prod(shape[:-1])) * shape[-1] // shape[0]
        fan_out = fan_in
        rows, cols = shape[0], int(np.prod(shape[1:]))
    if init_type == "normal":
        return rng.normal(0.0, gain, shape)
    if init_type == "xavier":
        std = gain * np.sqrt(2.0 / (fan_in + fan_out))
        return rng.normal(0.0, std, shape)
    if init_type == "kaiming":    # a=0, mode='fan_in' -> std = sqrt(2/fan_in)
        return rng.normal(0.0, np.sqrt(2.0 / fan_in), shape)
    if init_type == "orthogonal":
        # torch orthogonalises the (O, I*kh*kw) flattening; build that matrix
        # and transpose back into our layout
        flat = rng.normal(0.0, 1.0, (max(rows, cols), min(rows, cols)))
        q, r = np.linalg.qr(flat)
        q = q * np.sign(np.diag(r))
        q = q.T if rows < cols else q
        w_t = gain * q.reshape((rows, cols))       # (O, I*kh*kw)
        if len(shape) == 4:
            w = w_t.reshape(shape[3], shape[2], shape[0], shape[1])
            return np.transpose(w, (2, 3, 1, 0))
        return w_t.reshape(shape)
    raise NotImplementedError(f"initialization method [{init_type}]")


def reinit_params(params, seed: int, init_type: str = "normal",
                  init_gain: float = 0.02):
    """Re-initialise a flax param tree the reference way.  Returns a new tree.

    Conv kernels = 4D 'kernel' leaves plus the ECA 'conv_w' (torch Conv1d —
    its classname also matches 'Conv' in the reference's filter); BatchNorm
    affine = ('bn', 'scale'/'bias') leaves.
    """
    if init_type in ("none", None):
        return params
    if init_type not in INIT_TYPES:
        raise NotImplementedError(f"initialization method [{init_type}]")
    rng = np.random.default_rng(seed)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for keypath, leaf in flat:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        leaf_np = np.asarray(leaf)
        new = leaf_np
        if path[-1] == "kernel" and leaf_np.ndim == 4:
            new = _conv_init(rng, leaf_np.shape, init_type, init_gain)
        elif path[-1] == "conv_w":
            new = _conv_init(rng, leaf_np.shape, init_type, init_gain)
        elif len(path) >= 2 and path[-2] == "bn":
            if path[-1] == "scale":
                new = rng.normal(1.0, 0.02, leaf_np.shape)
            elif path[-1] == "bias":
                new = np.zeros_like(leaf_np)
        out.append(np.asarray(new, leaf_np.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)
