"""torch state_dict -> flax variables converter.

Lets a user of the reference load their trained `.pth` checkpoints
(utils/utils_fit.py:213-226 saves plain state_dicts) into this framework.
The mapping is generated from *our* param-tree paths, so every destination
leaf is either filled or reported; source keys that have no destination
(e.g. the dead `image_attn` params inside the initial RadarEnhanceByImage,
which the torch module constructs but never calls — vr_coc.py:325,331) are
reported as unused.

Layout transforms:
  conv weight   (O,I,kh,kw) -> (kh,kw,I,O)     [incl. depthwise (C,1,k,k)]
  BN            weight/bias/running_mean/running_var -> scale/bias & mean/var
  GroupNorm     weight/bias -> scale/bias
  ShuffleAttn   (1,C,1,1) -> (C,)
  Cluster       sim_alpha/sim_beta (1,) -> ()
  ECA conv1d    (1,1,k) kept as-is
"""
from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _torch_module_prefix(parts: list[str]) -> tuple[list[str], str]:
    """Translate our flax module path to the reference torch module path.

    Returns (torch path components, remaining leaf spec joined by '/')."""
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "neck":
            out.append("backbone")
        elif p == "backbone":
            out.append("backbone")
        elif m := re.fullmatch(r"stage(\d)_radar", p):
            s = int(m.group(1))
            out.append(f"network_radar.{3 * s if s < 3 else 9}")
        elif m := re.fullmatch(r"stage(\d)", p):
            s = int(m.group(1))
            out.append(f"network.{3 * s if s < 3 else 9}")
        elif m := re.fullmatch(r"block(\d+)", p):
            out.append(m.group(1))
        elif m := re.fullmatch(r"fusion(\d)_image", p):
            out.append(f"network.{3 * int(m.group(1)) + 1}")
        elif m := re.fullmatch(r"fusion(\d)_radar", p):
            out.append(f"network_radar.{3 * int(m.group(1)) + 1}")
        elif m := re.fullmatch(r"reducer(\d)_radar", p):
            out.append(f"network_radar.{3 * int(m.group(1)) + 2}")
        elif m := re.fullmatch(r"reducer(\d)", p):
            out.append(f"network.{3 * int(m.group(1)) + 2}")
        elif m := re.fullmatch(r"branch(\d)_conv", p):
            out.append("branch5_conv" if m.group(1) == "5" else f"branch{m.group(1)}.0")
        elif m := re.fullmatch(r"branch(\d)_bn", p):
            out.append("branch5_bn" if m.group(1) == "5" else f"branch{m.group(1)}.1")
        elif p == "conv_cat_conv":
            out.append("conv_cat.0")
        elif p == "conv_cat_bn":
            out.append("conv_cat.1")
        elif p in ("upsample5_4", "upsample4_3", "upsample3_2", "upsample2_0",
                   "p5_4_det", "p4_3_det") and i + 1 < len(parts) and parts[i + 1] == "conv":
            out.append(f"{p}.upsample.0")
            i += 1  # consume 'conv' (the BaseConv inside the Sequential)
        elif m := re.fullmatch(r"stem(\d)", p):
            out.append(f"stems.{m.group(1)}")
        elif m := re.fullmatch(r"cls_conv(\d)_(\d)", p):
            out.append(f"cls_convs.{m.group(1)}.{m.group(2)}")
        elif m := re.fullmatch(r"reg_conv(\d)_(\d)", p):
            out.append(f"reg_convs.{m.group(1)}.{m.group(2)}")
        elif m := re.fullmatch(r"cls_pred(\d)", p):
            out.append(f"cls_preds.{m.group(1)}")
        elif m := re.fullmatch(r"reg_pred(\d)", p):
            out.append(f"reg_preds.{m.group(1)}")
        elif m := re.fullmatch(r"obj_pred(\d)", p):
            out.append(f"obj_preds.{m.group(1)}")
        elif p in ("dconv", "pconv"):
            # our ds ConvBnAct holds dconv/pconv directly; torch BaseConv
            # nests them under .conv (the DWConv module)
            out.append(f"conv.{p}")
        else:
            out.append(p)
        i += 1
    return out


_LEAF_MAP = {
    # (module tail, our leaf) -> torch leaf suffix
    ("bn", "scale"): "weight",
    ("bn", "bias"): "bias",
    ("bn", "mean"): "running_mean",
    ("bn", "var"): "running_var",
    ("gn", "scale"): "weight",
    ("gn", "bias"): "bias",
}


def torch_key_for(path: tuple[str, ...]) -> str:
    """flax param path -> torch state_dict key."""
    parts = list(path)
    leaf = parts.pop()
    # flax wrapper-module names that vanish in torch: the 'bn' level inside
    # our standalone BatchNorm2d wrapper (instances named 'norm', '*_bn') and
    # the 'gn' level inside GroupNorm1 (instances named 'norm*').  The 'bn'
    # inside ConvBnAct maps to torch BaseConv's own '.bn' and is kept.
    tail = parts[-1] if parts else ""
    parent = parts[-2] if len(parts) >= 2 else ""
    if tail in ("bn", "gn") and (parent.startswith("norm") or parent.endswith("_bn")):
        mapped = _LEAF_MAP[(tail, leaf)]
        parts = parts[:-1]
        torch_parts = _torch_module_prefix(parts)
        return ".".join(torch_parts) + "." + mapped
    if (tail, leaf) in _LEAF_MAP:
        torch_parts = _torch_module_prefix(parts)
        return ".".join(torch_parts) + "." + _LEAF_MAP[(tail, leaf)]
    if leaf == "kernel":
        torch_parts = _torch_module_prefix(parts)
        return ".".join(torch_parts) + ".weight"
    if leaf == "conv_w":  # ECA
        torch_parts = _torch_module_prefix(parts)
        return ".".join(torch_parts) + ".conv.weight"
    if leaf in ("gn_scale", "gn_bias"):  # ShuffleAttention's own GroupNorm
        torch_parts = _torch_module_prefix(parts)
        return ".".join(torch_parts) + ".gn." + ("weight" if leaf == "gn_scale" else "bias")
    torch_parts = _torch_module_prefix(parts)
    return ".".join(torch_parts) + "." + leaf


def _convert_leaf(leaf_name: str, ours: np.ndarray, theirs: np.ndarray) -> np.ndarray:
    theirs = np.asarray(theirs)
    if leaf_name == "kernel" and theirs.ndim == 4:
        theirs = np.transpose(theirs, (2, 3, 1, 0))
    elif ours.ndim == 1 and theirs.ndim == 4:       # ShuffleAttention (1,C,1,1)
        theirs = theirs.reshape(-1)
    elif ours.ndim == 0 and theirs.size == 1:       # sim_alpha / sim_beta
        theirs = theirs.reshape(())
    return theirs.astype(np.asarray(ours).dtype).reshape(np.shape(ours))


def convert_torch_state_dict(
    state_dict: Mapping[str, Any],
    params: Any,
    batch_stats: Any,
    verbose: bool = True,
) -> tuple[Any, Any, dict]:
    """-> (params, batch_stats, report).  `state_dict` values may be torch
    tensors or numpy arrays."""
    import jax

    src = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        src[k] = np.asarray(v)

    used, missing = set(), []

    def fill(tree):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        out = []
        for keypath, leaf in flat:
            path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
            tkey = torch_key_for(path)
            if tkey in src:
                out.append(_convert_leaf(path[-1], np.asarray(leaf), src[tkey]))
                used.add(tkey)
            else:
                missing.append("/".join(path) + f" (wanted {tkey})")
                out.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, out)

    new_params = fill(params)
    new_bstats = fill(batch_stats)

    def _expected_unused(k: str) -> bool:
        # torch bookkeeping counters we don't keep
        if "num_batches_tracked" in k:
            return True
        # deterministic positional buffers (vr_coc.py:401-413) — recomputed
        if k.endswith("fea_pos") or k.endswith("fea_pos_r"):
            return True
        # dead zero-size params: the initial RadarEnhanceByImage constructs a
        # ShuffleAttention(channel=3, G=4) it never calls (vr_coc.py:325,331);
        # with channel//(2G)==0 all its params are empty tensors.
        if ".image_attn." in k and np.asarray(src[k]).size == 0:
            return True
        return False

    unused = sorted(k for k in src if k not in used and not _expected_unused(k))
    ignored = sorted(k for k in src if k not in used and _expected_unused(k))
    report = {"missing": missing, "unused": unused, "ignored": ignored,
              "loaded": len(used)}
    if verbose:
        print(
            f"convert_torch_state_dict: {len(used)} loaded, "
            f"{len(missing)} missing, {len(unused)} unused"
        )
    return new_params, new_bstats, report


def load_torch_checkpoint(path: str, params: Any, batch_stats: Any,
                          verbose: bool = True):
    import torch

    sd = torch.load(path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    elif "model" in sd:
        sd = sd["model"]
    return convert_torch_state_dict(sd, params, batch_stats, verbose)
