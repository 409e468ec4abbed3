"""Import helpers for the read-only torch reference at /root/reference.

The reference imports timm/thop/torchinfo (absent here) and — under
torch>=2 — crashes constructing the dead `image_attn` ShuffleAttention of the
initial RadarEnhanceByImage (vr_coc.py:325,331): `ShuffleAttention(channel=3,
G=4)` builds `nn.GroupNorm(0, 0)`, which torch<=1.12 silently accepted
(producing empty (0,)-shaped affine params in the state_dict) and torch 2.x
rejects.  This module installs minimal shims for the three libraries and a
lenient GroupNorm that reproduces the old behaviour for num_groups == 0 only.

Used by the reference-parity tests; nothing here touches /root/reference on
disk (sys.path import only).
"""
from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "nets"))


def _install_library_shims() -> None:
    import torch
    import torch.nn as nn

    if "timm" in sys.modules:
        return

    timm = types.ModuleType("timm")
    timm_data = types.ModuleType("timm.data")
    timm_data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    timm_data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        """timm.models.layers.DropPath: identity at drop_prob=0 / eval."""

        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            return x * mask / keep

    timm_layers.DropPath = DropPath
    timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm_helpers = types.ModuleType("timm.models.layers.helpers")
    timm_helpers.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
    timm_layers.helpers = timm_helpers
    timm_registry = types.ModuleType("timm.models.registry")
    timm_registry.register_model = lambda fn: fn
    timm_models.layers = timm_layers
    timm_models.registry = timm_registry
    timm.data = timm_data
    timm.models = timm_models
    for name, mod in [
        ("timm", timm), ("timm.data", timm_data), ("timm.models", timm_models),
        ("timm.models.layers", timm_layers),
        ("timm.models.layers.helpers", timm_helpers),
        ("timm.models.registry", timm_registry),
    ]:
        sys.modules[name] = mod

    thop = types.ModuleType("thop")
    thop.profile = lambda *a, **k: (0, 0)
    thop.clever_format = lambda x, *a, **k: x
    sys.modules["thop"] = thop
    torchinfo = types.ModuleType("torchinfo")
    torchinfo.summary = lambda *a, **k: None
    sys.modules["torchinfo"] = torchinfo

    # torchvision.ops.{nms, boxes.batched_nms} used by utils/utils_bbox.py:3.
    # Pure-torch re-implementation of the documented torchvision semantics:
    # descending-score greedy suppression of IoU strictly > threshold;
    # batched_nms via the per-class coordinate-offset trick.
    def _tv_nms(bxs, scores, iou_threshold):
        order = torch.argsort(scores, descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(i.item())
            if order.numel() == 1:
                break
            rest = order[1:]
            top, others = bxs[i], bxs[rest]
            tl = torch.maximum(top[:2], others[:, :2])
            br = torch.minimum(top[2:], others[:, 2:])
            wh = (br - tl).clamp(min=0)
            inter = wh[:, 0] * wh[:, 1]
            area_top = (top[2] - top[0]) * (top[3] - top[1])
            area_others = (others[:, 2] - others[:, 0]) * (others[:, 3] - others[:, 1])
            iou = inter / (area_top + area_others - inter)
            order = rest[iou <= iou_threshold]
        return torch.as_tensor(keep, dtype=torch.long)

    def _tv_batched_nms(bxs, scores, idxs, iou_threshold):
        if bxs.numel() == 0:
            return torch.empty((0,), dtype=torch.long)
        max_coordinate = bxs.max()
        offsets = idxs.to(bxs) * (max_coordinate + torch.tensor(1).to(bxs))
        return _tv_nms(bxs + offsets[:, None], scores, iou_threshold)

    torchvision = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_boxes = types.ModuleType("torchvision.ops.boxes")
    tv_boxes.nms = _tv_nms
    tv_boxes.batched_nms = _tv_batched_nms
    tv_ops.nms = _tv_nms
    tv_ops.boxes = tv_boxes
    torchvision.ops = tv_ops
    sys.modules["torchvision"] = torchvision
    sys.modules["torchvision.ops"] = tv_ops
    sys.modules["torchvision.ops.boxes"] = tv_boxes


class _lenient_groupnorm:
    """Context manager: tolerate nn.GroupNorm(0, 0) like torch<=1.12 did."""

    def __enter__(self):
        import torch
        import torch.nn as nn

        self._orig = nn.GroupNorm
        orig = self._orig

        class LenientGroupNorm(orig):  # type: ignore[misc, valid-type]
            def __init__(self, num_groups, num_channels, eps=1e-5, affine=True):
                if num_groups == 0:
                    nn.Module.__init__(self)
                    self.num_groups, self.num_channels = 0, 0
                    self.eps, self.affine = eps, affine
                    self.weight = nn.Parameter(torch.empty(0))
                    self.bias = nn.Parameter(torch.empty(0))
                else:
                    super().__init__(num_groups, num_channels, eps=eps,
                                     affine=affine)

        torch.nn.GroupNorm = LenientGroupNorm
        return self

    def __exit__(self, *exc):
        import torch

        torch.nn.GroupNorm = self._orig
        return False


class cpu_cuda_noop:
    """Context manager: make Tensor.cuda a no-op (decode_outputs calls
    `.cuda(local_rank)` unconditionally — utils/utils_bbox.py:72-73)."""

    def __enter__(self):
        import torch

        self._orig = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self, *a, **k: self
        return self

    def __exit__(self, *exc):
        import torch

        torch.Tensor.cuda = self._orig
        return False


def load_reference_module(dotted: str):
    """Import a module from /root/reference with the library shims installed."""
    import importlib

    _install_library_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    with _lenient_groupnorm():
        return importlib.import_module(dotted)


def build_reference_model(num_classes=4, num_seg_classes=9, phi="nano",
                          seed=0):
    """Instantiate the real /root/reference EfficientVRNet on CPU (eval).

    Returns (torch_model, state_dict).  Reference: nets/efficient_vrnet.py:13-27.
    """
    import torch

    _install_library_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    with _lenient_groupnorm():
        from nets.efficient_vrnet import EfficientVRNet  # type: ignore

        torch.manual_seed(seed)
        model = EfficientVRNet(num_classes, num_seg_classes, phi).eval()
    return model, model.state_dict()
