"""Training observability: loss history + periodic mAP / mIoU eval callbacks.

Parity targets: utils/callbacks.py:21-248 and utils_seg/callbacks.py:22-216.
Differences by design: evaluation is batched through the jit'd fused
forward+decode+NMS graph instead of a one-image-at-a-time Python loop, and the
mAP/mIoU computation is in-memory (asy_vrnet_tpu.metrics) instead of txt-file
round trips (the txt pipeline still exists for CLI parity).
"""
from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from asy_vrnet_tpu.metrics.map import DetectionEvaluator
from asy_vrnet_tpu.metrics.miou import MIoUAccumulator
from asy_vrnet_tpu.metrics.plots import plot_loss_curves, plot_metric_curve
from asy_vrnet_tpu.ops.boxes import decode_predictions
from asy_vrnet_tpu.ops.nms import non_max_suppression


class LossHistory:
    """txt logs + loss-curve PNG + optional TensorBoard scalars
    (utils/callbacks.py:21-80)."""

    def __init__(self, log_dir: str, tag: str = "loss"):
        self.log_dir = log_dir
        self.tag = tag
        self.losses: list[float] = []
        self.val_loss: list[float] = []
        os.makedirs(log_dir, exist_ok=True)
        self.writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(log_dir)
        except Exception:
            pass

    def append_loss(self, epoch: int, loss: float, val_loss: float) -> None:
        self.losses.append(loss)
        self.val_loss.append(val_loss)
        with open(os.path.join(self.log_dir, f"epoch_{self.tag}.txt"), "a") as f:
            f.write(f"{loss}\n")
        with open(os.path.join(self.log_dir, f"epoch_val_{self.tag}.txt"), "a") as f:
            f.write(f"{val_loss}\n")
        if self.writer is not None:
            self.writer.add_scalar(f"{self.tag}/train", loss, epoch)
            self.writer.add_scalar(f"{self.tag}/val", val_loss, epoch)
        plot_loss_curves(
            os.path.join(self.log_dir, f"epoch_{self.tag}.png"),
            self.losses, self.val_loss,
        )

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()


class DetEvalCallback:
    """Periodic COCO-style AP50 on the val split (utils/callbacks.py:83-248).

    Evaluation uses network-input coordinates for both detections and padded
    GT (the letterbox is a monotonic affine map, so AP is unchanged) and runs
    batched on device: forward -> decode -> fixed-shape NMS.
    """

    def __init__(
        self,
        model,
        cfg,
        val_loader,
        class_names: Sequence[str],
        log_dir: str,
        period: int = 10,
        conf_thres: float = 0.05,
        nms_thres: float = 0.5,
        max_det: int = 100,
    ):
        self.cfg = cfg
        self.val_loader = val_loader
        self.class_names = class_names
        self.log_dir = log_dir
        self.period = max(1, period)
        self.maps: list[float] = [0.0]
        self.epochs: list[int] = [0]
        os.makedirs(log_dir, exist_ok=True)
        input_hw = cfg.model.input_size
        num_classes = cfg.model.num_classes

        def det_fn(variables, image, radar):
            from asy_vrnet_tpu.data.preprocess import maybe_normalize_image_device

            det, _ = model.apply(
                variables, maybe_normalize_image_device(image), radar,
                train=False,
            )
            pred = decode_predictions(det, input_hw, cfg.model.head_strides)
            return non_max_suppression(
                pred, num_classes, conf_thres=conf_thres, nms_thres=nms_thres,
                max_out=max_det,
            )

        self._det = jax.jit(det_fn)

    def on_epoch_end(self, epoch: int, variables: dict) -> Optional[float]:
        if epoch % self.period != 0:
            return None
        h, w = self.cfg.model.input_size
        ev = DetectionEvaluator(self.class_names, iou_threshold=0.5)
        for batch in self.val_loader:
            out = jax.device_get(
                self._det(variables, jnp.asarray(batch["image"]), jnp.asarray(batch["radar"]))
            )
            scale = np.array([w, h, w, h], np.float32)
            for i in range(len(batch["image"])):
                valid = out["valid"][i]
                det_boxes = out["boxes_xyxy"][i][valid] * scale
                gt_valid = batch["gt_valid"][i]
                gt_cxcywh = batch["gt_boxes"][i][gt_valid]
                gt_xyxy = np.concatenate(
                    [gt_cxcywh[:, :2] - gt_cxcywh[:, 2:] / 2,
                     gt_cxcywh[:, :2] + gt_cxcywh[:, 2:] / 2], axis=-1,
                )
                ev.add_image(
                    det_boxes, out["scores"][i][valid], out["classes"][i][valid],
                    gt_xyxy, batch["gt_classes"][i][gt_valid],
                )
        res = ev.evaluate(method="coco")
        self.maps.append(res["map"])
        self.epochs.append(epoch)
        with open(os.path.join(self.log_dir, "epoch_map.txt"), "a") as f:
            f.write(f"{res['map']}\n")
        plot_metric_curve(
            os.path.join(self.log_dir, "epoch_map.png"),
            self.epochs, self.maps, "mAP50", "A Map Curve",
        )
        return res["map"]


class SegEvalCallback:
    """Periodic mIoU on the val split (utils_seg/callbacks.py:84-216),
    batched confusion-matrix accumulation on the letterboxed frame."""

    def __init__(self, model, cfg, val_loader, log_dir: str, period: int = 10):
        self.cfg = cfg
        self.val_loader = val_loader
        self.log_dir = log_dir
        self.period = max(1, period)
        self.mious: list[float] = [0.0]
        self.epochs: list[int] = [0]
        os.makedirs(log_dir, exist_ok=True)

        def seg_fn(variables, image, radar):
            from asy_vrnet_tpu.data.preprocess import maybe_normalize_image_device

            _, seg = model.apply(
                variables, maybe_normalize_image_device(image), radar,
                train=False,
            )
            return jnp.argmax(seg, axis=-1)

        self._seg = jax.jit(seg_fn)

    def on_epoch_end(self, epoch: int, variables: dict) -> Optional[float]:
        if epoch % self.period != 0:
            return None
        acc = MIoUAccumulator(self.cfg.model.num_seg_classes)
        for batch in self.val_loader:
            pred = np.asarray(
                self._seg(variables, jnp.asarray(batch["image"]), jnp.asarray(batch["radar"]))
            )
            acc.update(batch["seg_target"], pred)
        res = acc.result()
        self.mious.append(res["miou"])
        self.epochs.append(epoch)
        with open(os.path.join(self.log_dir, "epoch_miou.txt"), "a") as f:
            f.write(f"{res['miou']}\n")
        plot_metric_curve(
            os.path.join(self.log_dir, "epoch_miou.png"),
            self.epochs, self.mious, "Miou", "A Miou Curve",
        )
        return res["miou"]
