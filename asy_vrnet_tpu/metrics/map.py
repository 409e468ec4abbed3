"""Detection mAP: VOC all-point AP and COCO-style AP (no pycocotools).

The reference computes COCO AP50 through pycocotools with a VOC fallback
(utils/callbacks.py:223-226, utils/utils_map.py:276,894).  This module
implements both natively:

  - `voc_ap`: the VOC2012 all-point interpolation (utils_map.py:95-140);
  - `coco_ap`: 101-point recall interpolation, maxDets cap, score-sorted —
    the COCOeval AP@[.5] protocol for bbox, area=all;
  - an in-memory evaluator (`DetectionEvaluator`) fed with per-image arrays,
    plus reference-format txt-dir reading for the CLI path.
"""
from __future__ import annotations

import glob
import os
from collections import defaultdict
from typing import Optional, Sequence

import numpy as np


def voc_ap(rec: np.ndarray, prec: np.ndarray) -> float:
    """VOC2012 all-point AP (monotone precision envelope, recall steps)."""
    mrec = np.concatenate([[0.0], rec, [1.0]])
    mpre = np.concatenate([[0.0], prec, [0.0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0] + 1
    return float(np.sum((mrec[idx] - mrec[idx - 1]) * mpre[idx]))


def coco_ap_from_pr(rec: np.ndarray, prec: np.ndarray) -> float:
    """COCO 101-point interpolated AP from a PR curve."""
    if len(rec) == 0:
        return 0.0
    mpre = prec.copy()
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    recall_thrs = np.linspace(0.0, 1.0, 101)
    inds = np.searchsorted(rec, recall_thrs, side="left")
    q = np.zeros(101)
    valid = inds < len(mpre)
    q[valid] = mpre[inds[valid]]
    return float(np.mean(q))


def log_average_miss_rate(precision: np.ndarray, fp_cumsum: np.ndarray,
                          num_images: int) -> tuple[float, np.ndarray, np.ndarray]:
    """LAMR over 9 FPPI points in [1e-2, 1e0] (utils_map.py:30-66).

    Returns (lamr, miss_rate, fppi)."""
    if precision.size == 0:
        return 0.0, np.asarray(1.0), np.asarray(0.0)
    fppi = fp_cumsum / float(num_images)
    mr = 1.0 - precision
    fppi_tmp = np.insert(fppi, 0, -1.0)
    mr_tmp = np.insert(mr, 0, 1.0)
    ref = np.logspace(-2.0, 0.0, num=9)
    for i, ref_i in enumerate(ref):
        j = np.where(fppi_tmp <= ref_i)[0][-1]
        ref[i] = mr_tmp[j]
    lamr = float(np.exp(np.mean(np.log(np.maximum(1e-10, ref)))))
    return lamr, mr, fppi


def _iou_matrix(det: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """(D,4)x(G,4) xyxy IoU."""
    if len(det) == 0 or len(gt) == 0:
        return np.zeros((len(det), len(gt)))
    tl = np.maximum(det[:, None, :2], gt[None, :, :2])
    br = np.minimum(det[:, None, 2:], gt[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=-1)
    area_d = np.prod(det[:, 2:] - det[:, :2], axis=-1)
    area_g = np.prod(gt[:, 2:] - gt[:, :2], axis=-1)
    return inter / np.maximum(area_d[:, None] + area_g[None, :] - inter, 1e-12)


class DetectionEvaluator:
    """Accumulates per-image detections and GT; computes AP per class.

    Greedy matching in score order; each GT matched at most once;
    IoU threshold configurable (0.5 for the headline metric).
    """

    def __init__(self, class_names: Sequence[str], iou_threshold: float = 0.5,
                 max_dets: int = 100):
        self.class_names = list(class_names)
        self.iou_threshold = iou_threshold
        self.max_dets = max_dets
        # per class: list of (score, is_tp) across all images; gt counter
        self._scores = defaultdict(list)
        self._tps = defaultdict(list)
        self._num_gt = defaultdict(int)

    def add_image(
        self,
        det_boxes: np.ndarray,     # (D, 4) xyxy
        det_scores: np.ndarray,    # (D,)
        det_classes: np.ndarray,   # (D,) int
        gt_boxes: np.ndarray,      # (G, 4) xyxy
        gt_classes: np.ndarray,    # (G,) int
        gt_difficult: Optional[np.ndarray] = None,
    ) -> None:
        det_boxes = np.asarray(det_boxes, np.float64).reshape(-1, 4)
        det_scores = np.asarray(det_scores, np.float64).reshape(-1)
        det_classes = np.asarray(det_classes).reshape(-1)
        gt_boxes = np.asarray(gt_boxes, np.float64).reshape(-1, 4)
        gt_classes = np.asarray(gt_classes).reshape(-1)
        if gt_difficult is None:
            gt_difficult = np.zeros(len(gt_boxes), bool)

        if len(det_boxes) > self.max_dets:
            keep = np.argsort(-det_scores, kind="stable")[: self.max_dets]
            det_boxes, det_scores, det_classes = (
                det_boxes[keep], det_scores[keep], det_classes[keep]
            )

        for c in range(len(self.class_names)):
            gsel = gt_classes == c
            gboxes = gt_boxes[gsel]
            gdiff = gt_difficult[gsel]
            self._num_gt[c] += int((~gdiff).sum())

            dsel = det_classes == c
            dboxes = det_boxes[dsel]
            dscores = det_scores[dsel]
            order = np.argsort(-dscores, kind="stable")
            dboxes, dscores = dboxes[order], dscores[order]

            iou = _iou_matrix(dboxes, gboxes)
            matched = np.zeros(len(gboxes), bool)
            for d in range(len(dboxes)):
                tp = False
                if len(gboxes):
                    best = int(np.argmax(iou[d]))
                    if iou[d, best] >= self.iou_threshold and not matched[best]:
                        if gdiff[best]:
                            continue  # difficult GT: detection ignored
                        matched[best] = True
                        tp = True
                self._scores[c].append(dscores[d])
                self._tps[c].append(tp)

    def evaluate(self, method: str = "coco") -> dict:
        """Per-class AP + mean; method 'coco' (101-pt) or 'voc' (all-point)."""
        aps = {}
        for c, name in enumerate(self.class_names):
            scores = np.asarray(self._scores[c])
            tps = np.asarray(self._tps[c], bool)
            n_gt = self._num_gt[c]
            if n_gt == 0:
                aps[name] = float("nan")
                continue
            if len(scores) == 0:
                aps[name] = 0.0
                continue
            order = np.argsort(-scores, kind="stable")
            tps = tps[order]
            tp_cum = np.cumsum(tps)
            fp_cum = np.cumsum(~tps)
            rec = tp_cum / n_gt
            prec = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
            if method == "voc":
                aps[name] = voc_ap(rec, prec)
            else:
                aps[name] = coco_ap_from_pr(rec, prec)
        valid = [v for v in aps.values() if not np.isnan(v)]
        return {
            "ap_per_class": aps,
            "map": float(np.mean(valid)) if valid else 0.0,
        }


# ---------------------------------------------------------------------------
# Reference txt-format compatibility (utils/utils_map.py get_map pipeline):
#   ground-truth/<id>.txt : "<class> <x1> <y1> <x2> <y2> [difficult]"
#   detection-results/<id>.txt : "<class> <score> <x1> <y1> <x2> <y2>"
# ---------------------------------------------------------------------------

def evaluate_txt_dirs(
    path: str,
    class_names: Sequence[str],
    iou_threshold: float = 0.5,
    method: str = "coco",
) -> dict:
    gt_dir = os.path.join(path, "ground-truth")
    dr_dir = os.path.join(path, "detection-results")
    name_to_idx = {n: i for i, n in enumerate(class_names)}
    ev = DetectionEvaluator(class_names, iou_threshold)
    for gt_file in sorted(glob.glob(os.path.join(gt_dir, "*.txt"))):
        image_id = os.path.splitext(os.path.basename(gt_file))[0]
        gts, gcls, gdiff = [], [], []
        with open(gt_file) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                difficult = parts[-1] == "difficult"
                if difficult:
                    parts = parts[:-1]
                cname = " ".join(parts[:-4])
                if cname not in name_to_idx:
                    continue
                gts.append([float(v) for v in parts[-4:]])
                gcls.append(name_to_idx[cname])
                gdiff.append(difficult)
        dets, dscore, dcls = [], [], []
        dr_file = os.path.join(dr_dir, image_id + ".txt")
        if os.path.exists(dr_file):
            with open(dr_file) as f:
                for line in f:
                    parts = line.split()
                    if not parts:
                        continue
                    cname = " ".join(parts[:-5])
                    if cname not in name_to_idx:
                        continue
                    dscore.append(float(parts[-5]))
                    dets.append([float(v) for v in parts[-4:]])
                    dcls.append(name_to_idx[cname])
        ev.add_image(
            np.array(dets).reshape(-1, 4), np.array(dscore), np.array(dcls),
            np.array(gts).reshape(-1, 4), np.array(gcls),
            np.array(gdiff, bool) if gdiff else None,
        )
    return ev.evaluate(method)
