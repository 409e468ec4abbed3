"""Pin DetectionEvaluator's COCO AP@0.5 against a COCOeval-faithful oracle.

pycocotools is not installed in this image, so the oracle below re-implements
the published COCOeval bbox protocol (area=all, maxDets=100, IoU=0.5) from
its algorithm spec: per-image greedy matching of each detection (score order,
mergesort) to the best *unmatched* GT with IoU >= t, cross-image score-sorted
PR accumulation, monotone precision envelope, and 101-point recall
interpolation via searchsorted(side='left').  Reference consumer:
utils/utils_map.py:894-922 (get_coco_map) / utils/callbacks.py:223-226.
"""
import numpy as np
import pytest

from asy_vrnet_tpu.metrics.map import DetectionEvaluator


def _iou_xyxy(d, g):
    if len(d) == 0 or len(g) == 0:
        return np.zeros((len(d), len(g)))
    tl = np.maximum(d[:, None, :2], g[None, :, :2])
    br = np.minimum(d[:, None, 2:], g[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=-1)
    ad = np.prod(d[:, 2:] - d[:, :2], axis=-1)
    ag = np.prod(g[:, 2:] - g[:, :2], axis=-1)
    return inter / np.maximum(ad[:, None] + ag[None, :] - inter, 1e-12)


def cocoeval_ap50_oracle(images, num_classes, max_dets=100):
    """COCOeval AP@[.5] for bbox, area=all: returns (per-class AP, mAP)."""
    t = 0.5
    rec_thrs = np.linspace(0.0, 1.0, 101)
    aps = []
    per_class = []
    for c in range(num_classes):
        scores_all, tps_all = [], []
        npig = 0
        for det_boxes, det_scores, det_classes, gt_boxes, gt_classes in images:
            dsel = np.where(det_classes == c)[0]
            gsel = np.where(gt_classes == c)[0]
            npig += len(gsel)
            order = np.argsort(-det_scores[dsel], kind="mergesort")
            dsel = dsel[order][:max_dets]
            ious = _iou_xyxy(det_boxes[dsel], gt_boxes[gsel])
            gtm = np.full(len(gsel), -1)
            for di in range(len(dsel)):
                best = min(t, 1 - 1e-10)
                m = -1
                for gi in range(len(gsel)):
                    if gtm[gi] >= 0:
                        continue
                    if ious[di, gi] < best:
                        continue
                    best = ious[di, gi]
                    m = gi
                if m >= 0:
                    gtm[m] = di
                scores_all.append(det_scores[dsel][di])
                tps_all.append(m >= 0)
        if npig == 0:
            per_class.append(float("nan"))
            continue
        scores_all = np.asarray(scores_all)
        tps_all = np.asarray(tps_all, bool)
        order = np.argsort(-scores_all, kind="mergesort")
        tps_all = tps_all[order]
        tp = np.cumsum(tps_all)
        fp = np.cumsum(~tps_all)
        rc = tp / npig
        pr = tp / (fp + tp + np.spacing(1))
        # monotone envelope
        pr = pr.tolist()
        for i in range(len(pr) - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        q = np.zeros(len(rec_thrs))
        inds = np.searchsorted(rc, rec_thrs, side="left")
        for ri, pi in enumerate(inds):
            if pi < len(pr):
                q[ri] = pr[pi]
        ap = float(np.mean(q))
        per_class.append(ap)
        aps.append(ap)
    return per_class, float(np.mean(aps)) if aps else 0.0


def _random_images(seed, n_images=8, n_classes=3):
    rng = np.random.default_rng(seed)
    images = []
    for _ in range(n_images):
        n_gt = int(rng.integers(1, 6))
        gt_tl = rng.uniform(0, 350, (n_gt, 2))
        gt = np.concatenate([gt_tl, gt_tl + rng.uniform(20, 120, (n_gt, 2))], -1)
        gcls = rng.integers(0, n_classes, n_gt)
        # detections: jittered copies (some duplicated), plus pure noise
        dup = gt[: int(rng.integers(1, 4))]
        det = np.concatenate(
            [gt + rng.normal(0, 10, gt.shape)]
            + [dup + rng.normal(0, 25, dup.shape)]
            + [np.sort(rng.uniform(0, 400, (3, 4)), axis=-1)], axis=0)
        dcls = np.concatenate(
            [gcls, gcls[: len(dup)], rng.integers(0, n_classes, 3)])
        scores = rng.uniform(0.05, 1.0, len(det))
        images.append((det, scores, dcls, gt, gcls.astype(int)))
    return images


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_coco_ap50_matches_cocoeval_oracle(seed):
    n_classes = 3
    images = _random_images(seed, n_classes=n_classes)
    names = [f"c{i}" for i in range(n_classes)]
    ev = DetectionEvaluator(names, iou_threshold=0.5, max_dets=100)
    for det, scores, dcls, gt, gcls in images:
        ev.add_image(det, scores, dcls, gt, gcls)
    res = ev.evaluate("coco")
    oracle_per_class, oracle_map = cocoeval_ap50_oracle(images, n_classes)
    for i, name in enumerate(names):
        if np.isnan(oracle_per_class[i]):
            assert np.isnan(res["ap_per_class"][name])
        else:
            assert res["ap_per_class"][name] == pytest.approx(
                oracle_per_class[i], abs=1e-9), name
    assert res["map"] == pytest.approx(oracle_map, abs=1e-9)


def test_coco_matching_prefers_unmatched_gt():
    """The case where COCO and VOC protocols diverge: detection D2's highest
    IoU is with an already-matched GT, but another unmatched GT also clears
    the threshold.  COCOeval matches it (TP); classic VOC calls it FP."""
    gt = np.array([[0, 0, 100, 100], [40, 0, 140, 100]], np.float64)
    gcls = np.zeros(2, int)
    # D1 takes GT1 exactly; D2 overlaps GT1 more (IoU 90/110 = 0.818) than
    # GT2 (IoU 70/130 = 0.538), but both clear the 0.5 threshold
    det = np.array([[0, 0, 100, 100], [10, 0, 110, 100]], np.float64)
    scores = np.array([0.9, 0.8])
    dcls = np.zeros(2, int)

    ev = DetectionEvaluator(["x"], iou_threshold=0.5)
    ev.add_image(det, scores, dcls, gt, gcls)
    coco = ev.evaluate("coco")
    voc = ev.evaluate("voc")
    assert coco["map"] == pytest.approx(1.0)        # both matched
    assert voc["map"] < 1.0                          # D2 is a VOC FP
