"""Detection mAP and segmentation mIoU metrics."""
import numpy as np
import pytest

from asy_vrnet_tpu.metrics.map import (
    DetectionEvaluator,
    coco_ap_from_pr,
    evaluate_txt_dirs,
    voc_ap,
)
from asy_vrnet_tpu.metrics.miou import (
    MIoUAccumulator,
    fast_hist,
    per_class_iu,
    per_class_pa_recall,
)


def test_voc_ap_known_curve():
    # single detection, perfect: PR = (1,1)
    assert voc_ap(np.array([1.0]), np.array([1.0])) == pytest.approx(1.0)
    # recall reaches 0.5 with precision 1.0 then nothing
    assert voc_ap(np.array([0.5]), np.array([1.0])) == pytest.approx(0.5)


def test_coco_ap_known_curve():
    assert coco_ap_from_pr(np.array([1.0]), np.array([1.0])) == pytest.approx(1.0)
    # precision 1.0 up to recall 0.5: 101-pt mean ≈ fraction of thresholds <= 0.5
    v = coco_ap_from_pr(np.array([0.5]), np.array([1.0]))
    assert v == pytest.approx(51 / 101, abs=1e-6)


def test_evaluator_perfect_detection():
    ev = DetectionEvaluator(["a", "b"], iou_threshold=0.5)
    gt = np.array([[0, 0, 10, 10], [20, 20, 40, 40]], float)
    ev.add_image(gt, np.array([0.9, 0.8]), np.array([0, 1]), gt, np.array([0, 1]))
    res = ev.evaluate("voc")
    assert res["map"] == pytest.approx(1.0)
    res = ev.evaluate("coco")
    assert res["map"] == pytest.approx(1.0)


def test_evaluator_false_positive_and_miss():
    ev = DetectionEvaluator(["a"], iou_threshold=0.5)
    gt = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], float)
    det = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], float)  # 1 TP, 1 FP
    ev.add_image(det, np.array([0.9, 0.8]), np.array([0, 0]), gt, np.array([0, 0]))
    res = ev.evaluate("voc")
    # rec=[0.5,0.5], prec=[1.0,0.5] -> AP = 0.5
    assert res["map"] == pytest.approx(0.5)


def test_evaluator_duplicate_detection_counts_fp():
    ev = DetectionEvaluator(["a"], iou_threshold=0.5)
    gt = np.array([[0, 0, 10, 10]], float)
    det = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], float)
    ev.add_image(det, np.array([0.9, 0.8]), np.array([0, 0]), gt, np.array([0]))
    res = ev.evaluate("voc")
    assert res["map"] == pytest.approx(1.0)  # TP first; duplicate FP after full recall


def test_txt_dir_pipeline(tmp_path):
    gt_dir = tmp_path / "ground-truth"
    dr_dir = tmp_path / "detection-results"
    gt_dir.mkdir(); dr_dir.mkdir()
    (gt_dir / "img1.txt").write_text("boat 0 0 10 10\npier 20 20 40 40\n")
    (dr_dir / "img1.txt").write_text("boat 0.9 0 0 10 10\npier 0.8 21 21 41 41\n")
    res = evaluate_txt_dirs(str(tmp_path), ["boat", "pier"])
    assert res["map"] > 0.9


def test_fast_hist_and_iou():
    a = np.array([0, 0, 1, 1, 2])
    b = np.array([0, 1, 1, 1, 2])
    hist = fast_hist(a, b, 3)
    assert hist.sum() == 5
    ious = per_class_iu(hist)
    np.testing.assert_allclose(ious, [1 / 2, 2 / 3, 1.0])
    recall = per_class_pa_recall(hist)
    np.testing.assert_allclose(recall, [0.5, 1.0, 1.0])


def test_miou_accumulator_perfect():
    acc = MIoUAccumulator(3)
    lab = np.random.default_rng(0).integers(0, 3, (8, 8))
    acc.update(lab, lab)
    res = acc.result()
    assert res["miou"] == pytest.approx(1.0)
    assert res["accuracy"] == pytest.approx(1.0)


def test_log_average_miss_rate():
    from asy_vrnet_tpu.metrics.map import log_average_miss_rate

    # perfect detector: precision 1 everywhere, no FPs -> lamr ~ miss rate 0
    prec = np.array([1.0, 1.0, 1.0])
    fp = np.array([0.0, 0.0, 0.0])
    lamr, mr, fppi = log_average_miss_rate(prec, fp, num_images=10)
    assert lamr < 1e-6
    # empty detections
    lamr, mr, fppi = log_average_miss_rate(np.array([]), np.array([]), 10)
    assert lamr == 0.0


def _populated_evaluator():
    rng = np.random.default_rng(0)
    ev = DetectionEvaluator(["pier", "vessel"], iou_threshold=0.5)
    for _ in range(6):
        gt = rng.uniform(0, 400, (3, 2))
        gt = np.concatenate([gt, gt + rng.uniform(20, 80, (3, 2))], axis=-1)
        gcls = rng.integers(0, 2, 3)
        # detections: jittered gt + one false positive
        det = gt + rng.normal(0, 2, gt.shape)
        det = np.concatenate([det, [[0, 0, 30, 30]]], axis=0)
        scores = rng.uniform(0.3, 1.0, 4)
        dcls = np.concatenate([gcls, [0]])
        ev.add_image(det, scores, dcls, gt, gcls)
    return ev


def test_evaluate_returns_curves():
    res = _populated_evaluator().evaluate("voc")
    assert res["num_images"] == 6
    for name in ("pier", "vessel"):
        c = res["curves"][name]
        assert c["num_gt"] > 0 and c["scores"].size == c["recall"].size
        assert np.all(np.diff(c["recall"]) >= 0)          # recall monotone
        assert np.all((c["f1"] >= 0) & (c["f1"] <= 1.0 + 1e-9))
        assert 0.0 <= c["lamr"] <= 1.0


def test_plot_detection_report(tmp_path):
    pytest.importorskip("matplotlib")
    from asy_vrnet_tpu.metrics.plots import plot_detection_report

    res = _populated_evaluator().evaluate("voc")
    written = plot_detection_report(str(tmp_path), res)
    import os

    names = {os.path.relpath(w, tmp_path) for w in written}
    assert "mAP.png" in names and "lamr.png" in names
    assert "ground-truth-info.png" in names
    for sub in ("AP", "F1", "Recall", "Precision"):
        assert f"{sub}/pier.png" in names, names
    for w in written:
        assert os.path.getsize(w) > 0


def test_plot_miou_and_loss_curves(tmp_path):
    pytest.importorskip("matplotlib")
    import os

    from asy_vrnet_tpu.metrics.plots import plot_loss_curves
    from asy_vrnet_tpu.metrics.miou import save_results

    hist = np.array([[50, 2, 1], [3, 40, 2], [1, 1, 60]])
    ious = np.array([0.8, 0.7, 0.9])
    save_results(str(tmp_path), hist, ious, ious, ious, ["a", "b", "c"])
    for f in ("confusion_matrix.csv", "metrics.csv", "mIoU.png", "mPA.png",
              "Recall.png", "Precision.png"):
        assert os.path.exists(tmp_path / f), f

    losses = list(np.linspace(3.0, 1.0, 30))
    vals = list(np.linspace(3.2, 1.4, 30))
    assert plot_loss_curves(str(tmp_path / "epoch_loss.png"), losses, vals)
    assert os.path.getsize(tmp_path / "epoch_loss.png") > 0
