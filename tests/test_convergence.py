"""Convergence-to-a-working-model validation (VERDICT r2 #5).

Overfits the LEARNABLE synthetic WaterScenes-format set (coloured boxes +
co-located radar, data/synthetic.py::write_learnable_voc_dataset) through
the REAL training stack — cli.train -> fit -> eval callbacks -> AP50/mIoU —
and asserts the model actually becomes good, not merely that loss decreases.

Opt-in (RUN_CONVERGENCE=1): the run takes tens of minutes on a 1-core CPU
host.  The recorded TPU numbers live in BENCH_NOTES.md.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_CONVERGENCE"),
    reason="slow overfit run; set RUN_CONVERGENCE=1 to enable",
)


def _read_curve(path):
    vals = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if parts:
                vals.append(float(parts[-1]))
    return vals


def test_overfit_learnable_synthetic(tmp_path):
    """Recipe proven on CPU (round 3): AP50 1.0 / mIoU 0.81 by epoch 300 of
    a 1000-epoch cosine schedule (~90 min on a 1-core host; curves recorded
    in BENCH_NOTES.md).

    Uses the corrected seg head (--seg-signed-logits): the parity model's
    post-ReLU seg logits clamp the background logit at 0, which structurally
    dilates predicted masks and caps overfit mIoU at ~0.60 (at BOTH 64^2 and
    128^2; analysis in BENCH_NOTES).  The training stack is identical either
    way — the flag only drops the final ReLU."""
    from asy_vrnet_tpu.cli import train as train_cli

    save_dir = str(tmp_path / "logs")
    epochs = int(os.environ.get("CONVERGENCE_EPOCHS", "1000"))
    train_cli.main([
        "--synthetic", "48", "--synthetic-learnable",
        "--input-size", "64",
        "--epochs", str(epochs),
        "--batch-size", "8",
        "--optimizer", "adam", "--init-lr", "1.5e-3",
        "--no-ema", "--seg-signed-logits",
        "--eval-period", "50",
        "--save-period", "5000",
        "--compute-dtype", "float32",
        "--save-dir", save_dir,
    ])

    ap_curve = _read_curve(os.path.join(save_dir, "epoch_map.txt"))
    miou_curve = _read_curve(os.path.join(save_dir, "epoch_miou.txt"))
    assert ap_curve and miou_curve
    ap50 = max(ap_curve)
    miou = max(miou_curve)
    print(f"overfit: best AP50={ap50:.4f} best mIoU={miou:.4f}")
    # the curves must also actually climb (not flat noise)
    assert ap_curve[-1] >= ap_curve[0] - 0.05
    assert ap50 >= 0.90, f"AP50 {ap50} < 0.90 — training stack does not converge"
    assert miou >= 0.80, f"mIoU {miou} < 0.80 — seg branch does not converge"
