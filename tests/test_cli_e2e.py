"""End-to-end CLI smoke: train on synthetic data, then predict det+seg with the
trained weights, score mIoU — the whole user journey on tiny shapes."""
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def env():
    e = dict(os.environ)
    e["JAX_PLATFORMS"] = "cpu"
    # drop the axon plugin's sitecustomize platform pin for subprocesses
    return e


@pytest.fixture(scope="module")
def trained(tmp_path_factory, env):
    save_dir = str(tmp_path_factory.mktemp("run"))
    res = subprocess.run(
        [
            sys.executable, "-m", "asy_vrnet_tpu.cli.train",
            "--synthetic", "4", "--epochs", "2", "--batch-size", "2",
            "--input-size", "64", "--save-dir", save_dir,
            "--compute-dtype", "float32", "--eval-period", "2",
            "--save-period", "2", "--num-devices", "1", "--max-boxes", "8",
        ],
        capture_output=True, text=True, env=env, timeout=3000,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    return save_dir, res


def test_train_cli_produces_artifacts(trained):
    save_dir, res = trained
    assert "epoch 2/2" in res.stdout
    assert os.path.exists(os.path.join(save_dir, "last_epoch_weights.npz"))
    assert os.path.exists(os.path.join(save_dir, "epoch_map.txt"))
    assert os.path.exists(os.path.join(save_dir, "epoch_miou.txt"))
    ckpts = os.listdir(os.path.join(save_dir, "ckpt"))
    assert any(c.startswith("step_") for c in ckpts)


def test_predict_cli_with_trained_weights(trained, env, tmp_path):
    save_dir, res = trained
    # find the synthetic dataset the train CLI created (printed via config dump)
    import re

    m = re.search(r"synthetic dataset: (\S+)", res.stdout)
    assert m, res.stdout[:2000]
    root = m.group(1)
    img = next(
        os.path.join(root, "JPEGImages", f)
        for f in sorted(os.listdir(os.path.join(root, "JPEGImages")))
    )
    image_id = os.path.basename(img)[:-4]
    radar = os.path.join(root, "radar", image_id + ".npz")
    out = str(tmp_path / "det")
    r = subprocess.run(
        [
            sys.executable, "-m", "asy_vrnet_tpu.cli.predict",
            "--mode", "predict", "--image", img, "--radar", radar,
            "--weights", os.path.join(save_dir, "last_epoch_weights.npz"),
            "--classes", os.path.join(root, "classes.txt"),
            "--input-size", "64", "--compute-dtype", "float32",
            "--conf", "0.01", "--out", out,
        ],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(out, os.path.basename(img)))

    out_seg = str(tmp_path / "seg")
    r = subprocess.run(
        [
            sys.executable, "-m", "asy_vrnet_tpu.cli.predict_seg",
            "--mode", "predict", "--image", img, "--radar", radar,
            "--weights", os.path.join(save_dir, "last_epoch_weights.npz"),
            "--input-size", "64", "--compute-dtype", "float32", "--out", out_seg,
        ],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(out_seg, os.path.basename(img)))
