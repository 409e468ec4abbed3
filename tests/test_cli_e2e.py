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
    # plot artifacts (reference: utils/callbacks.py:56-80,230-245)
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        return
    assert os.path.exists(os.path.join(save_dir, "loss", "epoch_det_seg.png"))
    assert os.path.exists(os.path.join(save_dir, "epoch_map.png"))
    assert os.path.exists(os.path.join(save_dir, "epoch_miou.png"))


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


def test_video_modes(trained, env, tmp_path):
    """Both predict CLIs process a tiny mp4 (reference predict.py:74-140 /
    predict_seg.py:21,99-144 video modes)."""
    import re

    import cv2

    save_dir, res = trained
    m = re.search(r"synthetic dataset: (\S+)", res.stdout)
    root = m.group(1)
    img_dir = os.path.join(root, "JPEGImages")
    img_name = sorted(os.listdir(img_dir))[0]
    frame = cv2.imread(os.path.join(img_dir, img_name))
    radar = os.path.join(root, "radar", img_name[:-4] + ".npz")

    video_in = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(video_in, cv2.VideoWriter_fourcc(*"mp4v"), 5.0,
                        (frame.shape[1], frame.shape[0]))
    for _ in range(3):
        w.write(frame)
    w.release()

    for module, extra in [
        ("asy_vrnet_tpu.cli.predict", ["--classes", os.path.join(root, "classes.txt"),
                                       "--conf", "0.01"]),
        ("asy_vrnet_tpu.cli.predict_seg", []),
    ]:
        video_out = str(tmp_path / f"out_{module.rsplit('.', 1)[-1]}.mp4")
        r = subprocess.run(
            [
                sys.executable, "-m", module,
                "--mode", "video", "--video", video_in, "--video-out", video_out,
                "--radar", radar,
                "--weights", os.path.join(save_dir, "last_epoch_weights.npz"),
                "--input-size", "64", "--compute-dtype", "float32",
            ] + extra,
            capture_output=True, text=True, env=env, timeout=1200,
        )
        assert r.returncode == 0, (module, r.stderr[-3000:])
        assert "processed 3 frames" in r.stdout, r.stdout[-2000:]
        cap = cv2.VideoCapture(video_out)
        assert cap.isOpened() and int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3
        cap.release()
