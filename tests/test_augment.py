"""Augmentations + seg-only dataset + enhancement ops."""
import numpy as np
import pytest

import jax.numpy as jnp

from asy_vrnet_tpu.data.augment import (
    apply_weather,
    flip_horizontal,
    fog,
    hsv_jitter,
    merge_mosaic_boxes,
    mixup,
    mosaic,
    rain,
    random_place,
    sun_flare,
)


def test_flip_consistency():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (8, 16, 3), dtype=np.uint8)
    seg = rng.integers(0, 5, (8, 16)).astype(np.uint8)
    radar = rng.standard_normal((8, 16, 4)).astype(np.float32)
    boxes = np.array([[2, 1, 6, 5, 3]], np.float32)
    fi, fb, fs, fr = flip_horizontal(img, boxes, seg, radar)
    np.testing.assert_array_equal(fi, img[:, ::-1])
    np.testing.assert_array_equal(fs, seg[:, ::-1])
    np.testing.assert_array_equal(fr, radar[:, ::-1])
    np.testing.assert_allclose(fb[0, :4], [16 - 6, 1, 16 - 2, 5])


def test_hsv_jitter_preserves_shape_and_range():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    out = hsv_jitter(img, rng)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_random_place_boxes_stay_inside():
    from PIL import Image

    rng = np.random.default_rng(2)
    img = Image.fromarray(np.zeros((50, 100, 3), np.uint8))
    boxes = np.array([[10, 10, 90, 40, 1]], np.float32)
    out, nb, _ = random_place(img, boxes, (64, 64), rng)
    assert out.size == (64, 64)
    if len(nb):
        assert np.all(nb[:, 0] >= 0) and np.all(nb[:, 2] <= 64)
        assert np.all(nb[:, 1] >= 0) and np.all(nb[:, 3] <= 64)


def test_merge_mosaic_boxes_clipping():
    # a box crossing the cut in quadrant 0 gets clipped to the cut
    boxes = [np.array([[10, 10, 50, 50, 0]]), np.zeros((0, 5)),
             np.zeros((0, 5)), np.zeros((0, 5))]
    out = merge_mosaic_boxes(boxes, cutx=30, cuty=30)
    assert out.shape == (1, 5)
    np.testing.assert_allclose(out[0, :4], [10, 10, 30, 30])
    # a quadrant-0 box fully beyond the cut is dropped
    boxes[0] = np.array([[40, 40, 50, 50, 0]])
    assert len(merge_mosaic_boxes(boxes, 30, 30)) == 0


def test_mosaic_and_mixup():
    from PIL import Image

    rng = np.random.default_rng(3)
    imgs = [Image.fromarray(rng.integers(0, 255, (40, 60, 3), dtype=np.uint8))
            for _ in range(4)]
    boxes = [np.array([[5, 5, 30, 30, i]], np.float32) for i in range(4)]
    out, ob = mosaic(imgs, boxes, (64, 64), rng)
    assert out.shape == (64, 64, 3)
    assert ob.ndim == 2 and ob.shape[1] == 5

    m, mb = mixup(out, ob, out[::-1].copy(), ob)
    assert m.shape == out.shape
    assert len(mb) == 2 * len(ob)


def test_weather_ops():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    for fn in (rain, fog, sun_flare):
        out = fn(img, rng)
        assert out.shape == img.shape and out.dtype == np.uint8
    out = apply_weather(img, rng)
    assert out.shape == img.shape


def test_joint_dataset_augment_flag(tmp_path):
    from asy_vrnet_tpu.data.dataset import WaterScenesDataset, read_annotation_file
    from asy_vrnet_tpu.data.synthetic import write_synthetic_voc_dataset

    meta = write_synthetic_voc_dataset(str(tmp_path), num_images=2, hw=(64, 64))
    lines = read_annotation_file(meta["annotation_path"])
    ds = WaterScenesDataset(
        lines, (64, 64), 4, 9, meta["radar_root"], meta["seg_dataset_path"],
        max_boxes=8, augment=True, weather=True, seed=0,
    )
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    assert item["radar"].shape == (64, 64, 4)
    assert np.isfinite(item["image"]).all()


def test_seg_only_dataset(tmp_path):
    from PIL import Image

    from asy_vrnet_tpu.data.seg_dataset import SegOnlyDataset

    rng = np.random.default_rng(5)
    root = tmp_path
    (root / "VOC2007" / "JPEGImages").mkdir(parents=True)
    (root / "VOC2007" / "SegmentationClass").mkdir(parents=True)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)).save(
            root / "VOC2007" / "JPEGImages" / f"img{i}.jpg"
        )
        Image.fromarray(rng.integers(0, 9, (48, 72)).astype(np.uint8)).save(
            root / "VOC2007" / "SegmentationClass" / f"img{i}.png"
        )
    for train in (False, True):
        ds = SegOnlyDataset(["img0", "img1"], (64, 64), 9, train, str(root))
        item = ds[0]
        assert item["image"].shape == (64, 64, 3)
        assert "seg_onehot" not in item  # one-hot happens on device
        assert item["seg_target"].max() <= 9


def test_enhance_ops():
    from asy_vrnet_tpu.ops.enhance import ace_enhance, dehaze_dark_channel, unsharp_mask

    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.uniform(0.2, 1.0, (32, 32, 3)).astype(np.float32))
    hazy = jnp.clip(img * 0.6 + 0.4, 0, 1)  # uniform haze
    out = dehaze_dark_channel(hazy, size=7, guided_r=9)
    assert out.shape == img.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # dehazing should increase contrast of the hazy image
    assert float(jnp.std(out)) > float(jnp.std(hazy)) * 0.9

    sh = unsharp_mask(img)
    assert sh.shape == img.shape
    ace = ace_enhance(img)
    assert float(ace.min()) >= 0.0 and float(ace.max()) <= 1.0
