"""Fused device pipeline: radar projection + letterbox + forward + NMS."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.config import ModelConfig
from asy_vrnet_tpu.data.preprocess import letterbox_image, normalize_image
from asy_vrnet_tpu.infer.pipeline import build_fused_pipeline, device_letterbox
from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model
from asy_vrnet_tpu.ops.radar import project_points_to_rvep


def test_radar_projection_basics():
    pts = jnp.asarray([
        [2.0, 3.0, 10.0, 1.0, 0.5, 7.0],     # pixel (3,2)
        [2.0, 3.0, 5.0, -2.0, 0.1, 9.0],     # same pixel, nearer -> wins
        [0.0, 0.0, 1.0, 0.0, 0.0, 1.0],
        [100.0, 1.0, 1.0, 0.0, 0.0, 1.0],    # out of range -> dropped
        [-1.0, -1.0, 0.0, 0.0, 0.0, 0.0],    # padding
    ])
    valid = jnp.asarray([True, True, True, True, False])
    out = np.asarray(project_points_to_rvep(pts, valid, (8, 8)))
    np.testing.assert_allclose(out[3, 2], [5.0, -2.0, 0.1, 9.0])
    np.testing.assert_allclose(out[0, 0], [1.0, 0.0, 0.0, 1.0])
    assert out.sum() == pytest.approx(out[3, 2].sum() + out[0, 0].sum())


def test_device_letterbox_matches_host():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 96, 3), dtype=np.uint8)
    ours = np.asarray(device_letterbox(jnp.asarray(img), (64, 64)))
    from PIL import Image

    boxed, nw, nh = letterbox_image(Image.fromarray(img), (64, 64))
    ref = normalize_image(np.asarray(boxed))
    assert ours.shape == ref.shape
    # PIL resizes in two passes with uint8 intermediates (plus final uint8
    # rounding); the device path keeps float precision throughout, so allow a
    # few quantisation levels of difference inside the content region.  The
    # padding region must be exact.
    err = np.abs(ours - ref)
    assert err.max() < 8.0 / 255.0 / 0.225, err.max()
    assert err[:16].max() == 0.0 and err[48:].max() == 0.0  # gray bars exact
    assert err.mean() < 1.0 / 255.0 / 0.225


def test_fused_pipeline_end_to_end():
    cfg = ModelConfig(
        phi="nano", compute_dtype="float32", use_pallas_cluster=False,
        input_size=(64, 64),
    )
    model = create_model(cfg)
    params, bstats = init_model(model, jax.random.PRNGKey(0), input_size=(64, 64))
    pipe = build_fused_pipeline(
        model, cfg, source_hw=(48, 96), conf_thres=0.01, max_det=8
    )
    rng = np.random.default_rng(1)
    image = jnp.asarray(rng.integers(0, 255, (2, 48, 96, 3), dtype=np.uint8))
    pts = jnp.asarray(rng.uniform(0, 60, (2, 32, 6)).astype(np.float32))
    valid = jnp.ones((2, 32), bool)
    dets, seg_probs = pipe({"params": params, "batch_stats": bstats}, image, pts, valid)
    assert dets["boxes_xyxy"].shape == (2, 8, 4)
    assert seg_probs.shape == (2, 64, 64, cfg.num_seg_classes)
    s = np.asarray(seg_probs.sum(axis=-1))
    np.testing.assert_allclose(s, np.ones_like(s), atol=1e-4)
