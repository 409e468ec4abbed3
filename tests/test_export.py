"""StableHLO export/reload round trip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asy_vrnet_tpu.config import ModelConfig
from asy_vrnet_tpu.infer.export import export_stablehlo, load_exported
from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model


def test_export_roundtrip(tmp_path):
    cfg = ModelConfig(
        phi="nano", compute_dtype="float32", use_pallas_cluster=False,
        input_size=(64, 64),
    )
    model = create_model(cfg)
    params, bstats = init_model(model, jax.random.PRNGKey(0), input_size=(64, 64))
    variables = {"params": params, "batch_stats": bstats}

    path = str(tmp_path / "model.stablehlo")
    export_stablehlo(model, cfg, variables, path, with_postprocess=True,
                     conf_thres=0.01, max_det=8)
    assert_size = __import__("os").path.getsize(path)
    assert assert_size > 10_000

    fn = load_exported(path)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    rad = jnp.asarray(rng.standard_normal((1, 64, 64, 4)), jnp.float32)
    out, seg = fn(img, rad)
    assert out["boxes_xyxy"].shape == (1, 8, 4)
    assert seg.shape == (1, 64, 64, 9)

    # reloaded graph must match the live model + postprocess exactly
    from asy_vrnet_tpu.ops.boxes import decode_predictions
    from asy_vrnet_tpu.ops.nms import non_max_suppression

    det_ref, seg_ref = model.apply(variables, img, rad, train=False)
    pred = decode_predictions(det_ref, (64, 64))
    ref = non_max_suppression(pred, 4, conf_thres=0.01, max_out=8)
    np.testing.assert_allclose(
        np.asarray(out["boxes_xyxy"]), np.asarray(ref["boxes_xyxy"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(seg), np.asarray(jax.nn.softmax(seg_ref, -1)), atol=1e-5
    )
