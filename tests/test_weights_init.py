"""Reference-style weights_init (nets/yolo_training.py:482-501) equivalent."""
import numpy as np
import pytest

import jax

from asy_vrnet_tpu.config import ModelConfig
from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model
from asy_vrnet_tpu.utils.init import reinit_params


@pytest.fixture(scope="module")
def params():
    cfg = ModelConfig(phi="nano", compute_dtype="float32",
                      use_pallas_cluster=False, input_size=(64, 64))
    model = create_model(cfg)
    p, _ = init_model(model, jax.random.PRNGKey(0), input_size=(64, 64))
    return p


def _leaves(tree):
    return {
        tuple(k.key if hasattr(k, "key") else str(k) for k in kp): np.asarray(v)
        for kp, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_kaiming_statistics(params):
    new = _leaves(reinit_params(params, 0, "kaiming"))
    # pick a large conv kernel: head stem (1,1,in,64-ish)
    big = [(p, v) for p, v in new.items()
           if p[-1] == "kernel" and v.ndim == 4 and v.size > 4000]
    assert big
    for p, v in big[:5]:
        fan_in = v.shape[0] * v.shape[1] * v.shape[2]
        assert np.std(v) == pytest.approx(np.sqrt(2.0 / fan_in), rel=0.15), p
        assert np.mean(v) == pytest.approx(0.0, abs=3 * np.std(v) / np.sqrt(v.size))


def test_normal_and_bn(params):
    new = _leaves(reinit_params(params, 0, "normal", init_gain=0.02))
    old = _leaves(params)
    kern = [(p, v) for p, v in new.items()
            if p[-1] == "kernel" and v.ndim == 4 and v.size > 4000]
    for p, v in kern[:5]:
        assert np.std(v) == pytest.approx(0.02, rel=0.1), p
    bn_scale = [(p, v) for p, v in new.items() if p[-2:] == ("bn", "scale")]
    bn_bias = [(p, v) for p, v in new.items() if p[-2:] == ("bn", "bias")]
    assert bn_scale and bn_bias
    all_scales = np.concatenate([v.ravel() for _, v in bn_scale])
    assert np.mean(all_scales) == pytest.approx(1.0, abs=0.01)
    assert np.std(all_scales) == pytest.approx(0.02, rel=0.25)
    for _, v in bn_bias:
        np.testing.assert_array_equal(v, 0.0)
    # non-conv / non-BN leaves untouched (sim_alpha, GroupNorm, layer scale)
    for p, v in old.items():
        if p[-1] in ("sim_alpha", "sim_beta", "layer_scale_1", "layer_scale_2") \
                or p[-2:] == ("gn", "scale"):
            np.testing.assert_array_equal(new[p], v, err_msg=str(p))


def test_orthogonal_rows(params):
    new = _leaves(reinit_params(params, 0, "orthogonal", init_gain=1.0))
    # a conv with O <= I*kh*kw has orthonormal rows in torch's flattening
    for p, v in new.items():
        if p[-1] != "kernel" or v.ndim != 4:
            continue
        kh, kw, i, o = v.shape
        if o <= kh * kw * i and o > 4:
            w = np.transpose(v, (3, 2, 0, 1)).reshape(o, -1)
            np.testing.assert_allclose(w @ w.T, np.eye(o), atol=1e-6, err_msg=str(p))
            return
    pytest.fail("no suitable conv found")


def test_none_is_identity(params):
    out = reinit_params(params, 0, "none")
    assert out is params
    with pytest.raises(NotImplementedError):
        reinit_params(params, 0, "bogus")
