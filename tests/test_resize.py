"""Parity tests for the matmul-based resize/pool ops against torch/PIL oracles."""
import numpy as np
import pytest

import jax.numpy as jnp

from asy_vrnet_tpu.ops.resize import (
    adaptive_avg_pool,
    resize_bicubic_pil,
    resize_bilinear,
    upsample2x,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _nchw(x_nhwc: np.ndarray) -> "torch.Tensor":
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t: "torch.Tensor") -> np.ndarray:
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("in_hw,out_hw", [((8, 8), (16, 16)), ((5, 7), (13, 3)),
                                          ((16, 16), (64, 64)), ((4, 4), (8, 8))])
def test_bilinear_align_corners_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=True))
    ref = _to_nhwc(F.interpolate(_nchw(x), size=out_hw, mode="bilinear", align_corners=True))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("out_hw", [(7, 9), (16, 16)])
def test_bilinear_half_pixel_matches_torch(out_hw):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 11, 13, 2), dtype=np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=False))
    ref = _to_nhwc(F.interpolate(_nchw(x), size=out_hw, mode="bilinear", align_corners=False))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_upsample2x():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 6, 6, 4), dtype=np.float32)
    ours = np.asarray(upsample2x(jnp.asarray(x)))
    ref = _to_nhwc(F.interpolate(_nchw(x), scale_factor=2, mode="bilinear", align_corners=True))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((16, 16), (2, 2)), ((7, 9), (2, 2)),
                                          ((8, 8), (3, 5)), ((2, 2), (2, 2)),
                                          ((1, 1), (2, 2))])
def test_adaptive_avg_pool_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), out_hw))
    ref = _to_nhwc(torch.nn.AdaptiveAvgPool2d(out_hw)(_nchw(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_bicubic_matches_pil():
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.default_rng(4)
    img = rng.uniform(0, 255, size=(37, 53, 3)).astype(np.float32)
    out_hw = (19, 29)
    ours = np.asarray(resize_bicubic_pil(jnp.asarray(img[None]), out_hw))[0]
    ref = np.stack(
        [
            np.asarray(
                Image.fromarray(img[..., c], mode="F").resize(
                    (out_hw[1], out_hw[0]), Image.BICUBIC
                )
            )
            for c in range(3)
        ],
        axis=-1,
    )
    np.testing.assert_allclose(ours, ref, atol=2e-2)
