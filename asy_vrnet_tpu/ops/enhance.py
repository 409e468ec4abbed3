"""Device-side image enhancement: dark-channel dehaze + ACE-style sharpen.

jnp re-formulations of the reference's standalone OpenCV demos
(image_augmentation_test/dark_channel.py, sharpen.py) so they can fuse into
the on-device preprocessing graph (BASELINE config 3).  Morphological erosion
and box filters become reduce_window ops; the atmospheric-light estimate uses
a fixed-size top-k instead of a host argsort.

Inputs are float images in [0, 1], NHWC or HWC.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _min_pool(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Per-channel min filter (erosion with a rect kernel), HWC."""
    pad = size // 2
    return jax.lax.reduce_window(
        x, jnp.inf, jax.lax.min,
        (size, size, 1), (1, 1, 1),
        [(pad, pad), (pad, pad), (0, 0)],
    )


def _box_filter(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Mean filter with window (r, r), HWC or HW1."""
    pad = r // 2
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (r, r, 1), (1, 1, 1),
        [(pad, pad), (pad, pad), (0, 0)],
    )
    ones = jnp.ones(x.shape[:2] + (1,), x.dtype)
    n = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (r, r, 1), (1, 1, 1),
        [(pad, pad), (pad, pad), (0, 0)],
    )
    return s / n


def dark_channel(image: jnp.ndarray, size: int = 15) -> jnp.ndarray:
    """(H,W,3) -> (H,W,1) dark channel (min over RGB then min filter)."""
    dc = jnp.min(image, axis=-1, keepdims=True)
    return _min_pool(dc, size)


def _atmospheric_light(image: jnp.ndarray, dark: jnp.ndarray) -> jnp.ndarray:
    h, w, _ = image.shape
    npx = max((h * w) // 1000, 1)
    flat_dark = dark.reshape(-1)
    _, idx = jax.lax.top_k(flat_dark, npx)
    return jnp.mean(image.reshape(-1, 3)[idx], axis=0)  # (3,)


def dehaze_dark_channel(
    image: jnp.ndarray, size: int = 15, omega: float = 0.95,
    guided_r: int = 61, guided_eps: float = 1e-4, t0: float = 0.1,
) -> jnp.ndarray:
    """Single-image haze removal (He et al.), HWC float in [0,1]."""
    dark = dark_channel(image, size)
    a = _atmospheric_light(image, dark)
    te = 1.0 - omega * dark_channel(image / a, size)

    # guided filter with the gray image as guide
    gray = jnp.mean(image, axis=-1, keepdims=True)
    mean_i = _box_filter(gray, guided_r)
    mean_p = _box_filter(te, guided_r)
    mean_ip = _box_filter(gray * te, guided_r)
    cov_ip = mean_ip - mean_i * mean_p
    mean_ii = _box_filter(gray * gray, guided_r)
    var_i = mean_ii - mean_i * mean_i
    aa = cov_ip / (var_i + guided_eps)
    bb = mean_p - aa * mean_i
    t = _box_filter(aa, guided_r) * gray + _box_filter(bb, guided_r)

    t = jnp.maximum(t, t0)
    out = (image - a) / t + a
    return jnp.clip(out, 0.0, 1.0)


def unsharp_mask(image: jnp.ndarray, radius: int = 5, amount: float = 1.0
                 ) -> jnp.ndarray:
    """Classic unsharp sharpen, HWC float in [0,1]."""
    blurred = _box_filter(image, radius)
    return jnp.clip(image + amount * (image - blurred), 0.0, 1.0)


def ace_enhance(image: jnp.ndarray, radius: int = 31, gain: float = 3.0
                ) -> jnp.ndarray:
    """ACE-style local contrast enhancement (sharpen.py capability): local
    mean removal with bounded gain, then global [0,1] stretch."""
    local_mean = _box_filter(image, radius)
    detail = jnp.clip(gain * (image - local_mean), -1.0, 1.0)
    out = local_mean + detail
    lo = jnp.min(out)
    hi = jnp.max(out)
    return (out - lo) / (hi - lo + 1e-12)
