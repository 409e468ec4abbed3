"""Resize / pooling ops expressed as static interpolation matmuls.

TPU-first design note: `torch.nn.Upsample(mode='bilinear', align_corners=True)`
(used by the neck upsamples, neck/coc_fpn_dual.py:21, and ASPP's global branch
:96) and `nn.AdaptiveAvgPool2d` (cluster centers proposal, vr_coc.py:150) are
gather-style ops on GPU.  On TPU the fastest formulation is a pair of small
dense interpolation matrices applied as matmuls over the H and W axes — these
ride the MXU, fuse with neighbouring ops under XLA, and have fully static
shapes.  The matrices are built with numpy at trace time (shapes are static
under jit), so there is zero runtime cost to construct them.

All ops are NHWC.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _bilinear_matrix_align_corners(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) row-stochastic matrix for align_corners=True."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        # align_corners with a single output sample takes the first input.
        w[0, 0] = 1.0
        return w
    if in_size == 1:
        w[:, 0] = 1.0
        return w
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        src = i * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        w[i, lo] += 1.0 - frac
        w[i, hi] += frac
    return w


@functools.lru_cache(maxsize=None)
def _bilinear_matrix_half_pixel(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) matrix for align_corners=False (half-pixel centers)."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    scale = in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        src = min(max(src, 0.0), in_size - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        w[i, lo] += 1.0 - frac
        w[i, hi] += frac
    return w


@functools.lru_cache(maxsize=None)
def _adaptive_avg_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) averaging matrix matching torch AdaptiveAvgPool.

    torch window for output i: [floor(i*in/out), ceil((i+1)*in/out)).
    """
    w = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -((-(i + 1) * in_size) // out_size)  # ceil
        w[i, lo:hi] = 1.0 / (hi - lo)
    return w


def _apply_hw_matrices(x: jnp.ndarray, wh: np.ndarray, ww: np.ndarray) -> jnp.ndarray:
    """Apply (H2,H1) and (W2,W1) matrices over the H and W axes of NHWC x."""
    dtype = x.dtype
    wh_j = jnp.asarray(wh, dtype=dtype)
    ww_j = jnp.asarray(ww, dtype=dtype)
    # (B,H1,W1,C) -> (B,H2,W1,C)
    x = jnp.einsum("ih,bhwc->biwc", wh_j, x)
    # -> (B,H2,W2,C)
    x = jnp.einsum("jw,bhwc->bhjc", ww_j, x)
    return x


def resize_bilinear(
    x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool = True
) -> jnp.ndarray:
    """Bilinear resize of an NHWC tensor with exact torch semantics."""
    h2, w2 = out_hw
    _, h1, w1, _ = x.shape
    if (h1, w1) == (h2, w2):
        return x
    mat = _bilinear_matrix_align_corners if align_corners else _bilinear_matrix_half_pixel
    return _apply_hw_matrices(x, mat(h1, h2), mat(w1, w2))


def upsample2x(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """nn.Upsample(scale_factor=scale, mode='bilinear', align_corners=True)."""
    _, h, w, _ = x.shape
    return resize_bilinear(x, (h * scale, w * scale), align_corners=True)


def adaptive_avg_pool(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """AdaptiveAvgPool2d for NHWC, exact torch window semantics."""
    h2, w2 = out_hw
    _, h1, w1, _ = x.shape
    if (h1, w1) == (h2, w2):
        return x
    return _apply_hw_matrices(x, _adaptive_avg_matrix(h1, h2), _adaptive_avg_matrix(w1, w2))


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """Mean over H,W of NHWC."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


@functools.lru_cache(maxsize=None)
def _bicubic_matrix_pil(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) matrix reproducing PIL BICUBIC downscale/upscale.

    PIL uses a support-scaled cubic filter (a=-0.5) with per-row weight
    normalisation when resizing (letterbox preprocessing,
    utils/dataloader.py:140).  This matrix form allows the whole letterbox to
    run on-device as two matmuls for the fused-preprocess pipeline.
    """

    def cubic(t: np.ndarray, a: float = -0.5) -> np.ndarray:
        at = np.abs(t)
        r = np.where(
            at <= 1.0,
            (a + 2.0) * at**3 - (a + 3.0) * at**2 + 1.0,
            np.where(at < 2.0, a * at**3 - 5.0 * a * at**2 + 8.0 * a * at - 4.0 * a, 0.0),
        )
        return r

    w = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    for i in range(out_size):
        center = (i + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), in_size)
        js = np.arange(lo, hi)
        ws = cubic((js + 0.5 - center) / filterscale)
        s = ws.sum()
        if s != 0:
            ws = ws / s
        w[i, lo:hi] = ws
    return w.astype(np.float32)


def resize_bicubic_pil(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """PIL-style BICUBIC resize of NHWC (no clamping; caller may clip)."""
    h2, w2 = out_hw
    _, h1, w1, _ = x.shape
    if (h1, w1) == (h2, w2):
        return x
    return _apply_hw_matrices(x, _bicubic_matrix_pil(h1, h2), _bicubic_matrix_pil(w1, w2))
