"""Radar point-cloud -> RVEP map projection, device-side.

The reference consumes pre-projected 4x512x512 range/velocity/elevation/power
maps from .npz (utils/dataloader.py:111-112); the projection itself happens
offline in the WaterScenes tooling.  For the fused on-device pipeline
(BASELINE config 3) this op projects raw 4D-radar points straight on the TPU:

  points: (N, 6) float32 = [u, v, range, velocity, elevation, power]
          (u, v) already in camera-pixel coordinates; rows >= num_valid are
          padding and must carry u=v=-1.
  output: (H, W, 4) RVEP map; multiple points landing in a pixel keep the
          *nearest* (min range) return, matching typical radar rasterisation.

Implemented as a single scatter-min over a fixed-size point buffer — fully
jit-able, differentiable w.r.t. nothing (it's input preprocessing).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def project_points_to_rvep(
    points: jnp.ndarray,          # (N, 6)
    valid: jnp.ndarray,           # (N,) bool
    out_hw: tuple[int, int],
) -> jnp.ndarray:
    h, w = out_hw
    u = jnp.round(points[:, 0]).astype(jnp.int32)
    v = jnp.round(points[:, 1]).astype(jnp.int32)
    ok = valid & (u >= 0) & (u < w) & (v >= 0) & (v < h)

    # nearest-return wins: scatter-min on range, then scatter the full RVEP
    # vector of the winning point.
    flat_idx = jnp.where(ok, v * w + u, h * w)        # out-of-range -> dropped
    big = jnp.float32(jnp.inf)
    rng_flat = jnp.full((h * w + 1,), big).at[flat_idx].min(
        jnp.where(ok, points[:, 2], big), mode="drop"
    )[: h * w]

    # winners: points whose range equals the pixel minimum
    is_winner = ok & (points[:, 2] <= rng_flat[jnp.clip(flat_idx, 0, h * w - 1)])
    rvep = points[:, 2:6]
    out = jnp.full((h * w, 4), -jnp.inf, jnp.float32).at[flat_idx].max(
        jnp.where(is_winner[:, None], rvep, -jnp.inf), mode="drop"
    )
    out = jnp.where(jnp.isfinite(out), out, 0.0)
    return out.reshape(h, w, 4)


def rvep_from_npz_layout(radar_chw: jnp.ndarray) -> jnp.ndarray:
    """(4,H,W) on-disk layout -> NHWC map."""
    return jnp.transpose(radar_chw, (1, 2, 0))
