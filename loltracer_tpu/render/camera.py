"""Pinhole camera ray generation (naive_renderer.c:177-193, 217-224).

Reproduces the reference's projection including its atan quirk: the view
plane half-height is atan(fov/2), not tan(fov/2) (naive_renderer.c:183;
configurable via RenderConfig.atan_fov).

The camera direction is renormalized here (the reference normalizes only at
parse time, scene.c:173) so camera orientation stays valid while being
optimized in inverse rendering; for parsed scenes this is a no-op up to one
ulp.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from loltracer_tpu.config import RenderConfig
from loltracer_tpu.scene import SceneParams

_UP_GUIDE = (0.0, 1.0, 0.0)

from loltracer_tpu.render.vecmath import cross as _cross, normalize as _normalize


def camera_rays_for_rows(
    params: SceneParams,
    rows,
    height_px: int,
    width_px: int,
    cfg: RenderConfig,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ray grid for a subset of image rows (the sharding unit: each device
    owns a block of rows end-to-end, like the reference's disjoint
    scanlines). rows: [R] int row indices. Returns (ro [3], rd [R, W, 3])."""
    up_guide = jnp.asarray(_UP_GUIDE, dtype)
    direction = _normalize(params.cam_direction.astype(dtype))
    half_fov = params.cam_fov.astype(dtype) / 2.0
    h = jnp.arctan(half_fov) if cfg.atan_fov else jnp.tan(half_fov)
    aspect = width_px / height_px
    w = aspect * h

    right_dir = _normalize(_cross(direction, up_guide))
    up_dir = _cross(right_dir, direction)

    vx = (jnp.arange(width_px, dtype=dtype) + 0.5) / width_px * 2.0 - 1.0
    vy = 1.0 - (rows.astype(dtype) + 0.5) / height_px * 2.0

    rd = (
        right_dir * (vx[None, :, None] * w)
        + up_dir * (vy[:, None, None] * h)
        + direction
    )
    return params.cam_point.astype(dtype), _normalize(rd)


def camera_rays(
    params: SceneParams,
    height_px: int,
    width_px: int,
    cfg: RenderConfig,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-image ray grid. Returns (ro [3], rd [H, W, 3]).

    Pixel centers map to NDC as ((x+.5)/W*2-1, 1-(y+.5)/H*2)
    (naive_renderer.c:218-221); aspect = W/H follows the surface each frame
    (naive_renderer.c:213).
    """
    rows = jnp.arange(height_px, dtype=jnp.int32)
    return camera_rays_for_rows(params, rows, height_px, width_px, cfg, dtype)
