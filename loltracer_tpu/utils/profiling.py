"""Profiling and occupancy observability.

The reference's profiling story is a per-frame ms log (main.c:196-204) and
Linux-perf jitdump symbolication of the generated SDF kernel
(jitdump.c; SURVEY.md §5.1). The TPU equivalents:

- `trace(logdir)`: jax.profiler trace context -> xprof/tensorboard, with the
  scene kernels identifiable via jax.named_scope,
- `march_step_stats`: per-pixel march step counts + histogram — the
  wavefront-divergence/occupancy metric for tile sizing (SURVEY.md §5.5):
  a tile's cost is its *worst* ray, so the step distribution tells you how
  much masked work lane-masking wastes,
- `frame_timer`: running min/max/avg frame times like the reference's log.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from loltracer_tpu.config import DEFAULT_CONFIG, RenderConfig
from loltracer_tpu.render.camera import camera_rays
from loltracer_tpu.render.sdf import make_scene_sdf
from loltracer_tpu.scene import SceneParams, SceneStructure


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """jax.profiler trace context; view with tensorboard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def march_step_counts(
    structure: SceneStructure,
    params: SceneParams,
    height: int,
    width: int,
    cfg: RenderConfig = DEFAULT_CONFIG,
) -> np.ndarray:
    """Per-pixel number of march iterations until convergence/miss
    (naive_renderer.c:56-63 loop trips), [H, W] int32."""
    sdf = make_scene_sdf(structure)

    @jax.jit
    def run(params):
        ro, rd = camera_rays(params, height, width, cfg)
        batch = rd.shape[:-1]
        t0 = jnp.zeros(batch, rd.dtype)
        steps0 = jnp.zeros(batch, jnp.int32)
        done0 = jnp.zeros(batch, bool)

        def cond(c):
            i, _, _, done = c
            return (i < cfg.max_steps) & ~jnp.all(done)

        def body(c):
            i, t, steps, done = c
            d = sdf(params, ro + t[..., None] * rd)
            new_t = t + d
            steps = jnp.where(done, steps, steps + 1)
            t = jnp.where(done, t, new_t)
            done = done | (d < cfg.epsilon) | (new_t > cfg.max_dist)
            return i + 1, t, steps, done

        _, _, steps, _ = lax.while_loop(cond, body, (0, t0, steps0, done0))
        return steps

    return np.asarray(run(params))


def march_step_stats(
    structure: SceneStructure,
    params: SceneParams,
    height: int,
    width: int,
    cfg: RenderConfig = DEFAULT_CONFIG,
    tile: Tuple[int, int] = (8, 128),
) -> Dict[str, float]:
    """Occupancy summary: step distribution plus the masked-work overhead of
    (8, 128) tiling — mean tile max over mean step count measures how much
    a tile's worst ray makes its converged lanes wait."""
    steps = march_step_counts(structure, params, height, width, cfg)

    def waste(th, tw):
        # None (json null) when the image is smaller than the tile —
        # NaN would poison strict-JSON measurement artifacts (ADVICE r4)
        hh = height - height % th
        ww = width - width % tw
        if not hh or not ww:
            return None
        tiles = steps[:hh, :ww].reshape(hh // th, th, ww // tw, tw)
        return float(tiles.max(axis=(1, 3)).mean())

    mean = float(steps.mean())
    th, tw = tile

    def ratio(w):
        return None if w is None else float(w / max(mean, 1e-9))

    return {
        "mean_steps": mean,
        "p50_steps": float(np.percentile(steps, 50)),
        "p99_steps": float(np.percentile(steps, 99)),
        "max_steps": float(steps.max()),
        "tile_waste": ratio(waste(th, tw)),
        # the hardware tile since r4 (pallas_scene.resolve_tile): bigger
        # tiles pay MORE worst-lane masking yet measure faster — the
        # scalar loop-control cost per tile-iteration dominates (PERF.md)
        "tile_waste_64x128": ratio(waste(64, 128)),
    }


class frame_timer:
    """Running frame-time stats in the spirit of main.c:196-204."""

    def __init__(self) -> None:
        self.frames = 0
        self.total = 0.0
        self.min = float("inf")
        self.max = 0.0
        self._t0 = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.frames += 1
        self.total += dt
        self.min = min(self.min, dt)
        self.max = max(self.max, dt)
        return False

    @property
    def avg(self) -> float:
        return self.total / max(self.frames, 1)

    def log(self) -> str:
        return (
            f"frame {self.frames} min {self.min*1e3:.1f}ms "
            f"max {self.max*1e3:.1f}ms avg {self.avg*1e3:.1f}ms"
        )
