"""Pallas TPU forward renderer — a thin wrapper over the fused training
kernel's forward (render/pallas_train.py) with residual outputs disabled.

The whole per-pixel pipeline — camera ray, sphere-trace march, tetrahedron
normals, per-light soft shadows, Phong, soft-coverage AA, gamma — runs as
ONE fused Pallas kernel over (8, 128) pixel tiles (the VPU register shape:
the lane axis is the new SSE, SURVEY.md §2 C14). This is the hand-tuned
tier that replaces the reference's DynASM scene JIT
(tracing_jit_renderer.dasc): the scene *structure* is unrolled into the
kernel at trace time, while every scene number stays a runtime input read
from SMEM.

There is exactly ONE implementation of the fused march/shadow/shade
pipeline — `pallas_train._train_fwd_kernel` — used by this forward-only
renderer (with_residuals=False: no residual planes, no IFT-denominator
eval) and by the differentiable custom_vjp tier
(pallas_train.make_training_renderer). Round 2 carried three drifting
copies of these loops; this module now only adapts the shared kernel to
the plain `params -> image` contract. cfg.antialias is honored (the fused
forward implements soft-coverage AA identically to the jnp path).

Why it beats the XLA whole-image path:

- march and shadow loops are `lax.while_loop`s that exit when THIS TILE's
  worst ray finishes — sky/converged tiles stop after a few steps, whereas
  the whole-image formulation runs every pixel until the globally worst ray
  finishes;
- all intermediates live in registers/VMEM as flat (8, 128) component
  planes; materials resolve through an unrolled select — no gathers.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from loltracer_tpu.config import DEFAULT_CONFIG, RenderConfig
from loltracer_tpu.render.pallas_scene import TILE_H, TILE_W, active_fields  # noqa: F401 (TILE_* re-exported)
from loltracer_tpu.render.pallas_train import camera_pack, make_fwd_call
from loltracer_tpu.scene import SceneParams, SceneStructure


def make_pallas_renderer(
    structure: SceneStructure,
    height: int,
    width: int,
    cfg: RenderConfig = DEFAULT_CONFIG,
    interpret: bool = False,
) -> Callable[[SceneParams], jnp.ndarray]:
    """Compile `params -> [H, W, 3] float32` via the fused Pallas forward
    kernel (compiled scenes; instanced scenes use the banded renderer with
    the instanced march/shadow kernels). interpret=True runs the kernel in
    the Pallas interpreter (CPU tests)."""
    if structure.instanced:
        raise ValueError(
            "make_pallas_renderer requires a compiled (non-instanced) scene"
        )
    fields = active_fields(structure)
    call = make_fwd_call(
        structure, height, width, cfg, interpret=interpret,
        with_residuals=False,
    )

    @jax.jit
    def renderer(params: SceneParams) -> jnp.ndarray:
        args = [camera_pack(params, height, width, cfg)]
        for f in fields:
            args.append(jnp.asarray(getattr(params, f)).astype(jnp.float32))
        planar = call(*args)
        return jnp.moveaxis(planar, 0, -1)[:height, :width, :]

    return renderer
