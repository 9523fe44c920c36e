"""Render configuration.

The reference hardcodes every render constant at compile time
(march: naive_renderer.c:49-51, shadows: naive_renderer.c:99,
normal h: naive_renderer.c:119, gamma: naive_renderer.c:231).
Here they are a single config dataclass, hashable so it can be a static
argument to jitted renderers.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """All render-time constants, defaulting to the reference's values."""

    # Sphere-trace march (naive_renderer.c:49-51)
    max_steps: int = 256
    epsilon: float = 1e-3
    max_dist: float = 100.0

    # Soft shadows (naive_renderer.c:92-100): 128 steps, sharpness w=50,
    # shadow-ray origin offset of a full unit toward the light
    # (naive_renderer.c:97 — a quirk we reproduce by default).
    shadow_steps: int = 128
    shadow_w: float = 50.0
    shadow_offset: float = 1.0
    shadow_epsilon: float = 1e-3  # declared but unused by the reference too

    # Normal estimation: tetrahedron taps at h = dist/100
    # (naive_renderer.c:114-125).
    normal_h_scale: float = 0.01

    # Output (naive_renderer.c:231)
    gamma: float = 1.0 / 2.2

    # Soft-coverage antialiasing (NOT in the reference; off by default for
    # pixel parity). When on, near-miss rays within ~aa_width pixels of a
    # silhouette blend the occluder's color by a differentiable coverage
    # alpha — both an image-quality feature and the source of silhouette
    # gradients for inverse rendering (render/march.py intersect_aa).
    antialias: bool = False
    aa_width: float = 1.0

    # Camera projection: the reference computes the half-height of the view
    # plane as atan(fov/2) instead of the standard tan(fov/2)
    # (naive_renderer.c:183). True reproduces the reference.
    atan_fov: bool = True

    # Tile shape for tiled/Pallas rendering; lane dim must stay 128.
    tile_h: int = 8
    tile_w: int = 128

    # March backend for the differentiable render path's (stop-gradient'd)
    # sphere-trace: "auto" uses the fused Pallas kernel on TPU and the jnp
    # while_loop elsewhere; "jnp" / "pallas" force one;
    # "pallas-interpret" runs the kernel in the Pallas interpreter (CPU
    # equivalence tests). Gradients are identical across backends — the
    # march result is frozen and re-attached via the IFT either way
    # (render/march.py).
    march_backend: str = "auto"

    # Soft-shadow gradient estimator:
    #   "exact"    — reverse-mode AD through the full rematerialized
    #                128-step shadow scan: the exact gradient of the
    #                discretized forward computation (trajectory terms
    #                included). Backward cost: O(shadow_steps) SDF
    #                evaluations per light per pixel.
    #   "envelope" — the shadow march runs frozen (stop-gradient, Pallas
    #                kernel on TPU) recording the argmin step t*; the
    #                gradient is re-attached via ONE differentiable SDF
    #                evaluation at t* per light. By Danskin's theorem this
    #                is the exact gradient of the idealized penumbra
    #                min(1, min_t w·f(ro+t·rd)/t) — the same
    #                frozen-fixed-point principle as the march's IFT
    #                gradient (render/march.py). Forward values are
    #                bitwise identical to "exact"; backward cost drops
    #                from O(steps) to O(1) SDF evals.
    shadow_grad: str = "exact"

    # Step clamp for INSTANCED scenes (None = exact full SDF): the march
    # evaluates the step-clamped scene distance min(d, step_clamp) instead
    # of d. Semantically simple (one extra min, reproduced identically by
    # the jnp/banded oracle paths and the Pallas traversal) and
    # conservative: steps never overshoot, hits land on the same surfaces
    # within epsilon, and every quantity that consumes small distances —
    # hit detection, penumbra minima (w*d/t < 1 requires d << clamp),
    # normal taps, coverage alpha (s ~ pixel_rad) — sits in the d <
    # step_clamp regime where the value is EXACT. What changes is only the
    # free-space step SIZE (clamped to step_clamp), i.e. more, shorter
    # steps across empty space. The payoff on TPU: the traversal's
    # candidate ball shrinks from (scene-dependent upper bound + block
    # radius) to (step_clamp + block radius), cutting window evaluations
    # several-fold (render/pallas_scene.py InstancedScene). Ignored for
    # compiled (non-instanced) structures.
    step_clamp: float = None

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = RenderConfig()
