"""Fused instanced tier: the whole pipeline over the windowed traversal
(render/pallas_train.make_instanced_renderer) must reproduce the banded
jnp renderer under the same config — the r2 verdict's missing
whole-hot-path coverage for instanced scenes."""

import numpy as np
import pytest

from loltracer_tpu.config import RenderConfig
from loltracer_tpu.render.jnp_renderer import render_image
from loltracer_tpu.render.pallas_train import make_instanced_renderer
from loltracer_tpu.scenes import instanced_spheres

H, W = 36, 64
N = 300


@pytest.fixture(scope="module")
def scene():
    return instanced_spheres(n=N, seed=9)


@pytest.mark.parametrize(
    "cfg",
    [
        RenderConfig(),
        RenderConfig(step_clamp=2.0),
        RenderConfig(step_clamp=2.0, antialias=True),
        RenderConfig(step_clamp=2.0, shadow_grad="envelope"),
    ],
    ids=["exact", "clamp", "clamp-aa", "clamp-envelope"],
)
def test_instanced_fused_matches_jnp(scene, cfg):
    ref = np.asarray(
        render_image(scene.structure, scene.params, H, W, cfg)
    )
    img = np.asarray(
        make_instanced_renderer(
            scene.structure, H, W, cfg, interpret=True
        )(scene.params)
    )
    np.testing.assert_allclose(img, ref, atol=1e-4)


def test_instanced_fused_single_sphere():
    """Degenerate block shapes (ADVICE r2 high regression, fused path)."""
    scene = instanced_spheres(n=1, seed=7)
    cfg = RenderConfig(step_clamp=2.0)
    ref = np.asarray(
        render_image(scene.structure, scene.params, H, W, cfg)
    )
    img = np.asarray(
        make_instanced_renderer(
            scene.structure, H, W, cfg, interpret=True
        )(scene.params)
    )
    np.testing.assert_allclose(img, ref, atol=1e-4)
