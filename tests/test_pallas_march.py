"""Pallas march kernel equivalence vs the jnp while_loop march.

The march result is stop-gradient'd by the differentiable path, so backend
choice must not change values (and cannot change gradients); these tests pin
value equivalence in interpret mode on CPU, including the closest-approach
channels the soft-coverage AA consumes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loltracer_tpu.config import RenderConfig
from loltracer_tpu.lol import parse_scene_file
from loltracer_tpu.render.camera import camera_rays
from loltracer_tpu.render.jnp_renderer import make_renderer, render_image
from loltracer_tpu.render.march import march
from loltracer_tpu.render.pallas_march import make_pallas_march
from loltracer_tpu.render.sdf import make_scene_sdf
from loltracer_tpu.scene import build_scene

H, W = 16, 128


@pytest.fixture(scope="module")
def scenes(examples_dir):
    return {
        name: build_scene(parse_scene_file(str(examples_dir / name)))
        for name in ["scene.lol", "scene2.lol", "scene3.lol", "scene4.lol"]
    }


@pytest.mark.parametrize(
    "name", ["scene.lol", "scene2.lol", "scene3.lol", "scene4.lol"]
)
def test_march_kernel_matches_jnp(scenes, name):
    scene = scenes[name]
    cfg = RenderConfig()
    ro, rd = camera_rays(scene.params, H, W, cfg)
    sdf = make_scene_sdf(scene.structure)
    ref = march(sdf, scene.params, ro, rd, cfg)
    pal = make_pallas_march(scene.structure, cfg, interpret=True)(
        scene.params, ro, rd
    )
    np.testing.assert_allclose(pal.t, ref.t, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(pal.t_query, ref.t_query, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(pal.t_close, ref.t_close, atol=1e-4, rtol=1e-4)
    # s_min is inf where never tracked; compare finite lanes
    fin = np.isfinite(np.asarray(ref.s_min))
    assert fin.shape == np.asarray(pal.s_min).shape
    np.testing.assert_array_equal(fin, np.isfinite(np.asarray(pal.s_min)))
    np.testing.assert_allclose(
        np.asarray(pal.s_min)[fin], np.asarray(ref.s_min)[fin],
        atol=1e-4, rtol=1e-4,
    )


def test_march_kernel_nonaligned(scenes):
    """Odd sizes pad with edge-replicated rays and crop."""
    scene = scenes["scene.lol"]
    cfg = RenderConfig()
    ro, rd = camera_rays(scene.params, 13, 150, cfg)
    sdf = make_scene_sdf(scene.structure)
    ref = march(sdf, scene.params, ro, rd, cfg)
    pal = make_pallas_march(scene.structure, cfg, interpret=True)(
        scene.params, ro, rd
    )
    assert pal.t.shape == (13, 150)
    np.testing.assert_allclose(pal.t, ref.t, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("antialias", [False, True])
def test_render_with_pallas_march_matches(scenes, antialias):
    """Full render via march_backend=pallas-interpret equals the default."""
    scene = scenes["scene3.lol"]
    base = RenderConfig(antialias=antialias)
    ref = np.asarray(
        render_image(scene.structure, scene.params, H, W, base)
    )
    img = np.asarray(
        render_image(
            scene.structure, scene.params, H, W,
            base.replace(march_backend="pallas-interpret"),
        )
    )
    np.testing.assert_allclose(img, ref, atol=5e-5)


def test_grad_with_pallas_march_matches(scenes):
    """Gradients are identical across march backends (the march is frozen
    and IFT-re-attached either way)."""
    scene = scenes["scene4.lol"]
    base = RenderConfig(antialias=True)

    def loss(params, cfg):
        img = render_image(scene.structure, params, H, W, cfg)
        return jnp.mean(img * img)

    g_ref = jax.grad(loss)(scene.params, base)
    g_pal = jax.grad(loss)(
        scene.params, base.replace(march_backend="pallas-interpret")
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pal)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-3
        )
