"""Differential tests: vectorized jnp renderer vs the float64 golden oracle
on all four reference example scenes (BASELINE correctness gate: allclose on
images)."""

import numpy as np
import pytest

from loltracer_tpu.config import RenderConfig
from loltracer_tpu.golden import render_golden
from loltracer_tpu.lol import parse_scene_file
from loltracer_tpu.render.jnp_renderer import make_renderer, render_scene
from loltracer_tpu.scene import build_scene

W, H = 32, 24


@pytest.fixture(scope="module")
def rendered(example_path):
    scene32 = build_scene(parse_scene_file(str(example_path)))
    scene64 = build_scene(parse_scene_file(str(example_path)), dtype=np.float64)
    img = np.asarray(render_scene(scene32, H, W))
    gold = render_golden(scene64, W, H)
    return img, gold


def test_image_matches_golden(rendered):
    img, gold = rendered
    # fp32 pipeline vs fp64 oracle; march/shadow paths amplify ulps a bit
    np.testing.assert_allclose(img, gold, atol=2e-4)


def test_image_in_range_and_finite(rendered):
    img, _ = rendered
    assert np.all(np.isfinite(img))
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_renderer_is_deterministic(examples_dir):
    scene = build_scene(parse_scene_file(str(examples_dir / "scene3.lol")))
    r = make_renderer(scene.structure, H, W)
    a = np.asarray(r(scene.params))
    b = np.asarray(r(scene.params))
    np.testing.assert_array_equal(a, b)


def test_tan_fov_option(examples_dir):
    """atan_fov=False switches to a standard pinhole (documented divergence
    knob for the reference's atan quirk, naive_renderer.c:183)."""
    scene = build_scene(parse_scene_file(str(examples_dir / "scene.lol")))
    cfg = RenderConfig(atan_fov=False)
    img_atan = np.asarray(render_scene(scene, H, W))
    img_tan = np.asarray(render_scene(scene, H, W, cfg))
    assert not np.allclose(img_atan, img_tan)


def test_background_uses_material_zero(examples_dir):
    """Miss pixels shade with material 0 (naive_renderer.c:102-112); scene.lol
    material 0 is all-black so the sky is black."""
    scene = build_scene(parse_scene_file(str(examples_dir / "scene.lol")))
    img = np.asarray(render_scene(scene, H, W))
    assert np.all(img[0, :3] == 0.0)
