"""Golden-tracer self-consistency: the vectorized float64 golden must match
the scalar per-pixel transliteration bitwise-closely (both are float64; they
differ only in masking strategy)."""

import numpy as np
import pytest

from loltracer_tpu.golden import render_golden, render_golden_scalar, trace_pixel
from loltracer_tpu.lol import parse_scene_file
from loltracer_tpu.scene import build_scene


@pytest.mark.parametrize("name", ["scene.lol", "scene3.lol"])
def test_vectorized_matches_scalar(examples_dir, name):
    # tiny images: the scalar golden is pure-Python slow, and agreement at a
    # handful of pixels covering hit/miss/shadow cases is what matters
    scene = build_scene(parse_scene_file(str(examples_dir / name)), dtype=np.float64)
    vec = render_golden(scene, 8, 6)
    scal = render_golden_scalar(scene, 8, 6)
    np.testing.assert_allclose(vec, scal, rtol=1e-12, atol=1e-12)


def test_trace_pixel_consistent(examples_dir):
    scene = build_scene(
        parse_scene_file(str(examples_dir / "scene2.lol")), dtype=np.float64
    )
    vec = render_golden(scene, 16, 12)
    for (x, y) in [(8, 6), (0, 0), (15, 11)]:
        px = trace_pixel(scene, x, y, 16, 12)
        np.testing.assert_allclose(vec[y, x], px, rtol=1e-12, atol=1e-12)


def test_golden_is_float64(examples_dir):
    scene = build_scene(
        parse_scene_file(str(examples_dir / "scene.lol")), dtype=np.float64
    )
    img = render_golden(scene, 8, 6)
    assert img.dtype == np.float64
    assert np.all(np.isfinite(img))
