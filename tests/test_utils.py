"""Image I/O round-trip and interactive camera-update tests."""

import math

import numpy as np
import pytest

from loltracer_tpu.interactive import update_camera
from loltracer_tpu.utils.image import image_to_u8, read_png, write_png


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, size=(13, 17, 3))
    path = str(tmp_path / "x.png")
    write_png(path, img)
    back = read_png(path)
    np.testing.assert_array_equal(back, image_to_u8(img))


def test_u8_truncates_like_c_cast():
    img = np.array([[[0.0, 0.5, 1.0]]])
    u8 = image_to_u8(img)
    assert u8.tolist() == [[[0, 127, 255]]]


def test_camera_translate():
    # main.c:77-87: W moves along direction, D along right
    p, d = update_camera(
        np.zeros(3), np.array([0.0, 0.0, -1.0]), {"w"}
    )
    np.testing.assert_allclose(p, [0, 0, -0.1])
    np.testing.assert_allclose(d, [0, 0, -1])

    p, d = update_camera(np.zeros(3), np.array([0.0, 0.0, -1.0]), {"d"})
    # right = normalize(cross((0,0,-1), (0,1,0))) = (1, 0, 0)
    np.testing.assert_allclose(p, [0.1, 0, 0], atol=1e-12)


def test_camera_vertical():
    p, _ = update_camera(np.zeros(3), np.array([0.0, 0.0, -1.0]), {"space"})
    np.testing.assert_allclose(p, [0, 0.1, 0])
    p, _ = update_camera(np.zeros(3), np.array([0.0, 0.0, -1.0]), {"ctrl"})
    np.testing.assert_allclose(p, [0, -0.1, 0])


def test_camera_rotate_stays_unit():
    d0 = np.array([0.3, -0.7, -1.0])
    d0 /= np.linalg.norm(d0)
    _, d = update_camera(np.zeros(3), d0, {"left", "up"})
    assert math.isclose(np.linalg.norm(d), 1.0, rel_tol=1e-9)
    assert not np.allclose(d, d0)


def test_camera_combined_keys():
    # multiple movement keys compose, matching successive ifs (main.c:77-94)
    p, _ = update_camera(
        np.zeros(3), np.array([0.0, 0.0, -1.0]), {"w", "d", "space"}
    )
    np.testing.assert_allclose(p, [0.1, 0.1, -0.1], atol=1e-12)
