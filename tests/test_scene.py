"""Scene compiler tests: AST -> SceneStructure + SoA SceneParams."""

import numpy as np
import pytest

from loltracer_tpu.lol import parse_scene_file
from loltracer_tpu.scene import build_scene


def test_scene1_structure(examples_dir):
    s = build_scene(parse_scene_file(str(examples_dir / "scene.lol")))
    st = s.structure
    assert st.num_materials == 5
    assert st.num_lights == 1
    assert (st.num_spheres, st.num_boxes, st.num_planes, st.num_unions) == (
        2, 1, 1, 0,
    )
    assert st.objects == (
        ("sphere", 0),
        ("sphere", 1),
        ("box", 0),
        ("plane", 0),
    )
    assert st.material_ids == (0, 1, 2, 3, 4)
    p = s.params
    assert p.sphere_point.shape == (2, 3)
    np.testing.assert_allclose(p.sphere_point[1], [-1, 0.5, -3])
    np.testing.assert_allclose(p.box_half[0], [2, 2, 2])
    np.testing.assert_allclose(p.box_radius, [0.6])
    np.testing.assert_allclose(p.plane_y, [-1.0])


def test_scene4_csg_tape(examples_dir):
    s = build_scene(parse_scene_file(str(examples_dir / "scene4.lol")))
    st = s.structure
    assert st.num_spheres == 5
    assert st.num_unions == 4
    assert st.num_objects == 2
    root = st.objects[0]
    assert root[0] == "smin"
    # depth-first a-then-b collection: leaves 0..4 left to right
    ("smin", 3,
        ("smin", 0, ("sphere", 0), ("sphere", 1)),
        ("smin", 2, ("sphere", 2),
            ("smin", 1, ("sphere", 3), ("sphere", 4)))) == root
    assert st.objects[1] == ("plane", 0)
    # smoothness params all 3
    np.testing.assert_allclose(s.params.smooth_k, [3, 3, 3, 3])
    # the union shades with material 1, plane with 2; id 0 is background
    assert st.material_ids == (0, 1, 2)


def test_empty_primitive_arrays_have_shapes(examples_dir):
    s = build_scene(parse_scene_file(str(examples_dir / "scene2.lol")))
    assert s.params.box_point.shape == (0, 3)
    assert s.params.box_half.shape == (0, 3)
    assert s.params.smooth_k.shape == (0,)


def test_structure_hashable(examples_dir):
    s1 = build_scene(parse_scene_file(str(examples_dir / "scene.lol")))
    s2 = build_scene(parse_scene_file(str(examples_dir / "scene.lol")))
    assert hash(s1.structure) == hash(s2.structure)
    assert s1.structure == s2.structure


def test_params_is_pytree(examples_dir):
    import jax

    s = build_scene(parse_scene_file(str(examples_dir / "scene3.lol")))
    leaves = jax.tree_util.tree_leaves(s.params)
    assert len(leaves) == 18
    flat, treedef = jax.tree_util.tree_flatten(s.params)
    rebuilt = jax.tree_util.tree_unflatten(treedef, flat)
    np.testing.assert_allclose(rebuilt.sphere_radius, s.params.sphere_radius)


def test_dtype_option(examples_dir):
    s = build_scene(
        parse_scene_file(str(examples_dir / "scene.lol")), dtype=np.float64
    )
    assert s.params.sphere_point.dtype == np.float64
