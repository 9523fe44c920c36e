"""Instanced (SoA-batched, object-chunked) scene path tests.

The chunked instanced evaluation must agree with (a) an unrolled structure
over the same primitives, and (b) the float64 golden tracer; banded
rendering must agree with unbanded."""

import dataclasses

import numpy as np
import pytest

from loltracer_tpu.golden import render_golden
from loltracer_tpu.render.jnp_renderer import (
    make_renderer,
    render_image,
    render_image_banded,
)
from loltracer_tpu.scene import Scene, SceneStructure, params_astype
from loltracer_tpu.scenes import instanced_spheres

pytestmark = pytest.mark.slow  # 150-sphere compiles; run with `pytest -m slow`

H, W = 24, 32
N = 150  # small enough to unroll for the differential test


@pytest.fixture(scope="module")
def scene():
    s = instanced_spheres(n=N, seed=3)
    # small block so chunking (padding, multi-block fori) is exercised
    s.structure = dataclasses.replace(s.structure, instanced_block=64)
    return s


def _unrolled(scene: Scene) -> Scene:
    """The same scene as an unrolled per-object structure."""
    st = scene.structure
    objects = tuple(("sphere", i) for i in range(st.num_spheres)) + tuple(
        ("plane", i) for i in range(st.num_planes)
    )
    return Scene(
        structure=dataclasses.replace(st, instanced=False, objects=objects),
        params=scene.params,
    )


def test_instanced_matches_unrolled(scene):
    inst = np.asarray(
        make_renderer(scene.structure, H, W)(scene.params)
    )
    unr = np.asarray(
        make_renderer(_unrolled(scene).structure, H, W)(scene.params)
    )
    np.testing.assert_allclose(inst, unr, atol=2e-5)


def test_instanced_matches_golden(scene):
    scene64 = Scene(
        structure=scene.structure,
        params=params_astype(scene.params, np.float64),
    )
    gold = render_golden(scene64, W, H)
    img = np.asarray(make_renderer(scene.structure, H, W)(scene.params))
    np.testing.assert_allclose(img, gold, atol=3e-4)


def test_banded_matches_unbanded(scene):
    import jax

    full = np.asarray(make_renderer(scene.structure, H, W)(scene.params))
    banded = np.asarray(
        jax.jit(
            lambda p: render_image_banded(
                scene.structure, p, H, W, band_rows=8
            )
        )(scene.params)
    )
    np.testing.assert_allclose(banded, full, atol=1e-6)


def test_instanced_gradients_finite(scene):
    import jax
    import jax.numpy as jnp

    def loss(p):
        return jnp.mean(
            render_image_banded(scene.structure, p, H, W, band_rows=8) ** 2
        )

    g = jax.jit(jax.grad(loss))(scene.params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(np.isfinite(np.asarray(l)).all()) for l in leaves)
    assert float(np.abs(np.asarray(g.sphere_point)).sum()) > 0