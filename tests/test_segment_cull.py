"""Soundness of the shadow segment culls (pallas_scene segment_lit for
both scene kinds): a lane the bound marks PROVABLY LIT must produce
res == 1.0 exactly and t* == 0 from the real shadow march — any false
positive would silently flip a penumbra pixel to fully lit (the culls'
one-sidedness is what makes them value-exact)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loltracer_tpu.config import RenderConfig
from loltracer_tpu.lol import parse_scene_file
from loltracer_tpu.render.pallas_scene import (
    InstancedScene,
    ScalarScene,
    array_param_values,
    pack_instanced_spheres,
    shadow_loop,
)
from loltracer_tpu.scene import build_scene
from loltracer_tpu.scenes import instanced_spheres

CFG = RenderConfig()


def _rays(rng, n, origin_box, target_box):
    so = rng.uniform(*origin_box, size=(n, 3)).astype(np.float32)
    tgt = rng.uniform(*target_box, size=(n, 3)).astype(np.float32)
    d = tgt - so
    T = np.linalg.norm(d, axis=-1).astype(np.float32)
    ld = d / T[:, None]
    return so, ld, T


def _planes(a):
    """[n] -> (1, n) f32 plane (the kernels' lane-row layout)."""
    return jnp.asarray(a, jnp.float32).reshape(1, -1)


@pytest.mark.parametrize("name", ["scene2.lol", "scene3.lol", "scene4.lol"])
def test_compiled_segment_lit_sound(examples_dir, name):
    scene = build_scene(parse_scene_file(str(examples_dir / name)))
    st = scene.structure
    # geometry-only values (GEOM fields) suffice for the SDF
    from loltracer_tpu.render.pallas_scene import GEOM_FIELDS, active_fields

    values = array_param_values(st, scene.params, active_fields(st, GEOM_FIELDS))
    scn = ScalarScene(st, values)

    rng = np.random.RandomState(0)
    n = 512
    # origins across the scene volume, targets around the lights' region
    so, ld, T = _rays(rng, n, ((-4, -2, -6), (4, 4, 2)), ((-6, 3, -6), (6, 8, 2)))
    sop = tuple(_planes(so[:, i]) for i in range(3))
    ldp = tuple(_planes(ld[:, i]) for i in range(3))
    Tp = _planes(T)

    lit = np.asarray(
        jax.jit(
            lambda: scn.segment_lit(sop, ldp, Tp, None, CFG.shadow_w)
        )()
    )[0]
    res, t_star = jax.jit(
        lambda: shadow_loop(scn, CFG, sop, ldp, Tp)
    )()
    res = np.asarray(res)[0]
    t_star = np.asarray(t_star)[0]
    assert lit.sum() > 0, "bound never fires on this scene/ray set"
    np.testing.assert_array_equal(res[lit > 0.5], 1.0)
    np.testing.assert_array_equal(t_star[lit > 0.5], 0.0)


@pytest.mark.parametrize("clamp", [2.0, None])
def test_instanced_segment_lit_sound(clamp):
    """lit flags from InstancedScene.segment_lit (callable out-of-kernel —
    it needs no pl.ds) vs the ground-truth march from the interpret
    shadow kernel with the cull DISABLED."""
    from loltracer_tpu.render.pallas_march import make_pallas_shadow_march

    scene = instanced_spheres(n=400, seed=2)
    tables = pack_instanced_spheres(
        scene.params, scene.structure.material_ids
    )
    spheres_t, mu_b, blk_b, bbox = tables
    inst = InstancedScene(
        scene.structure, spheres_t, mu_b, blk_b,
        list(np.asarray(scene.params.plane_y)), bbox_ref=jnp.asarray(bbox),
    )
    rng = np.random.RandomState(1)
    n = 512  # one 16x32 lane-row patch
    # origins above/inside the field, targets near the lights
    so, ld, T = _rays(
        rng, n, ((-40, -1, -80), (40, 15, -4)), ((-25, 12, -35), (30, 35, -8))
    )
    sop = tuple(_planes(so[:, i]) for i in range(3))
    ldp = tuple(_planes(ld[:, i]) for i in range(3))
    Tp = _planes(T)

    lit = np.asarray(
        jax.jit(
            lambda: inst.segment_lit(sop, ldp, Tp, clamp, CFG.shadow_w)
        )()
    )[0]

    cfg = RenderConfig(
        step_clamp=clamp, shadow_cull=False, march_backend="pallas-interpret"
    )
    shadow_fn = make_pallas_shadow_march(
        scene.structure, cfg, interpret=True
    )
    from loltracer_tpu.render.pallas_march import P_H, P_W

    ro_img = so.reshape(P_H, P_W, 3)
    rd_img = ld.reshape(P_H, P_W, 3)
    T_img = T.reshape(P_H, P_W)
    res, t_star = shadow_fn(
        scene.params, jnp.asarray(ro_img), jnp.asarray(rd_img),
        jnp.asarray(T_img),
    )
    # _to_columns flattens the patch in (P_H, P_W) row-major order — the
    # same order the (1, COL) lane row uses, so a plain reshape matches
    res = np.asarray(res).reshape(-1)
    t_star = np.asarray(t_star).reshape(-1)
    np.testing.assert_array_equal(res[lit > 0.5], 1.0)
    np.testing.assert_array_equal(t_star[lit > 0.5], 0.0)


def test_instanced_gather_completeness():
    """The scratch gather's coverage guarantee, checked directly: for
    random points along each gathered patch's segments, the scratch-set
    min composed with the cut equals the full-set min (the clamp-
    completeness argument of config.py shadow_scratch)."""
    scene = instanced_spheres(n=400, seed=5)
    clamp = 2.0
    spheres = np.asarray(scene.params.sphere_point)
    radii = np.asarray(scene.params.sphere_radius)
    rng = np.random.RandomState(3)
    so = np.asarray([0.0, 3.0, -20.0], np.float32)
    ld = np.asarray([0.3, 0.8, 0.5], np.float32)
    ld /= np.linalg.norm(ld)
    T = 30.0

    # reference gather in numpy at micro-block granularity
    from loltracer_tpu.render.pallas_scene import (
        BOUND_MARGIN,
        INSTANCED_GROUP,
        _group_bounds,
        _morton_codes,
    )

    order = np.asarray(_morton_codes(jnp.asarray(spheres))).argsort()
    pos = spheres[order]
    rad = radii[order]
    pad = (-len(pos)) % 256
    pos = np.concatenate([pos, np.zeros((pad, 3), np.float32)])
    rad = np.concatenate([rad, np.full((pad,), -1e30, np.float32)])
    mu = np.asarray(_group_bounds(jnp.asarray(pos), jnp.asarray(rad),
                                  INSTANCED_GROUP, BOUND_MARGIN))
    g = INSTANCED_GROUP
    nmu = len(pos) // g
    ctr = mu[:nmu, :3]
    R = mu[:nmu, 3]
    # segment distance to each block center
    d = ctr - so
    proj = d @ ld
    tcl = np.clip(proj, 0, T)
    dseg = np.linalg.norm(d - tcl[:, None] * ld, axis=-1)
    keep = dseg <= clamp + R + BOUND_MARGIN
    kept_rows = np.concatenate(
        [np.arange(m * g, (m + 1) * g) for m in np.where(keep)[0]]
    ) if keep.any() else np.array([], int)

    # sample points along the segment; compare mins under the cut
    ts = rng.uniform(0, T, 200).astype(np.float32)
    pts = so + ts[:, None] * ld
    real = rad > -1e29

    def sphere_min(rows, p):
        if len(rows) == 0:
            return np.full(len(p), np.inf, np.float32)
        d = np.linalg.norm(p[:, None, :] - pos[rows], axis=-1) - rad[rows]
        return d.min(axis=1)

    full = sphere_min(np.where(real)[0], pts)
    part = sphere_min(kept_rows[real[kept_rows]] if len(kept_rows) else kept_rows, pts)
    # under the cut (>= clamp), the partial min must agree wherever it
    # matters: min(full, clamp) == min(part, clamp)
    np.testing.assert_allclose(
        np.minimum(full, clamp), np.minimum(part, clamp), atol=1e-6
    )
