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
        RenderConfig(step_clamp=2.0, shadow_step_clamp=8.0),
        RenderConfig(step_clamp=2.0, shadow_cull=False),
        # tiny scratch: most patches overflow -> exercises the
        # full-traversal fallback branch of the lax.cond
        RenderConfig(step_clamp=2.0, shadow_scratch=256),
        RenderConfig(step_clamp=2.0, shadow_scratch=0),
    ],
    ids=["exact", "clamp", "clamp-aa", "clamp-envelope", "shadow-clamp",
         "no-cull", "scratch-overflow", "scratch-off"],
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


def _penumbra_keep(scene, cfg, H, W):
    """Mask of pixels whose gradients are penumbra-argmin independent,
    from the fused instanced forward's own residuals (mirrors
    tests/test_train.py _penumbra_mask)."""
    import jax
    import jax.numpy as jnp

    from loltracer_tpu.render.pallas_march import P_H, P_W, _from_columns
    from loltracer_tpu.render.pallas_scene import (
        cdiv,
        pack_instanced_spheres,
    )
    from loltracer_tpu.render.pallas_train import (
        camera_pack,
        instanced_small_fields,
        make_instanced_fwd_call,
    )

    st = scene.structure
    gph, gpw = cdiv(H, P_H), cdiv(W, P_W)
    fwd = make_instanced_fwd_call(
        st, gph * P_H, gpw * P_W, cfg, interpret=True, full_height=H,
        with_residuals=True,
    )
    spheres_t, mu_b, blk_b, bbox = pack_instanced_spheres(
        scene.params, st.material_ids
    )
    cam = camera_pack(scene.params, H, W, cfg)
    args = [jnp.asarray(getattr(scene.params, f), jnp.float32)
            for f in instanced_small_fields(st)]
    # gather-capable calls take the finer gather-bounds table (r5)
    from loltracer_tpu.render.pallas_scene import pack_gather_bounds
    from loltracer_tpu.render.pallas_train import instanced_uses_scratch

    gb = (pack_gather_bounds(spheres_t),) if instanced_uses_scratch(cfg) \
        else ()
    _, res = jax.jit(fwd)(cam, spheres_t, mu_b, blk_b, bbox, *gb, *args)
    res = np.asarray(_from_columns(res, gph, gpw))[:, :H, :W]
    from _penumbra import penumbra_pixels

    return ~penumbra_pixels(res, st.num_lights)


@pytest.mark.parametrize("clamp", [2.0, None], ids=["clamp", "exact"])
def test_instanced_fused_gradients_match_banded(scene, clamp):
    """The fused instanced custom_vjp tier's gradients (incl. sphere
    positions/radii through the record/replay/scatter backward) match the
    banded jnp path's AD away from penumbra-argmin near-ties."""
    import jax
    import jax.numpy as jnp

    from loltracer_tpu.render.jnp_renderer import render_image_banded
    from loltracer_tpu.render.pallas_train import (
        make_instanced_training_renderer,
    )

    cfg = RenderConfig(
        shadow_grad="envelope", march_backend="jnp", step_clamp=clamp
    )
    keep = _penumbra_keep(scene, cfg, H, W)[..., None].astype(np.float32)
    target = 0.5

    fused = make_instanced_training_renderer(
        scene.structure, H, W, cfg, interpret=True
    )

    def grads(render_fn):
        def loss(p):
            img = render_fn(p)
            return jnp.mean(jnp.asarray(keep) * (img - target) ** 2)

        return jax.jit(jax.grad(loss))(scene.params)

    g_f = grads(fused)
    g_j = grads(
        lambda p: render_image_banded(
            scene.structure, p, H, W, cfg, band_rows=8
        )
    )
    for f in (
        "sphere_point", "sphere_radius", "plane_y", "light_point",
        "mat_diffuse", "mat_ambient", "ambient_color", "cam_point",
        "cam_direction", "cam_fov",
    ):
        a = np.asarray(getattr(g_f, f))
        b = np.asarray(getattr(g_j, f))
        assert np.isfinite(a).all(), f
        scale = max(np.abs(b).max(), 1e-7)
        np.testing.assert_allclose(
            a, b, atol=2e-2 * scale, rtol=0, err_msg=f
        )
    assert np.abs(np.asarray(g_f.sphere_point)).max() > 0
