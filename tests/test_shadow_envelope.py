"""Envelope shadow-gradient estimator (config.py shadow_grad).

The envelope path must (a) leave forward values bitwise unchanged, (b) have
its Pallas frozen shadow march agree with the jnp scan, (c) compute the
Danskin/envelope gradient of the penumbra min — validated against central
differences of the frozen-argmin integrand, the function the estimator is
the exact gradient of — and (d) drive inverse rendering as well as the
exact estimator (the production use case that motivates it).
"""

import dataclasses as dc

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from loltracer_tpu.config import RenderConfig
from loltracer_tpu.lol import parse_scene_file
from loltracer_tpu.opt import masked_optimizer
from loltracer_tpu.render.camera import camera_rays
from loltracer_tpu.render.jnp_renderer import make_renderer, render_image
from loltracer_tpu.render.march import march
from loltracer_tpu.render.pallas_march import make_pallas_shadow_march
from loltracer_tpu.render.sdf import make_scene_sdf
from loltracer_tpu.render.shading import soft_shadow
from loltracer_tpu.scene import build_scene

H, W = 16, 128
ALL = ["scene.lol", "scene2.lol", "scene3.lol", "scene4.lol"]


@pytest.fixture(scope="module")
def scenes(examples_dir):
    return {
        name: build_scene(parse_scene_file(str(examples_dir / name)))
        for name in ALL
    }


def _shadow_rays(scene, cfg):
    """March primary rays and build the first light's shadow rays, exactly
    as shading.shade does."""
    sdf = make_scene_sdf(scene.structure)
    ro, rd = camera_rays(scene.params, H, W, cfg)
    res = march(sdf, scene.params, ro, rd, cfg)
    p = ro + res.t[..., None] * rd
    to_light = scene.params.light_point[0] - p
    ldist = jnp.sqrt(jnp.sum(to_light * to_light, -1))
    ldir = to_light / ldist[..., None]
    return sdf, p + ldir * cfg.shadow_offset, ldir, ldist


@pytest.mark.parametrize("name", ALL)
def test_forward_identical(scenes, name):
    """shadow_grad changes gradients only: forward images are identical."""
    scene = scenes[name]
    exact = RenderConfig(antialias=True)
    a = np.asarray(render_image(scene.structure, scene.params, H, W, exact))
    b = np.asarray(
        render_image(
            scene.structure, scene.params, H, W,
            exact.replace(shadow_grad="envelope"),
        )
    )
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("name", ALL)
def test_pallas_shadow_march_matches_scan(scenes, name):
    """The Pallas frozen shadow march reproduces the jnp scan's (res, t*)."""
    scene = scenes[name]
    cfg = RenderConfig()
    sdf, sro, ldir, ldist = _shadow_rays(scene, cfg)

    def body(carry, _):
        r, t, ts, done = carry
        d = sdf(scene.params, sro + t[..., None] * ldir)
        safe_t = jnp.where(t > 0, t, 1.0)
        val = jnp.where(
            t > 0, cfg.shadow_w * d / safe_t,
            jnp.where(d < 0, -jnp.inf, jnp.inf),
        )
        better = ~done & (val < r)
        nr = jnp.where(done, r, jnp.minimum(r, val))
        ts = jnp.where(better, t, ts)
        nt = jnp.where(done, t, t + d)
        nd = done | (nr < -1) | (nt > ldist)
        return (nr, nt, ts, nd), None

    init = (
        jnp.ones((H, W)), jnp.zeros((H, W)), jnp.zeros((H, W)),
        jnp.zeros((H, W), bool),
    )
    (res_ref, _, ts_ref, _), _ = lax.scan(
        body, init, None, length=cfg.shadow_steps
    )
    pr, pts = make_pallas_shadow_march(scene.structure, cfg, interpret=True)(
        scene.params, sro, ldir, ldist
    )
    res_ref, ts_ref = np.asarray(res_ref), np.asarray(ts_ref)
    pr, pts = np.asarray(pr), np.asarray(pts)
    fin = np.isfinite(res_ref)
    np.testing.assert_array_equal(fin, np.isfinite(pr))
    np.testing.assert_allclose(pr[fin], res_ref[fin], atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(pts, ts_ref, atol=5e-5, rtol=1e-4)


def test_envelope_gradient_is_danskin(scenes):
    """The envelope gradient equals central differences of the Danskin
    integrand w·f(q*, θ)/t* evaluated at the FROZEN argmin point q* for
    penumbra lanes — i.e. the estimator really is the envelope derivative,
    with the correct argmin, scale and interior masking."""
    scene = scenes["scene2.lol"]
    # softer shadows than the reference defaults so the 16x128 fixture has
    # a wide penumbra band (w=50 leaves ~2 penumbra lanes at this size)
    cfg = RenderConfig(shadow_grad="envelope", shadow_w=8.0)
    sdf, sro, ldir, ldist = _shadow_rays(scene, cfg)
    r0 = scene.params.sphere_radius[0]

    def with_radius(r):
        return dc.replace(
            scene.params,
            sphere_radius=jnp.asarray(scene.params.sphere_radius).at[0].set(r),
        )

    def shadow_of_radius(r):
        return soft_shadow(sdf, with_radius(r), sro, ldir, ldist, cfg)

    base = np.asarray(shadow_of_radius(r0))
    interior = (base > 0.05) & (base < 0.95)
    assert interior.sum() > 20, "fixture must exercise the penumbra"

    # recover the frozen argmin t* exactly as the estimator does
    _, t_star = make_pallas_shadow_march(scene.structure, cfg, interpret=True)(
        scene.params, sro, ldir, ldist
    )
    t_star = jnp.asarray(np.asarray(t_star))
    q_star = sro + t_star[..., None] * ldir  # frozen: sro/ldir are
    # constants in this test (θ enters soft_shadow only via sdf params)

    def danskin_integrand(r):
        safe_ts = jnp.where(t_star > 0, t_star, 1.0)  # non-penumbra lanes
        return cfg.shadow_w * sdf(with_radius(r), q_star) / safe_ts

    eps = 1e-3
    fd = (
        np.asarray(danskin_integrand(r0 + eps))
        - np.asarray(danskin_integrand(r0 - eps))
    ) / (2 * eps)

    def shadow_sum_interior(r):
        return jnp.sum(jnp.where(interior, shadow_of_radius(r), 0.0))

    g_int = float(jax.grad(shadow_sum_interior)(r0))
    fd_int = float(fd[interior].sum())
    np.testing.assert_allclose(g_int, fd_int, rtol=1e-3)


def test_inverse_rendering_with_envelope(scenes):
    """Position recovery (the silhouette-gradient stress test of
    test_inverse.py) converges with envelope shadows."""
    scene = scenes["scene.lol"]
    cfg = RenderConfig(antialias=True, shadow_grad="envelope")
    Hs, Ws = 24, 32
    target = make_renderer(scene.structure, Hs, Ws, cfg)(scene.params)
    sp = np.array(scene.params.sphere_point)
    sp[0, 0] += 0.25
    sp[0, 1] -= 0.20
    params = dc.replace(scene.params, sphere_point=jnp.asarray(sp))

    loss_j = jax.jit(
        lambda p: jnp.mean(
            (render_image(scene.structure, p, Hs, Ws, cfg) - target) ** 2
        )
    )
    gfun = jax.jit(jax.grad(loss_j))
    opt = masked_optimizer(optax.adam(2e-2), params, ("sphere_point",))
    ost = opt.init(params)
    for _ in range(60):
        g = gfun(params)
        u, ost = opt.update(g, ost, params)
        params = optax.apply_updates(params, u)
    got = np.asarray(params.sphere_point)[0]
    want = np.asarray(scene.params.sphere_point)[0]
    assert abs(got[0] - want[0]) < 0.08, (got, want)
    assert abs(got[1] - want[1]) < 0.08, (got, want)


def test_envelope_grad_with_pallas_interpret(scenes):
    """Full-render envelope gradients agree between the jnp frozen scan and
    the Pallas shadow kernel. Frozen values differ by float ulps, which can
    flip the shadow argmin step on near-tied lanes (a discontinuous O(1)
    per-lane gradient change), so tolerances are per-leaf aggregate, not
    elementwise-tight."""
    scene = scenes["scene3.lol"]
    base = RenderConfig(antialias=True, shadow_grad="envelope")

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
        a, b = np.asarray(a), np.asarray(b)
        if a.size == 0:
            continue
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=0.05 * scale, rtol=0.05)
