"""The r5 instanced-tier machinery is value-exact (r4 verdict item 1).

Three independently-switchable mechanisms must all keep the forward
bitwise identical to the plain fused renderer (their whole point is
speed, bought by provably-complete culling/ordering, never by values):

- the REGROUPED pipeline (render/pallas_regroup.py): split kernels with
  a Morton sort of shadow rays between them — lane values depend only on
  the lane's own ray, so reordering is exact (measured NEUTRAL on the
  dense 10k field: sorting shrinks the gathered set only ~20%, the
  segment volume through the field is the cost — PERF.md r5);
- the scratch chunk WINDOW (cfg.scratch_window): projection-ordered
  gather + per-step chunk-interval skipping, conservative by the
  1-Lipschitz projection bound (+9% measured);
- the FINER GATHER granularity (pallas_scene.GATHER_GROUP-sphere bounds
  vs 64-sphere micro-blocks): a smaller ball radius shrinks the gather
  capsule, still a superset of every sphere within the clamp (+35%
  measured, 425k -> 576k fwd @1080p/10k — the round-2 529k bar).
"""

import numpy as np
import pytest

from loltracer_tpu.config import RenderConfig
from loltracer_tpu.render.pallas_regroup import (
    make_instanced_renderer_regrouped,
    morton_keys,
)
from loltracer_tpu.render.pallas_train import make_instanced_renderer
from loltracer_tpu.scenes import instanced_spheres

H, W = 32, 64
CFG = RenderConfig(step_clamp=2.0, shadow_grad="envelope")


@pytest.fixture(scope="module")
def scene():
    return instanced_spheres(n=150, seed=5)


@pytest.fixture(scope="module")
def baseline(scene):
    """The no-scratch fused render: no gather, no window — the slowest,
    most-direct evaluation path."""
    r = make_instanced_renderer(
        scene.structure, H, W, CFG.replace(shadow_scratch=0), interpret=True
    )
    return np.asarray(r(scene.params))


def test_scratch_window_bitwise(scene, baseline):
    for cfg in [CFG, CFG.replace(scratch_window=False)]:
        img = np.asarray(
            make_instanced_renderer(
                scene.structure, H, W, cfg, interpret=True
            )(scene.params)
        )
        np.testing.assert_array_equal(img, baseline)


@pytest.mark.parametrize("clamp", [2.0, None], ids=["clamp2", "exact"])
def test_regrouped_bitwise(scene, baseline, clamp):
    cfg = CFG.replace(step_clamp=clamp)
    a = np.asarray(
        make_instanced_renderer_regrouped(
            scene.structure, H, W, cfg, interpret=True
        )(scene.params)
    )
    b = np.asarray(
        make_instanced_renderer(
            scene.structure, H, W, cfg, interpret=True
        )(scene.params)
    )
    np.testing.assert_array_equal(a, b)
    if clamp is not None:
        np.testing.assert_array_equal(a, baseline)


def test_gather_granularity_bitwise(scene, baseline, monkeypatch):
    """GATHER_GROUP only changes which supersets get copied — never the
    values (completeness holds at every granularity)."""
    import loltracer_tpu.render.pallas_scene as ps

    for gg in (64, 32):
        monkeypatch.setattr(ps, "GATHER_GROUP", gg)
        img = np.asarray(
            make_instanced_renderer(
                scene.structure, H, W, CFG, interpret=True
            )(scene.params)
        )
        np.testing.assert_array_equal(img, baseline)


def test_morton_keys_locality():
    """Morton codes order 3-D-adjacent points adjacently: points in the
    same octant cell share high bits, so sorting clusters them."""
    import jax.numpy as jnp

    lo = jnp.asarray([0.0, 0.0, 0.0])
    hi = jnp.asarray([1.0, 1.0, 1.0])
    px = jnp.asarray([0.1, 0.9, 0.11, 0.91])
    py = jnp.asarray([0.1, 0.9, 0.12, 0.89])
    pz = jnp.asarray([0.1, 0.9, 0.10, 0.92])
    keys = np.asarray(morton_keys(px, py, pz, lo, hi))
    order = np.argsort(keys)
    # the two near-origin points sort together, the two far ones together
    assert {tuple(order[:2]), tuple(order[2:])} == {(0, 2), (1, 3)} or \
        {tuple(sorted(order[:2])), tuple(sorted(order[2:]))} == \
        {(0, 2), (1, 3)}
