"""Speed-of-light accounting for the fused kernels (VERDICT r1 weak #4).

BASELINE's north star is "speed-of-light Pallas kernels (measured)". This
module turns that from a vibe into a number: it multiplies the SURVEY §6
per-pixel cost model (march steps + shadow steps + fixed per-pixel work,
each step = one full scene-SDF evaluation) by a per-structure VPU-op count,
aggregates it over the actual per-tile step distribution (a tile pays for
its worst lane — the lane-masking cost model of SURVEY §5.7/§5.8), and
divides by the measured wall clock to report an achieved fraction of the
VPU's peak f32 throughput.

Peak model: one TPU v5e core issues 8x128-lane VPU ops from ~4 ALUs at
~940 MHz => ~3.85e12 f32 ops/s. Transcendentals (sqrt, rsqrt, exp, log,
divide) retire slower than adds/muls; they are counted with a fixed weight
(TRANSCENDENTAL_WEIGHT) so the model stays an estimate, not a measurement.
The point of the number is the ORDER: whether the kernel sits at ~5% or
~50% of roofline, and which term (march vs shadow) dominates.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from loltracer_tpu.config import DEFAULT_CONFIG, RenderConfig
from loltracer_tpu.scene import SceneParams, SceneStructure

# ~4 ALUs x (8*128) lanes x ~940 MHz, one core per v5e chip.
V5E_VPU_PEAK_F32 = 4 * 8 * 128 * 0.94e9

# weight of sqrt/rsqrt/div/exp/log relative to an add/mul slot
TRANSCENDENTAL_WEIGHT = 4.0


def node_op_cost(node) -> float:
    """Approximate VPU op count (weighted) for one evaluation of a compiled
    object-expression node on an (8,128) tile, per lane."""
    kind = node[0]
    if kind == "sphere":
        # 3 sub, 3 mul, 2 add, sqrt, sub
        return 9 + TRANSCENDENTAL_WEIGHT
    if kind == "box":
        # 3 sub, 3 abs, 3 sub, 3 max, 3 mul+2 add, sqrt, max-tree(2), min,
        # add, sub
        return 21 + TRANSCENDENTAL_WEIGHT
    if kind == "plane":
        return 1
    if kind == "smin":
        # sub, div, mul-add, clamp(2), lerp(3), mul(2), sub -> ~10 + div
        return (
            9
            + TRANSCENDENTAL_WEIGHT
            + node_op_cost(node[2])
            + node_op_cost(node[3])
        )
    raise ValueError(node)


def sdf_eval_cost(structure: SceneStructure) -> float:
    """Weighted VPU ops per lane for ONE full scene-SDF evaluation."""
    if structure.instanced:
        # per sphere: 3 sub, 3 mul, 2 add, sqrt, sub + running min
        per_sphere = 10 + TRANSCENDENTAL_WEIGHT
        return structure.num_spheres * per_sphere + structure.num_planes * 2
    cost = sum(node_op_cost(n) for n in structure.objects)
    return cost + len(structure.objects)  # the argmin/min combine


def _tile_max(counts: np.ndarray, tile=(8, 128)) -> np.ndarray:
    th, tw = tile
    H, W = counts.shape
    ph, pw = -(-H // th) * th, -(-W // tw) * tw
    padded = np.zeros((ph, pw), counts.dtype)
    padded[:H, :W] = counts
    # padded lanes replicate edge behavior; zero is a safe lower bound here
    t = padded.reshape(ph // th, th, pw // tw, tw)
    return t.max(axis=(1, 3))


def roofline_estimate(
    structure: SceneStructure,
    params: SceneParams,
    height: int,
    width: int,
    measured_seconds: float,
    cfg: RenderConfig = DEFAULT_CONFIG,
    peak_flops: Optional[float] = None,
    mode: str = "fwd",
) -> Dict[str, float]:
    """Estimate the fused kernel's achieved fraction of VPU peak.

    Runs the march/shadow step-count instrumentation (utils/profiling), adds
    the fixed per-pixel work (normal taps, material select, shading), and
    compares weighted-op throughput against `peak_flops`. `measured_seconds`
    is the measured wall time of one forward (mode="fwd") or one
    forward+backward (mode="fwdbwd") at this size.

    `peak_flops=None` prefers the MEASURED ceiling from the committed
    `loltrace peak` artifact (utils/peak.py, artifacts/vpu_peak.json) and
    only falls back to the modeled V5E_VPU_PEAK_F32 constant without one
    (r4 verdict item 3b: the peak must be a measurement, not ALU-count
    arithmetic). The record says which was used (`peak_source`).
    """
    from loltracer_tpu.render.pallas_scene import resolve_tile
    from loltracer_tpu.utils.peak import load_measured_peak
    from loltracer_tpu.utils.profiling import march_step_counts

    peak_source = "explicit"
    if peak_flops is None:
        peak_flops = load_measured_peak()
        peak_source = "measured_artifact"
        if peak_flops is None:
            peak_flops = V5E_VPU_PEAK_F32
            peak_source = "modeled_constant"

    eval_cost = sdf_eval_cost(structure)
    tile = resolve_tile(cfg, False, height, structure.num_lights)
    lanes_per_tile = tile[0] * tile[1]

    # march: each tile pays its worst lane's step count (the hardware tile
    # shape from resolve_tile — 64x128 by default since r4)
    steps = march_step_counts(structure, params, height, width, cfg)
    march_evals = float(_tile_max(steps, tile).sum()) * lanes_per_tile

    # shadows: bounded by shadow_steps per light; approximate the tile-max
    # distribution with the march's shape scaled to the shadow cap (the
    # shadow march early-outs are at least as aggressive as the primary's)
    shadow_cap = min(cfg.shadow_steps, cfg.max_steps)
    shadow_evals = (
        structure.num_lights
        * float(np.minimum(_tile_max(steps, tile), shadow_cap).sum())
        * lanes_per_tile
    )

    # fixed per-pixel work: 4 normal taps + ~3 extra scene evals (hit-id,
    # IFT value + denominator jvp) + shading/ray math (~150 weighted ops)
    pixels = height * width
    fixed_evals = 7.0 * pixels
    shading_ops = 150.0 * pixels

    total_ops = (march_evals + shadow_evals + fixed_evals) * eval_cost
    total_ops += shading_ops
    if mode == "fwdbwd":
        # backward kernel: the re-attachment (~7 evals) forward + reverse
        # (~2x), plus shading math both ways
        total_ops += (2.0 * 7.0 * pixels) * eval_cost + 2.0 * shading_ops

    achieved = total_ops / measured_seconds
    return {
        "sdf_eval_cost_weighted_ops": eval_cost,
        "march_evals": march_evals,
        "shadow_evals": shadow_evals,
        "total_weighted_ops": total_ops,
        "achieved_ops_per_s": achieved,
        "peak_ops_per_s": peak_flops,
        "peak_source": peak_source,
        "fraction_of_peak": achieved / peak_flops,
    }
