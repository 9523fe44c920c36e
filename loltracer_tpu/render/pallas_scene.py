"""Shared tile-level scene machinery for the Pallas kernels.

The Pallas renderer, march/shadow kernels and the fused training kernels all
evaluate the same scene SDF over (8, 128) pixel tiles with the scene
*structure* unrolled at trace time and every scene *number* read from SMEM
refs (the Pallas analog of the reference's DynASM scene specialization,
tracing_jit_renderer.dasc:76-143). This module holds the pieces they share:
the SMEM scalar reader, the value-based ScalarScene, the tile smooth-min,
the concrete-layout zero helper, and the SMEM field plumbing.

The split between `read_param_values` (refs -> nested tuples of traced
scalars) and `ScalarScene` (nested tuples -> SDF/shading evaluation) exists
for the backward training kernel: it reads the scalars once, then takes
`jax.vjp` of the whole re-attachment shading function with respect to that
scalar pytree (render/pallas_train.py)."""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from loltracer_tpu.scene import SceneStructure

import os as _os_tiles

# Compiled-tier DEFAULT tile shape under the interpreter and the floor of
# the auto-resolution (resolve_tile): (8, 128) is the f32 VPU register
# shape. On hardware the kernels default to 64x128 — the march/shadow
# loops pay a serial scalar-control cost per loop iteration per tile, so
# fewer/bigger tiles win (r4 sweep in PERF.md; the old fixed 8x128 left
# 1.6x on the table). Env override = perf-sweep hook.
TILE_H = int(_os_tiles.environ.get("LOL_TILE_H", "8"))
TILE_W = int(_os_tiles.environ.get("LOL_TILE_W", "128"))
_HW_TILE_H = int(_os_tiles.environ.get("LOL_HW_TILE_H", "64"))


def resolve_tile(cfg, interpret: bool, height: int = None,
                 num_lights: int = 2):
    """The compiled-tier FORWARD tile shape for this config/target:
    explicit cfg.tile_h/tile_w win; else 64x128 on hardware, 8x128 under
    the interpreter (keeps CPU equivalence tests fast — values are
    identical across tile shapes, see config.py). The height dim caps at
    the padded image/shard height so short row shards don't pad 8x, and
    halves per pair of lights beyond two (the forward kernel carries
    2 live shadow planes per light). The BACKWARD kernel's tile is
    resolved separately (resolve_bwd_tile): its vjp working set sat at
    14.8M of the 16M scoped VMEM for scene4 (L=2) at 64x128 — 80x128
    measured-OOMs — but it has no march loops, so it keeps a small tile
    without capping the forward tile (r4 verdict item 2)."""
    th = cfg.tile_h
    if th is None:
        if interpret:
            th = TILE_H
        else:
            th = _HW_TILE_H
            while num_lights > 2 and th > 8:
                th //= 2
                num_lights -= 2
    tw = cfg.tile_w if cfg.tile_w is not None else TILE_W
    if height is not None:
        th = max(8, min(th, cdiv(height, 8) * 8))
    if th % 8 or tw % 128:
        raise ValueError(f"tile ({th}, {tw}) must be (8k, 128k)")
    return th, tw


def resolve_bwd_tile(cfg, interpret: bool, padded_height: int,
                     num_lights: int = 2):
    """The backward kernel's tile: the largest height <= the measured
    64-row VMEM ceiling (halved per pair of lights beyond two) that
    divides the forward call's padded image height exactly (the residual
    and cotangent arrays are laid out by the forward grid). An explicit
    cfg.tile_h wins when it divides the padded height — the sweep hook
    stays honest."""
    tw = cfg.tile_w if cfg.tile_w is not None else TILE_W
    if cfg.tile_h is not None and padded_height % cfg.tile_h == 0:
        return cfg.tile_h, tw  # explicit sweep override
    cap = 64
    nl = num_lights
    while nl > 2 and cap > 8:
        cap //= 2
        nl -= 2
    if interpret:
        cap = min(cap, TILE_H)
    th = 8
    for cand in range(8, cap + 1, 8):
        if padded_height % cand == 0:
            th = cand
    return th, tw


# March/shadow loop unroll: SDF sub-steps per while_loop iteration (per
# `min(done)` reduce + scalar branch). The r4 tile sweep proved the
# compiled tier is bound by that serial per-iteration control cost, so
# amortizing it over K sub-steps is the direct attack; done lanes freeze
# per lane and an explicit step-cap term in the done flag keeps results
# bitwise identical to K=1 for any max_steps (see march_loop). Extra cost
# is up to K-1 wasted full-tile SDF evals after the worst lane converges.
_HW_UNROLL = int(_os_tiles.environ.get("LOL_MARCH_UNROLL", "0")) or None


def resolve_unroll(interpret: bool) -> int:
    """Loop unroll factor: env LOL_MARCH_UNROLL wins; else 4 on hardware
    (measured best in the r5 sweep — see PERF.md), 1 under the interpreter
    (values are unroll-invariant; K>1 only slows CPU tests)."""
    if _HW_UNROLL is not None:
        return _HW_UNROLL
    return 1 if interpret else 4

# All scene-parameter fields a kernel may read from SMEM, in canonical order.
PARAM_FIELDS = [
    "sphere_point",
    "sphere_radius",
    "box_point",
    "box_half",
    "box_radius",
    "plane_y",
    "smooth_k",
    "mat_shininess",
    "mat_diffuse",
    "mat_specular",
    "mat_ambient",
    "ambient_color",
    "light_point",
    "light_diffuse",
    "light_specular",
]

# The subset the scene SDF itself needs (march/shadow kernels read only
# geometry; shading additionally needs materials/lights).
GEOM_FIELDS = [
    "sphere_point",
    "sphere_radius",
    "box_point",
    "box_half",
    "box_radius",
    "plane_y",
    "smooth_k",
]


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def czero(v):
    """A zeros-tile with a CONCRETE (non-splat) Mosaic vector layout.
    jnp.zeros/x*0.0 constant-fold to replicated splats, which Mosaic cannot
    relayout back from concrete inside while-loop carries ("Invalid
    relayout ... replicated in destination but not in source"); min(v*v, 0)
    is exactly 0.0 but not foldable."""
    return jnp.minimum(v * v, 0.0)


def smin_tile(a, b, k):
    """Polynomial smooth-min on (8,128) tiles; k is a traced scalar.
    k == 0 never occurs in valid scenes (parser default 0 is projected by
    opt; kernels assume k != 0 like the reference's JIT does)."""
    h = jnp.clip(0.5 + 0.5 * (b - a) / k, 0.0, 1.0)
    return (b + (a - b) * h) - k * h * (1.0 - h)


def active_fields(
    structure: SceneStructure, fields: List[str] = PARAM_FIELDS
) -> List[str]:
    """Param fields with nonzero size for this structure (zero-size SMEM
    arrays are not passed into the kernel)."""
    s = structure
    skip = set()
    if not s.num_spheres:
        skip |= {"sphere_point", "sphere_radius"}
    if not s.num_boxes:
        skip |= {"box_point", "box_half", "box_radius"}
    if not s.num_planes:
        skip.add("plane_y")
    if not s.num_unions:
        skip.add("smooth_k")
    if not s.num_lights:
        skip |= {"light_point", "light_diffuse", "light_specular"}
    return [f for f in fields if f not in skip]


def field_shape(structure: SceneStructure, field: str):
    """Logical shape of a param field for this structure (scene.py
    SceneParams docstring)."""
    s = structure
    return {
        "sphere_point": (s.num_spheres, 3),
        "sphere_radius": (s.num_spheres,),
        "box_point": (s.num_boxes, 3),
        "box_half": (s.num_boxes, 3),
        "box_radius": (s.num_boxes,),
        "plane_y": (s.num_planes,),
        "smooth_k": (s.num_unions,),
        "mat_shininess": (s.num_materials,),
        "mat_diffuse": (s.num_materials, 3),
        "mat_specular": (s.num_materials, 3),
        "mat_ambient": (s.num_materials, 3),
        "ambient_color": (3,),
        "light_point": (s.num_lights, 3),
        "light_diffuse": (s.num_lights, 3),
        "light_specular": (s.num_lights, 3),
    }[field]


def read_param_values(structure: SceneStructure, refs: Dict) -> Dict:
    """Read every scalar of every provided SMEM field ref into nested
    tuples mirroring the field shapes: 1-D fields become (s0, s1, ...),
    [N, 3] fields become ((x, y, z), ...). The result is a JAX pytree of
    traced scalars — the differentiation point for the backward kernel."""
    values = {}
    for field, ref in refs.items():
        shape = field_shape(structure, field)
        if len(shape) == 1:
            values[field] = tuple(ref[i] for i in range(shape[0]))
        else:
            values[field] = tuple(
                tuple(ref[i, j] for j in range(shape[1]))
                for i in range(shape[0])
            )
    return values


def array_param_values(structure: SceneStructure, params, fields=None) -> Dict:
    """read_param_values, but from a SceneParams' arrays instead of SMEM
    refs — the out-of-kernel twin used by tests and host-side gradient
    checks."""
    import jax.numpy as _jnp

    if fields is None:
        fields = active_fields(structure)
    values = {}
    for field in fields:
        arr = _jnp.asarray(getattr(params, field)).astype(_jnp.float32)
        shape = field_shape(structure, field)
        if len(shape) == 1:
            values[field] = tuple(arr[i] for i in range(shape[0]))
        else:
            values[field] = tuple(
                tuple(arr[i, j] for j in range(shape[1]))
                for i in range(shape[0])
            )
    return values


import os as _os

# Spheres per eval window (the pairwise sublane dim). 256 measured best on
# v5e for the 10k-sphere config (128: -9%, 64: -31%, 512: -21%; r4 sweep
# in PERF.md); env override = sweep hook.
INSTANCED_LANES = int(_os.environ.get("LOL_INSTANCED_LANES", "256"))
# Spheres per cull micro-block (bound granularity). The sweet spot trades
# bound-radius tightness (smaller groups -> fewer window picks) against
# the height of the per-step eligibility pass (fewer rows for bigger
# groups); with the 256-sphere windows, 64 measured best on v5e (32: -2%,
# 128: -13%, 16: -26%; r4 sweep in PERF.md). Env override = sweep hook.
INSTANCED_GROUP = int(_os.environ.get("LOL_INSTANCED_GROUP", "64"))
# Scratch-table evaluation chunk (ScratchScene.CHUNK aliases this).
SCRATCH_CHUNK = 256
# The LOL_* sweep knobs are validated with explicit raises (not asserts —
# stripped under python -O): the traversal silently mis-windows when the
# group does not tile the window, and gather_segment_blocks' sentinel pad
# loop strides by INSTANCED_GROUP up to a SCRATCH_CHUNK boundary — a
# non-dividing group would store past the chunk end, an out-of-bounds
# VMEM write when the scratch is chunk-sized (ADVICE r4).
if INSTANCED_LANES % INSTANCED_GROUP:
    raise ValueError(
        f"LOL_INSTANCED_LANES ({INSTANCED_LANES}) must be a multiple of "
        f"LOL_INSTANCED_GROUP ({INSTANCED_GROUP})"
    )
if SCRATCH_CHUNK % INSTANCED_GROUP:
    raise ValueError(
        f"LOL_INSTANCED_GROUP ({INSTANCED_GROUP}) must divide the scratch "
        f"chunk ({SCRATCH_CHUNK})"
    )
if INSTANCED_LANES % 8 or INSTANCED_GROUP % 8:
    raise ValueError(
        f"LOL_INSTANCED_LANES/GROUP ({INSTANCED_LANES}/{INSTANCED_GROUP}) "
        "must be multiples of 8 (sublane-aligned window slices)"
    )
# Scratch-GATHER granularity (spheres per gathered bound/copy; r5): finer
# than the 64-sphere traversal micro-block because the gather capsule's
# radius is clamp + group-ball-R — at 64 spheres the ball radius (~3-4
# units in the 10k field) triples the capsule volume vs 16-sphere balls.
GATHER_GROUP = int(_os.environ.get("LOL_GATHER_GROUP", "16"))
if GATHER_GROUP % 8 or SCRATCH_CHUNK % GATHER_GROUP:
    raise ValueError(
        f"LOL_GATHER_GROUP ({GATHER_GROUP}) must be a multiple of 8 and "
        f"divide the scratch chunk ({SCRATCH_CHUNK})"
    )
# Conservative slack added to micro-block/block bound radii: the bound
# passes compute |p - ctr| via the MXU expansion |c|^2 - 2c.p + |p|^2,
# whose f32 cancellation error at |c| ~ 2e2 is ~3e-2 — the margin keeps
# every bound a TRUE bound so culling stays exact (the sphere evaluation
# itself stays componentwise on the VPU for bitwise parity with jnp).
# The margin assumes TRUE f32 accumulation: the bound dot_generals pass
# Precision.HIGHEST so the TPU MXU cannot silently run them as bf16
# passes (whose ~1e0 rounding at these magnitudes would dwarf the margin
# and cull visible spheres); cost is negligible — the bound passes are a
# tiny fraction of the window evaluations they guard (ADVICE r3 medium).
BOUND_MARGIN = 0.0625
_BOUND_PRECISION = jax.lax.Precision.HIGHEST


def _morton_codes(pos):
    """30-bit Morton (Z-order) codes for [N, 3] positions — the spatial sort
    that makes 128-sphere blocks compact so their bounding spheres cull
    (pure jnp: runs under jit on traced params; the ORDER is value-dependent
    but the min over spheres is exact regardless of order, so reordering
    never changes results)."""
    lo = jnp.min(pos, axis=0)
    hi = jnp.max(pos, axis=0)
    # ISOTROPIC normalization (one scale for all axes): per-axis scaling
    # would stretch the shortest axis's cells ~8x thinner on this kind of
    # slab-shaped scene, destroying the real-space locality of consecutive
    # codes — the whole point of the sort (group bounds got ~25% looser,
    # measured round 3).
    scale = jnp.maximum(jnp.max(hi - lo), 1e-9)
    q = (pos - lo) / scale * 1023.0
    q = jnp.clip(q, 0.0, 1023.0).astype(jnp.uint32)

    def part1by2(x):
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    return (
        part1by2(q[:, 0])
        | (part1by2(q[:, 1]) << 1)
        | (part1by2(q[:, 2]) << 2)
    )


def _group_bounds(pos, rad, group, margin):
    """Per-group bounds over consecutive `group`-sphere runs of a padded,
    Morton-sorted SoA, as a (ngroups_pad8, 8) row table:

      columns: cx cy cz R S |ctr|^2 0 0

    R = max(|c - ctr| + r) + margin: dist-to-center - R lower-bounds every
    member distance. S = min(|c - ctr| - r) + margin: dist-to-center + S
    upper-bounds the group's best distance. Padded groups get R = -1e30 /
    S = +1e30 so they never become eligible and never tighten the upper
    bound."""
    n = pos.shape[0] // group
    posg = pos.reshape(n, group, 3)
    radg = rad.reshape(n, group)
    real = radg > -1e29
    cnt = jnp.maximum(jnp.sum(real, axis=1, keepdims=True), 1)
    ctr = jnp.sum(jnp.where(real[..., None], posg, 0.0), axis=1) / cnt
    off = jnp.sqrt(jnp.sum((posg - ctr[:, None, :]) ** 2, axis=-1))
    any_real = jnp.any(real, axis=1)
    bound_r = jnp.where(
        any_real,
        jnp.max(jnp.where(real, off + radg, -jnp.inf), axis=1) + margin,
        -1e30,
    )
    bound_s = jnp.where(
        any_real,
        jnp.min(jnp.where(real, off - radg, jnp.inf), axis=1) + margin,
        1e30,
    )
    n_pad = cdiv(n, 8) * 8
    table = jnp.zeros((n_pad, 8), jnp.float32)
    table = table.at[:, 3].set(-1e30)
    table = table.at[:, 4].set(1e30)
    table = table.at[:n, 0].set(ctr[:, 0])
    table = table.at[:n, 1].set(ctr[:, 1])
    table = table.at[:n, 2].set(ctr[:, 2])
    table = table.at[:n, 3].set(bound_r)
    table = table.at[:n, 4].set(bound_s)
    table = table.at[:n, 5].set(jnp.sum(ctr * ctr, axis=-1))
    return table


def pack_gather_bounds(spheres_t):
    """Finer gather-granularity bounds from the packed sphere table:
    one ball per GATHER_GROUP consecutive (Morton-sorted) spheres, same
    column layout as the traversal's micro-block bounds. Built once per
    render by the gather-capable kernel wrappers (pallas_train,
    pallas_regroup); the traversal itself keeps INSTANCED_GROUP."""
    return _group_bounds(
        spheres_t[:, 0:3], spheres_t[:, 3], GATHER_GROUP, BOUND_MARGIN
    )


def pack_instanced_spheres(params, material_ids=None):
    """Pack the instanced sphere SoA into the traversal kernel layouts
    (all sublane-major row tables, so any 8-aligned window slices out as a
    (rows, 1) sublane vector with no in-kernel transpose):

      spheres_t  [ns_pad, 8]   columns x y z r |c|^2 mat 0 0, Morton-sorted
                               so consecutive runs are spatially compact;
                               padded rows have r = -1e30 (never win);
                               column 5 is the sphere's material id as f32
                               (from `material_ids`, a 1-based-object-id
                               table per scene.SceneStructure; 0 when not
                               provided — the march kernels don't need it)
      mu_bounds  [nmu_pad, 8]  bounds per INSTANCED_GROUP-sphere micro
                               block (_group_bounds): the CULL granularity
      blk_bounds [nbk_pad, 8]  bounds per INSTANCED_LANES-sphere block:
                               the cheap upper-bound (u) pass granularity

    The tables drive the bound-guided traversal in
    InstancedScene.dist_only: micro blocks are culled against the
    block-level upper bound, and each visited micro block is evaluated via
    a 128-sphere Morton WINDOW around it (one (128, COL) broadcast), which
    also retires every micro block the window covers — fine-grained
    culling at coarse, VPU-friendly evaluation granularity. ns_pad is a
    multiple of INSTANCED_LANES (hence of INSTANCED_GROUP) so both group
    tables tile evenly and every window is in range and 8-aligned."""
    ns = params.sphere_radius.shape[0]
    ns_pad = max(INSTANCED_LANES, cdiv(ns, INSTANCED_LANES) * INSTANCED_LANES)
    pad = ns_pad - ns
    pos = jnp.asarray(params.sphere_point, jnp.float32)
    rad = jnp.asarray(params.sphere_radius, jnp.float32)
    order = None
    if ns:
        order = jnp.argsort(_morton_codes(pos))
        pos = pos[order]
        rad = rad[order]
    pos = jnp.concatenate([pos, jnp.zeros((pad, 3), jnp.float32)])
    rad = jnp.concatenate([rad, jnp.full((pad,), -1e30, jnp.float32)])
    spheres_t = jnp.zeros((ns_pad, 8), jnp.float32)
    spheres_t = spheres_t.at[:, 0].set(pos[:, 0])
    spheres_t = spheres_t.at[:, 1].set(pos[:, 1])
    spheres_t = spheres_t.at[:, 2].set(pos[:, 2])
    spheres_t = spheres_t.at[:, 3].set(rad)
    spheres_t = spheres_t.at[:, 4].set(jnp.sum(pos * pos, axis=-1))
    if material_ids is not None and ns:
        # material of sphere object i (objects are 1-based; sphere i is
        # object i+1), reordered with the Morton sort
        mats = jnp.asarray(material_ids[1:1 + ns], jnp.float32)[order]
        spheres_t = spheres_t.at[:ns, 5].set(mats)
    mu_bounds = _group_bounds(pos, rad, INSTANCED_GROUP, BOUND_MARGIN)
    blk_bounds = _group_bounds(pos, rad, INSTANCED_LANES, BOUND_MARGIN)
    # sphere-set AABB (surface-inclusive) for the step-clamp's bbox escape
    # (sdf.py: cut = max(clamp, dist-to-bbox)); sentinel pads excluded
    real = rad > -1e29
    lo = jnp.min(
        jnp.where(real[:, None], pos - rad[:, None], jnp.inf), axis=0
    )
    hi = jnp.max(
        jnp.where(real[:, None], pos + rad[:, None], -jnp.inf), axis=0
    )
    bbox = jnp.concatenate([lo, hi])
    return spheres_t, mu_bounds, blk_bounds, bbox


def pack_order(params):
    """The Morton permutation pack_instanced_spheres applies (sorted row i
    holds original sphere order[i]) — the training wrapper uses it to
    un-sort the sphere-table gradient back to the SoA order."""
    pos = jnp.asarray(params.sphere_point, jnp.float32)
    return jnp.argsort(_morton_codes(pos))


class InstancedScene:
    """Tile-level scene evaluation for instanced (10k+ sphere) structures:
    a bound-guided windowed traversal over the Morton-sorted sphere table.

    LAYOUT (round 3, measured on v5e): rays live on LANES as (1, COL) rows
    — fully packed vector registers, so the march state ops are ~4 cycles
    each — and sphere/bound data lives in sublane-major row tables
    (pack_instanced_spheres), so any 8-aligned window slices out as a
    (rows, 1) sublane vector making the pairwise interaction a natural
    (rows, COL) broadcast with the min as a sublane reduction. The two
    layouts this replaces both measured ~100x slower end-to-end:
    pixels-on-sublanes (COL, 1) columns made every state op a 64-tile
    strided crawl (~30 us per tile-step with NO scene work), and
    pixels-on-lanes (8, 128) tiles forced a pixel relayout per pairwise
    op. Value-only (the differentiable re-attachment runs in banded jnp).
    """

    def __init__(self, structure: SceneStructure, sphere_ref, mu_ref,
                 blk_ref, plane_vals, bbox_ref=None, mu_gather_ref=None):
        self.structure = structure
        self.sphere_ref = sphere_ref  # [ns_pad, 8] VMEM (pack_…_spheres)
        self.mu_ref = mu_ref          # [nmu_pad, 8] micro-block bounds
        self.blk_ref = blk_ref        # [nbk_pad, 8] 128-sphere block bounds
        self.plane_vals = list(plane_vals)
        self.bbox_ref = bbox_ref      # [6] SMEM sphere-set AABB (lo, hi)
        # optional FINER bounds ([ns_pad / GATHER_GROUP, 8]) for the
        # scratch gather only: the 64-sphere micro-block ball inflates
        # the gather capsule by its ~3-4 unit radius, over-gathering
        # ~3-5x in dense fields; GATHER_GROUP-sphere balls tighten it
        self.mu_gather_ref = mu_gather_ref
        self.ns_pad = sphere_ref.shape[0]
        self.nmu_pad = mu_ref.shape[0]

    def _cut(self, px, py, pz, step_clamp):
        """The per-ray step cut max(clamp, dist-to-bbox) — a true lower
        bound of every sphere distance outside the AABB, so clamped free-
        space marching escapes at full stride (sdf.py twin formula); None
        when running exact."""
        if step_clamp is None:
            return None
        qx = jnp.maximum(
            jnp.maximum(self.bbox_ref[0] - px, px - self.bbox_ref[3]), 0.0
        )
        qy = jnp.maximum(
            jnp.maximum(self.bbox_ref[1] - py, py - self.bbox_ref[4]), 0.0
        )
        qz = jnp.maximum(
            jnp.maximum(self.bbox_ref[2] - pz, pz - self.bbox_ref[5]), 0.0
        )
        s = qx * qx + qy * qy + qz * qz
        # NaN-safe sqrt, bitwise-identical to the sdf.py oracle formula
        d_bbox = jnp.where(s > 0, jnp.sqrt(jnp.where(s > 0, s, 1.0)), 0.0)
        return jnp.maximum(jnp.float32(step_clamp), d_bbox)

    def _pm(self, px, py, pz):
        """((8, COL) MXU RHS, (1, COL) |p|^2): rows -2px -2py -2pz 0...,
        so dot(table, pm) + |c|^2_col + |p|^2 = |p - c|^2 for any row
        table with columns x y z * * (|c|^2 in column 5 for bounds,
        column 4 for spheres)."""
        z = czero(px)
        pm = jnp.concatenate(
            [-2.0 * px, -2.0 * py, -2.0 * pz, z, z, z, z, z], axis=0
        )
        p2 = px * px + py * py + pz * pz
        return pm, p2

    def dist_only(self, px, py, pz, active=None, step_clamp=None):
        """Scene min over spheres+planes for every ACTIVE (1, COL) ray —
        exact, or step-clamped to min(d, step_clamp) (bitwise equal to the
        jnp oracle's clamp, config.py RenderConfig.step_clamp).

        Traversal (the TPU-native replacement for a BVH descent), all
        bounds from pack_instanced_spheres' group tables:

        1. Upper-bound pass at 128-sphere-block granularity:
           u_r = min_b (|p_r - ctr_b| + S_b) >= ray r's final sphere min.
           Runs once over all blocks; |p - ctr| via the MXU expansion
           (margins keep it conservative, see BOUND_MARGIN). Under
           step_clamp the gate tightens to min(u, clamp) — the decisive
           effect: the candidate ball radius becomes clamp + R instead of
           the scene's nearest-neighbor spacing + R.
        2. Micro-block eligibility at INSTANCED_GROUP granularity, in
           SQUARED space (no sqrt over the (nmu, COL) plane):
           eligible[m, r] = active_r and |p_r - mctr_m|^2 <= (gate_r + R_m)^2
           — only groups whose lower bound beats some active ray's gate
           can contain a winner below the gate.
        3. Best-first pick loop: visit the micro block with the smallest
           (squared) center distance over active rays, evaluate the
           128-sphere Morton WINDOW centered on it with exact componentwise
           VPU math (one (128, COL) broadcast; bitwise-identical distances
           to the jnp path), and retire every micro block the window fully
           covers. Morton compactness + patch coherence end the loop after
           a few windows per step instead of evaluating all spheres.

        Exactness: every sphere with distance <= gate is inside some
        eligible micro block (its lower bound is <= its distance), so the
        evaluated min equals the true min whenever the true min <= gate;
        u >= true min always, hence the unclamped result is exact, and the
        clamped result is exactly min(true, clamp) — independent of u.

        `active` ((1, COL) bool) excludes finished rays: a done ray parked
        on a surface would otherwise keep its neighborhood eligible for
        every remaining iteration of the enclosing march loop. Results for
        inactive rays are garbage (the march/shadow bodies discard them).

        Eligibility uses NON-STRICT <= (via squared compare): a group
        holding exactly one real sphere has R == -S up to margins, so its
        lower bound can equal the upper bound exactly; a strict '<' would
        cull it against its own bound and silently delete the sphere from
        the SDF (ADVICE r2 high finding; regression:
        tests/test_pallas_march.py single-sphere-block cases). The pack
        margins make the test strictly conservative anyway.
        """
        from jax import lax

        g = INSTANCED_GROUP
        win = INSTANCED_LANES
        pm, p2 = self._pm(px, py, pz)

        if active is None:
            act = jnp.ones_like(px) > 0.0
        else:
            act = active

        # 1. block-level upper bound u (sqrt on the small (nbk, COL) plane)
        qb = jax.lax.dot_general(
            self.blk_ref[...], pm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_BOUND_PRECISION,
        ) + self.blk_ref[:, 5:6] + p2
        dcb = jnp.sqrt(jnp.maximum(qb, 0.0))
        u = jnp.min(dcb + self.blk_ref[:, 4:5], axis=0, keepdims=True)
        cut = self._cut(px, py, pz, step_clamp)
        gate = u if cut is None else jnp.minimum(u, cut)

        # 2. micro-block eligibility in squared space
        qm = jax.lax.dot_general(
            self.mu_ref[...], pm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_BOUND_PRECISION,
        ) + self.mu_ref[:, 5:6] + p2  # (nmu_pad, COL)
        mR = self.mu_ref[:, 3:4]
        thr = gate + mR  # (nmu_pad, COL)
        eligible = act & (thr > 0.0) & (qm <= thr * thr)
        mask0 = jnp.max(jnp.where(eligible, 1.0, 0.0), axis=1, keepdims=True)
        # best-first order: smallest squared center distance (a proxy for
        # the lower bound; ordering affects only speed, not the result)
        score = jnp.min(
            jnp.where(eligible, qm, jnp.inf), axis=1, keepdims=True
        )  # (nmu_pad, 1)
        sub = lax.broadcasted_iota(jnp.int32, mask0.shape, 0)

        def cond(c):
            mask, _ = c
            return jnp.max(mask) > 0.5

        def body(c):
            mask, dmin = c
            sc = jnp.where(mask > 0.5, score, jnp.inf)
            smin = jnp.min(sc)
            m = jnp.min(jnp.where(sc <= smin, sub, self.nmu_pad))
            # 128-sphere window centered on micro block m, clamped in
            # range; always 8-aligned, always fully covers block m
            w = jnp.clip(m * g + g // 2 - win // 2, 0, self.ns_pad - win)
            tw = self.sphere_ref[pl.ds(w, win), :]  # (win, 8)
            dx = px - tw[:, 0:1]
            dy = py - tw[:, 1:2]
            dz = pz - tw[:, 2:3]
            d = jnp.sqrt(dx * dx + dy * dy + dz * dz) - tw[:, 3:4]
            dmin = jnp.minimum(dmin, jnp.min(d, axis=0, keepdims=True))
            # retire every micro block fully inside the window
            lo = (w + g - 1) // g
            hi = (w + win) // g
            mask = jnp.where((sub >= lo) & (sub < hi), 0.0, mask)
            if step_clamp is None:
                # exact mode only: re-prune against the shrunken running
                # min (cuts picks ~40%, measured; under a clamp the gate
                # is already ~as tight as dmin ever gets, so the extra
                # (nmu, COL) pass per pick costs more than it saves)
                thr2 = dmin + mR
                still = jnp.max(
                    jnp.where(
                        act & (thr2 > 0.0) & (qm < thr2 * thr2), 1.0, 0.0
                    ),
                    axis=1, keepdims=True,
                )
                mask = mask * still
            return mask, dmin

        _, dmin = lax.while_loop(cond, body, (mask0, czero(px) + jnp.inf))
        # the cut applies to the SPHERE set only (jnp oracle order,
        # sdf.py): plane distances stay exact, so sky/floor rays keep
        # full-size steps and escape in a handful of iterations
        if cut is not None:
            dmin = jnp.minimum(dmin, cut)
        for y in self.plane_vals:
            dmin = jnp.minimum(dmin, py - y)
        return dmin

    def segment_lit(self, so, ld, seg_len, step_clamp, shadow_w):
        """(1, COL) f32 flags: 1.0 where the shadow ray from `so` toward
        unit `ld` is PROVABLY fully lit — every sampled penumbra value
        val(t) = w * d_eff(t) / t stays > 1 for all t in (0, seg_len] — so
        the whole shadow march can be skipped with bitwise-identical
        results (res stays exactly 1.0: res = min(1.0, vals) only moves
        when some val < 1, and t_star stays 0; shadow_loop init_done).

        The bound: the minimum distance from the segment [so, so+T*ld] to
        128-sphere block b is at least |seg - ctr_b| - R_b (R_b the pack's
        bound radius, already margin-inflated); the segment-to-center
        distance comes from two MXU passes (|c - so|^2 expansion + c.ld),
        with one extra BOUND_MARGIN subtracted for the expansion rounding.
        Then for t <= T:

          val(t) = w * min(d_sph(t), cut(t), planes(t)) / t
          min(d_sph, cut) >= min(d_min_sph, clamp)     (cut >= clamp)
          w * min(d_min_sph, clamp) / T > 1            => sphere part lit
          plane y: w * (a + b*T) / T > 1, a = so_y - y >= 0, b = ld_y
            ((a + b*t)/t is monotone decreasing for a >= 0: min at t = T)

        All comparisons are strict and one-sided, so a failed bound only
        costs the skipped optimization, never correctness. Cost: ~one
        window-evaluation equivalent per light per patch, against the
        10-50 patch-steps x O(10) window evals of a full shadow march."""
        from jax import lax

        sox, soy, soz = so
        ldx, ldy, ldz = ld
        T = seg_len
        pm, o2 = self._pm(sox, soy, soz)
        # |c - so|^2 per block, via the same expansion as the bound passes
        c2 = jax.lax.dot_general(
            self.blk_ref[...], pm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_BOUND_PRECISION,
        ) + self.blk_ref[:, 5:6] + o2  # (nbk, COL)
        # proj = (c - so) . ld  per block
        z = czero(ldx)
        rhs_l = jnp.concatenate([ldx, ldy, ldz, z, z, z, z, z], axis=0)
        cl = jax.lax.dot_general(
            self.blk_ref[...], rhs_l, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_BOUND_PRECISION,
        )  # (nbk, COL)
        ol = sox * ldx + soy * ldy + soz * ldz  # (1, COL)
        proj = cl - ol
        tcl = jnp.clip(proj, 0.0, T)
        dseg2 = jnp.maximum(c2 - tcl * (2.0 * proj - tcl), 0.0)
        dseg = jnp.sqrt(dseg2)
        d_lo = dseg - self.blk_ref[:, 3:4] - BOUND_MARGIN  # (nbk, COL)
        d_min = jnp.min(d_lo, axis=0, keepdims=True)  # (1, COL)
        if step_clamp is not None:
            # the clamp branch carries no margin of its own (d_lo is
            # margin-inflated, the raw clamp is not): subtract the same
            # slack so a march val within f32 rounding of 1 — the march's
            # w*d/t division and its differently-associated point updates
            # both round — is never falsely pre-marked lit (ADVICE r4)
            d_min = jnp.minimum(
                d_min, jnp.float32(step_clamp) - BOUND_MARGIN
            )
        lit = shadow_w * d_min > T
        for y in self.plane_vals:
            # same slack as ScalarScene.segment_lit: (soy - y) + ldy*T
            # associates differently from the march's (soy + t*ldy) - y
            a = soy - y
            lit = lit & (a >= BOUND_MARGIN) & (
                shadow_w * (a + ldy * T) > T + shadow_w * BOUND_MARGIN
            )
        return jnp.where(lit, 1.0, 0.0)

    def _segment_block_dist(self, so, ld, seg_len, ref):
        """(nrows, COL) lower-bound-ready segment-to-center distances for
        the row table `ref` (mu_ref or blk_ref layout): |seg(t) - ctr|
        minimized over t in [0, seg_len], via the two-MXU-pass expansion
        (see segment_lit)."""
        sox, soy, soz = so
        ldx, ldy, ldz = ld
        pm, o2 = self._pm(sox, soy, soz)
        c2 = jax.lax.dot_general(
            ref[...], pm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_BOUND_PRECISION,
        ) + ref[:, 5:6] + o2
        z = czero(ldx)
        rhs_l = jnp.concatenate([ldx, ldy, ldz, z, z, z, z, z], axis=0)
        cl = jax.lax.dot_general(
            ref[...], rhs_l, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_BOUND_PRECISION,
        )
        ol = sox * ldx + soy * ldy + soz * ldz
        proj = cl - ol
        tcl = jnp.clip(proj, 0.0, seg_len)
        return jnp.sqrt(jnp.maximum(c2 - tcl * (2.0 * proj - tcl), 0.0))

    def gather_segment_blocks(self, so, ld, seg_len, clamp, scratch_ref,
                              cap, bounds_ref=None):
        """Fill `scratch_ref` ([cap, 8] VMEM, spheres_t row layout) with
        every micro-block whose bound ball intersects the patch's swept
        shadow region within the step clamp: block m is gathered iff

            min_lane |seg_lane - mctr_m| <= clamp + R_m + BOUND_MARGIN

        — a superset of every sphere with d_sph(p) < clamp for any sampled
        p, which under the clamp is the complete set of spheres that can
        affect min(d_sph, cut) (config.py shadow_scratch). Returns
        (n_rows, overflow, ref): n_rows the filled row count; overflow >
        0.5 means the flagged blocks exceed `cap` and the caller must use
        the full traversal. Rows beyond n_rows are sentinel-filled (radius
        -1e30, |c|^2 0) so whole-chunk evaluation never picks them.

        With `bounds_ref` ((8, 128) f32 VMEM scratch), blocks are gathered
        in PROJECTION ORDER along the row's mean ray and per-chunk
        projection intervals are written to bounds_ref rows 0/1 — the
        moving-window index ScratchScene.dist_only uses to evaluate only
        the chunks overlapping the live lanes' current span (the r5
        windowed-scratch optimization; `ref` is the reference-ray scalars
        to construct the ScratchScene with)."""
        from jax import lax

        if self.mu_gather_ref is not None:
            g = GATHER_GROUP
            gtab = self.mu_gather_ref
            n_pad_blocks = gtab.shape[0]
        else:
            g = INSTANCED_GROUP
            gtab = self.mu_ref
            n_pad_blocks = self.nmu_pad
        dseg = self._segment_block_dist(so, ld, seg_len, gtab)
        mR = gtab[:, 3:4]
        flags = jnp.min(
            jnp.where(
                dseg <= jnp.float32(clamp) + mR + BOUND_MARGIN, 0.0, 1.0
            ),
            axis=1, keepdims=True,
        )  # (n_blocks, 1): 0.0 = gather this block
        flagged = jnp.where(flags < 0.5, 1.0, 0.0)
        n_blocks = jnp.sum(flagged).astype(jnp.int32)
        overflow = jnp.where(n_blocks * g > cap, 1.0, 0.0)

        sub = lax.broadcasted_iota(jnp.int32, flagged.shape, 0)
        # sentinel tile for the tail pad (iota select, not .at[].set —
        # scatter has no Mosaic lowering)
        cols = lax.broadcasted_iota(jnp.int32, (g, 8), 1)
        sent = jnp.where(cols == 3, jnp.float32(-1e30), jnp.float32(0.0))

        ref = None
        if bounds_ref is not None:
            # Reference ray for the chunk WINDOW (ScratchScene moving
            # window): any fixed ray works for correctness (projection is
            # 1-Lipschitz, so per-lane deviation never breaks the bound);
            # the row's mean direction and mid origin make it tight.
            inv = jnp.float32(1.0 / so[0].size)
            ox = (jnp.min(so[0]) + jnp.max(so[0])) * 0.5
            oy = (jnp.min(so[1]) + jnp.max(so[1])) * 0.5
            oz = (jnp.min(so[2]) + jnp.max(so[2])) * 0.5
            mx = jnp.sum(ld[0]) * inv
            my = jnp.sum(ld[1]) * inv
            mz = jnp.sum(ld[2]) * inv
            nrm = jnp.sqrt(jnp.maximum(mx * mx + my * my + mz * mz, 1e-12))
            dx, dy, dz = mx / nrm, my / nrm, mz / nrm
            ref = (ox, oy, oz, dx, dy, dz)
            # pick blocks in PROJECTION order so each chunk covers a
            # contiguous span along the ray and the per-step window
            # [first, last] eligible chunk stays tight; min() is exactly
            # associative, so table order never changes values
            key = (
                (gtab[:, 0:1] - ox) * dx
                + (gtab[:, 1:2] - oy) * dy
                + (gtab[:, 2:3] - oz) * dz
            )
            pick_key = jnp.where(flagged > 0.5, key, jnp.float32(jnp.inf))
        else:
            pick_key = None

        def cond(c):
            m_f, _ = c
            return jnp.max(m_f) > 0.5

        def body(c):
            m_f, off = c
            if pick_key is None:
                m = jnp.min(jnp.where(m_f > 0.5, sub, n_pad_blocks))
            else:
                live_key = jnp.where(m_f > 0.5, pick_key, jnp.inf)
                kmin = jnp.min(live_key)
                m = jnp.min(jnp.where(live_key <= kmin, sub, n_pad_blocks))
            scratch_ref[pl.ds(off, g), :] = self.sphere_ref[
                pl.ds(m * g, g), :
            ]
            m_f = jnp.where(sub == m, 0.0, m_f)
            return m_f, off + g

        def do_gather(_):
            _, off = lax.while_loop(cond, body, (flagged, jnp.int32(0)))
            # sentinel-pad only up to the next CHUNK boundary (the rows a
            # whole-chunk evaluation can see past n_rows) — a handful of
            # g-row stores instead of prefilling the whole scratch (the
            # full prefill was ~1k serial stores per gather, measured ~10%
            # of the instanced frame)
            chunk = ScratchScene.CHUNK
            end = ((off + chunk - 1) // chunk) * chunk

            def pad_cond(c):
                return c < end

            def pad_body(c):
                scratch_ref[pl.ds(c, g), :] = sent
                return c + g

            lax.while_loop(pad_cond, pad_body, off)
            return off

        n_rows = lax.cond(
            overflow > 0.5, lambda _: jnp.int32(0), do_gather, 0
        )

        if bounds_ref is not None:
            # per-chunk projection intervals [proj(c) - R, proj(c) + R]
            # over the gathered rows, laid out one chunk per lane of two
            # (1, 128) rows; empty/overflow chunks get an empty interval
            chunk = ScratchScene.CHUNK
            max_chunks = cap // chunk
            lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            pmin0 = jnp.zeros((1, 128), jnp.float32) + jnp.inf
            pmax0 = jnp.zeros((1, 128), jnp.float32) - jnp.inf
            nchunks = (n_rows + chunk - 1) // chunk

            def bounds_body(k, c):
                pmin_row, pmax_row = c
                tw = scratch_ref[pl.ds(k * chunk, chunk), :]
                valid = tw[:, 3:4] > jnp.float32(-1e29)
                proj = (
                    (tw[:, 0:1] - ox) * dx
                    + (tw[:, 1:2] - oy) * dy
                    + (tw[:, 2:3] - oz) * dz
                )
                pmin_k = jnp.min(
                    jnp.where(valid, proj - tw[:, 3:4], jnp.inf)
                )
                pmax_k = jnp.max(
                    jnp.where(valid, proj + tw[:, 3:4], -jnp.inf)
                )
                pmin_row = jnp.where(lane == k, pmin_k, pmin_row)
                pmax_row = jnp.where(lane == k, pmax_k, pmax_row)
                return pmin_row, pmax_row

            pmin_row, pmax_row = lax.fori_loop(
                0, jnp.minimum(nchunks, max_chunks), bounds_body,
                (pmin0, pmax0),
            )
            bounds_ref[0:1, :] = pmin_row
            bounds_ref[1:2, :] = pmax_row

        return n_rows, overflow, ref


    def sdf_track(self, px, py, pz, active=None, step_clamp=None):
        """Winner-tracking traversal: same eligibility/window structure as
        dist_only, additionally tracking per ray the winning SPHERE's
        material id, unit normal (p - c)/|p - c|, window start and
        row-in-window. Returns (raw, mat, nx, ny, nz, wstar, rowstar) with
        `raw` the UNCOMPOSED sphere-set min (no plane merge, no clamp —
        the caller composes; with a step_clamp gate, raw is only
        trustworthy where raw <= clamp, exactly the regime its consumers
        live in: material/normal/IFT-denominator lookups at hit points).
        Used by the fused instanced kernels (pallas_train) for the hit
        material, the analytic IFT denominator n.rd, and the backward
        record/scatter passes; ~2.5x a dist_only window per pick but only
        called O(1) times per pixel."""
        from jax import lax

        g = INSTANCED_GROUP
        win = INSTANCED_LANES
        pm, p2 = self._pm(px, py, pz)
        act = (jnp.ones_like(px) > 0.0) if active is None else active

        qb = jax.lax.dot_general(
            self.blk_ref[...], pm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_BOUND_PRECISION,
        ) + self.blk_ref[:, 5:6] + p2
        dcb = jnp.sqrt(jnp.maximum(qb, 0.0))
        u = jnp.min(dcb + self.blk_ref[:, 4:5], axis=0, keepdims=True)
        cut = self._cut(px, py, pz, step_clamp)
        gate = u if cut is None else jnp.minimum(u, cut)
        qm = jax.lax.dot_general(
            self.mu_ref[...], pm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_BOUND_PRECISION,
        ) + self.mu_ref[:, 5:6] + p2
        mR = self.mu_ref[:, 3:4]
        thr = gate + mR
        eligible = act & (thr > 0.0) & (qm <= thr * thr)
        mask0 = jnp.max(jnp.where(eligible, 1.0, 0.0), axis=1, keepdims=True)
        score = jnp.min(
            jnp.where(eligible, qm, jnp.inf), axis=1, keepdims=True
        )
        sub = lax.broadcasted_iota(jnp.int32, mask0.shape, 0)
        zc = czero(px)

        def cond(c):
            return jnp.max(c[0]) > 0.5

        def body(c):
            mask, dmin, mat, nx, ny, nz, wstar, rowstar = c
            sc = jnp.where(mask > 0.5, score, jnp.inf)
            smin = jnp.min(sc)
            m = jnp.min(jnp.where(sc <= smin, sub, self.nmu_pad))
            w = jnp.clip(m * g + g // 2 - win // 2, 0, self.ns_pad - win)
            tw = self.sphere_ref[pl.ds(w, win), :]
            dx = px - tw[:, 0:1]
            dy = py - tw[:, 1:2]
            dz = pz - tw[:, 2:3]
            dc = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            d = dc - tw[:, 3:4]
            wmin = jnp.min(d, axis=0, keepdims=True)  # (1, COL)
            rows = lax.broadcasted_iota(jnp.int32, d.shape, 0)
            winrow = jnp.min(
                jnp.where(d <= wmin, rows, win), axis=0, keepdims=True
            )
            sel = rows == winrow
            inv = 1.0 / jnp.maximum(dc, 1e-30)
            nwx = jnp.sum(jnp.where(sel, dx * inv, 0.0), axis=0, keepdims=True)
            nwy = jnp.sum(jnp.where(sel, dy * inv, 0.0), axis=0, keepdims=True)
            nwz = jnp.sum(jnp.where(sel, dz * inv, 0.0), axis=0, keepdims=True)
            wmat = jnp.sum(
                jnp.where(sel, tw[:, 5:6] + zc, 0.0), axis=0, keepdims=True
            )
            better = wmin < dmin
            dmin = jnp.where(better, wmin, dmin)
            mat = jnp.where(better, wmat, mat)
            nx = jnp.where(better, nwx, nx)
            ny = jnp.where(better, nwy, ny)
            nz = jnp.where(better, nwz, nz)
            wstar = jnp.where(better, zc + w.astype(jnp.float32), wstar)
            rowstar = jnp.where(
                better, winrow.astype(jnp.float32), rowstar
            )
            lo = (w + g - 1) // g
            hi = (w + win) // g
            mask = jnp.where((sub >= lo) & (sub < hi), 0.0, mask)
            return mask, dmin, mat, nx, ny, nz, wstar, rowstar

        _, raw, mat, nx, ny, nz, wstar, rowstar = lax.while_loop(
            cond, body,
            (mask0, zc + jnp.inf, zc, zc, zc, zc, zc - 1.0, zc - 1.0),
        )
        return raw, mat, nx, ny, nz, wstar, rowstar


class ScratchScene:
    """Scene evaluation against a gathered scratch sphere table
    (InstancedScene.gather_segment_blocks): min over the table's rows in
    256-row chunks — no eligibility pass, no pick loop — composed with
    the same per-ray step cut and plane merge as InstancedScene.dist_only
    so values are bitwise identical wherever the gather's coverage
    guarantee holds (everywhere, under the clamp)."""

    CHUNK = SCRATCH_CHUNK

    def __init__(self, inst: "InstancedScene", scratch_ref, n_rows,
                 bounds_ref=None, ref=None, window_clamp=None):
        self._inst = inst
        self._scratch = scratch_ref
        # chunk count rounded up; sentinel rows never win
        self._nchunks = (n_rows + self.CHUNK - 1) // self.CHUNK
        # moving chunk window (gather_segment_blocks bounds_ref/ref): only
        # chunks whose projection interval overlaps the live lanes' span
        # +/- the clamp can change min(d, cut) — the same completeness
        # argument as the gather itself (a windowed-out sphere has
        # d > clamp and d >= d_bbox, hence d >= cut = max(clamp, d_bbox))
        self._bounds = bounds_ref
        self._ref = ref
        self._wclamp = window_clamp

    def dist_only(self, px, py, pz, active=None, step_clamp=None):
        from jax import lax

        sref = self._scratch

        def chunk(i, dmin):
            tw = sref[pl.ds(i * self.CHUNK, self.CHUNK), :]
            dx = px - tw[:, 0:1]
            dy = py - tw[:, 1:2]
            dz = pz - tw[:, 2:3]
            d = jnp.sqrt(dx * dx + dy * dy + dz * dz) - tw[:, 3:4]
            return jnp.minimum(dmin, jnp.min(d, axis=0, keepdims=True))

        if self._bounds is not None and self._wclamp is not None:
            # project the ACTIVE lanes' points onto the reference ray
            # (1-Lipschitz: |proj(p) - proj(c)| <= |p - c|, so the
            # interval test is conservative for every lane no matter how
            # far it strays from the reference)
            ox, oy, oz, rdx, rdy, rdz = self._ref
            proj = (px - ox) * rdx + (py - oy) * rdy + (pz - oz) * rdz
            act = (jnp.ones_like(px) > 0.0) if active is None else active
            wmin = jnp.min(jnp.where(act, proj, jnp.inf))
            wmax = jnp.max(jnp.where(act, proj, -jnp.inf))
            m = jnp.float32(self._wclamp) + BOUND_MARGIN
            lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            pmin_row = self._bounds[0:1, :]
            pmax_row = self._bounds[1:2, :]
            elig = (
                (pmax_row >= wmin - m) & (pmin_row <= wmax + m)
                & (lane < self._nchunks)
            )
            # evaluate the [first, last] eligible span (chunks are
            # projection-ordered, so the span is tight; stragglers in
            # between are evaluated harmlessly)
            lo = jnp.min(jnp.where(elig, lane, self._nchunks))
            hi = jnp.max(jnp.where(elig, lane, -1)) + 1
            dmin = lax.fori_loop(lo, hi, chunk, czero(px) + jnp.inf)
        else:
            dmin = lax.fori_loop(
                0, self._nchunks, chunk, czero(px) + jnp.inf
            )
        cut = self._inst._cut(px, py, pz, step_clamp)
        if cut is not None:
            dmin = jnp.minimum(dmin, cut)
        for y in self._inst.plane_vals:
            dmin = jnp.minimum(dmin, py - y)
        return dmin


class ScalarScene:
    """Evaluates the unrolled scene SDF and shading tables from a pytree of
    plain scalars (`read_param_values` output — or any pytree with the same
    structure, e.g. vjp tangents). Material and light tables are populated
    only when their fields are present (the march/shadow kernels pass
    geometry only)."""

    def __init__(self, structure: SceneStructure, values: Dict):
        s = structure
        self.structure = s
        self.sphere = [
            (*values["sphere_point"][i], values["sphere_radius"][i])
            for i in range(s.num_spheres if "sphere_point" in values else 0)
        ]
        self.box = [
            (*values["box_point"][i], *values["box_half"][i],
             values["box_radius"][i])
            for i in range(s.num_boxes if "box_point" in values else 0)
        ]
        self.plane = list(values.get("plane_y", ()))
        self.smooth_k = list(values.get("smooth_k", ()))
        if "mat_shininess" in values:
            self.materials = [
                (
                    values["mat_shininess"][m],
                    values["mat_diffuse"][m],
                    values["mat_specular"][m],
                    values["mat_ambient"][m],
                )
                for m in range(s.num_materials)
            ]
        if "ambient_color" in values:
            self.ambient = values["ambient_color"]
        if "light_point" in values:
            self.lights = [
                (
                    values["light_point"][l],
                    values["light_diffuse"][l],
                    values["light_specular"][l],
                )
                for l in range(s.num_lights)
            ]
        else:
            self.lights = []

    def node_dist(self, node, px, py, pz):
        kind = node[0]
        if kind == "sphere":
            cx, cy, cz, r = self.sphere[node[1]]
            dx, dy, dz = px - cx, py - cy, pz - cz
            return jnp.sqrt(dx * dx + dy * dy + dz * dz) - r
        if kind == "box":
            cx, cy, cz, bx, by, bz, r = self.box[node[1]]
            qx = jnp.abs(px - cx) - bx
            qy = jnp.abs(py - cy) - by
            qz = jnp.abs(pz - cz) - bz
            ox = jnp.maximum(qx, 0.0)
            oy = jnp.maximum(qy, 0.0)
            oz = jnp.maximum(qz, 0.0)
            outside = jnp.sqrt(ox * ox + oy * oy + oz * oz)
            inside = jnp.minimum(jnp.maximum(qx, jnp.maximum(qy, qz)), 0.0)
            return outside + inside - r
        if kind == "plane":
            return py - self.plane[node[1]]
        if kind == "smin":
            _, k, a, b = node
            return smin_tile(
                self.node_dist(a, px, py, pz),
                self.node_dist(b, px, py, pz),
                self.smooth_k[k],
            )
        raise ValueError(node)

    def sdf(self, px, py, pz):
        """(dist, mat_id) per lane; first-wins strict < (naive tie rule).
        mat_id is resolved during the reduction (no gather); miss lanes
        keep material 0 via the INF initialization. Inits derive from px so
        Mosaic sees concrete (non-splat) vector layouts."""
        s = self.structure
        dist = czero(px) + jnp.inf
        mat = czero(px).astype(jnp.int32)
        for i, node in enumerate(s.objects):
            d = self.node_dist(node, px, py, pz)
            closer = d < dist
            dist = jnp.where(closer, d, dist)
            mat = jnp.where(closer, s.material_ids[i + 1], mat)
        return dist, mat

    def sdf_with_obj_id(self, px, py, pz):
        """(dist, obj_id) per lane; 1-based first-wins argmin over top-level
        objects (naive_renderer.c:30-44), id 0 reserved for miss."""
        s = self.structure
        dist = czero(px) + jnp.inf
        oid = czero(px).astype(jnp.int32)
        for i, node in enumerate(s.objects):
            d = self.node_dist(node, px, py, pz)
            closer = d < dist
            dist = jnp.where(closer, d, dist)
            oid = jnp.where(closer, i + 1, oid)
        return dist, oid

    def dist_only(self, px, py, pz, active=None, step_clamp=None):
        # `active`/`step_clamp` are accepted for signature parity with
        # InstancedScene (the march/shadow kernels pass their not-done mask
        # and cfg.step_clamp); the unrolled compiled scene has no per-ray
        # work to skip and ignores the clamp like the jnp path does.
        dist = czero(px) + jnp.inf
        for node in self.structure.objects:
            dist = jnp.minimum(dist, self.node_dist(node, px, py, pz))
        return dist

    def _node_seg_bound(self, node, so, ld, T):
        """Per-lane lower bound of min over t in [0, T] of d_node(so+t*ld).
        None for plane nodes (the caller applies the monotone plane rule).
        Spheres use the exact segment-to-point distance; boxes their
        circumscribed sphere; smooth-min dips at most k/4 below min."""
        sox, soy, soz = so
        ldx, ldy, ldz = ld
        kind = node[0]
        if kind == "plane":
            return None

        def segdist(cx, cy, cz):
            dx, dy, dz = cx - sox, cy - soy, cz - soz
            proj = dx * ldx + dy * ldy + dz * ldz
            tcl = jnp.clip(proj, 0.0, T)
            ex = dx - tcl * ldx
            ey = dy - tcl * ldy
            ez = dz - tcl * ldz
            return jnp.sqrt(ex * ex + ey * ey + ez * ez)

        if kind == "sphere":
            cx, cy, cz, r = self.sphere[node[1]]
            return segdist(cx, cy, cz) - r
        if kind == "box":
            cx, cy, cz, bx, by, bz, r = self.box[node[1]]
            hb = jnp.sqrt(bx * bx + by * by + bz * bz)
            return segdist(cx, cy, cz) - hb - r
        if kind == "smin":
            _, k, a, b = node
            ba = self._node_seg_bound(a, so, ld, T)
            bb = self._node_seg_bound(b, so, ld, T)
            if ba is None or bb is None:
                return None  # smin over a plane: give up, never cull
            return jnp.minimum(ba, bb) - self.smooth_k[k] / 4.0
        raise ValueError(node)

    def segment_lit(self, so, ld, seg_len, step_clamp, shadow_w):
        """Per-lane flags: 1.0 where the shadow ray is PROVABLY fully lit
        (every sampled val = w*d/t stays > 1 for t in (0, T]) — the
        compiled-scene analog of InstancedScene.segment_lit (same skip
        semantics via shadow_loop init_done; `step_clamp` ignored —
        compiled scenes never clamp). Per object: distance-like objects
        need w * (segment lower bound) > T; planes use the monotone rule
        min_t w*(a + b*t)/t = w*(a/T + b) with a >= 0. BOUND_MARGIN
        absorbs the f32 rounding of these short chains."""
        del step_clamp
        sox, soy, soz = so
        ldy = ld[1]
        T = seg_len
        lit = jnp.ones_like(sox) > 0.0
        for node in self.structure.objects:
            bound = self._node_seg_bound(node, so, ld, T)
            if bound is None:
                if node[0] != "plane":
                    return jnp.zeros_like(sox)  # smin-over-plane: no cull
                a = soy - self.plane[node[1]]
                lit = lit & (a >= BOUND_MARGIN) & (
                    shadow_w * (a + ldy * T) > T + shadow_w * BOUND_MARGIN
                )
            else:
                lit = lit & (shadow_w * (bound - BOUND_MARGIN) > T)
        return jnp.where(lit, 1.0, 0.0)


def march_loop(scn, cfg, ro, rd, track_aa=True, step_clamp=None,
               unroll=1):
    """THE sphere-trace march loop body (naive_renderer.c:46-69 semantics,
    per-tile early exit, done-lane freezing, optional closest-approach
    tracking for soft-coverage AA) — the single source shared by the value
    march kernel (pallas_march) and the fused forward kernels
    (pallas_train), so the loops cannot drift again (r2 verdict weak #3).

    ro/rd are component tuples in the kernel's tile layout; returns
    (t, t_query, s_min, t_close) with s_min/t_close meaningful only when
    track_aa. Done flags are f32 (Mosaic rejects loop-carried i1
    vectors).

    `unroll` = SDF sub-steps per while_loop iteration (resolve_unroll):
    the loop is bound by the serial `min(done)` reduce + branch per
    iteration (the r4 tile-sweep finding), so K sub-steps amortize it
    K-fold. Results are bitwise identical to K=1: done lanes freeze per
    lane, and a lane reaching the step cap mid-block is marked done by
    the explicit `step + j + 1 >= max_steps` term — exactly the state at
    which the K=1 loop's cond would have exited it."""
    ro_x, ro_y, ro_z = ro
    rdx, rdy, rdz = rd
    zeros = czero(rdx) + czero(rdy) + czero(rdz)
    inf = zeros + jnp.inf

    def cond(c):
        step = c[0]
        done_f = c[-1]
        return (step < cfg.max_steps) & (jnp.min(done_f) < 0.5)

    if track_aa:

        def body(c):
            step, t, t_query, s_min, t_close, done_f = c
            for j in range(unroll):
                done = done_f > 0.5
                d = scn.dist_only(
                    ro_x + t * rdx, ro_y + t * rdy, ro_z + t * rdz,
                    active=~done, step_clamp=step_clamp,
                )
                new_t = t + d
                # angular closest approach min_i d_i/t_i (march.py:83-92)
                track = (~done) & (t > 0.0)
                s = d / jnp.where(t > 0.0, t, 1.0)
                better = track & (s < s_min)
                s_min = jnp.where(better, s, s_min)
                t_close = jnp.where(better, t, t_close)
                t_query = jnp.where(done, t_query, t)
                t = jnp.where(done, t, new_t)
                now_done = (d < cfg.epsilon) | (new_t > cfg.max_dist) | (
                    step + j + 1 >= cfg.max_steps
                )
                done_f = jnp.maximum(done_f, jnp.where(now_done, 1.0, 0.0))
            return step + unroll, t, t_query, s_min, t_close, done_f

        from jax import lax

        _, t, t_query, s_min, t_close, _ = lax.while_loop(
            cond, body, (0, zeros, zeros, inf, zeros, zeros)
        )
        return t, t_query, s_min, t_close

    def body(c):
        step, t, t_query, done_f = c
        for j in range(unroll):
            done = done_f > 0.5
            d = scn.dist_only(
                ro_x + t * rdx, ro_y + t * rdy, ro_z + t * rdz,
                active=~done, step_clamp=step_clamp,
            )
            new_t = t + d
            t_query = jnp.where(done, t_query, t)
            t = jnp.where(done, t, new_t)
            now_done = (d < cfg.epsilon) | (new_t > cfg.max_dist) | (
                step + j + 1 >= cfg.max_steps
            )
            done_f = jnp.maximum(done_f, jnp.where(now_done, 1.0, 0.0))
        return step + unroll, t, t_query, done_f

    from jax import lax

    _, t, t_query, _ = lax.while_loop(cond, body, (0, zeros, zeros, zeros))
    return t, t_query, zeros, zeros


def shadow_loop(scn, cfg, so, ld, max_dist, step_clamp=None,
                init_done=None, unroll=1):
    """THE soft-shadow march loop body (naive_renderer.c:71-100 semantics
    incl. the first-iteration w*d/0 -> +/-inf quirk), shared by the value
    shadow kernel and the fused kernels; returns (res, t_star).

    `init_done` ((1, COL) f32, optional) marks lanes PROVEN fully lit by a
    conservative bound (InstancedScene.segment_lit): they start done with
    res = 1.0 / t_star = 0 — bitwise what the march would produce — and a
    fully pre-done tile skips the loop entirely (the cond sees
    min(done) >= 0.5 before the first iteration).

    `unroll` = sub-steps per while_loop iteration, same bitwise-exactness
    argument as march_loop (step-cap term in the done flag)."""
    from jax import lax

    sox, soy, soz = so
    ldx, ldy, ldz = ld
    zeros = czero(sox) + czero(soy) + czero(soz) + czero(ldx)
    inf = zeros + jnp.inf

    def cond(c):
        step = c[0]
        done_f = c[-1]
        return (step < cfg.shadow_steps) & (jnp.min(done_f) < 0.5)

    def body(c):
        step, res, t, t_star, done_f = c
        for j in range(unroll):
            done = done_f > 0.5
            d = scn.dist_only(
                sox + t * ldx, soy + t * ldy, soz + t * ldz,
                active=~done, step_clamp=step_clamp,
            )
            live = t > 0.0
            safe_t = jnp.where(live, t, 1.0)
            val = jnp.where(
                live, cfg.shadow_w * d / safe_t,
                jnp.where(d < 0.0, -inf, inf),
            )
            better = (~done) & (val < res)
            res = jnp.where(done, res, jnp.minimum(res, val))
            t_star = jnp.where(better, t, t_star)
            t = jnp.where(done, t, t + d)
            now_done = (res < -1.0) | (t > max_dist) | (
                step + j + 1 >= cfg.shadow_steps
            )
            done_f = jnp.maximum(done_f, jnp.where(now_done, 1.0, 0.0))
        return step + unroll, res, t, t_star, done_f

    done0 = zeros if init_done is None else zeros + init_done
    _, res, _, t_star, _ = lax.while_loop(
        cond, body, (0, zeros + 1.0, zeros, zeros, done0)
    )
    return res, t_star
