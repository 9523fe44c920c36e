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

import jax.numpy as jnp

from loltracer_tpu.scene import SceneStructure

TILE_H = 8
TILE_W = 128

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


INSTANCED_LANES = 128  # sphere block width = the VPU lane count


def _morton_codes(pos):
    """30-bit Morton (Z-order) codes for [N, 3] positions — the spatial sort
    that makes 128-sphere blocks compact so their bounding spheres cull
    (pure jnp: runs under jit on traced params; the ORDER is value-dependent
    but the min over spheres is exact regardless of order, so reordering
    never changes results)."""
    lo = jnp.min(pos, axis=0)
    hi = jnp.max(pos, axis=0)
    q = (pos - lo) / jnp.maximum(hi - lo, 1e-9) * 1023.0
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


def pack_instanced_spheres(params):
    """Pack the instanced sphere SoA into the kernel layouts:

      spheres [4, nblocks, 128]  (rows x, y, z, r), Morton-sorted so each
                                 128-sphere block is spatially compact;
                                 lane-padded with r = -1e30 so padded
                                 entries never win the min
      bounds  [5, 1, nb_pad]     per-block bounds as lane vectors: rows
                                 0-2 = bound center (cx, cy, cz), row 3 =
                                 lower-bound radius R (dist-to-center - R
                                 lower-bounds every member distance), row
                                 4 = upper-bound offset S (dist-to-center
                                 + S upper-bounds the block's best
                                 distance); padded with R = -1e30 /
                                 S = +1e30 so padded blocks always cull

    The bounds drive per-tile block culling in InstancedScene.dist_only:
    for every ray, dist-to-block-bound lower-bounds every sphere distance
    in the block, so a block whose bound beats no ray's running min is
    skipped outright — the BVH-free analog of a two-level hierarchy, with
    the hierarchy implicit in the Morton order."""
    ns = params.sphere_radius.shape[0]
    nb = max(1, cdiv(ns, INSTANCED_LANES))
    pad = nb * INSTANCED_LANES - ns
    pos = jnp.asarray(params.sphere_point, jnp.float32)
    rad = jnp.asarray(params.sphere_radius, jnp.float32)
    if ns:
        order = jnp.argsort(_morton_codes(pos))
        pos = pos[order]
        rad = rad[order]
    pos = jnp.concatenate([pos, jnp.zeros((pad, 3), jnp.float32)])
    rad = jnp.concatenate([rad, jnp.full((pad,), -1e30, jnp.float32)])
    packed = jnp.stack([pos[:, 0], pos[:, 1], pos[:, 2], rad])
    packed = packed.reshape(4, nb, INSTANCED_LANES)

    # per-block bounds: center = mean of real members,
    # R = max(|c - ctr| + r) (lower-bound radius: dist-to-center - R lower
    # bounds every member distance), S = min(|c - ctr| - r) (upper-bound
    # offset: dist-to-center + S upper bounds the block's best distance)
    posb = pos.reshape(nb, INSTANCED_LANES, 3)
    radb = rad.reshape(nb, INSTANCED_LANES)
    real = radb > -1e29
    cnt = jnp.maximum(jnp.sum(real, axis=1, keepdims=True), 1)
    ctr = jnp.sum(jnp.where(real[..., None], posb, 0.0), axis=1) / cnt
    off = jnp.sqrt(jnp.sum((posb - ctr[:, None, :]) ** 2, axis=-1))
    bound_r = jnp.max(jnp.where(real, off + radb, -1e30), axis=1)
    bound_s = jnp.min(jnp.where(real, off - radb, 1e30), axis=1)
    nb_pad = cdiv(nb, INSTANCED_LANES) * INSTANCED_LANES
    bounds = jnp.zeros((5, 1, nb_pad), jnp.float32)
    bounds = bounds.at[3].set(-1e30)  # padded blocks: never relevant
    bounds = bounds.at[4].set(1e30)  # padded blocks: never bound U
    bounds = bounds.at[0, 0, :nb].set(ctr[:, 0])
    bounds = bounds.at[1, 0, :nb].set(ctr[:, 1])
    bounds = bounds.at[2, 0, :nb].set(ctr[:, 2])
    bounds = bounds.at[3, 0, :nb].set(bound_r)
    bounds = bounds.at[4, 0, :nb].set(bound_s)
    return packed, bounds


class InstancedScene:
    """Tile-level scene evaluation for instanced (10k+ sphere) structures:
    a running min over 128-sphere blocks streamed from a VMEM ref.

    The instanced kernels run in COLUMN LAYOUT: a tile's 1024 rays are laid
    out as (1024, 1) columns (pixels on sublanes), so each sphere block is
    one natural (1024, 128) broadcast — pixels splat along lanes, the
    sphere-block lane vector splats along sublanes, and the block argmin is
    a lane reduction, with no relayout of ray data anywhere. (The
    pixels-on-lanes (8,128,128) formulation forced a pixel-tile relayout
    per op and measured 2x SLOWER than whole-image jnp; this one keeps
    XLA's natural instanced layout while adding per-tile early exit.)
    Value-only (the differentiable re-attachment runs in banded jnp)."""

    def __init__(self, structure: SceneStructure, sphere_ref, bounds_ref,
                 plane_vals):
        self.structure = structure
        self.sphere_ref = sphere_ref  # [4, nblocks, 128] VMEM
        self.bounds_ref = bounds_ref  # [5, 1, nb_pad] VMEM block bounds
        self.plane_vals = list(plane_vals)
        self.nblocks = cdiv(structure.num_spheres, INSTANCED_LANES)

    def dist_only(self, px, py, pz):
        import jax
        from jax import lax

        # EXACT block culling in one (COL, nb_pad) bound pass per call
        # (triangle inequality, bounds from pack_instanced_spheres):
        #   d_lo[r, b] = |p_r - ctr_b| - R_b  <=  every sphere dist in b
        #   d_hi[r, b] = |p_r - ctr_b| + S_b  >=  block b's best dist
        # so U_r = min_b d_hi[r, b] upper-bounds ray r's final sphere min,
        # and a block with d_lo[r, b] >= U_r for EVERY ray in the tile
        # cannot win any lane — skipping it changes nothing. Morton
        # ordering (pack time) makes blocks compact enough to cull.
        bx = self.bounds_ref[0, :, :]  # (1, nb_pad)
        by = self.bounds_ref[1, :, :]
        bz = self.bounds_ref[2, :, :]
        bR = self.bounds_ref[3, :, :]
        bS = self.bounds_ref[4, :, :]
        dbx = px - bx
        dby = py - by
        dbz = pz - bz
        dc = jnp.sqrt(dbx * dbx + dby * dby + dbz * dbz)  # (COL, nb_pad)
        u = jnp.min(dc + bS, axis=-1, keepdims=True)  # (COL, 1)
        # NON-STRICT <=: for a block holding exactly one real sphere,
        # bR == -bS (== off + r == r - off == r), so dc - bR == dc + bS == u
        # exactly and a strict '<' would cull the block against its own
        # upper bound — silently deleting the sphere from the SDF
        # (ADVICE r2 high finding; regression: tests/test_instanced.py
        # single-sphere-block cases).
        relevant = jnp.any(dc - bR <= u, axis=0, keepdims=True)  # (1, nb_pad)
        relevant_f = jnp.where(relevant, 1.0, 0.0)
        lane = lax.broadcasted_iota(
            jnp.int32, relevant_f.shape, 1
        )

        def eval_block(b, dmin):
            cx = self.sphere_ref[0, b, :][None, :]  # (1, 128)
            cy = self.sphere_ref[1, b, :][None, :]
            cz = self.sphere_ref[2, b, :][None, :]
            rr = self.sphere_ref[3, b, :][None, :]
            dx = px - cx  # (COL, 128)
            dy = py - cy
            dz = pz - cz
            d = jnp.sqrt(dx * dx + dy * dy + dz * dz) - rr
            return jnp.minimum(dmin, jnp.min(d, axis=-1, keepdims=True))

        def body(b, dmin):
            sel = jnp.sum(jnp.where(lane == b, relevant_f, 0.0))
            return lax.cond(
                sel > 0.5, lambda d: eval_block(b, d), lambda d: d, dmin
            )

        dmin = jax.lax.fori_loop(
            0, self.nblocks, body, czero(px) + jnp.inf
        )
        for y in self.plane_vals:
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

    def dist_only(self, px, py, pz):
        dist = czero(px) + jnp.inf
        for node in self.structure.objects:
            dist = jnp.minimum(dist, self.node_dist(node, px, py, pz))
        return dist
