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
