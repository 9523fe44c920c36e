"""Shared tile-level scene machinery for the Pallas kernels.

The Pallas renderer, march and shadow kernels all evaluate the same
scene SDF over (8, 128) pixel tiles with the scene *structure* unrolled at
trace time and every scene *number* read from SMEM refs (the Pallas analog
of the reference's DynASM scene specialization,
tracing_jit_renderer.dasc:76-143). This module holds the pieces they share:
the ScalarScene SMEM reader, the tile smooth-min, the concrete-layout zero
helper, and the SMEM field plumbing.
"""

from __future__ import annotations

from typing import List

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


class ScalarScene:
    """Reads every scene number out of the kernel's SMEM refs once, exposing
    them as plain traced scalars for the unrolled SDF/shading code. Material
    and light tables are populated only when their refs are provided (the
    march/shadow kernels pass geometry refs only)."""

    def __init__(self, structure: SceneStructure, refs: dict):
        s = structure
        self.structure = s
        self.sphere = [
            (
                refs["sphere_point"][i, 0],
                refs["sphere_point"][i, 1],
                refs["sphere_point"][i, 2],
                refs["sphere_radius"][i],
            )
            for i in range(s.num_spheres if "sphere_point" in refs else 0)
        ]
        self.box = [
            (
                refs["box_point"][i, 0],
                refs["box_point"][i, 1],
                refs["box_point"][i, 2],
                refs["box_half"][i, 0],
                refs["box_half"][i, 1],
                refs["box_half"][i, 2],
                refs["box_radius"][i],
            )
            for i in range(s.num_boxes if "box_point" in refs else 0)
        ]
        self.plane = [
            refs["plane_y"][i]
            for i in range(s.num_planes if "plane_y" in refs else 0)
        ]
        self.smooth_k = [
            refs["smooth_k"][i]
            for i in range(s.num_unions if "smooth_k" in refs else 0)
        ]
        if "mat_shininess" in refs:
            self.materials = [
                (
                    refs["mat_shininess"][m],
                    tuple(refs["mat_diffuse"][m, c] for c in range(3)),
                    tuple(refs["mat_specular"][m, c] for c in range(3)),
                    tuple(refs["mat_ambient"][m, c] for c in range(3)),
                )
                for m in range(s.num_materials)
            ]
        if "ambient_color" in refs:
            self.ambient = tuple(refs["ambient_color"][c] for c in range(3))
        if "light_point" in refs:
            self.lights = [
                (
                    tuple(refs["light_point"][l, c] for c in range(3)),
                    tuple(refs["light_diffuse"][l, c] for c in range(3)),
                    tuple(refs["light_specular"][l, c] for c in range(3)),
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
