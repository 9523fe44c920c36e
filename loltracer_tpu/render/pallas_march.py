"""Pallas sphere-trace march kernel: the non-differentiable hot loop.

The differentiable render path (render/march.py intersect_aa) stop-gradients
the ENTIRE march result and re-attaches gradients via the implicit-function
theorem at the frozen hit distance. That makes the march — up to 256 full
scene-SDF evaluations per ray (naive_renderer.c:46-69) — a pure value
computation, so it can run as a fused Pallas kernel with per-tile early exit
without changing gradient semantics at all: sky/converged tiles stop after a
few steps, whereas the whole-image `lax.while_loop` formulation runs every
pixel until the globally worst ray finishes.

Semantics match render/march.py `march` exactly per pixel (same update
order, same done-freezing, same closest-approach tracking for the soft
coverage AA), differing only in op scheduling (rsqrt-free; identical math).

Two layouts:

- compiled structures: (8, 128) pixel tiles, scene scalars from SMEM
  (pallas_scene.ScalarScene) — the lane axis is the new SSE;
- instanced structures: each 32x16 pixel patch is one (1, COL) lane-packed
  ray row, marched against VMEM sphere blocks through the bound-guided
  traversal (pallas_scene.InstancedScene), with the not-done mask passed as
  `active` so finished rays stop pinning their blocks.

Lowering/config quirks shared with pallas_renderer.py: f32 done flags
instead of i1 loop-carried vectors, concrete-layout zero inits (see
pallas_scene.czero).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from loltracer_tpu.config import DEFAULT_CONFIG, RenderConfig
from loltracer_tpu.render.march import MarchResult
from loltracer_tpu.render.pallas_scene import (
    GEOM_FIELDS,
    TILE_H,
    TILE_W,
    InstancedScene,
    ScalarScene,
    active_fields,
    cdiv,
    czero,
    march_loop,
    pack_instanced_spheres,
    read_param_values,
    resolve_unroll,
    shadow_loop,
)
from loltracer_tpu.scene import SceneParams, SceneStructure


def _build_geom_scene(structure, fields, refs):
    """Scene evaluator + count of geometry refs consumed from `refs`.

    Compiled structures read per-primitive scalars from SMEM; instanced
    structures stream 128-sphere blocks from one VMEM ref (+ optional SMEM
    plane_y)."""
    if structure.instanced:
        sphere_ref, mu_ref, blk_ref, bbox_ref = refs[:4]
        n = 4
        plane_vals = []
        if structure.num_planes:
            plane_vals = [refs[4][i] for i in range(structure.num_planes)]
            n = 5
        return (
            InstancedScene(
                structure, sphere_ref, mu_ref, blk_ref, plane_vals,
                bbox_ref=bbox_ref,
            ),
            n,
        )
    geom_refs = dict(zip(fields, refs[: len(fields)]))
    scn = ScalarScene(structure, read_param_values(structure, geom_refs))
    return scn, len(fields)


def _planes(structure, ref, n):
    """The n leading channel planes of a ray ref in the structure's layout:
    (1, COL) lane rows for instanced, (8, 128) tiles for compiled."""
    if structure.instanced:
        return tuple(ref[i:i + 1, :] for i in range(n))
    return tuple(ref[i, :, :] for i in range(n))


def _march_kernel(structure, cfg, fields, unroll, ro_ref, *rest):
    scn, n = _build_geom_scene(structure, fields, rest)
    rd_ref, out_ref = rest[n], rest[n + 1]
    clamp = cfg.step_clamp if structure.instanced else None

    ro = (ro_ref[0], ro_ref[1], ro_ref[2])
    rd = _planes(structure, rd_ref, 3)
    t, t_query, s_min, t_close = march_loop(
        scn, cfg, ro, rd, track_aa=True, step_clamp=clamp, unroll=unroll
    )
    for i, v in enumerate((t, t_query, s_min, t_close)):
        if structure.instanced:
            out_ref[i:i + 1, :] = v
        else:
            out_ref[i, :, :] = v


def _shadow_kernel(structure, cfg, fields, unroll, *refs):
    scn, n = _build_geom_scene(structure, fields, refs)
    ro_ref, rd_ref, maxd_ref, out_ref = refs[n: n + 4]

    clamp = cfg.effective_shadow_clamp() if structure.instanced else None
    so = _planes(structure, ro_ref, 3)
    ld = _planes(structure, rd_ref, 3)
    (max_dist,) = _planes(structure, maxd_ref, 1)
    # segment cull (value-exact; ScalarScene/InstancedScene.segment_lit):
    # provably-lit lanes start pre-done, shortening the tile's worst lane
    lit = None
    if cfg.shadow_cull:
        lit = scn.segment_lit(so, ld, max_dist, clamp, cfg.shadow_w)
    res, t_star = shadow_loop(
        scn, cfg, so, ld, max_dist, step_clamp=clamp, init_done=lit,
        unroll=unroll,
    )
    for i, v in enumerate((res, t_star)):
        if structure.instanced:
            out_ref[i:i + 1, :] = v
        else:
            out_ref[i, :, :] = v


# Rays per lane-packed row tile (instanced kernels) and its spatial
# footprint: one 32x16 pixel patch per tile (P_H * P_W == COL). Square-ish
# patches keep a tile's rays angularly coherent, so the block-relevance
# union in InstancedScene.dist_only stays small — 4-row x 128-column strips
# spanned so much of the image width that most sphere blocks stayed
# relevant to SOME ray and the per-tile culling bought almost nothing
# (52.9 krays/s, round-2 verdict). 16x32 patches measured best in the r4
# sweep (32x16: -6% — shadow rays leave a squatter patch footprint more
# coherently toward elevated lights; 8x64: -7%; see PERF.md). Env
# overrides are an experiment hook for perf sweeps (COL must stay a
# multiple of 128 and equal P_H * P_W).
import os as _os

COL = int(_os.environ.get("LOL_COL", "512"))
P_H = int(_os.environ.get("LOL_P_H", "16"))
P_W = int(_os.environ.get("LOL_P_W", "32"))
# explicit raises, not asserts (stripped under python -O; ADVICE r4):
# every instanced kernel reshapes patches through these constants
if COL != P_H * P_W:
    raise ValueError(
        f"LOL_COL ({COL}) must equal LOL_P_H * LOL_P_W ({P_H}*{P_W})"
    )
if COL % 128:
    raise ValueError(f"LOL_COL ({COL}) must be a multiple of 128 lanes")


def _to_columns(arr, gph, gpw):
    """(C, ph, pw) -> (C, gph*gpw*COL): patch-major lane-packed rays for the
    instanced kernels (see pallas_scene.InstancedScene); each spatial
    (P_H, P_W) patch contributes one COL-ray row tile."""
    C = arr.shape[0]
    a = arr.reshape(C, gph, P_H, gpw, P_W).transpose(0, 1, 3, 2, 4)
    return a.reshape(C, gph * gpw * COL)


def _from_columns(a, gph, gpw):
    """Inverse of _to_columns."""
    C = a.shape[0]
    a = a.reshape(C, gph, gpw, P_H, P_W).transpose(0, 1, 3, 2, 4)
    return a.reshape(C, gph * P_H, gpw * P_W)


def _row_spec(ch):
    """BlockSpec for one (ch, COL) lane-row tile of a (ch, NP*COL) array.
    ch equals the array's first dim, so the (ch, COL) block satisfies the
    Mosaic last-two-dims rule (ch == full dim, COL % 128 == 0)."""
    return pl.BlockSpec((ch, COL), lambda i: (0, i), memory_space=pltpu.VMEM)


def _geom_specs_and_args(structure, fields, params):
    """(in_specs, args) for the scene geometry, matching _build_geom_scene:
    SMEM scalars for compiled structures; a VMEM [4, nblocks, 128] sphere
    pack (+ SMEM plane_y) for instanced ones."""
    if structure.instanced:
        spheres_t, mu_bounds, blk_bounds, bbox = pack_instanced_spheres(
            params
        )
        specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        args = [spheres_t, mu_bounds, blk_bounds, bbox]
        if structure.num_planes:
            specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            args.append(jnp.asarray(params.plane_y).astype(jnp.float32))
        return specs, args
    specs = [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in fields]
    args = [
        jnp.asarray(getattr(params, f)).astype(jnp.float32) for f in fields
    ]
    return specs, args


def _pad_dims(structure, height, width, tile=None):
    """(gh, gw, ph, pw): grid and padded image dims in the structure's
    tiling ((P_H, P_W) patches for instanced, resolve_tile tiles
    otherwise)."""
    if structure.instanced:
        gh, gw = cdiv(height, P_H), cdiv(width, P_W)
        return gh, gw, gh * P_H, gw * P_W
    th, tw = tile or (TILE_H, TILE_W)
    gh, gw = cdiv(height, th), cdiv(width, tw)
    return gh, gw, gh * th, gw * tw


def _eval_kernel(structure, cfg, has_planes, *refs):
    """One windowed-traversal scene eval per (3, COL) point tile."""
    sphere_ref, mu_ref, blk_ref, bbox_ref = refs[:4]
    n = 4
    plane_vals = []
    if has_planes:
        plane_vals = [refs[4][i] for i in range(structure.num_planes)]
        n = 5
    p_ref, out_ref = refs[n], refs[n + 1]
    inst = InstancedScene(
        structure, sphere_ref, mu_ref, blk_ref, plane_vals, bbox_ref=bbox_ref
    )
    px, py, pz = (p_ref[i:i + 1, :] for i in range(3))
    out_ref[0:1, :] = inst.dist_only(
        px, py, pz, step_clamp=cfg.step_clamp
    )


def make_instanced_eval(
    structure: SceneStructure,
    cfg: RenderConfig = DEFAULT_CONFIG,
    interpret: bool = False,
) -> Callable:
    """Build `eval_fn(tables, plane_y, p[..., 3]) -> dist[...]`: ONE
    bound-guided windowed-traversal evaluation of the (possibly clamped)
    instanced scene SDF at arbitrary points, as a Pallas kernel.

    `tables` = (spheres_t, mu_bounds, blk_bounds, bbox) from
    pack_instanced_spheres — passed explicitly so the OBJECT-SHARDED path
    (parallel/objects.py) can pack each device's local sphere shard once
    per render and pmin-combine the per-device results per march step
    while still evaluating through the Pallas traversal (r3 verdict item
    4: composing object-axis sharding with the Pallas tier). `bbox` may
    be the axis-combined global AABB so the step-clamp cut matches the
    unsharded oracle. Value-only (callers attach gradients via a jnp
    twin, e.g. objects._pmin_pallas_sdf)."""
    kernel = functools.partial(
        _eval_kernel, structure, cfg, bool(structure.num_planes)
    )

    def eval_fn(tables, plane_y, p):
        spheres_t, mu_b, blk_b, bbox = tables
        batch = p.shape[:-1]
        flat = p.astype(jnp.float32).reshape(-1, 3)
        npts = flat.shape[0]
        npad = max(COL, cdiv(npts, COL) * COL)
        if npad != npts:
            flat = jnp.pad(flat, ((0, npad - npts), (0, 0)), mode="edge")
        pc = flat.T.reshape(3, npad)  # (3, NPAD)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        args = [spheres_t, mu_b, blk_b, bbox]
        if structure.num_planes:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            args.append(jnp.asarray(plane_y).astype(jnp.float32))
        in_specs.append(_row_spec(3))
        call = pl.pallas_call(
            kernel,
            grid=(npad // COL,),
            in_specs=in_specs,
            out_specs=_row_spec(1),
            out_shape=jax.ShapeDtypeStruct((1, npad), jnp.float32),
            interpret=interpret,
            name="lol_instanced_eval",
        )
        out = call(*args, pc)
        return out[0, :npts].reshape(batch)

    return eval_fn


def make_pallas_shadow_march(
    structure: SceneStructure,
    cfg: RenderConfig = DEFAULT_CONFIG,
    interpret: bool = False,
) -> Callable:
    """Build `shadow_fn(params, ro [H,W,3], rd [H,W,3], max_dist [H,W]) ->
    (res [H,W], t_star [H,W])`: the frozen soft-shadow march for the
    envelope gradient estimator (shading.py soft_shadow, cfg.shadow_grad
    == "envelope"). Per-pixel semantics match the jnp scan exactly; tiles
    early-exit when every lane is done (shadow rays from lit/sky regions
    terminate in a handful of steps). Value-only: the caller stop-gradients
    inputs and outputs. Supports compiled and instanced structures."""
    fields = active_fields(structure, GEOM_FIELDS)
    # unroll only for compiled structures: an instanced dist_only is a whole
    # windowed traversal, so wasted post-convergence sub-steps cost far more
    # than the amortized loop control saves (see pallas_scene.resolve_unroll)
    kernel = functools.partial(
        _shadow_kernel, structure, cfg, fields,
        1 if structure.instanced else resolve_unroll(interpret),
    )

    def shadow_fn(params: SceneParams, ro, rd, max_dist):
        from loltracer_tpu.render.pallas_scene import resolve_tile

        height, width = rd.shape[0], rd.shape[1]
        tile = resolve_tile(cfg, interpret, height, structure.num_lights)
        gh, gw, ph, pw = _pad_dims(structure, height, width, tile)
        rop = jnp.moveaxis(ro.astype(jnp.float32), -1, 0)  # (3, H, W)
        rdp = jnp.moveaxis(rd.astype(jnp.float32), -1, 0)
        mdp = max_dist.astype(jnp.float32)[None]  # (1, H, W)
        if (ph, pw) != (height, width):
            pad = ((0, 0), (0, ph - height), (0, pw - width))
            rop = jnp.pad(rop, pad, mode="edge")
            rdp = jnp.pad(rdp, pad, mode="edge")
            mdp = jnp.pad(mdp, pad, mode="edge")

        in_specs, args = _geom_specs_and_args(structure, fields, params)
        if structure.instanced:
            nt = gh * gw
            rop, rdp, mdp = (
                _to_columns(rop, gh, gw),
                _to_columns(rdp, gh, gw),
                _to_columns(mdp, gh, gw),
            )
            in_specs.extend([_row_spec(3), _row_spec(3), _row_spec(1)])
            call = pl.pallas_call(
                kernel,
                grid=(nt,),
                in_specs=in_specs,
                out_specs=_row_spec(2),
                out_shape=jax.ShapeDtypeStruct((2, nt * COL), jnp.float32),
                interpret=interpret,
                name="lol_shadow_march_instanced",
            )
            out = _from_columns(call(*args, rop, rdp, mdp), gh, gw)
        else:
            for ch in (3, 3, 1):
                in_specs.append(
                    pl.BlockSpec(
                        (ch,) + tile,
                        lambda i, j: (0, i, j),
                        memory_space=pltpu.VMEM,
                    )
                )
            call = pl.pallas_call(
                kernel,
                grid=(gh, gw),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    (2,) + tile,
                    lambda i, j: (0, i, j),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((2, ph, pw), jnp.float32),
                interpret=interpret,
                name="lol_shadow_march",
            )
            out = call(*args, rop, rdp, mdp)
        return out[0, :height, :width], out[1, :height, :width]

    return shadow_fn


def make_pallas_march(
    structure: SceneStructure,
    cfg: RenderConfig = DEFAULT_CONFIG,
    interpret: bool = False,
) -> Callable:
    """Build `march_fn(params, ro [3], rd [H, W, 3]) -> MarchResult` running
    the march as a Pallas kernel (interpret=True for CPU tests). Inputs are
    treated as constants (stop-gradient applied by the caller); outputs carry
    no gradient. Supports compiled and instanced structures."""
    fields = active_fields(structure, GEOM_FIELDS)
    kernel = functools.partial(
        _march_kernel, structure, cfg, fields,
        1 if structure.instanced else resolve_unroll(interpret),
    )

    def march_fn(params: SceneParams, ro, rd) -> MarchResult:
        from loltracer_tpu.render.pallas_scene import resolve_tile

        height, width = rd.shape[0], rd.shape[1]
        tile = resolve_tile(cfg, interpret, height, structure.num_lights)
        gh, gw, ph, pw = _pad_dims(structure, height, width, tile)
        rdp = jnp.moveaxis(rd.astype(jnp.float32), -1, 0)  # (3, H, W)
        if (ph, pw) != (height, width):
            # edge-replicated rays: padded lanes march real geometry, so the
            # tile early-exit behaves like the neighboring real rays
            rdp = jnp.pad(
                rdp, ((0, 0), (0, ph - height), (0, pw - width)), mode="edge"
            )

        geom_specs, geom_args = _geom_specs_and_args(structure, fields, params)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]  # ro
        in_specs.extend(geom_specs)
        if structure.instanced:
            # lane-row layout: rays as (1, COL) rows, 1-D grid over patches
            nt = gh * gw
            rdc = _to_columns(rdp, gh, gw)
            in_specs.append(_row_spec(3))
            call = pl.pallas_call(
                kernel,
                grid=(nt,),
                in_specs=in_specs,
                out_specs=_row_spec(4),
                out_shape=jax.ShapeDtypeStruct((4, nt * COL), jnp.float32),
                interpret=interpret,
                name="lol_march_instanced",
            )
            args = [jnp.asarray(ro, jnp.float32)] + geom_args + [rdc]
            out = _from_columns(call(*args), gh, gw)
        else:
            in_specs.append(
                pl.BlockSpec(
                    (3,) + tile,
                    lambda i, j: (0, i, j),
                    memory_space=pltpu.VMEM,
                )
            )
            call = pl.pallas_call(
                kernel,
                grid=(gh, gw),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    (4,) + tile,
                    lambda i, j: (0, i, j),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((4, ph, pw), jnp.float32),
                interpret=interpret,
                name="lol_march",
            )
            args = [jnp.asarray(ro, jnp.float32)] + geom_args + [rdp]
            out = call(*args)
        return MarchResult(
            t=out[0, :height, :width],
            t_query=out[1, :height, :width],
            s_min=out[2, :height, :width],
            t_close=out[3, :height, :width],
        )

    return march_fn
