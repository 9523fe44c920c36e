"""Shadow-ray 3-D regrouping for the instanced tier (r4 verdict item 1).

The fused instanced kernel (pallas_train._instanced_fwd_kernel) marches
each (1, COL) tile's TWO per-light shadow rays with origins at that pixel
patch's hit points. A 16x32-pixel patch straddling a silhouette has hit
points spread ~30 units in depth, so the patch's per-step traversal
window union stays at 10-20 sphere windows no matter how tight the
bounds are — and the shadow marches are a measured 70% of the instanced
frame (PERF.md). Pixel adjacency is simply the wrong grouping for shadow
rays; 3-D adjacency of their ORIGINS is the right one.

This module regroups: the forward render becomes

  kernel A (per patch): primary march (+ scratch gather) -> t_sh, hit,
      material — the fused kernel's march/track section, shadows removed;
  glue (jnp/XLA): shadow-ray records per light (origin, direction,
      segment length) -> Morton-code the origins -> argsort -> permute;
  kernel C (per 512-ray row, per light): segment-lit cull + scratch
      gather + the shared shadow_loop over rays that are now 3-D
      NEIGHBORS, so each row's window union collapses to the few windows
      around one cell -> (res, t*);
  unsort (one gather) -> kernel D (per patch): _shade_from_frozen with
      the shadow planes supplied as inputs -> the image.

Per-lane march values depend only on the lane's own ray and the scene
(done lanes freeze; the scratch gather is complete under the clamp), so
re-ordering lanes across rows is VALUE-EXACT: the pipeline matches the
monolithic fused renderer to fp32 glue noise (tests/test_regroup.py),
with the sort buying only locality. Gradients keep the monolithic path
(make_instanced_training_renderer); this is the forward/serving tier.

Reference bar: the DynASM JIT exists to make the scene SDF cheap
everywhere it is called, shadows included
(tracing_jit_renderer.dasc:76-143, naive_renderer.c:71-100).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from loltracer_tpu.config import DEFAULT_CONFIG, RenderConfig
from loltracer_tpu.render.pallas_scene import (
    InstancedScene,
    ScratchScene,
    cdiv,
    czero,
    march_loop,
    pack_instanced_spheres,
    read_param_values,
    shadow_loop,
)
from loltracer_tpu.render.pallas_train import (
    CAM_SIZE,
    _compose_track,
    _InstancedShading,
    _rays_from_cam_cols,
    _shade_from_frozen,
    camera_pack,
    instanced_small_fields,
)
from loltracer_tpu.scene import SceneParams, SceneStructure


def _row(ch):
    return pl.BlockSpec((ch, 512), lambda i: (0, i), memory_space=pltpu.VMEM)


def _smem():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


# --------------------------------------------------------------------------
# kernel A: primary march + winner tracking (the fused kernel's march
# section verbatim, shadows and shading removed)
# --------------------------------------------------------------------------


def _march_track_kernel(structure, cfg, height, width, gpw, fields,
                        use_scratch, cam_ref, sph_ref, mu_ref, blk_ref,
                        bbox_ref, *refs):
    mug_ref = None
    if use_scratch:
        mug_ref, refs = refs[0], refs[1:]
    param_refs = dict(zip(fields, refs[: len(fields)]))
    rest = refs[len(fields):]
    scratch_ref = bounds_ref = None
    if use_scratch:
        if cfg.scratch_window:
            scratch_ref, bounds_ref = rest[-2], rest[-1]
        else:
            scratch_ref = rest[-1]
    out_ref = rest[0]
    values = read_param_values(structure, param_refs)
    cam = tuple(cam_ref[i] for i in range(CAM_SIZE))
    clamp = cfg.step_clamp

    pi = pl.program_id(0)
    ro, rd = _rays_from_cam_cols(cam, height, width, gpw, pi)
    ro_x, ro_y, ro_z = ro
    rdx, rdy, rdz = rd
    inst = InstancedScene(
        structure, sph_ref, mu_ref, blk_ref,
        list(values.get("plane_y", ())), bbox_ref=bbox_ref,
        mu_gather_ref=mug_ref,
    )
    zeros = czero(rdx) + czero(rdy) + czero(rdz)

    if scratch_ref is not None and clamp is not None:
        zl = czero(rdx)
        ro_pl = (ro_x + zl, ro_y + zl, ro_z + zl)
        n_rows_p, over_p, ref_p = inst.gather_segment_blocks(
            ro_pl, rd, jnp.float32(cfg.max_dist), clamp, scratch_ref,
            cfg.shadow_scratch, bounds_ref=bounds_ref,
        )

        def scratch_march(_):
            scn_p = ScratchScene(
                inst, scratch_ref, n_rows_p, bounds_ref=bounds_ref,
                ref=ref_p, window_clamp=clamp,
            )
            return march_loop(
                scn_p, cfg, ro, rd, track_aa=cfg.antialias,
                step_clamp=clamp,
            )

        def full_march_p(_):
            return march_loop(
                inst, cfg, ro, rd, track_aa=cfg.antialias, step_clamp=clamp
            )

        t, t_query, _, t_close = lax.cond(
            over_p > 0.5, full_march_p, scratch_march, 0
        )
    else:
        t, t_query, _, t_close = march_loop(
            inst, cfg, ro, rd, track_aa=cfg.antialias, step_clamp=clamp
        )
    hit = t < cfg.max_dist

    if cfg.antialias:
        t_q = jnp.where(hit, t_query, t_close)
        t_sh = jnp.where(hit, t, t_close)
    else:
        t_q = t_query
        t_sh = t
    pqx = ro_x + t_q * rdx
    pqy = ro_y + t_q * rdy
    pqz = ro_z + t_q * rdz
    raw, matf, _, _, _, _, _ = inst.sdf_track(
        pqx, pqy, pqz, step_clamp=clamp
    )
    cut_q = inst._cut(pqx, pqy, pqz, clamp)
    _, matf, _, _, _ = _compose_track(
        structure, values, cut_q, raw, matf, zeros, zeros, zeros, pqy
    )
    if not cfg.antialias:
        matf = jnp.where(hit, matf, 0.0)

    out_ref[0:1, :] = t_sh
    out_ref[1:2, :] = jnp.where(hit, 1.0, 0.0)
    out_ref[2:3, :] = matf


# --------------------------------------------------------------------------
# kernel C: shadow march over SORTED ray rows
# --------------------------------------------------------------------------


def _shadow_sorted_kernel(structure, cfg, fields, use_scratch, emit_stats,
                          sph_ref, mu_ref, blk_ref, bbox_ref, *refs):
    mug_ref = None
    if use_scratch:
        mug_ref, refs = refs[0], refs[1:]
    param_refs = dict(zip(fields, refs[: len(fields)]))
    rest = refs[len(fields):]
    scratch_ref = bounds_ref = None
    if use_scratch:
        if cfg.scratch_window:
            scratch_ref, bounds_ref = rest[-2], rest[-1]
        else:
            scratch_ref = rest[-1]
    so_ref, ld_ref, maxd_ref, out_ref = rest[:4]
    stats_ref = rest[4] if emit_stats else None
    values = read_param_values(structure, param_refs)

    inst = InstancedScene(
        structure, sph_ref, mu_ref, blk_ref,
        list(values.get("plane_y", ())), bbox_ref=bbox_ref,
        mu_gather_ref=mug_ref,
    )
    so = (so_ref[0:1, :], so_ref[1:2, :], so_ref[2:3, :])
    ld = (ld_ref[0:1, :], ld_ref[1:2, :], ld_ref[2:3, :])
    max_dist = maxd_ref[0:1, :]
    shadow_clamp = cfg.effective_shadow_clamp()

    lit = None
    if cfg.shadow_cull:
        lit = inst.segment_lit(so, ld, max_dist, shadow_clamp, cfg.shadow_w)

    if scratch_ref is not None and shadow_clamp is not None:
        cap = cfg.shadow_scratch
        n_rows, overflow, ref_s = inst.gather_segment_blocks(
            so, ld, max_dist, shadow_clamp, scratch_ref, cap,
            bounds_ref=bounds_ref,
        )

        def scratch_march(_):
            scn_s = ScratchScene(
                inst, scratch_ref, n_rows, bounds_ref=bounds_ref,
                ref=ref_s, window_clamp=shadow_clamp,
            )
            return shadow_loop(
                scn_s, cfg, so, ld, max_dist,
                step_clamp=shadow_clamp, init_done=lit,
            )

        def full_march(_):
            return shadow_loop(
                inst, cfg, so, ld, max_dist,
                step_clamp=shadow_clamp, init_done=lit,
            )

        res, t_star = lax.cond(overflow > 0.5, full_march, scratch_march, 0)
        if stats_ref is not None:
            # per-row-tile gather diagnostics, broadcast across the lane
            # row (VMEM-friendly): scratch rows gathered, overflow flag,
            # fraction pre-marked lit
            zl = czero(so[0])
            stats_ref[0:1, :] = zl + n_rows.astype(jnp.float32)
            stats_ref[1:2, :] = zl + overflow
            stats_ref[2:3, :] = zl + (
                jnp.sum(lit) / lit.size if lit is not None else 0.0
            )
    else:
        res, t_star = shadow_loop(
            inst, cfg, so, ld, max_dist,
            step_clamp=shadow_clamp, init_done=lit,
        )
        if stats_ref is not None:
            zl = czero(so[0])
            stats_ref[0:1, :] = zl
            stats_ref[1:2, :] = zl
            stats_ref[2:3, :] = zl + (
                jnp.sum(lit) / lit.size if lit is not None else 0.0
            )
    out_ref[0:1, :] = res
    out_ref[1:2, :] = t_star


# --------------------------------------------------------------------------
# kernel D: shading from frozen planes (the fused kernel's tail, march and
# shadow numbers supplied as inputs)
# --------------------------------------------------------------------------


def _shade_planes_kernel(structure, cfg, height, width, gpw, fields,
                         cam_ref, sph_ref, mu_ref, blk_ref, bbox_ref,
                         *refs):
    param_refs = dict(zip(fields, refs[: len(fields)]))
    rest = refs[len(fields):]
    frozen_ref, img_ref = rest[0], rest[1]
    values = read_param_values(structure, param_refs)
    cam = tuple(cam_ref[i] for i in range(CAM_SIZE))

    pi = pl.program_id(0)

    def rays_fn(c):
        return _rays_from_cam_cols(c, height, width, gpw, pi)

    inst = InstancedScene(
        structure, sph_ref, mu_ref, blk_ref,
        list(values.get("plane_y", ())), bbox_ref=bbox_ref,
    )
    scn = _InstancedShading(structure, values, inst, cfg)

    t_sh = frozen_ref[0:1, :]
    hit_f = frozen_ref[1:2, :]
    matf = frozen_ref[2:3, :]
    nl = structure.num_lights
    shadow_res = [frozen_ref[3 + 2 * li:4 + 2 * li, :] for li in range(nl)]
    shadow_tstar = [
        frozen_ref[4 + 2 * li:5 + 2 * li, :] for li in range(nl)
    ]
    den = jnp.ones_like(t_sh)  # value-neutral (forward-only tier)

    r, g, b = _shade_from_frozen(
        structure, cfg, scn, cam, t_sh, hit_f, matf, den,
        shadow_res, shadow_tstar, rays_fn,
    )
    img_ref[0:1, :] = r
    img_ref[1:2, :] = g
    img_ref[2:3, :] = b


# --------------------------------------------------------------------------
# Morton keys: 3-D locality order for the sort
# --------------------------------------------------------------------------


def _part1by2(v):
    """Spread 10 bits to every 3rd position (standard Morton interleave)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & jnp.uint32(0xFF0000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0F00F00F)
    v = (v | (v << 4)) & jnp.uint32(0xC30C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x49249249)
    return v


def morton_keys(px, py, pz, lo, hi):
    """uint32 30-bit Morton codes of points quantized to a 1024^3 grid of
    the [lo, hi] box; out-of-box points clamp to the boundary cells."""
    span = jnp.maximum(hi - lo, 1e-6)

    def q(v, a):
        n = (v - lo[a]) / span[a] * 1024.0
        return jnp.clip(n, 0.0, 1023.0).astype(jnp.uint32)

    return (
        (_part1by2(q(px, 0)) << 2)
        | (_part1by2(q(py, 1)) << 1)
        | _part1by2(q(pz, 2))
    )


def _make_shadow_call(structure, cfg, fields, use_scratch, npad,
                      scratch_shapes, interpret, emit_stats=False):
    from loltracer_tpu.render.pallas_march import COL

    nt = npad // COL
    out_specs = _row(2)
    out_shape = jax.ShapeDtypeStruct((2, npad), jnp.float32)
    if emit_stats:
        out_specs = (out_specs, _row(3))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((3, npad), jnp.float32))
    return pl.pallas_call(
        functools.partial(
            _shadow_sorted_kernel, structure, cfg, fields, use_scratch,
            emit_stats,
        ),
        grid=(nt,),
        in_specs=[_vmem(), _vmem(), _vmem(), _smem()]
        + ([_vmem()] if use_scratch else [])
        + [_smem() for _ in fields] + [_row(3), _row(3), _row(1)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        name="lol_rg_shadow",
    )


# --------------------------------------------------------------------------
# the regrouped forward renderer
# --------------------------------------------------------------------------


def make_instanced_renderer_regrouped(
    structure: SceneStructure,
    height: int,
    width: int,
    cfg: RenderConfig = DEFAULT_CONFIG,
    interpret: bool = False,
    full_height: int = None,
    with_row_offset: bool = False,
):
    """`params -> [H, W, 3]` through the regrouped pipeline (module
    docstring). Same contract as pallas_train.make_instanced_renderer —
    values match it to fp32 glue noise; the difference is wall time."""
    from loltracer_tpu.render.pallas_march import COL, P_H, P_W, \
        _from_columns, _to_columns

    if not structure.instanced:
        raise ValueError("requires an instanced scene")
    fields = instanced_small_fields(structure)
    gph, gpw = cdiv(height, P_H), cdiv(width, P_W)
    ph, pw = gph * P_H, gpw * P_W
    nt = gph * gpw
    npad = nt * COL
    fh = full_height or height

    use_scratch = bool(
        cfg.shadow_scratch
        and (cfg.step_clamp is not None
             or cfg.effective_shadow_clamp() is not None)
    )
    scratch_shapes = (
        [pltpu.VMEM((cfg.shadow_scratch, 8), jnp.float32)]
        if use_scratch else []
    )
    if use_scratch and cfg.scratch_window:
        scratch_shapes.append(pltpu.VMEM((8, 128), jnp.float32))
    table_specs4 = [_vmem(), _vmem(), _vmem(), _smem()]
    table_specs = list(table_specs4)
    if use_scratch:
        table_specs.append(_vmem())  # gather bounds (pack_gather_bounds)
    field_specs = [_smem() for _ in fields]

    callA = pl.pallas_call(
        functools.partial(
            _march_track_kernel, structure, cfg, fh, width, gpw, fields,
            use_scratch,
        ),
        grid=(nt,),
        in_specs=[_smem()] + table_specs + field_specs,
        out_specs=_row(3),
        out_shape=jax.ShapeDtypeStruct((3, npad), jnp.float32),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        name="lol_rg_march",
    )
    callC = _make_shadow_call(
        structure, cfg, fields, use_scratch, npad, scratch_shapes,
        interpret,
    )
    n_frozen = 3 + 2 * structure.num_lights
    callD = pl.pallas_call(
        functools.partial(
            _shade_planes_kernel, structure, cfg, fh, width, gpw, fields,
        ),
        grid=(nt,),
        in_specs=[_smem()] + table_specs4 + field_specs + [_row(n_frozen)],
        out_specs=_row(3),
        out_shape=jax.ShapeDtypeStruct((3, npad), jnp.float32),
        interpret=interpret,
        name="lol_rg_shade",
    )

    def render(params: SceneParams, row0) -> jnp.ndarray:
        tables = pack_instanced_spheres(params, structure.material_ids)
        spheres_t, mu_b, blk_b, bbox = tables
        if use_scratch:
            from loltracer_tpu.render.pallas_scene import pack_gather_bounds

            tables = tables + (pack_gather_bounds(spheres_t),)
        cam = camera_pack(params, fh, width, cfg, row0)
        fargs = [
            jnp.asarray(getattr(params, f)).astype(jnp.float32)
            for f in fields
        ]

        track = callA(cam, *tables, *fargs)  # (3, npad)
        t_sh_c = track[0:1, :]
        # hit/mat stay in column layout; shadow records need pixel rays:
        # the jnp twin of the kernel's ray math (bitwise-equal formula)
        ro, rd = _cols_rays(cam, fh, width, gph, gpw)
        px = ro[0] + t_sh_c * rd[0]
        py = ro[1] + t_sh_c * rd[1]
        pz = ro[2] + t_sh_c * rd[2]

        lo = jnp.stack([jnp.min(px), jnp.min(py), jnp.min(pz)])
        hi = jnp.stack([jnp.max(px), jnp.max(py), jnp.max(pz)])

        light_planes = []
        for li in range(structure.num_lights):
            lp = jnp.asarray(params.light_point[li]).astype(jnp.float32)
            tlx, tly, tlz = lp[0] - px, lp[1] - py, lp[2] - pz
            light_dist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
            lnorm = jnp.sqrt(
                jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-30)
            )
            ldx, ldy, ldz = tlx / lnorm, tly / lnorm, tlz / lnorm
            sox = px + ldx * cfg.shadow_offset
            soy = py + ldy * cfg.shadow_offset
            soz = pz + ldz * cfg.shadow_offset

            keys = morton_keys(
                sox[0], soy[0], soz[0], lo, hi
            )  # (npad,) uint32
            perm = jnp.argsort(keys)
            inv = jnp.argsort(perm)

            def g(a):
                return jnp.take(a[0], perm, axis=0)[None, :]

            so_s = jnp.concatenate([g(sox), g(soy), g(soz)], axis=0)
            ld_s = jnp.concatenate([g(ldx), g(ldy), g(ldz)], axis=0)
            md_s = g(light_dist)
            out = callC(*tables, *fargs, so_s, ld_s, md_s)  # (2, npad)
            res = jnp.take(out[0], inv, axis=0)[None, :]
            tst = jnp.take(out[1], inv, axis=0)[None, :]
            light_planes.extend([res, tst])

        frozen = jnp.concatenate([track] + light_planes, axis=0)
        img_planar = callD(cam, *tables[:4], *fargs, frozen)
        planar = _from_columns(img_planar, gph, gpw)
        return jnp.moveaxis(planar, 0, -1)[:height, :width, :]

    def _cols_rays(cam, fh_, width_, gph_, gpw_):
        # jnp twin of _rays_from_cam_cols over ALL patches, (1, npad)
        # component planes in the same column order the kernels use
        from loltracer_tpu.render.pallas_train import _rays_from_xy

        k = jnp.arange(npad, dtype=jnp.int32)
        pi = k // COL
        c = k - pi * COL
        ti = pi // gpw_
        tj = pi - ti * gpw_
        y = cam[15] + (ti * P_H + c // P_W).astype(jnp.float32)
        x = (tj * P_W + (c % P_W)).astype(jnp.float32)
        ro, rd = _rays_from_xy(cam, fh_, width_, x[None, :], y[None, :])
        return ro, rd

    if with_row_offset:
        def renderer_rows(params: SceneParams, row0) -> jnp.ndarray:
            return render(params, jnp.asarray(row0, jnp.float32))

        return renderer_rows

    @jax.jit
    def renderer(params: SceneParams) -> jnp.ndarray:
        return render(params, jnp.float32(0.0))

    return renderer


def shadow_gather_stats(
    structure: SceneStructure,
    params: SceneParams,
    height: int,
    width: int,
    cfg: RenderConfig = DEFAULT_CONFIG,
    light: int = 0,
    sort: bool = True,
    interpret: bool = False,
):
    """Diagnostics: per-row-tile scratch-gather row counts, overflow and
    pre-lit fractions for one light's shadow rays, with or without the
    Morton sort — the measurement that says whether 3-D regrouping
    actually shrinks the marched sphere set."""
    import numpy as np

    from loltracer_tpu.render.pallas_march import COL, P_H, P_W, _to_columns

    fields = instanced_small_fields(structure)
    gph, gpw = cdiv(height, P_H), cdiv(width, P_W)
    nt = gph * gpw
    npad = nt * COL
    use_scratch = bool(
        cfg.shadow_scratch and cfg.effective_shadow_clamp() is not None
    )
    scratch_shapes = (
        [pltpu.VMEM((cfg.shadow_scratch, 8), jnp.float32)]
        if use_scratch else []
    )
    if use_scratch and cfg.scratch_window:
        scratch_shapes.append(pltpu.VMEM((8, 128), jnp.float32))
    callA = pl.pallas_call(
        functools.partial(
            _march_track_kernel, structure, cfg, height, width, gpw, fields,
            bool(use_scratch and cfg.step_clamp is not None),
        ),
        grid=(nt,),
        in_specs=[_smem(), _vmem(), _vmem(), _vmem(), _smem()]
        + ([_vmem()] if use_scratch and cfg.step_clamp is not None else [])
        + [_smem() for _ in fields],
        out_specs=_row(3),
        out_shape=jax.ShapeDtypeStruct((3, npad), jnp.float32),
        scratch_shapes=(
            scratch_shapes if cfg.step_clamp is not None else []
        ),
        interpret=interpret,
        name="lol_rg_march",
    )
    callC = _make_shadow_call(
        structure, cfg, fields, use_scratch, npad, scratch_shapes,
        interpret, emit_stats=True,
    )

    @jax.jit
    def run(params):
        tables = pack_instanced_spheres(params, structure.material_ids)
        if use_scratch:
            from loltracer_tpu.render.pallas_scene import pack_gather_bounds

            tables = tables + (pack_gather_bounds(tables[0]),)
        cam = camera_pack(params, height, width, cfg, 0.0)
        fargs = [
            jnp.asarray(getattr(params, f)).astype(jnp.float32)
            for f in fields
        ]
        track = callA(cam, *tables, *fargs)
        t_sh_c = track[0:1, :]

        k = jnp.arange(npad, dtype=jnp.int32)
        pi = k // COL
        c = k - pi * COL
        ti = pi // gpw
        tj = pi - ti * gpw
        y = cam[15] + (ti * P_H + c // P_W).astype(jnp.float32)
        x = (tj * P_W + (c % P_W)).astype(jnp.float32)
        from loltracer_tpu.render.pallas_train import _rays_from_xy

        ro, rd = _rays_from_xy(cam, height, width, x[None, :], y[None, :])
        px = ro[0] + t_sh_c * rd[0]
        py = ro[1] + t_sh_c * rd[1]
        pz = ro[2] + t_sh_c * rd[2]
        lp = jnp.asarray(params.light_point[light]).astype(jnp.float32)
        tlx, tly, tlz = lp[0] - px, lp[1] - py, lp[2] - pz
        light_dist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
        lnorm = jnp.sqrt(
            jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-30)
        )
        ldx, ldy, ldz = tlx / lnorm, tly / lnorm, tlz / lnorm
        sox = px + ldx * cfg.shadow_offset
        soy = py + ldy * cfg.shadow_offset
        soz = pz + ldz * cfg.shadow_offset
        if sort:
            lo = jnp.stack([jnp.min(sox), jnp.min(soy), jnp.min(soz)])
            hi = jnp.stack([jnp.max(sox), jnp.max(soy), jnp.max(soz)])
            keys = morton_keys(sox[0], soy[0], soz[0], lo, hi)
            perm = jnp.argsort(keys)
        else:
            perm = jnp.arange(npad)

        def g(a):
            return jnp.take(a[0], perm, axis=0)[None, :]

        so_s = jnp.concatenate([g(sox), g(soy), g(soz)], axis=0)
        ld_s = jnp.concatenate([g(ldx), g(ldy), g(ldz)], axis=0)
        md_s = g(light_dist)
        _, stats = callC(*tables, *fargs, so_s, ld_s, md_s)
        # one value per tile: every lane of a tile's row carries the same
        # broadcast scalar
        return stats.reshape(3, nt, COL)[:, :, 0]

    stats = np.asarray(run(params))
    n_rows = stats[0]
    return {
        "tiles": int(stats.shape[1]),
        "n_rows_mean": float(n_rows.mean()),
        "n_rows_p50": float(np.percentile(n_rows, 50)),
        "n_rows_p99": float(np.percentile(n_rows, 99)),
        "n_rows_max": float(n_rows.max()),
        "overflow_frac": float(stats[1].mean()),
        "lit_frac_mean": float(stats[2].mean()),
        "sorted": sort,
    }
