"""Pallas TPU forward renderer.

The whole per-pixel pipeline — camera ray, sphere-trace march, tetrahedron
normals, per-light soft shadows, Phong, gamma — runs as ONE fused Pallas
kernel over (8, 128) pixel tiles (the VPU register shape: the lane axis is
the new SSE, SURVEY.md §2 C14). This is the hand-tuned tier that replaces
the reference's DynASM scene JIT (tracing_jit_renderer.dasc): the scene
*structure* is unrolled into the kernel at trace time, while every scene
number stays a runtime input read from SMEM.

Why it beats the XLA whole-image path:

- march and shadow loops are `lax.while_loop`s that exit when THIS TILE's
  worst ray finishes — sky/converged tiles stop after a few steps, whereas
  the whole-image formulation runs every pixel until the globally worst ray
  finishes (and the jnp shadow scan always runs all 128 steps to stay
  reverse-differentiable);
- all intermediates live in registers/VMEM as flat (8, 128) component
  planes (x/y/z kept as separate tiles — no awkward minor-dim-3 layouts);
- materials are resolved by carrying the material id through the
  distance argmin and a small unrolled select over the material table —
  no gathers.

Scope: forward only, reference-parity semantics (no AA). The training path
uses the jnp renderer's AD; a Pallas backward kernel is future work.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from loltracer_tpu.config import DEFAULT_CONFIG, RenderConfig
from loltracer_tpu.render.pallas_scene import (
    TILE_H,
    TILE_W,
    ScalarScene as _ScalarScene,
    active_fields as _active_fields,
    cdiv as _cdiv,
    czero as _czero,
    read_param_values as _read_param_values,
)
from loltracer_tpu.scene import SceneParams, SceneStructure

_NORMAL_KS = ((1.0, -1.0, -1.0), (-1.0, -1.0, 1.0), (-1.0, 1.0, -1.0), (1.0, 1.0, 1.0))


def _render_kernel(structure, cfg, height, width, cam_ref, *refs_and_out):
    param_refs = dict(zip(_active_fields(structure), refs_and_out[:-1]))
    out_ref = refs_and_out[-1]
    scn = _ScalarScene(structure, _read_param_values(structure, param_refs))

    f32 = jnp.float32
    # camera pack: ro(3) right(3) up(3) dir(3) halfw halfh
    ro_x, ro_y, ro_z = cam_ref[0], cam_ref[1], cam_ref[2]
    rt = (cam_ref[3], cam_ref[4], cam_ref[5])
    up = (cam_ref[6], cam_ref[7], cam_ref[8])
    fw = (cam_ref[9], cam_ref[10], cam_ref[11])
    half_w, half_h = cam_ref[12], cam_ref[13]

    ti = pl.program_id(0)
    tj = pl.program_id(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    y = (ti * TILE_H + rows).astype(f32)
    x = (tj * TILE_W + cols).astype(f32)

    vx = (x + 0.5) / width * 2.0 - 1.0
    vy = 1.0 - (y + 0.5) / height * 2.0

    rdx = rt[0] * (vx * half_w) + up[0] * (vy * half_h) + fw[0]
    rdy = rt[1] * (vx * half_w) + up[1] * (vy * half_h) + fw[1]
    rdz = rt[2] * (vx * half_w) + up[2] * (vy * half_h) + fw[2]
    inv = lax.rsqrt(rdx * rdx + rdy * rdy + rdz * rdz)
    rdx, rdy, rdz = rdx * inv, rdy * inv, rdz * inv

    # --- march (naive_renderer.c:46-69), tile-local early exit -------------
    # done flags are carried as f32 (1.0 = done): Mosaic rejects loop-carried
    # i1 vectors in scf.while layouts.
    def march_cond(c):
        step, _, _, done_f = c
        return (step < cfg.max_steps) & (jnp.min(done_f) < 0.5)

    def march_body(c):
        step, t, t_query, done_f = c
        done = done_f > 0.5
        d = scn.dist_only(ro_x + t * rdx, ro_y + t * rdy, ro_z + t * rdz)
        new_t = t + d
        t_query = jnp.where(done, t_query, t)
        t = jnp.where(done, t, new_t)
        now_done = (d < cfg.epsilon) | (new_t > cfg.max_dist)
        done_f = jnp.maximum(done_f, jnp.where(now_done, 1.0, 0.0))
        return step + 1, t, t_query, done_f

    # concrete-layout (non-splat) loop carry inits; must vary in BOTH tile
    # dims (x alone is sublane-replicated) — see _czero
    zeros = jnp.minimum(x + y, 0.0)
    t, t_query = lax.while_loop(
        march_cond, march_body, (0, zeros, zeros, zeros)
    )[1:3]

    px = ro_x + t * rdx
    py = ro_y + t * rdy
    pz = ro_z + t * rdz
    _, mat = scn.sdf(
        ro_x + t_query * rdx, ro_y + t_query * rdy, ro_z + t_query * rdz
    )
    mat = jnp.where(t >= cfg.max_dist, 0, mat)

    # --- normal (naive_renderer.c:114-125) ---------------------------------
    h = t * cfg.normal_h_scale
    nx = zeros
    ny = zeros
    nz = zeros
    for kx, ky, kz in _NORMAL_KS:
        d = scn.dist_only(px + kx * h, py + ky * h, pz + kz * h)
        nx = nx + kx * d
        ny = ny + ky * d
        nz = nz + kz * d
    ninv = lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
    nx, ny, nz = nx * ninv, ny * ninv, nz * ninv

    # --- material select (no gathers) --------------------------------------
    def msel(get):
        acc = jnp.ones(mat.shape, f32) * get(scn.materials[0])
        for m in range(1, structure.num_materials):
            acc = jnp.where(mat == m, get(scn.materials[m]), acc)
        return acc

    shininess = msel(lambda M: M[0])
    dif = [msel(lambda M, c=c: M[1][c]) for c in range(3)]
    spec = [msel(lambda M, c=c: M[2][c]) for c in range(3)]
    amb = [msel(lambda M, c=c: M[3][c]) for c in range(3)]

    # --- per-light shadow + Phong (naive_renderer.c:71-175) ----------------
    cr = zeros
    cg = zeros
    cb = zeros

    cdx = ro_x - px
    cdy = ro_y - py
    cdz = ro_z - pz
    cinv = lax.rsqrt(jnp.maximum(cdx * cdx + cdy * cdy + cdz * cdz, 1e-30))
    cdx, cdy, cdz = cdx * cinv, cdy * cinv, cdz * cinv

    for (lp, ldiff, lspec) in scn.lights:
        tlx, tly, tlz = lp[0] - px, lp[1] - py, lp[2] - pz
        light_dist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
        linv = lax.rsqrt(jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-30))
        ldx, ldy, ldz = tlx * linv, tly * linv, tlz * linv

        # shadow ray: full-unit origin offset (naive_renderer.c:97)
        sox = px + ldx * cfg.shadow_offset
        soy = py + ldy * cfg.shadow_offset
        soz = pz + ldz * cfg.shadow_offset

        def sh_cond(c):
            step, _, _, done_f = c
            return (step < cfg.shadow_steps) & (jnp.min(done_f) < 0.5)

        def sh_body(c, sox=sox, soy=soy, soz=soz, ldx=ldx, ldy=ldy, ldz=ldz,
                    light_dist=light_dist):
            step, res, st, done_f = c
            done = done_f > 0.5
            d = scn.dist_only(sox + st * ldx, soy + st * ldy, soz + st * ldz)
            # first step: t==0 -> +/-2 sentinel, value-equivalent to the
            # reference's +/-inf through min/clamp (SURVEY §2.1.5)
            val = jnp.where(
                st > 0.0,
                cfg.shadow_w * d / jnp.where(st > 0.0, st, 1.0),
                jnp.where(d < 0.0, -2.0, 2.0),
            )
            new_res = jnp.where(done, res, jnp.minimum(res, val))
            new_t = jnp.where(done, st, st + d)
            now_done = (new_res < -1.0) | (new_t > light_dist)
            done_f = jnp.maximum(done_f, jnp.where(now_done, 1.0, 0.0))
            return step + 1, new_res, new_t, done_f

        _, res, _, _ = lax.while_loop(
            sh_cond, sh_body, (0, zeros + 1.0, zeros, zeros)
        )
        shadow = jnp.maximum(res, 0.0)

        ndl = nx * ldx + ny * ldy + nz * ldz
        diffuse_incidence = jnp.clip(ndl, 0.0, 1.0)
        w_diff = shadow * diffuse_incidence

        refx = nx * (2.0 * ndl) - ldx
        refy = ny * (2.0 * ndl) - ldy
        refz = nz * (2.0 * ndl) - ldz
        base = jnp.clip(refx * cdx + refy * cdy + refz * cdz, 0.0, 1.0)
        # powf(0,0) == 1; guard pow grad corner exactly like the jnp path
        safe_base = jnp.where(base > 0.0, base, 1.0)
        powv = jnp.where(
            base > 0.0,
            jnp.exp(shininess * jnp.log(safe_base)),
            jnp.where(shininess == 0.0, 1.0, 0.0),
        )
        w_spec = shadow * diffuse_incidence * powv

        cr = cr + ldiff[0] * w_diff * dif[0] + lspec[0] * w_spec * spec[0]
        cg = cg + ldiff[1] * w_diff * dif[1] + lspec[1] * w_spec * spec[1]
        cb = cb + ldiff[2] * w_diff * dif[2] + lspec[2] * w_spec * spec[2]

    cr = cr + scn.ambient[0] * amb[0]
    cg = cg + scn.ambient[1] * amb[1]
    cb = cb + scn.ambient[2] * amb[2]

    # clamp + gamma (naive_renderer.c:174,231)
    def enc(c):
        c = jnp.clip(c, 0.0, 1.0)
        return jnp.where(c > 0.0, jnp.exp(cfg.gamma * jnp.log(jnp.where(c > 0.0, c, 1.0))), 0.0)

    out_ref[0, :, :] = enc(cr)
    out_ref[1, :, :] = enc(cg)
    out_ref[2, :, :] = enc(cb)


# --- wrapper ---------------------------------------------------------------


def make_pallas_renderer(
    structure: SceneStructure,
    height: int,
    width: int,
    cfg: RenderConfig = DEFAULT_CONFIG,
    interpret: bool = False,
) -> Callable[[SceneParams], jnp.ndarray]:
    """Compile `params -> [H, W, 3] float32` via the fused Pallas kernel.
    interpret=True runs the kernel in the Pallas interpreter (CPU tests)."""
    gh, gw = _cdiv(height, TILE_H), _cdiv(width, TILE_W)
    ph, pw = gh * TILE_H, gw * TILE_W
    fields = _active_fields(structure)

    kernel = functools.partial(_render_kernel, structure, cfg, height, width)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]  # camera pack
    for _ in fields:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    call = pl.pallas_call(
        kernel,
        grid=(gh, gw),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (3, TILE_H, TILE_W), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, ph, pw), jnp.float32),
        interpret=interpret,
        name="lol_render_fused",
    )

    def camera_pack(params: SceneParams):
        d = params.cam_direction.astype(jnp.float32)
        d = d / jnp.sqrt(jnp.sum(d * d))
        upg = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
        rt = jnp.cross(d, upg)
        rt = rt / jnp.sqrt(jnp.sum(rt * rt))
        up = jnp.cross(rt, d)
        half = params.cam_fov.astype(jnp.float32) / 2.0
        hh = jnp.arctan(half) if cfg.atan_fov else jnp.tan(half)
        hw = (width / height) * hh
        return jnp.concatenate(
            [
                params.cam_point.astype(jnp.float32),
                rt,
                up,
                d,
                jnp.stack([hw, hh]),
            ]
        )

    @jax.jit
    def renderer(params: SceneParams) -> jnp.ndarray:
        args = [camera_pack(params)]
        for f in fields:
            args.append(jnp.asarray(getattr(params, f)).astype(jnp.float32))
        planar = call(*args)
        return jnp.moveaxis(planar, 0, -1)[:height, :width, :]

    return renderer
