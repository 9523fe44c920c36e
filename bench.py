"""Benchmark: rays/s per chip, forward + backward, scene4 @ 1920x1080.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "rays/s", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md: `published: {}`), so
`vs_baseline` divides by a MEASURED CPU baseline (r4 verdict item 6 — the
old 1.0e6 nominal guess is gone): native/cpu_baseline.c transcribes the
scene4 pipeline (naive_renderer.c semantics, statically-compiled SDF —
an upper bound on the reference's DynASM JIT backend, which does the same
job at runtime) and measured 518,186 rays/s forward-only on ALL cores of
this machine (271,850 single-thread; 2-core host, BASELINE.md). Our
metric is the strictly harder forward+backward.

Env overrides: BENCH_SCENE (path), BENCH_W/BENCH_H, BENCH_MODE
(fwd | fwdbwd), BENCH_BACKEND (pallas | jnp; fwd defaults to the Pallas
kernel, fwdbwd to the differentiable jnp path), BENCH_REPS.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from loltracer_tpu.utils.cache import enable_cache

    enable_cache()

    from loltracer_tpu.config import RenderConfig
    from loltracer_tpu.lol import parse_scene_file
    from loltracer_tpu.render.jnp_renderer import render_image
    from loltracer_tpu.scene import build_scene

    scene_path = os.environ.get("BENCH_SCENE", "examples/scene4.lol")
    width = int(os.environ.get("BENCH_W", 1920))
    height = int(os.environ.get("BENCH_H", 1080))
    mode = os.environ.get("BENCH_MODE", "fwdbwd")
    reps = int(os.environ.get("BENCH_REPS", 5))
    # Shadow gradient estimator for fwdbwd (config.py shadow_grad): the
    # envelope estimator is the production inverse-rendering path — forward
    # values are bitwise identical to "exact"; the backward re-attaches
    # through one SDF eval at the frozen penumbra argmin instead of
    # backpropagating the 128-step shadow scan.
    shadow_grad = os.environ.get("BENCH_SHADOW_GRAD", "envelope")
    antialias = os.environ.get("BENCH_AA", "0") == "1"

    if scene_path.startswith("instanced:"):
        # procedural 10k+ primitive config, e.g. BENCH_SCENE=instanced:10000
        from loltracer_tpu.scenes import instanced_spheres

        scene = instanced_spheres(n=int(scene_path.split(":")[1]))
    else:
        scene = build_scene(parse_scene_file(scene_path))
    structure, params = scene.structure, scene.params
    # march backend for the frozen value passes inside the jnp/banded paths
    # ("auto" = Pallas kernels on TPU); forward values are backend-invariant
    march_backend = os.environ.get("BENCH_MARCH", "auto")
    # Instanced step clamp (config.py RenderConfig.step_clamp): the
    # documented instanced fast path; BENCH_CLAMP=none for exact.
    clamp_env = os.environ.get("BENCH_CLAMP", "2.0")
    step_clamp = None if clamp_env.lower() in ("", "none", "0") else float(
        clamp_env
    )
    # envelope in fwd mode too: forward values are bitwise identical to
    # "exact" (tests/test_shadow_envelope.py) and the frozen shadow march
    # runs as a Pallas kernel instead of a full reverse-differentiable scan
    # BENCH_SHADOW_CULL=0 disables the (value-exact) shadow segment cull
    # for A/B measurement (config.py shadow_cull)
    shadow_cull = os.environ.get("BENCH_SHADOW_CULL", "1") == "1"
    # BENCH_SCRATCH_WINDOW=0 disables the (value-exact) moving chunk
    # window over the scratch table for A/B (config.py scratch_window)
    scratch_window = os.environ.get("BENCH_SCRATCH_WINDOW", "1") == "1"
    cfg = RenderConfig(
        shadow_grad=shadow_grad,
        antialias=antialias,
        march_backend=march_backend,
        step_clamp=step_clamp if structure.instanced else None,
        shadow_cull=shadow_cull,
        scratch_window=scratch_window,
    )
    # decomposition hooks (values change; timing-only A/B):
    # BENCH_SHADOW_STEPS / BENCH_MAX_STEPS cap the loops, BENCH_SCRATCH_ROWS
    # resizes the scratch table
    if os.environ.get("BENCH_SHADOW_STEPS"):
        cfg = cfg.replace(shadow_steps=int(os.environ["BENCH_SHADOW_STEPS"]))
    if os.environ.get("BENCH_MAX_STEPS"):
        cfg = cfg.replace(max_steps=int(os.environ["BENCH_MAX_STEPS"]))
    if os.environ.get("BENCH_SCRATCH_ROWS"):
        cfg = cfg.replace(
            shadow_scratch=int(os.environ["BENCH_SCRATCH_ROWS"])
        )

    # Default to the fused Pallas tier on TPU for BOTH modes (fwd: the fused
    # forward renderer; fwdbwd: the custom_vjp training kernels); jnp
    # elsewhere. resolve_march_backend respects jax_default_device — under
    # the axon plugin jax.default_backend() says "tpu" even on CPU-pinned
    # runs, which would otherwise build non-interpret Pallas kernels on CPU.
    from loltracer_tpu.render.backend import resolve_march_backend

    backend = os.environ.get(
        "BENCH_BACKEND",
        "pallas" if resolve_march_backend("auto") == "pallas" else "jnp",
    )

    # Outputs are reduced to scalars ON DEVICE so the timing measures the
    # render/backward computation, not the 24MB image transfer through the
    # axon tunnel. XLA still executes the full pipeline to produce the
    # reductions.
    if structure.instanced and backend != "pallas":
        # banded rendering bounds the [pixels, object_block] temporaries;
        # the march/shadow value passes inside each band go through the
        # instanced Pallas kernels when march_backend resolves to pallas
        from loltracer_tpu.render.backend import resolve_march_backend
        from loltracer_tpu.render.jnp_renderer import render_image_banded

        backend = f"banded-{resolve_march_backend(march_backend)}-march"
        band_rows = int(os.environ.get("BENCH_BAND", 16))

        def _render(p):
            return render_image_banded(
                structure, p, height, width, cfg, band_rows=band_rows
            )

    else:

        def _render(p):
            return render_image(structure, p, height, width, cfg)

    if mode == "fwd" and backend == "pallas" and structure.instanced:
        # fused instanced forward: whole pipeline over the windowed
        # traversal (render/pallas_train.make_instanced_renderer);
        # BENCH_REGROUP=1 selects the shadow-ray 3-D regrouped pipeline
        # (render/pallas_regroup.py) for A/B measurement
        if os.environ.get("BENCH_REGROUP", "0") == "1":
            from loltracer_tpu.render.pallas_regroup import (
                make_instanced_renderer_regrouped as make_instanced_renderer,
            )

            backend = "pallas-instanced-regrouped"
        else:
            from loltracer_tpu.render.pallas_train import (
                make_instanced_renderer,
            )

            backend = "pallas-fused-instanced"
        r = make_instanced_renderer(structure, height, width, cfg)
        fn = jax.jit(lambda p: jnp.sum(r(p)))
    elif mode == "fwd" and backend == "pallas":
        from loltracer_tpu.render.pallas_renderer import make_pallas_renderer

        r = make_pallas_renderer(structure, height, width, cfg)
        fn = jax.jit(lambda p: jnp.sum(r(p)))
    elif mode == "fwd":
        fn = jax.jit(lambda p: jnp.sum(_render(p)))
    else:
        if backend == "pallas" and structure.instanced:
            # fused instanced differentiable tier: custom_vjp with the
            # record/replay/scatter backward (render/pallas_train.py)
            from loltracer_tpu.render.pallas_train import (
                make_instanced_training_renderer,
            )

            backend = "pallas-fused-instanced"
            _render = make_instanced_training_renderer(
                structure, height, width, cfg
            )
        elif backend == "pallas":
            # the fused differentiable tier: custom_vjp around the fused
            # forward kernel + the re-attachment backward kernel
            # (render/pallas_train.py)
            from loltracer_tpu.render.pallas_train import (
                make_training_renderer,
            )

            _render = make_training_renderer(structure, height, width, cfg)

        def loss(p):
            img = _render(p)
            return jnp.mean(img * img)

        def both(p):
            l, g = jax.value_and_grad(loss)(p)
            gnorm = sum(
                jnp.sum(x * x) for x in jax.tree_util.tree_leaves(g)
            )
            # ONE fused scalar: each fetched leaf costs a full host round
            # trip through the axon tunnel (~20 ms, measured — see
            # PERF.md), which is measurement noise, not render time
            return l + gnorm

        fn = jax.jit(both)

    # Amortize the per-call tunnel latency: one fetch through the axon
    # tunnel costs ~20-100 ms (and varies by the minute — PERF.md
    # "weather"), which at ~25 ms of device time per 1080p frame was
    # billing up to HALF the measured wall to the network. Chain K frames
    # behind one fetch, with a value dependency through cam_fov (+0.0 *
    # previous result) so XLA cannot CSE the repeated renders; wall =
    # K * device + 1 fetch. K=1 restores the old protocol.
    frames_env = os.environ.get("BENCH_FRAMES_PER_FETCH", "auto")
    if frames_env == "auto":
        # instanced frames run seconds each; amortization is pointless
        frames = 1 if structure.instanced else 8
    else:
        frames = int(frames_env)

    if frames > 1:
        import dataclasses

        import jax.numpy as _jnp

        inner = fn

        def chained(p):
            acc = _jnp.float32(0.0)
            for _ in range(frames):
                q = dataclasses.replace(
                    p, cam_fov=p.cam_fov + 0.0 * acc
                )
                acc = acc + inner(q)
            return acc

        fn = jax.jit(chained)

    def fetch(out):
        # force materialization on the host: through the axon TPU tunnel,
        # block_until_ready returns before execution finishes, so timing
        # must fetch actual (scalar) values
        return jax.tree_util.tree_map(np.asarray, out)

    # compile + warmup
    fetch(fn(params))

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(params))
        times.append(time.perf_counter() - t0)

    best = min(times)
    rays = height * width * frames
    rays_per_s = rays / best

    tags = ""
    if frames > 1:
        tags += f" frames_per_fetch={frames}"
    if mode == "fwdbwd":
        tags += f" shadow_grad={shadow_grad}"
    if antialias:
        tags += " aa"
    if structure.instanced and step_clamp is not None:
        tags += f" clamp={step_clamp:g}"
    result = {
        "metric": f"rays/s/chip {mode}/{backend} {os.path.basename(scene_path)} "
        f"{width}x{height}{tags}",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        # measured all-core CPU baseline on THIS machine (BASELINE.md;
        # native/cpu_baseline.c, 2 threads)
        "vs_baseline": round(rays_per_s / 518186.3, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
