"""Worker for the two-process jax.distributed loopback test.

Launched twice by tests/test_distributed.py with LOLTRACE_COORDINATOR /
LOLTRACE_NUM_PROCESSES / LOLTRACE_PROCESS_ID pointing at localhost: each
process contributes 4 faked CPU devices, builds the global (hosts, chips)
mesh, runs the row-sharded renderer and one sharded train step, and checks
the results against a purely LOCAL single-device computation — proving the
cross-process collectives (gloo over loopback, the DCN stand-in) change
nothing. Prints one JSON line on success."""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import numpy as np


def main():
    import jax

    from loltracer_tpu.parallel import maybe_initialize

    assert maybe_initialize(), "worker requires LOLTRACE_COORDINATOR"
    assert jax.process_count() == 2, jax.process_count()

    jax.config.update("jax_default_device", jax.local_devices()[0])
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )

    import jax.numpy as jnp
    import optax

    from loltracer_tpu.config import RenderConfig
    from loltracer_tpu.lol import parse_scene_file
    from loltracer_tpu.opt import masked_optimizer
    from loltracer_tpu.parallel import make_mesh_2d, make_sharded_train_step
    from loltracer_tpu.parallel.sharded import make_sharded_loss
    from loltracer_tpu.render.jnp_renderer import render_image
    from loltracer_tpu.scene import build_scene

    scene = build_scene(
        parse_scene_file(
            os.path.join(
                os.path.dirname(__file__), "..", "examples", "scene3.lol"
            )
        )
    )
    H, W = 16, 64
    cfg = RenderConfig(antialias=True)

    mesh = make_mesh_2d()
    assert mesh.devices.shape == (2, 4), mesh.devices.shape

    # local single-device reference (no mesh, no collectives)
    target = np.asarray(
        jax.jit(
            lambda p: render_image(scene.structure, p, H, W, cfg)
        )(scene.params)
    )

    # sharded loss across both processes must match the local loss
    loss_fn = make_sharded_loss(scene.structure, mesh, H, W, cfg)
    sharded_loss = float(jax.jit(loss_fn)(scene.params, jnp.zeros_like(
        jnp.asarray(target)
    )))
    local_loss = float(np.mean(target**2))
    assert abs(sharded_loss - local_loss) < 1e-6, (sharded_loss, local_loss)

    # one sharded train step: loss against the rendered target is ~0, and
    # the replicated parameter update must be finite and identical across
    # processes (checked implicitly: both processes assert the same values)
    optimizer = masked_optimizer(
        optax.adam(1e-2), scene.params, ("sphere_point",)
    )
    step = make_sharded_train_step(
        scene.structure, mesh, H, W, optimizer, cfg
    )
    state = optimizer.init(scene.params)
    params2, state, loss0 = step(
        scene.params, state, jnp.asarray(target)
    )
    loss0 = float(loss0)
    assert loss0 < 1e-10, loss0
    leaves = jax.tree_util.tree_leaves(params2)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    print(
        json.dumps(
            {
                "process": jax.process_index(),
                "devices": len(jax.devices()),
                "sharded_loss": sharded_loss,
                "local_loss": local_loss,
                "step_loss": loss0,
                "ok": True,
            }
        )
    )


if __name__ == "__main__":
    main()
