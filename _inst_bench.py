import time, os, numpy as np, jax, jax.numpy as jnp
from loltracer_tpu.utils.cache import enable_cache
enable_cache()
from loltracer_tpu.config import RenderConfig
from loltracer_tpu.scenes import instanced_spheres
from loltracer_tpu.render.pallas_train import make_instanced_renderer
scene = instanced_spheres(n=10000)
H,W=1080,1920
cfg = RenderConfig(step_clamp=2.0)
if os.environ.get("SSC"): cfg = cfg.replace(shadow_step_clamp=float(os.environ["SSC"]))
r = make_instanced_renderer(scene.structure, H, W, cfg)
fn = jax.jit(lambda p: jnp.sum(r(p)))
np.asarray(fn(scene.params))
ts=[]
for _ in range(3):
    t0=time.perf_counter(); np.asarray(fn(scene.params)); ts.append(time.perf_counter()-t0)
tag=os.environ.get("TAG","run")
print(f"{tag:40s} {min(ts)*1000:8.0f} ms  {H*W/min(ts)/1e3:7.1f} krays/s")
