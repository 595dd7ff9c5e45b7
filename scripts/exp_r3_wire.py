"""Round-3: v5 wired into the render path — correctness + throughput.

Renders config-3 (textured mesh, cluster backend) with the v5 exact-cull
dispatch vs the v3 work-list fallback dispatch and reports per-pixel
agreement and Mrays/s at bench settings.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mitsuba_tpu.integrators.path import PathConfig, path_trace, pixel_morton_perm
from mitsuba_tpu.render.sampler import Sampler
from mitsuba_tpu.render.scene import textured_mesh_scene


def run(scene, w, h, spp, depth):
    n = w * h * spp
    lane = jnp.arange(n)
    perm = pixel_morton_perm(w, h)
    pixel_id = jnp.asarray(perm, jnp.int32)[lane // spp]
    sample_id = (lane % spp).astype(jnp.int32)
    cfg = PathConfig(max_depth=depth, spp=spp, remat=False)

    @jax.jit
    def f(scene):
        px = (pixel_id % w).astype(jnp.float32)
        py = (pixel_id // w).astype(jnp.float32)
        sampler = Sampler(0, pixel_id, sample_id)
        off = sampler.next_2d()
        uv = jnp.stack([(px + off[:, 0]) / w, (py + off[:, 1]) / h], -1)
        ray = scene.camera.sample_ray(uv)
        L, aux = path_trace(scene, ray, sampler, cfg)
        return L, aux["rays_traced"]

    L, rays = f(scene)
    jax.block_until_ready(L)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        L, rays = f(scene)
        jax.block_until_ready(L)
        best = min(best, time.perf_counter() - t0)
    return np.asarray(L), float(rays), best


def main():
    w = h = 256
    spp, depth = 4, 5
    scene = textured_mesh_scene(w, h, backend="cluster")

    os.environ["MTS_EXACT"] = "1"
    L1, rays, t1 = run(scene, w, h, spp, depth)
    print(f"v5 exact : {t1*1e3:8.1f} ms  {rays/t1/1e6:7.2f} Mrays/s", flush=True)

    os.environ["MTS_EXACT"] = "0"
    jax.clear_caches()
    L0, rays0, t0 = run(scene, w, h, spp, depth)
    print(f"v4 stream: {t0*1e3:8.1f} ms  {rays0/t0/1e6:7.2f} Mrays/s", flush=True)

    d = np.abs(L1 - L0)
    print("max|dL|", d.max(), "mean|dL|", d.mean(),
          "frac>1e-4", float((d > 1e-4).mean()), flush=True)


if __name__ == "__main__":
    main()
