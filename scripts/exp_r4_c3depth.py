"""Round-4: config-3 full-render marginal cost per depth (the real
bounce body, not a replica): depth 1..5 at 512x512x4."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mitsuba_tpu.integrators.path import (PathConfig, path_trace,
                                          pixel_morton_perm)
from mitsuba_tpu.render.sampler import Sampler
from mitsuba_tpu.render.scene import textured_mesh_scene


def main():
    w = h = 512
    spp = 4
    scene = textured_mesh_scene(w, h, backend="cluster")
    n = w * h * spp
    lane = jnp.arange(n)
    perm = pixel_morton_perm(w, h)
    pixel_id = jnp.asarray(perm, jnp.int32)[lane // spp]
    sample_id = (lane % spp).astype(jnp.int32)

    prev = 0.0
    for depth in (1, 2, 3, 4, 5):
        cfg = PathConfig(max_depth=depth, spp=spp, remat=False)

        @jax.jit
        def run(scene):
            px = (pixel_id % w).astype(jnp.float32)
            py = (pixel_id // w).astype(jnp.float32)
            smp = Sampler(0, pixel_id, sample_id)
            off = smp.next_2d()
            uv = jnp.stack([(px + off[:, 0]) / w, (py + off[:, 1]) / h],
                           -1)
            ray = scene.camera.sample_ray(uv)
            L, aux = path_trace(scene, ray, smp, cfg)
            return L.sum(0)[0], aux["rays_traced"]

        out = run(scene)
        _ = float(out[0])
        best = 1e9
        for _i in range(3):
            t0 = time.perf_counter()
            out = run(scene)
            _ = float(out[0])
            best = min(best, time.perf_counter() - t0)
        rays = float(out[1])
        print(f"depth {depth}: {best*1e3:7.1f} ms  (+{(best-prev)*1e3:6.1f})"
              f"  rays={rays/1e6:.2f}M  {rays/best/1e6:5.2f} Mrays/s",
              flush=True)
        prev = best


if __name__ == "__main__":
    main()
