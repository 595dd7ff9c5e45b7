"""Round-3: config-2 (specular cornell 512x512) ablation on the TPU.
Times the full step and variants to locate the 512^2-lane fixed costs."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mitsuba_tpu.integrators.path import PathConfig, path_trace, pixel_morton_perm
from mitsuba_tpu.render.sampler import Sampler
from mitsuba_tpu.render.scene import cornell_box_specular, cornell_box
from mitsuba_tpu.render.intersect import ray_intersect, ray_test

def timeit(fn, *a):
    out = fn(*a); jax.block_until_ready(out)
    _ = float(jnp.asarray(out).ravel()[0])
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        out = fn(*a)
        _ = float(jnp.asarray(out).ravel()[0])
        best = min(best, time.perf_counter()-t0)
    return best

def step_time(scene, depth, spp, w, h, label):
    n = w*h*spp
    lane = jnp.arange(n)
    perm = pixel_morton_perm(w, h)
    pixel_id = jnp.asarray(perm, jnp.int32)[lane // spp]
    sample_id = (lane % spp).astype(jnp.int32)
    cfg = PathConfig(max_depth=depth, spp=spp, remat=False)
    @jax.jit
    def run(scene):
        px = (pixel_id % w).astype(jnp.float32)
        py = (pixel_id // w).astype(jnp.float32)
        sampler = Sampler(0, pixel_id, sample_id)
        off = sampler.next_2d()
        uv = jnp.stack([(px+off[:,0])/w, (py+off[:,1])/h], -1)
        ray = scene.camera.sample_ray(uv)
        L, aux = path_trace(scene, ray, sampler, cfg)
        return L.sum(0)[0], aux["rays_traced"]
    t = timeit(lambda s: run(s)[0], scene)
    rays = float(run(scene)[1])
    print(f"{label:36s} {t*1e3:8.1f} ms  rays={rays/1e6:.2f}M  {rays/t/1e6:6.1f} Mrays/s", flush=True)
    return t

def isect_time(scene, w, h, spp, label, shadow=False):
    n = w*h*spp
    lane = jnp.arange(n)
    perm = pixel_morton_perm(w, h)
    pixel_id = jnp.asarray(perm, jnp.int32)[lane // spp]
    sample_id = (lane % spp).astype(jnp.int32)
    @jax.jit
    def run(scene):
        px = (pixel_id % w).astype(jnp.float32)
        py = (pixel_id // w).astype(jnp.float32)
        sampler = Sampler(0, pixel_id, sample_id)
        off = sampler.next_2d()
        uv = jnp.stack([(px+off[:,0])/w, (py+off[:,1])/h], -1)
        ray = scene.camera.sample_ray(uv)
        if shadow:
            return ray_test(scene.geom, ray).sum().astype(jnp.float32)
        its = ray_intersect(scene.geom, ray)
        return its.t.sum()
    t = timeit(run, scene)
    print(f"{label:36s} {t*1e3:8.1f} ms  ({n/t/1e6:6.1f} Mrays/s)", flush=True)
    return t

def main():
    w = h = 512; spp = 4; depth = 5
    s2 = cornell_box_specular(w, h, backend="auto")
    s1 = cornell_box(w, h, backend="brute")
    step_time(s2, depth, spp, w, h, "config-2 full depth-5")
    step_time(s1, depth, spp, w, h, "config-1-geom at 512x4 depth-5")
    # no-analytic variant of config-2 (sphere deleted)
    import dataclasses
    g = s2.geom
    g_noana = dataclasses.replace(g, sph_c=None, sph_r=None, sph_mid=None,
                                  sph_eid=None, sph_sid=None)
    s2_noana = dataclasses.replace(s2, geom=g_noana)
    step_time(s2_noana, depth, spp, w, h, "config-2 minus analytic sphere")
    isect_time(s2, w, h, spp, "camera closest (with sphere)")
    isect_time(s2_noana, w, h, spp, "camera closest (no sphere)")
    isect_time(s2, w, h, spp, "camera any-hit (with sphere)", shadow=True)
    step_time(s2, 1, spp, w, h, "config-2 depth-1")
    step_time(s2, 2, spp, w, h, "config-2 depth-2")
    step_time(s2, 3, spp, w, h, "config-2 depth-3")

if __name__ == "__main__":
    main()
