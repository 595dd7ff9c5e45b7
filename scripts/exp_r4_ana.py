"""Round-4: cost of the XLA analytic-sphere merge in config-2."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mitsuba_tpu.render.scene import cornell_box_specular
from mitsuba_tpu.render.intersect import (_merge_analytic, _sphere_closest,
                                          _analytic_any, ray_intersect)
from mitsuba_tpu.render.records import Ray
from mitsuba_tpu.integrators.path import pixel_morton_perm


def timed(f, *a, tag=""):
    out = f(*a)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        out = f(*a)
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"  {tag:28s}: {best*1e3:7.1f} ms", flush=True)
    return out


def main():
    w = h = 512
    spp = 4
    scene = cornell_box_specular(w, h, backend="auto")
    geom = scene.geom
    n = w * h * spp
    lane = jnp.arange(n)
    perm = jnp.asarray(pixel_morton_perm(w, h))
    pid = perm[lane // spp]
    px = (pid % w).astype(jnp.float32) / w
    py = (pid // w).astype(jnp.float32) / h
    cam = scene.camera.sample_ray(jnp.stack([px, py], -1))
    ray = Ray.make(cam.o, cam.d)

    full = jax.jit(lambda r: ray_intersect(geom, r))
    its = timed(full, ray, tag="ray_intersect full")

    quad = jax.jit(lambda r: _sphere_closest(geom, r))
    timed(quad, ray, tag="_sphere_closest only")

    mrg = jax.jit(lambda r, its: _merge_analytic(geom, r, its))
    timed(mrg, ray, its, tag="_merge_analytic")

    anyq = jax.jit(lambda r: _analytic_any(geom, r))
    timed(anyq, ray, tag="_analytic_any")


if __name__ == "__main__":
    main()
