"""TPU experiment: where does config-3 (textured bunny, cluster backend,
depth-5 path) actually spend its time?

Phases measured (all dependency-chained inside one jit, tunnel-floor-free):
  A. full render (bench.py config-3 accounting)
  B. full render WITHOUT per-bounce Morton re-sort (sort_rays=False)
  C. camera-only (depth-1, no NEE)
  D. standalone 1M-key argsort + inverse-perm (per-bounce sort cost)
  E. per-bounce worklist stats: items/row + overflow fraction for the
     closest and shadow wavefronts at each depth (post-octant-fix keys)
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

from mitsuba_tpu.integrators import PathConfig
from mitsuba_tpu.integrators.path import path_trace, pixel_morton_perm, \
    _morton_keys, _inverse_perm
from mitsuba_tpu.render.sampler import Sampler
from mitsuba_tpu.render.scene import textured_mesh_scene
from mitsuba_tpu.ops import worklist_pallas as wp


def timed(fn, *args, rounds=2):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    best = 1e9
    for _i in range(rounds):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def make_rays(scene, spp):
    w, h = scene.width, scene.height
    n = w * h * spp
    lane = jnp.arange(n)
    perm = pixel_morton_perm(w, h)
    pixel_id = jnp.asarray(perm, jnp.int32)[lane // spp]
    sample_id = (lane % spp).astype(jnp.int32)
    return pixel_id, sample_id, n


def render_time(scene, cfg, spp):
    pixel_id, sample_id, n = make_rays(scene, spp)
    w, h = scene.width, scene.height

    @jax.jit
    def run(scene, chain):
        px = (pixel_id % w).astype(jnp.float32)
        py = (pixel_id // w).astype(jnp.float32)
        sampler = Sampler(0, pixel_id + chain.astype(jnp.int32), sample_id)
        offset = sampler.next_2d()
        uv = jnp.stack([(px + offset[:, 0]) / w, (py + offset[:, 1]) / h], -1)
        ray = scene.camera.sample_ray(uv)
        L, aux = path_trace(scene, ray, sampler, cfg)
        return L.sum(axis=0), aux["rays_traced"]

    chain = jnp.zeros((), jnp.float32)
    s, rays = run(scene, chain)
    _ = float(s[0])
    rays_traced = float(rays)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        s, rays = run(scene, chain)
        _ = float(s[0])
        best = min(best, time.perf_counter() - t0)
    return rays_traced / best / 1e6, best, rays_traced


def main():
    import dataclasses

    scene = textured_mesh_scene(512, 512, backend="cluster")
    spp = 4

    cfg = PathConfig(max_depth=5, spp=spp, remat=False)
    m, t, r = render_time(scene, cfg, spp)
    print(f"A full depth5: {m:.1f} Mrays/s ({t*1e3:.0f} ms, {r/1e6:.1f} Mrays)",
          flush=True)

    cfg_oct = dataclasses.replace(cfg, sort_mode="octant")
    m, t, r = render_time(scene, cfg_oct, spp)
    print(f"B octant-mode depth5: {m:.1f} Mrays/s ({t*1e3:.0f} ms)",
          flush=True)

    cfg1 = PathConfig(max_depth=1, spp=spp, remat=False)
    m, t, r = render_time(scene, cfg1, spp)
    print(f"C camera-only: {m:.1f} Mrays/s ({t*1e3:.0f} ms, {r/1e6:.1f} Mrays)",
          flush=True)

    # D: standalone sort cost on 1M realistic keys
    n = 512 * 512 * spp
    o = jnp.asarray(np.random.RandomState(0).rand(n, 3), jnp.float32)
    d = jnp.asarray(np.random.RandomState(1).rand(n, 3) - 0.5, jnp.float32)
    bmin = scene.geom.bvh_min[0]
    bmax = scene.geom.bvh_max[0]

    @jax.jit
    def sort_once(o, d, salt):
        keys = _morton_keys(o + salt, d, bmin, bmax)
        order = jnp.argsort(keys)
        inv = _inverse_perm(order)
        return (order[0] + inv[0]).astype(jnp.float32)

    t = timed(sort_once, o, d, jnp.zeros(()))
    print(f"D one sort+inv of {n/1e6:.1f}M keys: {t*1e3:.2f} ms "
          f"(x2 per bounce x4 bounces)", flush=True)

    # E: per-bounce worklist stats on the real wavefront
    from mitsuba_tpu.core import warp
    from mitsuba_tpu.core import math as mm
    from mitsuba_tpu.render.intersect import ray_intersect
    from mitsuba_tpu.render.records import Ray

    pixel_id, sample_id, n = make_rays(scene, spp)
    w, h = scene.width, scene.height
    px = (pixel_id % w).astype(jnp.float32)
    py = (pixel_id // w).astype(jnp.float32)
    uv = jnp.stack([(px + 0.5) / w, (py + 0.5) / h], -1)
    ray = scene.camera.sample_ray(uv)
    o_c, d_c = ray.o, ray.d
    geom_cl = dict(scene.geom.wl_tables)
    mint = jnp.full(n, 1e-3)
    maxt = jnp.full(n, 1e9)

    @jax.jit
    def wl_stats(o, d):
        keys = _morton_keys(o, d, bmin, bmax)
        order = jnp.argsort(keys)
        o_s, d_s = o[order], d[order]
        rays, _, n_rows = wp._pack_rays(o_s, d_s, mint, maxt)
        items, total, overflow = wp.build_worklist(
            rays, geom_cl["bmin"], geom_cl["bmax"],
            geom_cl["sc_bmin"], geom_cl["sc_bmax"], n_rows * 24, 24)
        return total / n_rows, jnp.mean(overflow.astype(jnp.float32))

    o_b, d_b = o_c, d_c
    key = 11
    for depth in range(4):
        ipr, ovf = wl_stats(o_b, d_b)
        print(f"E depth {depth}: items/row={float(ipr):.1f} "
              f"overflow={float(ovf):.3f}", flush=True)
        its = ray_intersect(scene.geom, Ray.make(o_b, d_b))
        sampler = Sampler(key + depth, jnp.arange(n), jnp.zeros(n, jnp.int32))
        u2 = sampler.next_2d()
        d_loc = warp.square_to_cosine_hemisphere(u2)
        fr = mm.Frame.from_normal(its.sh_n)
        nd = fr.to_world(d_loc)
        o_b = jnp.where(its.valid[:, None], its.p + its.sh_n * 1e-3, o_b)
        d_b = jnp.where(its.valid[:, None], nd, d_b)


if __name__ == "__main__":
    main()
