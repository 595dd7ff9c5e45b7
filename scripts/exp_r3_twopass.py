"""Round-3: two-pass work-list with cap refinement on bounce rays.

Pass 1 (narrow beams, truncated lists) finds candidate nearest hits
front-to-back; pass 2 re-runs with per-lane maxt capped at the found t
(x1.0001), which shortens every row frustum and should collapse the
S2/SC beam overflow. Measures overflow and time of each pass, with and
without re-sorting between passes (dead/miss lanes last).
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

from mitsuba_tpu.core import warp
from mitsuba_tpu.core import math as m
from mitsuba_tpu.render.scene import textured_mesh_scene
from mitsuba_tpu.render.intersect import ray_intersect
from mitsuba_tpu.render.records import Ray
from mitsuba_tpu.render.sampler import Sampler
from mitsuba_tpu.ops import worklist_pallas as wp
from mitsuba_tpu.integrators.path import pixel_morton_perm


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timed(f, *a, rounds=3):
    sync(f(*a))
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        sync(f(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def bounce_rays(scene, n, w, h):
    lane = jnp.arange(n)
    perm = jnp.asarray(pixel_morton_perm(w, h))
    pid = perm[lane]
    px = (pid % w).astype(jnp.float32) / w
    py = (pid // w).astype(jnp.float32) / h
    ray = scene.camera.sample_ray(jnp.stack([px, py], -1))

    @jax.jit
    def mk(scene, ray):
        its = ray_intersect(scene.geom, ray)
        sampler = Sampler(7, jnp.arange(n), jnp.zeros(n, jnp.int32))
        u2 = sampler.next_2d()
        d_loc = warp.square_to_cosine_hemisphere(u2)
        fr = m.Frame.from_normal(its.sh_n)
        d = fr.to_world(d_loc)
        o = its.p + its.sh_n * 1e-3
        return o, d, its.valid

    o_b, d_b, valid = mk(scene, Ray.make(ray.o, ray.d))
    o_b, d_b = np.asarray(o_b), np.asarray(d_b)
    idx = np.where(np.asarray(valid))[0]
    take = np.resize(idx, n)
    return o_b[take], d_b[take]


def sort_oct_morton(o, d, bmin, bmax):
    q = np.clip((o - bmin) / np.maximum(bmax - bmin, 1e-6) * 1023,
                0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << np.uint64(16))) & np.uint64(0x030000FF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x0300F00F)
        x = (x | (x << np.uint64(4))) & np.uint64(0x030C30C3)
        x = (x | (x << np.uint64(2))) & np.uint64(0x09249249)
        return x

    mo = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) \
        | (spread(q[:, 2]) << np.uint64(2))
    oc = ((d[:, 0] > 0).astype(np.uint64)
          + 2 * (d[:, 1] > 0).astype(np.uint64)
          + 4 * (d[:, 2] > 0).astype(np.uint64))
    return np.argsort((oc << np.uint64(30)) | mo, kind="stable")


def main():
    scene = textured_mesh_scene(1024, 1024, backend="cluster")
    geom = scene.geom
    n = 1024 * 1024
    o_b, d_b = bounce_rays(scene, n, 1024, 1024)
    bmin = np.asarray(geom.bvh_min[0])
    bmax = np.asarray(geom.bvh_max[0])
    order = sort_oct_morton(o_b, d_b, bmin, bmax)
    o_s = jnp.asarray(o_b[order])
    d_s = jnp.asarray(d_b[order])
    mint = jnp.full(n, 1e-3)
    maxt = jnp.full(n, 1e9)
    geom_cl = dict(geom.wl_tables)
    K_IT = 4

    def two_pass(o, d, mn, mx, p1, p2):
        t1, u1, v1, pr1, ok1, ovf1 = wp.wl_closest(
            geom_cl, o, d, mn, mx, w_factor=p1[1], l_sc=p1[0], beam_s2=16)
        lane_ovf = jnp.repeat(ovf1, wp.LANES)[:n]
        mx2 = jnp.where(ok1 & jnp.isfinite(t1), t1 * 1.0001, mx)
        mx2 = jnp.where(lane_ovf, mx2, -1.0)   # settled lanes trace nothing
        t2, u2, v2, pr2, ok2, ovf2 = wp.wl_closest(
            geom_cl, o, d, mn, mx2, w_factor=p2[1], l_sc=p2[0], beam_s2=16)
        take2 = lane_ovf & ok2 & (~ok1 | (t2 < t1))
        t = jnp.where(take2, t2, t1)
        ok = jnp.where(lane_ovf, ok1 | ok2, ok1)
        still = lane_ovf & jnp.repeat(ovf2, wp.LANES)[:n]
        return t, ok, ovf1, ovf2, still

    for p1, p2 in (((32, 32), (32, 16)),):
        @jax.jit
        def run(o, d):
            def step(s, _):
                t, ok, ovf1, ovf2, still = two_pass(
                    o + s * 0.0, d, mint, maxt, p1, p2)
                return (jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)) * 1e-30,
                        (jnp.mean(ovf1.astype(jnp.float32)),
                         jnp.mean(ovf2.astype(jnp.float32)),
                         jnp.mean(still.astype(jnp.float32))))
            s, aux = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
            return s, jax.tree_util.tree_map(lambda x: x[0], aux)

        t = timed(lambda o, d: run(o, d)[0], o_s, d_s)
        _, (f1, f2, fs) = run(o_s, d_s)
        print(f"two-pass p1={p1} p2={p2}: {t*1e3/K_IT:.1f} ms/1M  "
              f"ovf1={float(f1):.3f} ovf2={float(f2):.3f} "
              f"still={float(fs):.4f}", flush=True)


if __name__ == "__main__":
    main()
