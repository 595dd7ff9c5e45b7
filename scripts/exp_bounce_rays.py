"""TPU experiment: worklist behavior on REALISTIC bounce rays.

Synthesizes diffuse bounce rays (camera-hit origins + cosine directions
about the shading normal) for the config-2/3 scenes, then measures
worklist totals/overflow + closest-hit time under different sort keys:
  scanline / pixel-morton camera order (origins), octant-major vs
  position-major Morton sort.
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


def main():
    scene = textured_mesh_scene(1024, 1024, backend="cluster")
    geom = scene.geom
    n = 1024 * 1024
    w = h = 1024
    lane = jnp.arange(n)
    perm = jnp.asarray(pixel_morton_perm(w, h))
    pid = perm[lane]
    px = (pid % w).astype(jnp.float32) / w
    py = (pid // w).astype(jnp.float32) / h
    ray = scene.camera.sample_ray(jnp.stack([px, py], -1))
    mint = jnp.full(n, 1e-3)
    maxt = jnp.full(n, 1e9)

    @jax.jit
    def make_bounce(scene, ray):
        its = ray_intersect(scene.geom, ray)
        sampler = Sampler(7, jnp.arange(n), jnp.zeros(n, jnp.int32))
        u2 = sampler.next_2d()
        d_loc = warp.square_to_cosine_hemisphere(u2)
        fr = m.Frame.from_normal(its.sh_n)
        d = fr.to_world(d_loc)
        o = its.p + its.sh_n * 1e-3
        return o, d, its.valid

    o_b, d_b, valid = make_bounce(scene, Ray.make(ray.o, ray.d))
    o_b = np.asarray(o_b)
    d_b = np.asarray(d_b)
    valid = np.asarray(valid)
    print("bounce rays valid:", valid.mean(), flush=True)
    # keep only valid rays, duplicated to fill n lanes
    idx = np.where(valid)[0]
    take = np.resize(idx, n)
    o_b, d_b = o_b[take], d_b[take]

    bmin = np.asarray(scene.geom.bvh_min[0])
    bmax = np.asarray(scene.geom.bvh_max[0])

    def mkey(o, d, octant_major):
        q = np.clip((o - bmin) / np.maximum(bmax - bmin, 1e-6) * 1023, 0,
                    1023).astype(np.uint64)

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
        if octant_major:
            return (oc << np.uint64(30)) | mo
        return (mo << np.uint64(3)) | oc

    geom_cl = {k: v for k, v in scene.geom.wl_tables.items()}

    def lists_stats(o, d, l_sc, wf):
        rays, _, n_rows = wp._pack_rays(o, d, mint, maxt)
        items, total, overflow = wp.build_worklist(
            rays, geom_cl["bmin"], geom_cl["bmax"],
            geom_cl["sc_bmin"], geom_cl["sc_bmax"], n_rows * wf, l_sc)
        return total, jnp.mean(overflow.astype(jnp.float32))

    for name, omaj in (("pos-major", False), ("octant-major", True)):
        order = np.argsort(mkey(o_b, d_b, omaj), kind="stable")
        o_s = jnp.asarray(o_b[order])
        d_s = jnp.asarray(d_b[order])
        for l_sc in (16, 32):
            f = jax.jit(lambda o, d, l=l_sc: lists_stats(o, d, l, 24))
            tot, ovf = f(o_s, d_s)
            print(f"bounce {name} l_sc={l_sc}: items/row="
                  f"{float(tot)/8192:.1f} overflow={float(ovf):.3f}",
                  flush=True)

    # closest-hit timing on octant-major sorted bounce rays
    order = np.argsort(mkey(o_b, d_b, True), kind="stable")
    o_s = jnp.asarray(o_b[order])
    d_s = jnp.asarray(d_b[order])

    K_IT = 4
    for l_sc, wf in ((16, 8), (32, 16)):
        @jax.jit
        def rep(o, d, _l=l_sc, _w=wf):
            def step(salt, _):
                t, u, v, p, ok, ovf = wp.wl_closest(
                    geom_cl, o + salt * 0.0, d, mint, maxt,
                    w_factor=_w, l_sc=_l)
                return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)) * 1e-30, \
                    None
            s, _ = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
            return s
        sync(rep(o_s, d_s))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            sync(rep(o_s, d_s))
            best = min(best, time.perf_counter() - t0)
        print(f"bounce closest octant-major l_sc={l_sc} wf={wf}: "
              f"{best*1e3/K_IT:.1f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
