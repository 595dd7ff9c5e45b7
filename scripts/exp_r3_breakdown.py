"""Round-3 experiment: config-3 time breakdown on realistic bounce rays.

Measures, on 1M diffuse bounce rays (bunny scene, octant-major sorted):
  1. packet-BVH fallback (bvh_pallas.bvh_closest) — the overflow path
  2. wl_closest at several (l_sc, w_factor) beam settings + overflow
  3. build_worklist alone (cull cost) at the same settings
All dependency-chained inside one jit (K_IT iterations) to dodge the
tunnel dispatch floor.
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
from mitsuba_tpu.ops import bvh_pallas as bp
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
    idx = np.where(valid)[0]
    take = np.resize(idx, n)
    o_b, d_b = o_b[take], d_b[take]

    bmin = np.asarray(geom.bvh_min[0])
    bmax = np.asarray(geom.bvh_max[0])

    def mkey(o, d):
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
        db = int(os.environ.get("MTS_DIR_BITS", "0"))
        if db == 0:
            return (oc << np.uint64(30)) | mo
        # sub-octant direction bits: quantize |d| per axis to db bits,
        # morton-interleave, place ABOVE the origin morton code
        lvl = (1 << db) - 1
        dq = np.clip(np.abs(d) * (lvl + 0.999), 0, lvl).astype(np.uint64)
        dm = np.zeros(d.shape[0], np.uint64)
        for b in range(db):
            for ax in range(3):
                dm |= (((dq[:, ax] >> np.uint64(b)) & np.uint64(1))
                       << np.uint64(3 * b + ax))
        return (oc << np.uint64(30 + 3 * db)) | (dm << np.uint64(30)) | mo

    order = np.argsort(mkey(o_b, d_b), kind="stable")
    o_s = jnp.asarray(o_b[order])
    d_s = jnp.asarray(d_b[order])
    geom_cl = {k: v for k, v in geom.wl_tables.items()}
    K_IT = 4

    # 1. packet-BVH fallback cost on 1M bounce rays (all active)
    @jax.jit
    def fb(o, d):
        def step(s, _):
            t, u, v, p, ok = bp.bvh_closest(
                geom.bvh_rows, geom.tri_rows, o + s * 0.0, d, mint, maxt,
                n_nodes=geom.bvh_min.shape[0], n_tris=geom.n_tris)
            return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)) * 1e-30, None
        s, _ = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
        return s

    t = 0.0 if True else timed(fb, o_s, d_s)
    print(f"1. packet-BVH fallback: {t*1e3/K_IT:.1f} ms/1M bounce rays",
          flush=True)

    # 2+3. wl_closest and build at several beams
    for l_sc, wf in ((32, 32), (48, 48)):
        @jax.jit
        def wl(o, d, _l=l_sc, _w=wf):
            def step(s, _):
                t, u, v, p, ok, ovf = wp.wl_closest(
                    geom_cl, o + s * 0.0, d, mint, maxt,
                    w_factor=_w, l_sc=_l, beam_s2=16)
                return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)) * 1e-30, \
                    jnp.mean(ovf.astype(jnp.float32))
            s, ov = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
            return s + 0.0 * ov[0], ov[0]

        @jax.jit
        def bld(o, d, _l=l_sc, _w=wf):
            rays, _, n_rows = wp._pack_rays(o, d, mint, maxt)

            def step(s, _):
                items, total, overflow = wp.build_worklist(
                    rays + s * 0.0, geom_cl["bmin"], geom_cl["bmax"],
                    geom_cl["sc_bmin"], geom_cl["sc_bmax"],
                    min(n_rows * _w, wp.MAX_ITEMS_PER_CALL), _l, 16)
                return (total.astype(jnp.float32) * 1e-30
                        + items[0].astype(jnp.float32) * 1e-30), total
            s, tot = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
            return s, tot[0]

        t_wl = timed(lambda o, d: wl(o, d)[0], o_s, d_s)
        _, ovf = wl(o_s, d_s)
        t_b = timed(lambda o, d: bld(o, d)[0], o_s, d_s)
        _, tot = bld(o_s, d_s)
        print(f"2. wl_closest l_sc={l_sc} wf={wf}: {t_wl*1e3/K_IT:.1f} ms "
              f"(build {t_b*1e3/K_IT:.1f} ms) overflow={float(ovf):.3f} "
              f"items/row={float(tot)/8192:.1f}", flush=True)


if __name__ == "__main__":
    main()
