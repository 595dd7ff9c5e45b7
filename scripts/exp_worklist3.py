"""TPU experiment: v3 build phase costs (in-jit iterated, floor-free)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mitsuba_tpu.render.scene import textured_mesh_scene
from mitsuba_tpu.render.clusters import build_mt_tables, cut_clusters
from mitsuba_tpu.render.bvh import build_bvh
from mitsuba_tpu.ops import worklist_pallas as wp
from scripts.exp_worklist2 import pixel_morton_order


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    scene = textured_mesh_scene(256, 256, backend="cluster")
    geom = scene.geom
    v0 = np.asarray(geom.v0)
    e1 = np.asarray(geom.e1)
    e2 = np.asarray(geom.e2)
    f = np.arange(v0.shape[0] * 3, dtype=np.int32).reshape(-1, 3)
    verts = np.concatenate([v0, v0 + e1, v0 + e2], axis=1).reshape(-1, 3)
    bvh = build_bvh(verts, f)
    perm = np.asarray(bvh.perm)
    ranges = cut_clusters(np.asarray(bvh.first), np.asarray(bvh.count),
                          np.asarray(bvh.skip), f.shape[0], max_k=32)
    mt = build_mt_tables(v0[perm], e1[perm], e2[perm], ranges, k=32)
    geom_cl = dict(tri=jnp.asarray(mt.tri),
                   tri_start=jnp.asarray(mt.tri_start),
                   bmin=jnp.asarray(mt.bmin), bmax=jnp.asarray(mt.bmax),
                   sc_bmin=jnp.asarray(mt.sc_bmin),
                   sc_bmax=jnp.asarray(mt.sc_bmax))

    n = 1024 * 1024
    w = h = 1024
    lane = jnp.arange(n)
    px = (lane % w).astype(jnp.float32) / w
    py = (lane // w).astype(jnp.float32) / h
    ray = scene.camera.sample_ray(jnp.stack([px, py], -1))
    mo = jnp.asarray(pixel_morton_order(w, h))
    o, d = ray.o[mo], ray.d[mo]
    mint = jnp.full(n, 1e-4)
    maxt = jnp.full(n, 1e9)
    rays0, _, n_rows = wp._pack_rays(o, d, mint, maxt)

    cl_bmin, cl_bmax = geom_cl["bmin"], geom_cl["bmax"]
    sc_bmin, sc_bmax = geom_cl["sc_bmin"], geom_cl["sc_bmax"]
    C = cl_bmin.shape[0]
    c_s = sc_bmin.shape[0]
    l_sc = 16
    beam_s2 = 8
    c_s2 = -(-c_s // 8)
    padn = c_s2 * 8 - c_s
    s2_bmin = jnp.pad(sc_bmin, ((0, padn), (0, 0)),
                      constant_values=3e38).reshape(c_s2, 8, 3).min(axis=1)
    s2_bmax = jnp.pad(sc_bmax, ((0, padn), (0, 0)),
                      constant_values=-3e38).reshape(c_s2, 8, 3).max(axis=1)

    def stage_s2(rays):
        row_ctx = wp._row_intervals(rays)
        s2_ids = jnp.broadcast_to(
            jnp.arange(c_s2, dtype=jnp.int32)[None], (n_rows, c_s2))
        ids2, ok2, _, cnt2 = wp._beam_stage(
            jnp.broadcast_to(s2_bmin[None], (n_rows, c_s2, 3)),
            jnp.broadcast_to(s2_bmax[None], (n_rows, c_s2, 3)),
            s2_ids, jnp.ones((n_rows, c_s2), bool), beam_s2, row_ctx)
        return row_ctx, ids2, ok2

    def stage_sc(rays):
        row_ctx, ids2, ok2 = stage_s2(rays)
        sc_cand = (ids2[:, :, None] * 8
                   + jnp.arange(8, dtype=jnp.int32)[None, None, :]).reshape(
                       n_rows, beam_s2 * 8)
        sc_in = jnp.repeat(ok2, 8, axis=1) & (sc_cand < c_s)
        sc_cand = jnp.minimum(sc_cand, c_s - 1)
        gmin, gmax = sc_bmin[sc_cand], sc_bmax[sc_cand]
        return row_ctx, sc_cand, sc_in, gmin, gmax

    def stage_sc_full(rays):
        row_ctx, sc_cand, sc_in, gmin, gmax = stage_sc(rays)
        sc_ids, sc_ok, _, cnt = wp._beam_stage(gmin, gmax, sc_cand, sc_in,
                                               l_sc, row_ctx)
        return row_ctx, sc_ids, sc_ok

    def stage_cl_gather(rays):
        row_ctx, sc_ids, sc_ok = stage_sc_full(rays)
        cand = (sc_ids[:, :, None] * 8
                + jnp.arange(8, dtype=jnp.int32)[None, None, :]).reshape(
                    n_rows, l_sc * 8)
        cl_in = jnp.repeat(sc_ok, 8, axis=1) & (cand < C)
        cand = jnp.minimum(cand, C - 1)
        return row_ctx, cand, cl_in, cl_bmin[cand], cl_bmax[cand]

    def stage_cl_sort(rays):
        row_ctx, cand, cl_in, gmin, gmax = stage_cl_gather(rays)
        olo, ohi, ilo, ihi, spans, mt_hi = row_ctx
        hit_b, tn_b = wp._interval_slab(gmin, gmax, olo, ohi, ilo, ihi,
                                        spans, mt_hi)
        hit_b = hit_b & cl_in
        key_b = jnp.where(hit_b, tn_b, 3e38)
        key_s, order = jax.lax.sort_key_val(key_b, cand)
        return key_s, order

    probes = {
        "s2 stage": lambda r: (jnp.sum(stage_s2(r)[1]),),
        "sc gather": lambda r: (jnp.sum(stage_sc(r)[3]),),
        "sc stage": lambda r: (jnp.sum(stage_sc_full(r)[1]),),
        "cl gather": lambda r: (jnp.sum(stage_cl_gather(r)[3]),),
        "cl slab+sort": lambda r: (jnp.sum(stage_cl_sort(r)[1]),),
        "full build": lambda r: (wp.build_worklist(
            r, cl_bmin, cl_bmax, sc_bmin, sc_bmax,
            n_rows * 6, l_sc)[1].astype(jnp.float32),),
    }
    K_IT = 8
    for name, fn in probes.items():
        @jax.jit
        def rep(rays, _fn=fn):
            def step(salt, _):
                out = _fn(rays + salt * 0.0)
                return out[0].astype(jnp.float32) * 1e-30, None
            s, _ = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
            return s
        sync(rep(rays0))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            sync(rep(rays0))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e3/K_IT:.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
