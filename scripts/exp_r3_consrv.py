"""Round-3: conservative row-interval cluster survivor counts.

The v5 build can only afford conservative (interval-arithmetic) tests at
cluster granularity. Measures survivors/row for K in {8,16,32} on the
config-3 camera and octant-Morton-sorted bounce rays, with per-lane maxt
pre-capped at the scene-box exit. Compare to exact listed counts from
exp_r3_footprint2 (e.g. bounce K=8 exact 64.7/row) to get the inflation
factor a cheap build pays.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mitsuba_tpu.render.scene import textured_mesh_scene
from mitsuba_tpu.render.clusters import build_mt_tables, cut_clusters
from mitsuba_tpu.render.bvh import build_bvh
from mitsuba_tpu.ops.worklist_pallas import (
    _interval_slab, _pack_rays, _row_intervals,
)
from mitsuba_tpu.integrators.path import pixel_morton_perm
from scripts.exp_r3_twopass import bounce_rays, sort_oct_morton


def main():
    scene = textured_mesh_scene(1024, 1024, backend="cluster")
    geom = scene.geom
    n = 1024 * 1024
    sbmin = np.asarray(geom.bvh_min[0])
    sbmax = np.asarray(geom.bvh_max[0])
    v0 = np.asarray(geom.v0)
    e1 = np.asarray(geom.e1)
    e2 = np.asarray(geom.e2)
    tris = np.stack([v0, v0 + e1, v0 + e2], 1)
    f = np.arange(tris.shape[0] * 3).reshape(-1, 3)
    bvh = build_bvh(tris.reshape(-1, 3), f)
    p = bvh.perm
    v0p, e1p, e2p = v0[p], e1[p], e2[p]

    lane = jnp.arange(n)
    perm = jnp.asarray(pixel_morton_perm(1024, 1024))
    pid = perm[lane]
    px = (pid % 1024).astype(jnp.float32) / 1024
    py = (pid // 1024).astype(jnp.float32) / 1024
    cam = scene.camera.sample_ray(jnp.stack([px, py], -1))
    o_b, d_b = bounce_rays(scene, n, 1024, 1024)
    order = sort_oct_morton(o_b, d_b, sbmin, sbmax)
    o_s = jnp.asarray(o_b[order])
    d_s = jnp.asarray(d_b[order])
    mint = jnp.full(n, 1e-3)

    @jax.jit
    def exit_t(o, d):
        inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 3e38)
        t0 = (jnp.asarray(sbmin)[None] - o) * inv
        t1 = (jnp.asarray(sbmax)[None] - o) * inv
        return jnp.maximum(jnp.min(jnp.maximum(t0, t1), -1), 0.0) * 1.0001

    @jax.jit
    def counts(rays, bn, bx):
        ctx = _row_intervals(rays)
        olo, ohi, ilo, ihi, spans, mt_hi = ctx
        n_rows = rays.shape[0]
        B = bn.shape[0]
        hit, tn = _interval_slab(
            jnp.broadcast_to(bn[None], (n_rows, B, 3)),
            jnp.broadcast_to(bx[None], (n_rows, B, 3)),
            olo, ohi, ilo, ihi, spans, mt_hi)
        return hit.sum(-1)

    for name, (o, d) in (("camera", (cam.o, cam.d)), ("bounce", (o_s, d_s))):
        mx = exit_t(o, d)
        rays, _, n_rows = _pack_rays(o, d, mint, mx)
        for K in (8, 16, 32):
            ranges = cut_clusters(bvh.first, bvh.count, bvh.skip,
                                  v0p.shape[0], max_k=K)
            mt = build_mt_tables(v0p, e1p, e2p, ranges, k=K)
            w = []
            bn = jnp.asarray(mt.bmin)
            bx = jnp.asarray(mt.bmax)
            step = 2048
            for s in range(0, n_rows, step):
                w.append(np.asarray(counts(rays[s:s + step], bn, bx)))
            w = np.concatenate(w)
            mt_ms = w.mean() * 68 * (max(K, 8) / 8) * 8192 / 0.94e9 * 1e3
            print(f"{name} K={K:2d}: conservative survivors/row mean "
                  f"{w.mean():7.1f} p95 {np.percentile(w,95):6.0f} max "
                  f"{w.max():5d} -> all-MT {mt_ms:6.1f} ms/1M", flush=True)


if __name__ == "__main__":
    main()
