"""Round-3 footprint sim part 2: cluster size sweep + uncapped lists.

For K in {32, 16, 8} (cluster max tris), measures per-128-row:
  - walked  = union over lanes of {c : slab_hit, tn <= min(true_t, exit)}
    (what a perfect ordered early-exit kernel MTs)
  - listed  = union over lanes of {c : slab_hit, tn <= exit}
    (what an exact build-time cull can produce — behind-hit clusters
    included; bounds SMEM list length + scalar scan overhead)
Implied MT ms/1M at 270 cy/cluster-row (measured _mt_chunks rate,
4096 pairs/270cy) scaled by K/32, +40 cy/listed-entry scan overhead,
940 MHz.
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
from mitsuba_tpu.ops import stream_pallas as sp
from mitsuba_tpu.integrators.path import pixel_morton_perm
from scripts.exp_r3_twopass import bounce_rays, sort_oct_morton


def row_union_counts(o, d, mint, t_cap, bmin, bmax):
    n = o.shape[0]
    C = bmin.shape[0]
    chunk = 65536
    outs = []

    @jax.jit
    def masks(o_c, d_c, mn_c, ts_c):
        inv = jnp.where(jnp.abs(d_c) > 1e-12, 1.0 / d_c, 3e38)
        t0 = (bmin[None] - o_c[:, None]) * inv[:, None]
        t1 = (bmax[None] - o_c[:, None]) * inv[:, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        tn = jnp.maximum(tn, mn_c[:, None])
        hit = (tn <= tf) & (tn <= ts_c[:, None])
        return hit.reshape(-1, 128, C).any(1).sum(-1)

    for s in range(0, n, chunk):
        outs.append(np.asarray(masks(o[s:s + chunk], d[s:s + chunk],
                                     mint[s:s + chunk], t_cap[s:s + chunk])))
    return np.concatenate(outs)


def main():
    scene = textured_mesh_scene(1024, 1024, backend="cluster")
    geom = scene.geom
    st = geom.st_tables
    n = 1024 * 1024
    sbmin = np.asarray(geom.bvh_min[0])
    sbmax = np.asarray(geom.bvh_max[0])

    # rebuild the raw soup in BVH order to re-cut clusters at several K
    v0 = np.asarray(geom.v0)
    e1 = np.asarray(geom.e1)
    e2 = np.asarray(geom.e2)
    tris = np.stack([v0, v0 + e1, v0 + e2], 1)
    # re-derive BVH over the already-permuted soup (identity-ish perm)
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
    maxt = jnp.full(n, 1e9)

    @jax.jit
    def exit_t(o, d):
        inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 3e38)
        t0 = (jnp.asarray(sbmin)[None] - o) * inv
        t1 = (jnp.asarray(sbmax)[None] - o) * inv
        return jnp.maximum(jnp.min(jnp.maximum(t0, t1), -1), 0.0)

    rays = {}
    for name, (o, d) in (("camera", (cam.o, cam.d)), ("bounce", (o_s, d_s))):
        t, _u, _v, _p, ok = jax.jit(
            lambda o, d: sp.stream_closest(st, o, d, mint, maxt))(o, d)
        tex = exit_t(o, d)
        t_set = jnp.where(ok, jnp.minimum(t * 1.0001, tex), tex)
        rays[name] = (np.asarray(o), np.asarray(d), np.asarray(t_set),
                      np.asarray(tex))

    mint_np = np.asarray(mint)
    for K in (32, 16, 8):
        ranges = cut_clusters(bvh.first, bvh.count, bvh.skip,
                              v0p.shape[0], max_k=K)
        mt = build_mt_tables(v0p, e1p, e2p, ranges, k=K)
        bn = jnp.asarray(mt.bmin)
        bx = jnp.asarray(mt.bmax)
        C = mt.bmin.shape[0]
        for name in ("camera", "bounce"):
            o, d, t_set, tex = rays[name]
            walked = row_union_counts(o, d, mint_np, t_set, bn, bx)
            listed = row_union_counts(o, d, mint_np, tex, bn, bx)
            mt_ms = walked.mean() * 270 * (K / 32) * 8192 / 0.94e9 * 1e3
            scan_ms = listed.mean() * 40 * 8192 / 0.94e9 * 1e3
            tot = mt_ms + scan_ms
            print(f"K={K:2d} C={C:5d} {name}: walked {walked.mean():6.1f} "
                  f"(p95 {np.percentile(walked,95):5.0f}) listed "
                  f"{listed.mean():6.1f} (p95 {np.percentile(listed,95):5.0f}"
                  f" max {listed.max():4d}) -> MT {mt_ms:5.1f} + scan "
                  f"{scan_ms:4.1f} = {tot:5.1f} ms/1M "
                  f"({1e3/tot:5.1f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
