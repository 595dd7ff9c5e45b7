"""TPU experiment: v2 work-list VPU-MT intersector vs v1 cluster sweep.

Correctness: 64k camera rays vs v1 (already validated vs packet-BVH).
Perf: 1M closest hits camera / incoherent-sorted / unsorted; any-hit.
Also reports cull/list stats and the overflow flag.
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

from mitsuba_tpu.render.scene import textured_mesh_scene
from mitsuba_tpu.render.clusters import build_mt_tables, cut_clusters
from mitsuba_tpu.render.bvh import build_bvh
from mitsuba_tpu.ops import cluster_pallas as cp
from mitsuba_tpu.ops import worklist_pallas as wp


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    scene = textured_mesh_scene(256, 256, backend="cluster")
    geom = scene.geom
    print("tris:", geom.n_tris)

    # v2 tables from the same (already BVH-ordered) triangle soup
    v0 = np.asarray(geom.v0)
    e1 = np.asarray(geom.e1)
    e2 = np.asarray(geom.e2)
    bvh = None
    # triangles in GeometryTables are already permuted into BVH order, and
    # the flat cluster ranges were cut from the same skip-link BVH -- reuse
    # cut_clusters on a rebuilt BVH over the *ordered* soup
    f = np.arange(v0.shape[0] * 3, dtype=np.int32).reshape(-1, 3)
    verts = np.concatenate([v0, v0 + e1, v0 + e2], axis=1).reshape(-1, 3)
    bvh = build_bvh(verts, f)
    perm = np.asarray(bvh.perm)
    ranges = cut_clusters(np.asarray(bvh.first), np.asarray(bvh.count),
                          np.asarray(bvh.skip), f.shape[0])
    import os
    K_CL = int(os.environ.get("K_CL", "32"))
    ranges = cut_clusters(np.asarray(bvh.first), np.asarray(bvh.count),
                          np.asarray(bvh.skip), f.shape[0], max_k=K_CL)
    mt = build_mt_tables(v0[perm], e1[perm], e2[perm], ranges, k=K_CL)
    print("K_CL:", K_CL, "clusters:", mt.tri.shape[0])
    geom_cl = dict(tri=jnp.asarray(mt.tri),
                   tri_start=jnp.asarray(mt.tri_start),
                   bmin=jnp.asarray(mt.bmin), bmax=jnp.asarray(mt.bmax),
                   sc_bmin=jnp.asarray(mt.sc_bmin),
                   sc_bmax=jnp.asarray(mt.sc_bmax))
    perm_j = jnp.asarray(perm)

    n = 1024 * 1024
    w = h = 1024
    lane = jnp.arange(n)
    px = (lane % w).astype(jnp.float32) / w
    py = (lane // w).astype(jnp.float32) / h
    uv = jnp.stack([px, py], -1)
    ray = scene.camera.sample_ray(uv)
    mint = jnp.full(n, 1e-4)
    maxt = jnp.full(n, 1e9)

    # correctness vs v1 on a CONTIGUOUS 64k block (strided subsets make
    # rows artificially wide -> overflow -> meaningless comparison)
    sel = slice(256 * 1024, 256 * 1024 + 64 * 1024)
    ro, rd, rmn, rmx = ray.o[sel], ray.d[sel], mint[sel], maxt[sel]
    t1, u1, v1_, p1, ok1 = cp.cluster_closest(
        geom.cluster_tables, ro, rd, rmn, rmx)
    t2, u2, v2_, p2, ok2, ovf = wp.wl_closest(geom_cl, ro, rd, rmn, rmx)
    p2g = jnp.where(ok2, perm_j[jnp.maximum(p2, 0)], -1)
    ok1n, ok2n = np.asarray(ok1), np.asarray(ok2)
    print("overflow rows:", float(jnp.mean(ovf.astype(jnp.float32))))
    print("hit agree:", (ok1n == ok2n).mean(), "hits v1:", ok1n.mean(),
          "v2:", ok2n.mean())
    both = ok1n & ok2n
    dt = np.abs(np.asarray(t1)[both] - np.asarray(t2)[both])
    rel = dt / np.maximum(np.asarray(t2)[both], 1e-6)
    print("t rel err: max", rel.max(), "mean", rel.mean())
    pm = (np.asarray(p2g)[both] == np.asarray(p1)[both]).mean()
    print("prim agree:", pm)

    occ1 = cp.cluster_any(geom.cluster_tables, ro, rd, rmn,
                          jnp.full_like(rmx, 2.0))
    occ2, _ = wp.wl_any(geom_cl, ro, rd, rmn, jnp.full_like(rmx, 2.0))
    print("any agree:", (np.asarray(occ1) == np.asarray(occ2)).mean())

    def bench(name, fn, *args, rounds=3):
        out = fn(*args)
        sync(out[0])
        best = 1e9
        for _ in range(rounds):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e3:.1f} ms -> {n/best/1e6:.1f} Mrays/s",
              flush=True)
        return best

    @jax.jit
    def run_v2(o, d, mint, maxt, salt):
        t, u, v, p, ok, _ = wp.wl_closest(geom_cl, o + salt * 0.0, d,
                                          mint, maxt)
        return (jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)),)

    @jax.jit
    def run_v2_any(o, d, mint, maxt, salt):
        occ, _ = wp.wl_any(geom_cl, o + salt * 0.0, d, mint, maxt)
        return (jnp.sum(occ.astype(jnp.float32)),)

    @jax.jit
    def lists_only(o, d, mint, maxt, salt):
        rays, _, n_rows = wp._pack_rays(o + salt * 0.0, d, mint, maxt)
        items, total, overflow = wp.build_worklist(
            rays, geom_cl["bmin"], geom_cl["bmax"],
            geom_cl["sc_bmin"], geom_cl["sc_bmax"], n_rows * 16, 24)
        return (total.astype(jnp.float32), total,
                jnp.sum(overflow.astype(jnp.int32)))

    from mitsuba_tpu.integrators.path import _morton_keys as _mk
    ckeys = _mk(ray.o, ray.d, jnp.asarray(np.asarray(geom.bvh_min[0])),
                jnp.asarray(np.asarray(geom.bvh_max[0])))
    corder = jnp.argsort(ckeys)
    cam_o, cam_d = ray.o[corder], ray.d[corder]

    salt = jnp.zeros(())
    tot = lists_only(cam_o, cam_d, mint, maxt, salt)
    print("morton-camera worklist total:", int(tot[1]),
          "overflow rows:", int(tot[2]))
    tot = lists_only(ray.o, ray.d, mint, maxt, salt)
    print("camera worklist total:", int(tot[1]), "cap:", (n // 128) * 16,
          "overflow rows:", int(tot[2]))
    bench("v2 lists-only camera 1M", lists_only, ray.o, ray.d, mint, maxt,
          salt)
    bench("v2 closest camera-scanline 1M", run_v2, ray.o, ray.d, mint,
          maxt, salt)
    bench("v2 closest camera-morton 1M", run_v2, cam_o, cam_d, mint, maxt,
          salt)
    bench("v2 any camera-morton 1M", run_v2_any, cam_o, cam_d, mint, maxt,
          salt)

    # incoherent rays
    rng = np.random.default_rng(0)
    bmin = np.asarray(geom.bvh_min[0])
    bmax = np.asarray(geom.bvh_max[0])
    o_r = rng.uniform(0, 1, (n, 3)).astype(np.float32) * (bmax - bmin) + bmin
    d_r = rng.normal(size=(n, 3)).astype(np.float32)
    d_r /= np.linalg.norm(d_r, axis=1, keepdims=True)
    o_r = jnp.asarray(o_r)
    d_r = jnp.asarray(d_r)

    from mitsuba_tpu.integrators.path import _morton_keys
    keys = _morton_keys(o_r, d_r, jnp.asarray(bmin), jnp.asarray(bmax))
    order = jnp.argsort(keys)
    o_s, d_s = o_r[order], d_r[order]
    # octant-aware sort: direction octant as top bits
    oct_ = ((d_r[:, 0] > 0).astype(jnp.uint32)
            + 2 * (d_r[:, 1] > 0).astype(jnp.uint32)
            + 4 * (d_r[:, 2] > 0).astype(jnp.uint32))
    keys_o = keys.astype(jnp.uint32) // 8 + oct_ * (2 ** 29)
    order_o = jnp.argsort(keys_o)
    o_so, d_so = o_r[order_o], d_r[order_o]

    tot = lists_only(o_s, d_s, mint, maxt, salt)
    print("sorted-incoherent worklist total:", int(tot[1]),
          "overflow rows:", int(tot[2]))
    tot = lists_only(o_so, d_so, mint, maxt, salt)
    print("octant-sorted worklist total:", int(tot[1]),
          "overflow rows:", int(tot[2]))
    bench("v2 closest morton-sorted 1M", run_v2, o_s, d_s, mint, maxt, salt)
    bench("v2 closest octant-sorted 1M", run_v2, o_so, d_so, mint, maxt,
          salt)
    bench("v2 closest unsorted 1M", run_v2, o_r, d_r, mint, maxt, salt)


if __name__ == "__main__":
    main()
