"""TPU experiment: cluster streaming intersector vs packet-BVH on the bunny.

Correctness: 64k camera rays cluster vs packet-BVH closest hit.
Perf: 1M closest hits, coherent (camera) and incoherent (random, sorted
and unsorted) — dependency-chained, host-materialization synced (axon).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mitsuba_tpu.render.scene import textured_mesh_scene
from mitsuba_tpu.ops import cluster_pallas as cp
from mitsuba_tpu.ops import bvh_pallas as bp


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    scene = textured_mesh_scene(256, 256, backend="cluster")
    geom = scene.geom
    print("tris:", geom.n_tris, "superclusters:", geom.cl_sc_bmin.shape[0],
          "clusters:", geom.cl_start.shape[0])

    # camera rays
    n = 1024 * 1024
    w = h = 1024
    lane = jnp.arange(n)
    px = (lane % w).astype(jnp.float32) / w
    py = (lane // w).astype(jnp.float32) / h
    uv = jnp.stack([px, py], -1)
    ray = scene.camera.sample_ray(uv)
    mint = jnp.full(n, 1e-4)
    maxt = jnp.full(n, 1e9)

    # correctness on 64k strided subset (covers whole image) vs packet BVH
    m = 64 * 1024
    sel = slice(None, None, 16)
    ro, rd, rmn, rmx = ray.o[sel], ray.d[sel], mint[sel], maxt[sel]
    t1, u1, v1, p1, ok1 = cp.cluster_closest(
        geom.cluster_tables, ro, rd, rmn, rmx)
    t2, u2, v2, p2, ok2 = bp.bvh_closest(
        geom.bvh_rows, geom.tri_rows, ro, rd, rmn, rmx,
        n_nodes=geom.bvh_min.shape[0], n_tris=geom.n_tris)
    ok1n, ok2n = np.asarray(ok1), np.asarray(ok2)
    agree = (ok1n == ok2n)
    print("hit agree:", agree.mean(), "hits:", ok1n.mean())
    both = ok1n & ok2n
    dt = np.abs(np.asarray(t1)[both] - np.asarray(t2)[both])
    rel = dt / np.maximum(np.asarray(t2)[both], 1e-6)
    print("t rel err: max", rel.max(), "mean", rel.mean())
    pm = (np.asarray(p1)[both] == np.asarray(p2)[both]).mean()
    print("prim agree:", pm)

    def bench(name, fn, *args, rounds=3):
        out = fn(*args)
        sync(out[0])
        best = 1e9
        for r in range(rounds):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e3:.1f} ms -> {n/best/1e6:.1f} Mrays/s")
        return best

    @jax.jit
    def run_cluster(o, d, mint, maxt, salt):
        t, u, v, p, ok = cp.cluster_closest(
            geom.cluster_tables, o + salt * 0.0, d, mint, maxt)
        return (jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)),)

    @jax.jit
    def run_bvh(o, d, mint, maxt, salt):
        t, u, v, p, ok = bp.bvh_closest(
            geom.bvh_rows, geom.tri_rows, o + salt * 0.0, d, mint, maxt,
            n_nodes=geom.bvh_min.shape[0], n_tris=geom.n_tris)
        return (jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)),)

    # cull-list statistics + cull-only timing
    from mitsuba_tpu.ops.cluster_pallas import (
        BM, build_tile_lists, _pack_rays)

    @jax.jit
    def lists_only(o, d, mint, maxt, salt):
        (ox, oy, oz, dx, dy, dz, mn, mx, _, mrows) = _pack_rays(
            o + salt * 0.0, d, mint, maxt)
        ids, counts = build_tile_lists(
            jnp.stack([p.reshape(-1) for p in (ox, oy, oz)], -1),
            jnp.stack([p.reshape(-1) for p in (dx, dy, dz)], -1),
            mx.reshape(-1), geom.cl_sc_bmin, geom.cl_sc_bmax,
            mrows // BM)
        return (counts.astype(jnp.float32).mean(), counts.max())

    salt = jnp.zeros(())
    cm, cmax = lists_only(ray.o, ray.d, mint, maxt, salt)
    print("camera counts: mean", float(cm), "max", int(cmax))

    def bench2(name, fn, *args, rounds=3):
        out = fn(*args)
        sync(out[0])
        best = 1e9
        for r in range(rounds):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e3:.2f} ms")
        return best

    bench2("lists-only camera 1M", lists_only, ray.o, ray.d, mint, maxt, salt)
    bench("cluster camera 1M", run_cluster, ray.o, ray.d, mint, maxt, salt)

    # incoherent rays: random origins in scene box, random dirs
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

    cm, cmax = lists_only(o_s, d_s, mint, maxt, salt)
    print("sorted-incoherent counts: mean", float(cm), "max", int(cmax))
    cm, cmax = lists_only(o_r, d_r, mint, maxt, salt)
    print("unsorted counts: mean", float(cm), "max", int(cmax))
    bench("cluster incoherent-sorted 1M", run_cluster, o_s, d_s, mint, maxt, salt)
    bench("cluster incoherent-unsorted 1M", run_cluster, o_r, d_r, mint, maxt, salt)
    bench("packet-bvh camera 1M", run_bvh, ray.o, ray.d, mint, maxt, salt, rounds=1)

    # shadow-ray (any-hit) perf
    @jax.jit
    def run_any(o, d, mint, maxt, salt):
        occ = cp.cluster_any(geom.cluster_tables, o + salt * 0.0, d, mint, maxt)
        return (jnp.sum(occ.astype(jnp.float32)),)

    bench("cluster any camera 1M", run_any, ray.o, ray.d, mint, maxt, salt)
    bench("cluster any sorted 1M", run_any, o_s, d_s, mint, maxt, salt)


if __name__ == "__main__":
    main()
