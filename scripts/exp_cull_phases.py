"""Profile the work-list cull phase by phase on the TPU (camera rays,
bunny, K_CL from env). Slope timing via doubled workloads is impractical
here; instead each phase is dispatch-chained 8x inside one jit so the
25 ms dispatch floor amortizes to ~3 ms."""
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

REPS = 8


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def bench(name, fn, *args, rounds=3):
    sync(fn(*args))
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/REPS*1e3:.2f} ms (x{REPS} chained: {best*1e3:.1f})",
          flush=True)


def chain(f):
    """Run f REPS times with a data dependency so XLA can't CSE/parallel."""
    @jax.jit
    def go(o, d, mint, maxt):
        acc = jnp.zeros(())
        for _ in range(REPS):
            out = f(o + acc * 0.0, d, mint, maxt)
            acc = acc + out
        return acc
    return go


def main():
    scene = textured_mesh_scene(256, 256, backend="cluster")
    geom = scene.geom
    K_CL = int(os.environ.get("K_CL", "128"))
    v0 = np.asarray(geom.v0); e1 = np.asarray(geom.e1); e2 = np.asarray(geom.e2)
    f = np.arange(v0.shape[0] * 3, dtype=np.int32).reshape(-1, 3)
    verts = np.concatenate([v0, v0 + e1, v0 + e2], axis=1).reshape(-1, 3)
    bvh = build_bvh(verts, f)
    perm = np.asarray(bvh.perm)
    ranges = cut_clusters(np.asarray(bvh.first), np.asarray(bvh.count),
                          np.asarray(bvh.skip), f.shape[0], max_k=K_CL)
    mt = build_mt_tables(v0[perm], e1[perm], e2[perm], ranges, k=K_CL)
    print("K_CL:", K_CL, "clusters:", mt.tri.shape[0],
          "superclusters:", mt.sc_bmin.shape[0])
    cl_bmin = jnp.asarray(mt.bmin); cl_bmax = jnp.asarray(mt.bmax)
    sc_bmin = jnp.asarray(mt.sc_bmin); sc_bmax = jnp.asarray(mt.sc_bmax)

    n = 1024 * 1024
    w = h = 1024
    lane = jnp.arange(n)
    uv = jnp.stack([(lane % w).astype(jnp.float32) / w,
                    (lane // w).astype(jnp.float32) / h], -1)
    ray = scene.camera.sample_ray(uv)
    mint = jnp.full(n, 1e-4)
    maxt = jnp.full(n, 1e9)
    n_rows = n // 128
    L_SC = 24
    C = cl_bmin.shape[0]
    c_s = sc_bmin.shape[0]
    l_sc = min(L_SC, c_s)
    w_cap = n_rows * 16

    def pack(o, d, mint, maxt):
        rays, _, _ = wp._pack_rays(o, d, mint, maxt)
        return (rays[:, 0:3].transpose(0, 2, 1).reshape(-1, 3),
                rays[:, 3:6].transpose(0, 2, 1).reshape(-1, 3),
                rays[:, 6].reshape(-1), rays[:, 7].reshape(-1))

    def phase_intervals(o, d, mint, maxt):
        o, d, mint, maxt = pack(o, d, mint, maxt)
        parts = wp._row_intervals(o, d, mint, maxt, n_rows)
        return sum(p.sum() for p in parts[:2])

    def phase_levelA(o, d, mint, maxt):
        o, d, mint, maxt = pack(o, d, mint, maxt)
        olo, ohi, ilo, ihi, spans, mt_hi = wp._row_intervals(
            o, d, mint, maxt, n_rows)
        hit_a, tn_a = wp._interval_slab(
            jnp.broadcast_to(sc_bmin[None], (n_rows, c_s, 3)),
            jnp.broadcast_to(sc_bmax[None], (n_rows, c_s, 3)),
            olo, ohi, ilo, ihi, spans, mt_hi)
        return hit_a.sum().astype(jnp.float32) + tn_a.sum() * 0.0

    def phase_topk(o, d, mint, maxt):
        o, d, mint, maxt = pack(o, d, mint, maxt)
        olo, ohi, ilo, ihi, spans, mt_hi = wp._row_intervals(
            o, d, mint, maxt, n_rows)
        hit_a, tn_a = wp._interval_slab(
            jnp.broadcast_to(sc_bmin[None], (n_rows, c_s, 3)),
            jnp.broadcast_to(sc_bmax[None], (n_rows, c_s, 3)),
            olo, ohi, ilo, ihi, spans, mt_hi)
        key_a = jnp.where(hit_a, tn_a, 3e38)
        neg_top, sc_ids = jax.lax.top_k(-key_a, l_sc)
        return sc_ids.sum().astype(jnp.float32)

    def phase_levelB(o, d, mint, maxt):
        o, d, mint, maxt = pack(o, d, mint, maxt)
        olo, ohi, ilo, ihi, spans, mt_hi = wp._row_intervals(
            o, d, mint, maxt, n_rows)
        hit_a, tn_a = wp._interval_slab(
            jnp.broadcast_to(sc_bmin[None], (n_rows, c_s, 3)),
            jnp.broadcast_to(sc_bmax[None], (n_rows, c_s, 3)),
            olo, ohi, ilo, ihi, spans, mt_hi)
        key_a = jnp.where(hit_a, tn_a, 3e38)
        neg_top, sc_ids = jax.lax.top_k(-key_a, l_sc)
        cand = (sc_ids[:, :, None] * 8
                + jnp.arange(8, dtype=jnp.int32)[None, None, :]).reshape(
                    n_rows, l_sc * 8)
        cand = jnp.clip(cand, 0, C - 1)
        hit_b, tn_b = wp._interval_slab(
            cl_bmin[cand], cl_bmax[cand], olo, ohi, ilo, ihi, spans, mt_hi)
        return hit_b.sum().astype(jnp.float32)

    def phase_full(o, d, mint, maxt):
        o, d, mint, maxt = pack(o, d, mint, maxt)
        items, total, overflow = wp.build_worklist(
            o, d, mint, maxt, cl_bmin, cl_bmax, sc_bmin, sc_bmax,
            n_rows, w_cap, l_sc)
        return items.sum().astype(jnp.float32)

    bench("pack+intervals     ", chain(phase_intervals), ray.o, ray.d, mint, maxt)
    bench("+ levelA slab      ", chain(phase_levelA), ray.o, ray.d, mint, maxt)
    bench("+ top_k            ", chain(phase_topk), ray.o, ray.d, mint, maxt)
    bench("+ levelB slab      ", chain(phase_levelB), ray.o, ray.d, mint, maxt)
    bench("full build_worklist", chain(phase_full), ray.o, ray.d, mint, maxt)


if __name__ == "__main__":
    main()
