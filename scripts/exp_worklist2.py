"""TPU experiment: worklist v2 phase breakdown + pixel-Morton camera order.

Answers, in one TPU run:
  1. camera rays in pixel-Morton order (16x8 tiles) vs scanline order:
     worklist totals, overflow, closest-hit time;
  2. list-build phase costs (slab A / +slab B / +sort / full packing);
  3. kernel fixed cost via the probe kernel (DMA+grid only, no MT);
  4. correctness vs v1 restricted to NON-overflow rows;
  5. l_sc sweep for overflow.
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


def pixel_morton_order(w, h):
    """Host-side static permutation: lane i -> pixel in Morton order."""
    ix = np.arange(w * h, dtype=np.uint64) % w
    iy = np.arange(w * h, dtype=np.uint64) // w

    def spread(x):
        x &= 0xFFFFFFFF
        x = (x | (x << 16)) & 0x0000FFFF0000FFFF
        x = (x | (x << 8)) & 0x00FF00FF00FF00FF
        x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0F
        x = (x | (x << 2)) & 0x3333333333333333
        x = (x | (x << 1)) & 0x5555555555555555
        return x

    code = spread(ix) | (spread(iy) << np.uint64(1))
    return np.argsort(code, kind="stable")


def main():
    scene = textured_mesh_scene(256, 256, backend="cluster")
    geom = scene.geom
    print("tris:", geom.n_tris, flush=True)

    v0 = np.asarray(geom.v0)
    e1 = np.asarray(geom.e1)
    e2 = np.asarray(geom.e2)
    f = np.arange(v0.shape[0] * 3, dtype=np.int32).reshape(-1, 3)
    verts = np.concatenate([v0, v0 + e1, v0 + e2], axis=1).reshape(-1, 3)
    bvh = build_bvh(verts, f)
    perm = np.asarray(bvh.perm)
    K_CL = int(os.environ.get("K_CL", "32"))
    ranges = cut_clusters(np.asarray(bvh.first), np.asarray(bvh.count),
                          np.asarray(bvh.skip), f.shape[0], max_k=K_CL)
    mt = build_mt_tables(v0[perm], e1[perm], e2[perm], ranges, k=K_CL)
    print("K_CL:", K_CL, "clusters:", mt.tri.shape[0], flush=True)
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

    mo = jnp.asarray(pixel_morton_order(w, h))
    mo_o, mo_d = ray.o[mo], ray.d[mo]

    # ---- worklist totals / overflow, scanline vs pixel-morton, l_sc sweep
    def lists_stats(o, d, l_sc):
        rays, _, n_rows = wp._pack_rays(o, d, mint, maxt)
        items, total, overflow = wp.build_worklist(
            rays, geom_cl["bmin"], geom_cl["bmax"],
            geom_cl["sc_bmin"], geom_cl["sc_bmax"], n_rows * 16, l_sc)
        return total, jnp.sum(overflow.astype(jnp.int32))

    for name, (o_, d_) in (("scanline", (ray.o, ray.d)),
                           ("pix-morton", (mo_o, mo_d))):
        for l_sc in (24, 48):
            tot, ovf = jax.jit(lists_stats, static_argnums=2)(o_, d_, l_sc)
            print(f"{name} l_sc={l_sc}: total={int(tot)} "
                  f"({int(tot)/8192:.1f}/row) overflow_rows={int(ovf)}",
                  flush=True)

    # ---- phase timings of the list build (pixel-morton rays)
    rays_pm, _, n_rows = wp._pack_rays(mo_o, mo_d, mint, maxt)
    c_s = geom_cl["sc_bmin"].shape[0]
    C = geom_cl["bmin"].shape[0]

    @jax.jit
    def phase_a(rays, salt):
        rays = rays + salt * 0.0
        olo, ohi, ilo, ihi, spans, mt_hi = wp._row_intervals(rays)
        hit_a, tn_a = wp._interval_slab(
            jnp.broadcast_to(geom_cl["sc_bmin"][None], (8192, c_s, 3)),
            jnp.broadcast_to(geom_cl["sc_bmax"][None], (8192, c_s, 3)),
            olo, ohi, ilo, ihi, spans, mt_hi)
        key_a = jnp.where(hit_a, tn_a, 3e38)
        neg_top, sc_ids = jax.lax.top_k(-key_a, 24)
        return (jnp.sum(sc_ids),)

    @jax.jit
    def phase_ab(rays, salt):
        rays = rays + salt * 0.0
        olo, ohi, ilo, ihi, spans, mt_hi = wp._row_intervals(rays)
        hit_a, tn_a = wp._interval_slab(
            jnp.broadcast_to(geom_cl["sc_bmin"][None], (8192, c_s, 3)),
            jnp.broadcast_to(geom_cl["sc_bmax"][None], (8192, c_s, 3)),
            olo, ohi, ilo, ihi, spans, mt_hi)
        key_a = jnp.where(hit_a, tn_a, 3e38)
        neg_top, sc_ids = jax.lax.top_k(-key_a, 24)
        cand = (sc_ids[:, :, None] * 8
                + jnp.arange(8, dtype=jnp.int32)[None, None, :]).reshape(
                    8192, 24 * 8)
        bmin_blk = geom_cl["bmin"].reshape(c_s, 8, 3)[sc_ids].reshape(
            8192, 24 * 8, 3)
        bmax_blk = geom_cl["bmax"].reshape(c_s, 8, 3)[sc_ids].reshape(
            8192, 24 * 8, 3)
        hit_b, tn_b = wp._interval_slab(
            bmin_blk, bmax_blk, olo, ohi, ilo, ihi, spans, mt_hi)
        return (jnp.sum(hit_b.astype(jnp.int32)) + jnp.sum(cand),)

    @jax.jit
    def phase_abs(rays, salt):
        rays = rays + salt * 0.0
        olo, ohi, ilo, ihi, spans, mt_hi = wp._row_intervals(rays)
        hit_a, tn_a = wp._interval_slab(
            jnp.broadcast_to(geom_cl["sc_bmin"][None], (8192, c_s, 3)),
            jnp.broadcast_to(geom_cl["sc_bmax"][None], (8192, c_s, 3)),
            olo, ohi, ilo, ihi, spans, mt_hi)
        key_a = jnp.where(hit_a, tn_a, 3e38)
        neg_top, sc_ids = jax.lax.top_k(-key_a, 24)
        cand = (sc_ids[:, :, None] * 8
                + jnp.arange(8, dtype=jnp.int32)[None, None, :]).reshape(
                    8192, 24 * 8)
        bmin_blk = geom_cl["bmin"].reshape(c_s, 8, 3)[sc_ids].reshape(
            8192, 24 * 8, 3)
        bmax_blk = geom_cl["bmax"].reshape(c_s, 8, 3)[sc_ids].reshape(
            8192, 24 * 8, 3)
        hit_b, tn_b = wp._interval_slab(
            bmin_blk, bmax_blk, olo, ohi, ilo, ihi, spans, mt_hi)
        key_b = jnp.where(hit_b, tn_b, 3e38)
        key_s, order = jax.lax.sort_key_val(key_b, cand)
        return (jnp.sum(order) + jnp.sum(key_s),)

    @jax.jit
    def full_build(rays, salt):
        rays = rays + salt * 0.0
        items, total, overflow = wp.build_worklist(
            rays, geom_cl["bmin"], geom_cl["bmax"],
            geom_cl["sc_bmin"], geom_cl["sc_bmax"], 8192 * 16, 24)
        return (total.astype(jnp.float32),)

    K_IT = 8

    def bench(name, fn, *args, rounds=3):
        """fn(*args, salt) -> tuple with [0] a scalar. Runs K_IT chained
        iterations INSIDE one jit (scan) — the ~25 ms per-dispatch floor
        of the tunnel otherwise swamps every sub-50ms measurement."""
        @jax.jit
        def rep(*a):
            def step(salt, _):
                out = fn(*a, salt)
                return out[0].astype(jnp.float32) * 1e-30, None
            s, _ = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
            return s
        sync(rep(*args))
        best = 1e9
        for _ in range(rounds):
            t0 = time.perf_counter()
            sync(rep(*args))
            best = min(best, time.perf_counter() - t0)
        per = (best * 1e3) / K_IT
        print(f"{name}: {per:.1f} ms/iter ({best*1e3:.0f} total)",
              flush=True)
        return per

    bench("full build (+packing)", full_build, rays_pm)

    # ---- kernel: probe (no MT) vs closest, scanline vs pixel-morton
    def run_probe(o, d, salt, wf=16):
        acc, _ = wp.wl_probe(geom_cl, o + salt * 0.0, d, mint, maxt,
                             w_factor=wf)
        return (jnp.sum(acc),)

    def run_closest(o, d, salt, wf=16):
        t, u, v, p, ok, _ = wp.wl_closest(geom_cl, o + salt * 0.0, d,
                                          mint, maxt, w_factor=wf)
        return (jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)),)

    import functools
    bench("probe pix-morton 1M", jax.jit(run_probe), mo_o, mo_d)
    bench("closest scanline 1M", jax.jit(run_closest), ray.o, ray.d)
    bench("closest pix-morton 1M", jax.jit(run_closest), mo_o, mo_d)
    bench("closest pix-morton wf=8 1M",
          jax.jit(functools.partial(run_closest, wf=8)), mo_o, mo_d)
    bench("closest pix-morton wf=6 1M",
          jax.jit(functools.partial(run_closest, wf=6)), mo_o, mo_d)
    # any-hit (shadow) cost
    def run_any(o, d, salt, wf=8):
        occ, _ = wp.wl_any(geom_cl, o + salt * 0.0, d, mint,
                           jnp.full_like(maxt, 2.0), w_factor=wf)
        return (jnp.sum(occ.astype(jnp.float32)),)
    bench("any pix-morton wf=8 1M", jax.jit(run_any), mo_o, mo_d)

    # ---- correctness on NON-overflow rows only (pixel-morton, 64k block)
    sel = slice(256 * 1024, 256 * 1024 + 64 * 1024)
    ro, rd = mo_o[sel], mo_d[sel]
    rmn, rmx = mint[sel], maxt[sel]
    t1, u1, v1_, p1, ok1 = cp.cluster_closest(
        geom.cluster_tables, ro, rd, rmn, rmx)
    t2, u2, v2_, p2, ok2, ovf = wp.wl_closest(geom_cl, ro, rd, rmn, rmx)
    keep = ~np.repeat(np.asarray(ovf), 128)
    p2g = jnp.where(ok2, perm_j[jnp.maximum(p2, 0)], -1)
    ok1n, ok2n = np.asarray(ok1)[keep], np.asarray(ok2)[keep]
    print("non-overflow frac:", keep.mean(), flush=True)
    print("hit agree:", (ok1n == ok2n).mean())
    both = ok1n & ok2n
    dt = np.abs(np.asarray(t1)[keep][both] - np.asarray(t2)[keep][both])
    rel = dt / np.maximum(np.asarray(t2)[keep][both], 1e-6)
    print("t rel err: max", rel.max(), "mean", rel.mean())
    print("prim agree:", (np.asarray(p2g)[keep][both]
                          == np.asarray(p1)[keep][both]).mean(), flush=True)


if __name__ == "__main__":
    main()
