"""Round-3: exact per-lane hierarchical cull build, prototyped in XLA.

Pipeline (per 128-lane row, all vectorized over (row, entry, lane)):
  S0 conservative SC256 interval cull + front-to-back sort  (existing)
  S1 exact per-lane slab refine of the top-E0 SC256 entries
  S2 expand survivors to SC64 (8 consecutive K8 clusters), exact refine
  S3 expand survivors to K8 clusters, exact refine, sort by entry t

"Exact" = the union over the row's 128 real rays of per-ray slab hits
(tn <= tf, tn <= maxt), with maxt pre-capped at the scene-box exit.
Measures stage times on the TPU (chained) and survivor counts, for the
config-3 bounce and camera rays.
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
from mitsuba_tpu.ops.worklist_pallas import _pack_rays
from mitsuba_tpu.ops.stream_pallas import build_sc_lists, _BIG
from mitsuba_tpu.integrators.path import pixel_morton_perm
from scripts.exp_r3_twopass import bounce_rays, sort_oct_morton, timed

E0 = 128      # SC256 entries taken into exact stage 1
E1 = 64       # SC256 survivors kept -> 4*E1 SC64 candidates
E2 = 96       # SC64 survivors kept  -> 8*E2 K8 candidates
E3 = 384      # final K8 item cap per row


def exact_refine(rays, ids, keep, blo, bhi):
    """Exact per-lane slab of boxes blo/bhi[ids] vs each row's rays.

    rays (R,8,128); ids (R,E) box ids; keep (R,E) candidate mask.
    Returns (hit (R,E) union-over-lanes, tn_min (R,E))."""
    o = rays[:, 0:3]                       # (R,3,128)
    d = rays[:, 3:6]
    mn = rays[:, 6]                        # (R,128)
    mx = rays[:, 7]
    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 3e38)
    lo = blo[ids]                          # (R,E,3)
    hi = bhi[ids]
    t0 = (lo[..., None] - o[:, None]) * inv[:, None]   # (R,E,3,128)
    t1 = (hi[..., None] - o[:, None]) * inv[:, None]
    tn = jnp.max(jnp.minimum(t0, t1), axis=2)          # (R,E,128)
    tf = jnp.min(jnp.maximum(t0, t1), axis=2)
    tn = jnp.maximum(tn, mn[:, None])
    tf = jnp.minimum(tf, mx[:, None])
    ok = (tn <= tf) & keep[..., None]
    hit = jnp.any(ok, axis=-1)
    tn_min = jnp.min(jnp.where(ok, tn, _BIG), axis=-1)
    return hit, tn_min


def build_exact_lists(rays, sc_bmin, sc_bmax, s64_lo, s64_hi,
                      cl_lo, cl_hi, stop=4):
    """Full build: returns (ids (R,E3) K8-cluster ids front-to-back,
    tns (R,E3) entry keys, counts per stage for diagnostics). stop<4
    truncates the pipeline after that stage (for timing splits)."""
    R = rays.shape[0]
    zc = jnp.zeros(R, jnp.int32)
    # S0: conservative SC256, sorted front-to-back, sentinel-padded
    ids0, tns0 = build_sc_lists(rays, sc_bmin, sc_bmax)
    ids0 = ids0[:, 0, :E0]
    keep0 = tns0[:, 0, :E0] < _BIG
    n0_all = jnp.sum((tns0[:, 0, :] < _BIG), -1)
    if stop <= 0:
        return ids0, tns0[:, 0, :E0], (n0_all, zc, zc, zc)
    # S1: exact per-lane SC256
    hit1, tn1 = exact_refine(rays, ids0, keep0, sc_bmin, sc_bmax)
    key1 = jnp.where(hit1, tn1, _BIG)
    key1s, ids1 = jax.lax.sort_key_val(key1, ids0)
    ids1 = ids1[:, :E1]
    keep1 = key1s[:, :E1] < _BIG
    if stop <= 1:
        return ids1, key1s[:, :E1], (n0_all, jnp.sum(hit1, -1), zc, zc)
    # S2: SC64 = 4 per SC256
    ids64 = (ids1[:, :, None] * 4
             + jnp.arange(4, dtype=jnp.int32)[None, None]).reshape(R, -1)
    keep64 = jnp.repeat(keep1, 4, axis=1)
    hit2, tn2 = exact_refine(rays, ids64, keep64, s64_lo, s64_hi)
    key2 = jnp.where(hit2, tn2, _BIG)
    key2s, ids2 = jax.lax.sort_key_val(key2, ids64)
    ids2 = ids2[:, :E2]
    keep2 = key2s[:, :E2] < _BIG
    if stop <= 2:
        return ids2, key2s[:, :E2], (n0_all, jnp.sum(hit1, -1),
                                     jnp.sum(hit2, -1), zc)
    # S3: K8 clusters = 8 per SC64
    idsc = (ids2[:, :, None] * 8
            + jnp.arange(8, dtype=jnp.int32)[None, None]).reshape(R, -1)
    keepc = jnp.repeat(keep2, 8, axis=1)
    hit3, tn3 = exact_refine(rays, idsc, keepc, cl_lo, cl_hi)
    key3 = jnp.where(hit3, tn3, _BIG)
    key3s, ids3 = jax.lax.sort_key_val(key3, idsc)
    counts = (n0_all, jnp.sum(hit1, -1), jnp.sum(hit2, -1),
              jnp.sum(hit3, -1))
    return ids3[:, :E3], key3s[:, :E3], counts


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
    mt8 = build_mt_tables(v0[p], e1[p], e2[p],
                          cut_clusters(bvh.first, bvh.count, bvh.skip,
                                       v0.shape[0], max_k=8), k=8,
                          sc_group=32)
    C = mt8.bmin.shape[0]
    # SC64 boxes: groups of 8 consecutive K8 clusters
    c64 = C // 8
    s64_lo = mt8.bmin.reshape(c64, 8, 3).min(1)
    s64_hi = mt8.bmax.reshape(c64, 8, 3).max(1)
    print(f"K8 clusters C={C} (sc256={mt8.sc_bmin.shape[0]}, sc64={c64})",
          flush=True)

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

    args = dict(
        sc_bmin=jnp.asarray(mt8.sc_bmin), sc_bmax=jnp.asarray(mt8.sc_bmax),
        s64_lo=jnp.asarray(s64_lo), s64_hi=jnp.asarray(s64_hi),
        cl_lo=jnp.asarray(mt8.bmin), cl_hi=jnp.asarray(mt8.bmax))

    K_IT = 4

    def make_run(stop):
      @jax.jit
      def run(o, d, mx):
        rays, _, _ = _pack_rays(o, d, mint, mx)

        def step(s, _):
            ids, tns, counts = build_exact_lists(rays + s * 0.0,
                                                 stop=stop, **args)
            chk = (jnp.sum(jnp.where(tns < _BIG, tns, 0.0))
                   + jnp.sum((ids % 7).astype(jnp.float32))) * 1e-30
            return chk, (
                jnp.mean(counts[0].astype(jnp.float32)),
                jnp.mean(counts[1].astype(jnp.float32)),
                jnp.mean(counts[2].astype(jnp.float32)),
                jnp.mean(counts[3].astype(jnp.float32)),
                jnp.percentile(counts[1].astype(jnp.float32), 99),
                jnp.percentile(counts[2].astype(jnp.float32), 99),
                jnp.percentile(counts[3].astype(jnp.float32), 99),
                jnp.max(counts[3]))
        s, aux = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
        return s, jax.tree_util.tree_map(lambda x: x[0], aux)
      return run

    runs = [make_run(k) for k in range(4)]
    for name, (o, d) in (("bounce", (o_s, d_s)), ("camera", (cam.o, cam.d))):
        mx = exit_t(o, d)
        ts = []
        for k, r in enumerate(runs):
            ts.append(timed(lambda o, d, mx, r=r: r(o, d, mx)[0], o, d, mx))
            print(f"  {name} S<={k}: {ts[-1]*1e3/K_IT:.1f} ms", flush=True)
        _, (c0, c1, c2, c3, p1, p2, p3, m3) = runs[3](o, d, mx)
        stage = [ts[0]] + [ts[k] - ts[k - 1] for k in range(1, 4)]
        print(f"{name}: build {ts[3]*1e3/K_IT:6.1f} ms/1M | stages "
              + " ".join(f"S{k}={v*1e3/K_IT:6.1f}" for k, v in
                         enumerate(stage))
              + f" | counts sc256-cons {float(c0):6.1f} -> "
              f"exact sc256 {float(c1):5.1f} (p99 {float(p1):4.0f}) -> "
              f"sc64 {float(c2):5.1f} (p99 {float(p2):4.0f}) -> "
              f"k8 {float(c3):5.1f} (p99 {float(p3):4.0f} max {int(m3)})",
              flush=True)


if __name__ == "__main__":
    main()
