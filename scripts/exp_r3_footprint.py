"""Round-3: achievable cluster footprint per ray-group (simulation).

The v4 per-row streaming kernel walks ~600 clusters per 128-lane row on
incoherent bounce rays (1.5 s/1M). This measures what a kernel with
EXACT per-ray culling + perfect ordered early exit would walk, as a
function of ray-group size G (the SIMD unit that shares a work list):

  walked(G) = | union over the G rays of
                {cluster c : slab_hit(ray, c) and tn(ray, c) <= t_set} |
  t_set = min(true closest t, scene-box exit t)

pairs/ray = walked * 32 bounds throughput at the measured 14.2 Gpairs/s
VPU MT rate. Computed on the TPU in chunks; reports mean/p95 walked and
the implied ms/1M rays for G in {1, 8, 16, 32, 128} at cluster (32-tri)
and supercluster (256-tri) granularity, for camera and bounce rays.
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
from mitsuba_tpu.ops import stream_pallas as sp
from mitsuba_tpu.integrators.path import pixel_morton_perm
from scripts.exp_r3_twopass import bounce_rays, sort_oct_morton


def footprint(o, d, mint, t_set, bmin, bmax, groups=(1, 8, 16, 32, 128)):
    """o,d (N,3); t_set (N,) cap; bmin/bmax (C,3). Returns
    {G: walked counts (N//G,)} as numpy, computed in ray chunks."""
    n = o.shape[0]
    C = bmin.shape[0]
    chunk = 65536
    acc = {g: [] for g in groups}

    @jax.jit
    def masks(o_c, d_c, mn_c, ts_c):
        inv = jnp.where(jnp.abs(d_c) > 1e-12, 1.0 / d_c, 3e38)
        t0 = (bmin[None] - o_c[:, None]) * inv[:, None]   # (n, C, 3)
        t1 = (bmax[None] - o_c[:, None]) * inv[:, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        tn = jnp.maximum(tn, mn_c[:, None])
        hit = (tn <= tf) & (tn <= ts_c[:, None])
        outs = []
        for g in groups:
            m = hit.reshape(-1, g, C).any(1)
            outs.append(m.sum(-1))
        return outs

    for s in range(0, n, chunk):
        outs = masks(o[s:s + chunk], d[s:s + chunk],
                     mint[s:s + chunk], t_set[s:s + chunk])
        for g, w in zip(groups, outs):
            acc[g].append(np.asarray(w))
    return {g: np.concatenate(v) for g, v in acc.items()}


def main():
    scene = textured_mesh_scene(1024, 1024, backend="cluster")
    geom = scene.geom
    st = geom.st_tables
    n = 1024 * 1024
    sbmin = np.asarray(geom.bvh_min[0])
    sbmax = np.asarray(geom.bvh_max[0])

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

    cl_bmin = geom.mt_bmin
    cl_bmax = geom.mt_bmax
    sc_bmin = geom.cl_sc_bmin
    sc_bmax = geom.cl_sc_bmax
    C = cl_bmin.shape[0]
    print(f"clusters C={C}, superclusters={sc_bmin.shape[0]}", flush=True)

    @jax.jit
    def exit_t(o, d):
        inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 3e38)
        t0 = (jnp.asarray(sbmin)[None] - o) * inv
        t1 = (jnp.asarray(sbmax)[None] - o) * inv
        return jnp.maximum(jnp.min(jnp.maximum(t0, t1), -1), 0.0)

    for name, (o, d) in (("camera", (cam.o, cam.d)), ("bounce", (o_s, d_s))):
        t, _u, _v, _p, ok = jax.jit(
            lambda o, d: sp.stream_closest(st, o, d, mint, maxt))(o, d)
        tex = exit_t(o, d)
        t_set = jnp.where(ok, jnp.minimum(t * 1.0001, tex), tex)
        print(f"{name}: hit {float(jnp.mean(ok.astype(jnp.float32))):.3f}",
              flush=True)
        for lvl, (bn, bx, tpc) in (("cl32", (cl_bmin, cl_bmax, 32)),
                                   ("sc256", (sc_bmin, sc_bmax, 256))):
            w = footprint(np.asarray(o), np.asarray(d), np.asarray(mint),
                          np.asarray(t_set), bn, bx)
            for g, ws in w.items():
                pairs_per_ray = ws.mean() * tpc
                ms = pairs_per_ray * 1e6 / 14.2e9 * 1e3
                print(f"  {name}/{lvl} G={g:4d}: walked mean {ws.mean():7.1f}"
                      f" p95 {np.percentile(ws, 95):7.1f}"
                      f" -> {pairs_per_ray:7.0f} pairs/ray"
                      f" = {ms:6.1f} ms/1M ({1e3/max(ms,1e-9):5.1f} Mrays/s)",
                      flush=True)


if __name__ == "__main__":
    main()
