"""Round-3: candidate-count statistics vs ray-group size.

For the sorted 1M diffuse bounce rays of config-3, computes the TRUE
conservative-slab candidate count per ray group (group sizes 8..128)
against (a) 32-tri clusters and (b) 128-tri windows (4 consecutive
clusters — the transposed-kernel DMA unit). Pure XLA, no kernels; this
sizes the octet work-list design before building it.
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
from mitsuba_tpu.ops import worklist_pallas as wp
from scripts.exp_r3_twopass import bounce_rays, sort_oct_morton


def group_counts(o, d, maxt, bmin_c, bmax_c, g):
    """(n/g,) candidate counts for groups of g consecutive rays."""
    n = o.shape[0]
    ng = n // g
    og = o.reshape(ng, g, 3)
    dg = d.reshape(ng, g, 3)
    olo, ohi = og.min(1), og.max(1)
    dlo, dhi = dg.min(1), dg.max(1)
    mt_hi = maxt.reshape(ng, g).max(1)
    spans = (dlo <= 0) & (dhi >= 0)
    safe_lo = jnp.where(spans, 1.0, dlo)
    safe_hi = jnp.where(spans, 1.0, dhi)
    ilo = jnp.clip(jnp.minimum(1 / safe_lo, 1 / safe_hi), -3e38, 3e38)
    ihi = jnp.clip(jnp.maximum(1 / safe_lo, 1 / safe_hi), -3e38, 3e38)

    def mul_lo_hi(alo, ahi, blo, bhi):
        p = [alo * blo, alo * bhi, ahi * blo, ahi * bhi]
        return (jnp.minimum(jnp.minimum(p[0], p[1]),
                            jnp.minimum(p[2], p[3])),
                jnp.maximum(jnp.maximum(p[0], p[1]),
                            jnp.maximum(p[2], p[3])))

    def count_chunk(c0, acc):
        bmin = jax.lax.dynamic_slice(bmin_c, (c0, 0), (256, 3))
        bmax = jax.lax.dynamic_slice(bmax_c, (c0, 0), (256, 3))
        a_lo = bmin[None] - ohi[:, None]
        a_hi = bmin[None] - olo[:, None]
        b_lo = bmax[None] - ohi[:, None]
        b_hi = bmax[None] - olo[:, None]
        ta_lo, ta_hi = mul_lo_hi(a_lo, a_hi, ilo[:, None], ihi[:, None])
        tb_lo, tb_hi = mul_lo_hi(b_lo, b_hi, ilo[:, None], ihi[:, None])
        ent = jnp.minimum(ta_lo, tb_lo)
        ext = jnp.maximum(ta_hi, tb_hi)
        ent = jnp.where(spans[:, None], -3e38, ent)
        ext = jnp.where(spans[:, None], 3e38, ext)
        tn = jnp.maximum(ent.max(-1), 0.0)
        tf = jnp.minimum(ext.min(-1), mt_hi[:, None])
        return acc + jnp.sum(tn <= tf, axis=1).astype(jnp.int32)

    C = bmin_c.shape[0]
    pad = (-C) % 256
    bmin_c = jnp.pad(bmin_c, ((0, pad), (0, 0)), constant_values=3e38)
    bmax_c = jnp.pad(bmax_c, ((0, pad), (0, 0)), constant_values=-3e38)
    acc = jnp.zeros(ng, jnp.int32)
    for c0 in range(0, C + pad, 256):
        acc = count_chunk(c0, acc)
    return acc


def main():
    scene = textured_mesh_scene(1024, 1024, backend="cluster")
    geom = scene.geom
    n = 1024 * 1024
    o_b, d_b = bounce_rays(scene, n, 1024, 1024)
    bmin = np.asarray(geom.bvh_min[0])
    bmax = np.asarray(geom.bvh_max[0])
    order = sort_oct_morton(o_b, d_b, bmin, bmax)
    o_s = jnp.asarray(o_b[order])
    d_s = jnp.asarray(d_b[order])
    maxt = jnp.full(n, 1e9)

    cl_bmin = geom.mt_bmin
    cl_bmax = geom.mt_bmax
    C = cl_bmin.shape[0]
    # 128-tri windows = 4 consecutive 32-tri clusters
    padc = (-C) % 4
    wmin = jnp.pad(cl_bmin, ((0, padc), (0, 0)),
                   constant_values=3e38).reshape(-1, 4, 3).min(1)
    wmax = jnp.pad(cl_bmax, ((0, padc), (0, 0)),
                   constant_values=-3e38).reshape(-1, 4, 3).max(1)
    print(f"C={C} clusters, {wmin.shape[0]} windows", flush=True)

    fn = jax.jit(group_counts, static_argnames=("g",))
    for g in (8, 16, 32, 128):
        cc = np.asarray(fn(o_s, d_s, maxt, cl_bmin, cl_bmax, g))
        cw = np.asarray(fn(o_s, d_s, maxt, wmin, wmax, g))
        print(f"g={g:4d}: clusters mean={cc.mean():6.1f} "
              f"p50={np.percentile(cc, 50):5.0f} "
              f"p90={np.percentile(cc, 90):5.0f} "
              f"p99={np.percentile(cc, 99):5.0f} | "
              f"windows mean={cw.mean():6.1f} "
              f"p90={np.percentile(cw, 90):5.0f} "
              f"p99={np.percentile(cw, 99):5.0f}", flush=True)


if __name__ == "__main__":
    main()
