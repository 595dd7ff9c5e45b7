"""Round-3: ray-sort variants vs exact-cull footprint quantiles.

The v5 build's cost scales with the cap sizes, which must cover the
p99 row footprint — and the octant+origin-Morton sort leaves a fat
tail. Tests direction-aware 6-D sorts: interleaving quantized
direction bits into the origin Morton key at different depths.
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
from mitsuba_tpu.ops import exact_pallas as ep
from mitsuba_tpu.ops.worklist_pallas import _pack_rays
from scripts.exp_r3_twopass import bounce_rays



def spread2(x):
    """Spread 10-bit ints to every 2nd bit (2-way interleave)."""
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def spread3(x):
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x030000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x0300F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x030C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x09249249)
    return x


def morton3(q):
    return (spread3(q[:, 0]) | (spread3(q[:, 1]) << np.uint64(1))
            | (spread3(q[:, 2]) << np.uint64(2)))


def quant(o, bmin, bmax, bits):
    s = (1 << bits) - 1
    return np.clip((o - bmin) / np.maximum(bmax - bmin, 1e-6) * s,
                   0, s).astype(np.uint64)


def sort_variants(o, d, bmin, bmax):
    oq = quant(o, bmin, bmax, 10)
    mo = morton3(oq)                       # 30-bit origin morton
    oc = ((d[:, 0] > 0).astype(np.uint64)
          + 2 * (d[:, 1] > 0).astype(np.uint64)
          + 4 * (d[:, 2] > 0).astype(np.uint64))
    dq = quant(np.abs(d), np.zeros(3), np.ones(3), 4)
    md = morton3(dq)                       # 12-bit |dir| morton
    out = {}
    out["oct+o"] = np.argsort((oc << np.uint64(30)) | mo, kind="stable")
    # direction-first: octant, 6 dir bits, then origin
    out["oct+d2+o"] = np.argsort(
        (oc << np.uint64(36)) | ((md >> np.uint64(6)) << np.uint64(30))
        | mo, kind="stable")
    # origin-first coarse, then direction, then fine origin
    hi = mo >> np.uint64(18)               # top 4 levels (12 bits)
    lo = mo & np.uint64((1 << 18) - 1)
    out["oct+o4+d2+o"] = np.argsort(
        (oc << np.uint64(36)) | (hi << np.uint64(24))
        | ((md >> np.uint64(6)) << np.uint64(18)) | lo, kind="stable")
    out["oct+o6+d4+o"] = np.argsort(
        (oc << np.uint64(42)) | ((mo >> np.uint64(12)) << np.uint64(24))
        | (md << np.uint64(12)) | (mo & np.uint64(4095)), kind="stable")
    return out


def main():
    scene = textured_mesh_scene(1024, 1024, backend="cluster")
    geom = scene.geom
    ex = geom.ex_tables
    n = 1024 * 1024
    sbmin = np.asarray(geom.bvh_min[0])
    sbmax = np.asarray(geom.bvh_max[0])
    o_b, d_b = bounce_rays(scene, n, 1024, 1024)
    mint = jnp.full(n, 1e-3)
    maxt = jnp.full(n, 1e9)

    @jax.jit
    def exit_cap(o, d, mx):
        inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 3e38)
        t0 = (jnp.asarray(sbmin)[None] - o) * inv
        t1 = (jnp.asarray(sbmax)[None] - o) * inv
        tex = jnp.maximum(jnp.min(jnp.maximum(t0, t1), -1), 0.0)
        return jnp.minimum(mx, tex * 1.0001)

    big = (192, 128, 256, 1024)

    @jax.jit
    def chunk_counts(rays_c):
        E0, E1, E2, E3 = big
        R = rays_c.shape[0]
        ids0f, tns0f = ep.build_sc_lists(rays_c, ex["b2_lo"], ex["b2_hi"])
        n0 = jnp.sum(tns0f[:, 0, :] < ep._BIG, -1)
        ids0 = ids0f[:, 0, :E0]
        keep0 = tns0f[:, 0, :E0] < ep._BIG
        key1 = ep._exact_refine(rays_c, ids0, keep0, ex["b2_lo"],
                                ex["b2_hi"])
        k1s, i1 = jax.lax.sort_key_val(key1, ids0)
        n1 = jnp.sum(key1 < ep._BIG, -1)
        i1 = i1[:, :E1]
        kp1 = k1s[:, :E1] < ep._BIG
        i64 = (i1[:, :, None] * 8 + jnp.arange(8, dtype=jnp.int32)[
            None, None]).reshape(R, -1)
        kp64 = jnp.repeat(kp1, 8, 1)
        key2 = ep._exact_refine(rays_c, i64, kp64, ex["b1_lo"],
                                ex["b1_hi"])
        k2s, i2 = jax.lax.sort_key_val(key2, i64)
        n2 = jnp.sum(key2 < ep._BIG, -1)
        i2 = i2[:, :E2]
        kp2 = k2s[:, :E2] < ep._BIG
        i8 = (i2[:, :, None] * 8 + jnp.arange(8, dtype=jnp.int32)[
            None, None]).reshape(R, -1)
        kp8 = jnp.repeat(kp2, 8, 1)
        key3 = ep._exact_refine(rays_c, i8, kp8, ex["b0_lo"], ex["b0_hi"])
        n3 = jnp.sum(key3 < ep._BIG, -1)
        return jnp.stack([n0, n1, n2, n3], 1)

    for sname, order in sort_variants(o_b, d_b, sbmin, sbmax).items():
        o = jnp.asarray(o_b[order])
        d = jnp.asarray(d_b[order])
        mx = exit_cap(o, d, maxt)
        rays, _, n_rows = _pack_rays(o, d, mint, mx)
        ns = []
        for s in range(0, n_rows, 256):
            ns.append(np.asarray(chunk_counts(rays[s:s + 256])))
        ns = np.concatenate(ns)
        msg = [sname]
        for k, lbl in enumerate(["L2x", "L1x", "K8x"]):
            v = ns[:, k + 1]
            msg.append(f"{lbl} {v.mean():5.1f}/p99 {np.percentile(v,99):4.0f}"
                       f"/max {v.max():4d}")
        print("  ".join(msg), flush=True)


if __name__ == "__main__":
    main()
