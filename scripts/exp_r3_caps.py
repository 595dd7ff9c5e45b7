"""Round-3: survivor-count quantiles per stage of the v5 exact build
(8x hierarchy: 512-tri L2 -> 64-tri L1 -> 8-tri K8) on config-3 rays,
measured with generous caps, to size the production cap presets."""
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
from mitsuba_tpu.integrators.path import pixel_morton_perm
from scripts.exp_r3_twopass import bounce_rays, sort_oct_morton


def main():
    scene = textured_mesh_scene(1024, 1024, backend="cluster")
    geom = scene.geom
    ex = geom.ex_tables
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
        if True:
            E0, E1, E2, E3 = big
            R = rays_c.shape[0]
            ids0f, tns0f = ep.build_sc_lists(rays_c, ex["b2_lo"],
                                             ex["b2_hi"])
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
            key3 = ep._exact_refine(rays_c, i8, kp8, ex["b0_lo"],
                                    ex["b0_hi"])
            n3 = jnp.sum(key3 < ep._BIG, -1)
            return jnp.stack([n0, n1, n2, n3], 1)

    def counts(o, d):
        mx = exit_cap(o, d, maxt)
        rays, _, n_rows = _pack_rays(o, d, mint, mx)
        ns = []
        for s in range(0, n_rows, 256):
            ns.append(np.asarray(chunk_counts(rays[s:s + 256])))
        return np.concatenate(ns)
    for name, (o, d) in (("camera", (cam.o, cam.d)),
                         ("bounce", (o_s, d_s))):
        ns = counts(o, d)
        for k, lbl in enumerate(["n0 cons-L2", "n1 exact-L2",
                                 "n2 exact-L1", "n3 exact-K8"]):
            v = ns[:, k]
            print(f"{name} {lbl}: mean {v.mean():7.1f} p95 "
                  f"{np.percentile(v,95):5.0f} p99 {np.percentile(v,99):5.0f}"
                  f" p99.9 {np.percentile(v,99.9):5.0f} max {v.max():5d}",
                  flush=True)


if __name__ == "__main__":
    main()
