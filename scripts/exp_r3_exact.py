"""Round-3: v5 exact-cull item-stream intersector on real TPU.

Measures exact_closest / exact_any on 1M camera and sorted diffuse
bounce rays of the config-3 scene at both cap presets, cross-checks vs
the packed-row BVH oracle, and reports overflow fractions.
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
from mitsuba_tpu.integrators.path import pixel_morton_perm
from scripts.exp_r3_twopass import bounce_rays, sort_oct_morton, timed


def main():
    scene = textured_mesh_scene(1024, 1024, backend="cluster")
    geom = scene.geom
    ex = geom.ex_tables
    n = 1024 * 1024
    K_IT = 4
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

    for name, (o, d) in (("camera", (cam.o, cam.d)),
                         ("bounce", (o_s, d_s))):
        mx = exit_cap(o, d, maxt)
        for cname, caps in (("coh", ep.CAPS_COHERENT),
                            ("dif", ep.CAPS_DIFFUSE)):
            @jax.jit
            def closest(o, d, mx):
                def step(s, _):
                    t, u, v, p, ok, ovf = ep.exact_closest(
                        ex, o + s * 0.0, d, mint, mx, caps=caps)
                    return (jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))
                            * 1e-30,
                            (jnp.mean(ok.astype(jnp.float32)),
                             jnp.mean(ovf.astype(jnp.float32))))
                s, a = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
                return s, jax.tree_util.tree_map(lambda x: x[0], a)

            @jax.jit
            def anyq(o, d, mx):
                def step(s, _):
                    occ, ovf = ep.exact_any(ex, o + s * 0.0, d, mint, mx,
                                            caps=caps)
                    return (jnp.sum(occ.astype(jnp.float32)) * 1e-30,
                            (jnp.mean(occ.astype(jnp.float32)),
                             jnp.mean(ovf.astype(jnp.float32))))
                s, a = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
                return s, jax.tree_util.tree_map(lambda x: x[0], a)

            t_c = timed(lambda o, d, mx: closest(o, d, mx)[0], o, d, mx)
            _, (hf, of_) = closest(o, d, mx)
            t_a = timed(lambda o, d, mx: anyq(o, d, mx)[0], o, d, mx)
            _, (af, oa) = anyq(o, d, mx)
            print(f"{name}/{cname}: closest {t_c*1e3/K_IT:7.1f} ms/1M "
                  f"({1e3/(t_c*1e3/K_IT):5.1f} Mray/s, hit {float(hf):.3f},"
                  f" ovf {float(of_):.4f})  any {t_a*1e3/K_IT:7.1f} ms/1M "
                  f"(occ {float(af):.3f}, ovf {float(oa):.4f})", flush=True)

    # correctness spot-check vs the packed-row walk (bounce, 16k rays)
    from mitsuba_tpu.render.intersect import _closest_bvh_unrolled
    from mitsuba_tpu.render.records import Ray

    m = 16384
    mxs = exit_cap(o_s[:m], d_s[:m], maxt[:m])
    t1, u1, v1, p1, ok1, ovf1 = jax.jit(
        lambda o, d, mx: ep.exact_closest(ex, o, d, mint[:m], mx,
                                          caps=ep.CAPS_DIFFUSE))(
            o_s[:m], d_s[:m], mxs)
    r = Ray(o=o_s[:m], d=d_s[:m], mint=mint[:m], maxt=maxt[:m])
    t0, u0, v0, p0, ok0 = jax.jit(
        lambda r: _closest_bvh_unrolled(geom, r))(r)
    ok0 = np.asarray(ok0)
    ok1 = np.asarray(ok1)
    good = ~np.asarray(ovf1)
    agree = (ok0[good] == ok1[good]).mean()
    tmask = good & ok0 & ok1
    tdiff = np.abs(np.asarray(t1)[tmask] - np.asarray(t0)[tmask])
    pmatch = (np.asarray(p1)[tmask] == np.asarray(p0)[tmask]).mean()
    print(f"check: non-ovf {good.mean():.4f}, ok agree {agree:.6f}, "
          f"max|dt| {tdiff.max():.2e}, prim match {pmatch:.6f}", flush=True)


if __name__ == "__main__":
    main()
