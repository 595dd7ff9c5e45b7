"""Round-3: per-row streaming kernel (v4) on real TPU.

Measures stream_closest / stream_any on 1M sorted diffuse bounce rays
and 1M camera rays of the config-3 scene, and cross-checks a sample of
results against the brute oracle.
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
from scripts.exp_r3_twopass import bounce_rays, sort_oct_morton, timed, sync


def main():
    scene = textured_mesh_scene(1024, 1024, backend="cluster")
    geom = scene.geom
    st = geom.st_tables
    n = 1024 * 1024
    K_IT = 4
    bmin = np.asarray(geom.bvh_min[0])
    bmax = np.asarray(geom.bvh_max[0])

    # camera rays (pixel-Morton order, as the render path issues them)
    lane = jnp.arange(n)
    perm = jnp.asarray(pixel_morton_perm(1024, 1024))
    pid = perm[lane]
    px = (pid % 1024).astype(jnp.float32) / 1024
    py = (pid // 1024).astype(jnp.float32) / 1024
    cam = scene.camera.sample_ray(jnp.stack([px, py], -1))

    o_b, d_b = bounce_rays(scene, n, 1024, 1024)
    order = sort_oct_morton(o_b, d_b, bmin, bmax)
    o_s = jnp.asarray(o_b[order])
    d_s = jnp.asarray(d_b[order])
    mint = jnp.full(n, 1e-3)
    maxt = jnp.full(n, 1e9)

    for name, (o, d) in (("camera", (cam.o, cam.d)),
                         ("bounce", (o_s, d_s))):
        @jax.jit
        def closest(o, d):
            def step(s, _):
                t, u, v, p, ok = sp.stream_closest(
                    st, o + s * 0.0, d, mint, maxt)
                return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)) * 1e-30, \
                    jnp.mean(ok.astype(jnp.float32))
            s, hf = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
            return s, hf[0]

        @jax.jit
        def anyq(o, d):
            def step(s, _):
                occ = sp.stream_any(st, o + s * 0.0, d, mint, maxt)
                return jnp.sum(occ.astype(jnp.float32)) * 1e-30, \
                    jnp.mean(occ.astype(jnp.float32))
            s, hf = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
            return s, hf[0]

        t_c = timed(lambda o, d: closest(o, d)[0], o, d)
        _, hitf = closest(o, d)
        t_a = timed(lambda o, d: anyq(o, d)[0], o, d)
        _, occf = anyq(o, d)
        print(f"{name}: closest {t_c*1e3/K_IT:7.1f} ms/1M "
              f"(hit {float(hitf):.3f})  any {t_a*1e3/K_IT:7.1f} ms/1M "
              f"(occ {float(occf):.3f})", flush=True)

    # spot-check vs the XLA packed-row walk on a 16k subsample
    from mitsuba_tpu.render.intersect import _closest_bvh_unrolled
    from mitsuba_tpu.render.records import Ray

    m = 16384
    t1, u1, v1, p1, ok1 = jax.jit(
        lambda o, d: sp.stream_closest(st, o, d, mint[:m], maxt[:m]))(
            o_s[:m], d_s[:m])
    r = Ray(o=o_s[:m], d=d_s[:m], mint=mint[:m], maxt=maxt[:m])
    t0, u0, v0, p0, ok0 = jax.jit(
        lambda r: _closest_bvh_unrolled(geom, r))(r)
    ok0 = np.asarray(ok0)
    ok1 = np.asarray(ok1)
    agree = (ok0 == ok1).mean()
    tmask = ok0 & ok1
    tdiff = np.abs(np.asarray(t1)[tmask] - np.asarray(t0)[tmask])
    pmatch = (np.asarray(p1)[tmask] == np.asarray(p0)[tmask]).mean()
    print(f"check: ok agree {agree:.6f}, max|dt| {tdiff.max():.2e}, "
          f"prim match {pmatch:.6f}", flush=True)


if __name__ == "__main__":
    main()
