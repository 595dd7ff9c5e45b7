"""Round-4: consolidated v5 cost split (compile-budget-aware version).

One process, few jit programs, K_IT=2: full build, kernel-only, e2e
closest/any as shipped, overflow fraction, all-dead fallback launch,
per-bounce argsort. S3ref+sort3 cost = full-build minus the +sort2
number from exp_r4_split.py (45.0 ms/1M).
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
from mitsuba_tpu.ops import exact_pallas as ep
from mitsuba_tpu.ops import bvh_pallas as bp
from mitsuba_tpu.ops.worklist_pallas import _pack_rays
from mitsuba_tpu.integrators.path import (pixel_morton_perm, _morton_keys,
                                          _inverse_perm)
from scripts.exp_r3_twopass import bounce_rays, sort_oct_morton, timed

_BIG = 3e38
K_IT = 2


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
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
    caps = ep.CAPS_DIFFUSE
    # NO exit cap: matches what the render loop passes (maxt=inf)
    maxt = jnp.full(n, 1e9)

    def chained(f):
        def g(o, d, mn, mx):
            acc = jnp.zeros(())
            for k in range(K_IT):
                acc = acc + f(o + acc * 0.0, d, mn, mx)
            return acc
        return jax.jit(g)

    o, d, mn, mx = o_s, d_s, mint, maxt

    if which in ("all", "build"):
        def fullb(o, d, mn, mx):
            rays, nn, n_rows = _pack_rays(o, d, mn, mx)
            chunks = ep._pad_rows(rays, n_rows)
            ids, blk, ovf = jax.lax.map(
                lambda rc: ep.build_exact_items(rc, ex, caps), chunks)
            return jnp.sum(ids) * 1e-30 + jnp.sum(ovf) * 1e-30
        t = timed(chained(fullb), o, d, mn, mx, rounds=2)
        print(f"build full     : {t / K_IT * 1e3:8.1f} ms/1M", flush=True)

    if which in ("all", "e2e"):
        def e2e_c(o, d, mn, mx):
            t_, u, v, p, ok, ovf = ep.exact_closest(ex, o, d, mn, mx,
                                                    caps=caps)
            return jnp.sum(jnp.where(ok, t_, 0.0)) * 1e-30 + \
                jnp.sum(ovf) * 1e-30
        t = timed(chained(e2e_c), o, d, mn, mx, rounds=2)
        print(f"e2e closest    : {t / K_IT * 1e3:8.1f} ms/1M", flush=True)

        _, _, _, _, _, ovf = ep.exact_closest(ex, o, d, mn, mx, caps=caps)
        print(f"overflow frac  : {float(jnp.mean(ovf)):.4f}", flush=True)

    if which in ("all", "any"):
        def e2e_a(o, d, mn, mx):
            occ, ovf = ep.exact_any(ex, o, d, mn, mx, caps=caps)
            return jnp.sum(occ) * 1e-30
        t = timed(chained(e2e_a), o, d, mn, mx, rounds=2)
        print(f"e2e any        : {t / K_IT * 1e3:8.1f} ms/1M", flush=True)

    if which in ("all", "fb"):
        def fb(o, d, mn, mx):
            acc = jnp.zeros(())
            for k in range(K_IT):
                t_, u, v, p, ok = bp.bvh_closest(
                    geom.bvh_rows, geom.tri_rows, o + acc * 0.0, d, mn,
                    mx, n_nodes=geom.bvh_min.shape[0], n_tris=geom.n_tris)
                acc = acc + jnp.sum(jnp.where(ok, t_, 0.0)) * 1e-30
            return acc
        t = timed(jax.jit(fb), cam.o, cam.d, mint, jnp.full(n, -1.0),
                  rounds=2)
        print(f"fallback (all dead): {t / K_IT * 1e3:8.1f} ms/1M",
              flush=True)

    if which in ("all", "sort"):
        def srt(o, d, mn, mx):
            acc = jnp.zeros(())
            for k in range(K_IT):
                keys = _morton_keys(o + acc * 0.0, d,
                                    jnp.asarray(sbmin), jnp.asarray(sbmax))
                orderj = jnp.argsort(keys)
                inv = _inverse_perm(orderj)
                acc = acc + jnp.sum(o[orderj][:, 0]) * 1e-30 + \
                    jnp.sum(inv) * 1e-30
            return acc
        t = timed(jax.jit(srt), o_s, d_s, mint, maxt, rounds=2)
        print(f"argsort+invperm+gather: {t / K_IT * 1e3:8.1f} ms/1M",
              flush=True)


if __name__ == "__main__":
    main()
