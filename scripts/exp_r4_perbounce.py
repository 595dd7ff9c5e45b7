"""Round-4: per-bounce, per-phase timing of the REAL config-3 render.

Re-creates the wavefront loop in Python (one jit per phase, host-synced)
so each phase of each bounce is timed on the actual ray population:
argsort | exact_closest (+overflow frac) | stream-fallback | shading+
bsdf-sample | NEE sample | exact_any | any-fallback. Numbers include
the ~25 ms tunnel dispatch floor per call — read trends, not absolutes.
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
from mitsuba_tpu.render.records import Ray
from mitsuba_tpu.render.sampler import Sampler
from mitsuba_tpu.render.intersect import (ray_intersect, _cap_root_exit,
                                          _fallback_closest_stream)
from mitsuba_tpu.ops import exact_pallas as ep
from mitsuba_tpu.core import math as m
from mitsuba_tpu.core import warp
from mitsuba_tpu.core.types import replace
from mitsuba_tpu.emitters import sample_direct
from mitsuba_tpu.integrators.path import (pixel_morton_perm, _morton_keys,
                                          _inverse_perm)


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timed(f, *a):
    out = f(*a)
    sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    out = f(*a)
    s = sync(out[0] if isinstance(out, tuple) else out)
    return time.perf_counter() - t0, out


def main():
    w = h = 512
    spp = 4
    scene = textured_mesh_scene(w, h, backend="cluster")
    geom = scene.geom
    ex = geom.ex_tables
    n = w * h * spp
    sbmin = geom.bvh_min[0]
    sbmax = geom.bvh_max[0]

    lane = jnp.arange(n)
    perm = jnp.asarray(pixel_morton_perm(w, h))
    pid = perm[lane // spp]
    px = (pid % w).astype(jnp.float32) / w
    py = (pid // w).astype(jnp.float32) / h
    cam = scene.camera.sample_ray(jnp.stack([px, py], -1))
    ray = Ray.make(cam.o, cam.d)

    @jax.jit
    def sort_rays(o, d, maxt, mint):
        dead = maxt < mint
        keys = _morton_keys(o, d, sbmin, sbmax)
        keys = jnp.where(dead, jnp.int32(0x7FFFFFFF), keys)
        order = jnp.argsort(keys)
        return order, _inverse_perm(order)

    @jax.jit
    def closest(o, d, mint, maxt, coherent: bool = False):
        r = _cap_root_exit(geom, Ray(o=o, d=d, mint=mint, maxt=maxt))
        caps = ep.CAPS_DIFFUSE
        t, u, v, p, ok, ovf = ep.exact_closest(ex, r.o, r.d, r.mint,
                                               r.maxt, caps=caps)
        return t, u, v, p, ok, ovf & (r.mint <= r.maxt), r.maxt

    @jax.jit
    def fb_closest(o, d, mint, maxt, t, p, ok, ovf):
        r = Ray(o=o, d=d, mint=mint, maxt=maxt)
        z = jnp.zeros_like(t)
        t2, u2, v2, p2, ok2 = _fallback_closest_stream(
            geom, r, t, z, z, p, ok, ovf)
        return t2, p2, ok2

    @jax.jit
    def shade_and_sample(o, d, t, p, ok, seed):
        prim = jnp.where(ok, p, 0)
        hit = o + d * t[:, None]
        nrm = m.normalize(jnp.cross(geom.e1[prim], geom.e2[prim]))
        nrm = jnp.where((jnp.sum(nrm * d, -1) > 0)[:, None], -nrm, nrm)
        smp = Sampler(seed, jnp.arange(n), jnp.zeros(n, jnp.int32))
        u2 = smp.next_2d()
        dl = warp.square_to_cosine_hemisphere(u2)
        fr = m.Frame.from_normal(nrm)
        nd = fr.to_world(dl)
        eps = 1e-3 * jnp.maximum(1.0, jnp.abs(hit).max(-1))
        o2 = hit
        alive = ok
        return o2, nd, jnp.where(alive, eps, 1.0), \
            jnp.where(alive, jnp.inf, -1.0), nrm

    @jax.jit
    def nee(o, nrm, ok, seed):
        smp = Sampler(seed + 77, jnp.arange(n), jnp.zeros(n, jnp.int32))
        u1 = smp.next_1d()
        u2 = smp.next_2d()
        ds = sample_direct(scene.emitters, geom, o, u1, u2)
        eps = 1e-3 * jnp.maximum(1.0, jnp.abs(o).max(-1))
        mx = jnp.where(ok & ds.valid, ds.dist * (1 - 1e-3), -1.0)
        return ds.d, eps, mx

    @jax.jit
    def anyq(o, d, mint, maxt):
        r = _cap_root_exit(geom, Ray(o=o, d=d, mint=mint, maxt=maxt))
        occ, ovf = ep.exact_any(ex, r.o, r.d, r.mint, r.maxt)
        return occ, ovf & (r.mint <= r.maxt) & ~occ, r.maxt

    @jax.jit
    def fb_any(o, d, mint, maxt, occ, ovf):
        from mitsuba_tpu.render.intersect import _fallback_any_stream
        r = Ray(o=o, d=d, mint=mint, maxt=maxt)
        return _fallback_any_stream(geom, r, occ, ovf)

    o, d = ray.o, ray.d
    mint = jnp.full(n, 1e-3)
    maxt = jnp.full(n, jnp.inf)
    for depth in range(5):
        live = float(jnp.mean((maxt >= mint).astype(jnp.float32)))
        ts, (order, inv) = timed(sort_rays, o, d, maxt, mint)
        o_s, d_s = o[order], d[order]
        mn_s, mx_s = mint[order], maxt[order]
        tc, (t, u, v, p, ok, ovf, mxc) = timed(closest, o_s, d_s, mn_s,
                                               mx_s)
        ovf_frac = float(jnp.mean(ovf.astype(jnp.float32)))
        tf, (t2, p2, ok2) = timed(fb_closest, o_s, d_s, mn_s, mxc,
                                  t, p, ok, ovf)
        # un-sort the hit, shade, sample next bounce
        t2u, p2u, ok2u = t2[inv], p2[inv], ok2[inv]
        tb, (o2, d2, mn2, mx2, nrm) = timed(shade_and_sample, o, d, t2u,
                                            p2u, ok2u, depth)
        # NEE from the hit points
        tn, (sd, seps, smx) = timed(nee, o2, nrm, ok2u, depth)
        so, si = sort_rays(o2, sd, smx, seps)
        so_o, so_d = o2[so], sd[so]
        so_mn, so_mx = seps[so], smx[so]
        ta, (occ, aovf, amx) = timed(anyq, so_o, so_d, so_mn, so_mx)
        aovf_frac = float(jnp.mean(aovf.astype(jnp.float32)))
        taf, occ2 = timed(fb_any, so_o, so_d, so_mn, amx, occ, aovf)
        print(f"depth {depth}: live={live:.3f} sort={ts*1e3:6.1f} "
              f"closest={tc*1e3:6.1f} (ovf {ovf_frac:.4f}) "
              f"fbC={tf*1e3:6.1f} shade={tb*1e3:6.1f} nee={tn*1e3:6.1f} "
              f"any={ta*1e3:6.1f} (ovf {aovf_frac:.4f}) "
              f"fbA={taf*1e3:6.1f} ms", flush=True)
        o, d, mint, maxt = o2, d2, mn2, mx2


if __name__ == "__main__":
    main()
