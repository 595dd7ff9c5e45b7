"""Round-4: where does config-3's time go in the ACTIVE v5 path?

Times, on the real TPU with 1M config-3 rays (camera + sorted diffuse
bounce), each phase the render loop pays per bounce per query:
  argsort   full octant-Morton argsort + 2 gathers (sort_rays path)
  S0        conservative SC256 cull + front-to-back sort
  S1        exact L2 refine kernel + width-E0 sort
  S2        child refine kernel + width-8*E1 sort
  S3        child refine kernel + width-8*E2 sort
  kernel    the flat item-stream MT kernel on the built lists
  fallback  the unconditional packet-BVH launch with ALL lanes dead
  e2e       exact_closest / exact_any as shipped
All chained K_IT times inside one jit (tunnel dispatch floor ~25 ms).
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
from mitsuba_tpu.ops.stream_pallas import build_sc_lists
from mitsuba_tpu.integrators.path import pixel_morton_perm, _morton_keys, _inverse_perm
from scripts.exp_r3_twopass import bounce_rays, sort_oct_morton, timed

_BIG = 3e38
K_IT = 4


def build_stages(rays, ex, caps, stop):
    """build_exact_items truncated after `stop` sub-stages.
    stops: 1=S0, 2=+S1refine, 3=+sort1, 4=+S2refine, 5=+sort2,
    6=+S3refine, 7=+sort3 (full)."""
    E0, E1, E2, E3 = caps
    R = rays.shape[0]
    ids0f, tns0f = build_sc_lists(rays, ex["b2_lo"], ex["b2_hi"])
    n0 = jnp.sum(tns0f[:, 0, :] < _BIG, -1)
    ids0 = ids0f[:, 0, :E0]
    keep0 = tns0f[:, 0, :E0] < _BIG
    live0 = jnp.minimum(n0, E0).astype(jnp.int32)
    if stop <= 1:
        return ids0.sum() + live0.sum()
    key1 = ep._refine_keys_pallas(rays, ids0, keep0, live0,
                                  ex["b2_lo"], ex["b2_hi"], False)
    if stop <= 2:
        return jnp.sum(jnp.where(key1 < _BIG, key1, 0.0))
    key1s, ids1 = jax.lax.sort_key_val(key1, ids0)
    n1 = jnp.sum(key1 < _BIG, -1)
    ids1 = ids1[:, :E1]
    keep1 = key1s[:, :E1] < _BIG
    live1p = jnp.minimum(n1, E1).astype(jnp.int32)
    if stop <= 3:
        return ids1.sum() + live1p.sum()
    ids64 = (ids1[:, :, None] * 8
             + jnp.arange(8, dtype=jnp.int32)[None, None]).reshape(R, -1)
    keep64 = jnp.repeat(keep1, 8, axis=1)
    key2 = ep._child_refine(rays, ids1, live1p, ex["ct1"], keep64, False)
    if stop <= 4:
        return jnp.sum(jnp.where(key2 < _BIG, key2, 0.0))
    key2s, ids2 = jax.lax.sort_key_val(key2, ids64)
    n2 = jnp.sum(key2 < _BIG, -1)
    ids2 = ids2[:, :E2]
    keep2 = key2s[:, :E2] < _BIG
    live2p = jnp.minimum(n2, E2).astype(jnp.int32)
    if stop <= 5:
        return ids2.sum() + live2p.sum()
    ids8 = (ids2[:, :, None] * 8
            + jnp.arange(8, dtype=jnp.int32)[None, None]).reshape(R, -1)
    keep8 = jnp.repeat(keep2, 8, axis=1)
    key3 = ep._child_refine(rays, ids2, live2p, ex["ct0"], keep8, False)
    if stop <= 6:
        return jnp.sum(jnp.where(key3 < _BIG, key3, 0.0))
    key3s, ids3 = jax.lax.sort_key_val(key3, ids8)
    ids = jnp.where(key3s[:, :E3] < _BIG, ids3[:, :E3], 0)
    blk = key3s[:, :E3].reshape(R, E3 // ep.BI, ep.BI)[:, :, 0]
    return ids.sum() + jnp.sum(jnp.where(blk < _BIG, blk, 0.0))


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None   # e.g. "bounce:S0"
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
    maxt_r = jnp.full(n, 1e9)

    @jax.jit
    def exit_cap(o, d):
        inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 3e38)
        t0 = (jnp.asarray(sbmin)[None] - o) * inv
        t1 = (jnp.asarray(sbmax)[None] - o) * inv
        tf = jnp.min(jnp.maximum(t0, t1), -1)
        return jnp.maximum(tf * 1.0001, 0.0)

    maxt_b = exit_cap(o_s, d_s)
    sets = {"cam": (cam.o, cam.d, mint, maxt_r),
            "bounce": (o_s, d_s, mint, maxt_b)}

    def chained(f):
        def g(o, d, mn, mx):
            acc = jnp.zeros(())
            for k in range(K_IT):
                acc = acc + f(o + acc * 0.0, d, mn, mx)
            return acc
        return jax.jit(g)

    def want(tag):
        return only is None or only == tag

    for name, (o, d, mn, mx) in sets.items():
        caps = ep.CAPS_DIFFUSE
        print(f"== {name} rays (caps={caps}) ==", flush=True)

        # per-stage build
        for stop, lbl in [(1, "S0"), (2, "+S1ref"), (3, "+sort1"),
                          (4, "+S2ref"), (5, "+sort2"), (6, "+S3ref"),
                          (7, "+sort3")]:
            if not want(f"{name}:{lbl}"):
                continue
            def f(o, d, mn, mx, stop=stop):
                rays, nn, n_rows = _pack_rays(o, d, mn, mx)
                chunks = ep._pad_rows(rays, n_rows)
                s = jax.lax.map(
                    lambda rc: build_stages(rc, ex, caps, stop), chunks)
                return jnp.sum(s) * 1e-30
            t = timed(chained(f), o, d, mn, mx)
            print(f"  build {lbl:7s}: {t / K_IT * 1e3:8.1f} ms/1M",
                  flush=True)

        # kernel only (build once outside the timed region)
        if not (want(f"{name}:kernel") or want(f"{name}:e2e")
                or want(f"{name}:ovf")):
            continue
        rays, nn, n_rows = _pack_rays(o, d, mn, mx)
        chunks = ep._pad_rows(rays, n_rows)

        if want(f"{name}:kernel"):
            @jax.jit
            def prebuild(chunks):
                return jax.lax.map(
                    lambda rc: ep.build_exact_items(rc, ex, caps)[:2],
                    chunks)
            ids_c, blk_c = prebuild(chunks)

            def kern(chunks, ids_c, blk_c):
                acc = jnp.zeros(())
                for k in range(K_IT):
                    outs = jax.lax.map(
                        lambda t: ep._call_items(ex["tri"],
                                                 t[0] + acc * 0.0,
                                                 t[1], t[2], False),
                        (chunks, ids_c, blk_c))
                    acc = acc + jnp.sum(outs[:, :, 0, :] * 1e-30)
                return acc
            t = timed(jax.jit(kern), chunks, ids_c, blk_c)
            print(f"  kernel closest : {t / K_IT * 1e3:8.1f} ms/1M",
                  flush=True)

        if want(f"{name}:e2e"):
            def e2e_c(o, d, mn, mx):
                t_, u, v, p, ok, ovf = ep.exact_closest(ex, o, d, mn, mx,
                                                        caps=caps)
                return jnp.sum(jnp.where(ok, t_, 0.0)) * 1e-30 + \
                    jnp.sum(ovf) * 1e-30
            t = timed(chained(e2e_c), o, d, mn, mx)
            print(f"  e2e closest    : {t / K_IT * 1e3:8.1f} ms/1M",
                  flush=True)

            def e2e_a(o, d, mn, mx):
                occ, ovf = ep.exact_any(ex, o, d, mn, mx, caps=caps)
                return jnp.sum(occ) * 1e-30
            t = timed(chained(e2e_a), o, d, mn, mx)
            print(f"  e2e any        : {t / K_IT * 1e3:8.1f} ms/1M",
                  flush=True)

        if want(f"{name}:ovf"):
            _, _, _, _, _, ovf = ep.exact_closest(ex, o, d, mn, mx,
                                                  caps=caps)
            print(f"  overflow frac  : {float(jnp.mean(ovf)):.4f}",
                  flush=True)

    if only is not None and only not in ("fallback", "sort"):
        return

    # fallback launch with all lanes dead
    if only is not None and only != "fallback":
        pass
    else:
        t = timed(jax.jit(_mk_fb(geom)), cam.o, cam.d, mint,
                  jnp.full(n, -1.0))
        print(f"fallback launch (all dead): {t / K_IT * 1e3:8.1f} ms/1M",
              flush=True)
    if only is not None and only != "sort":
        return

    # the per-bounce argsort cost (sort_rays path)
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
    t = timed(jax.jit(srt), o_s, d_s, mint, maxt_b)
    print(f"argsort+invperm+gather    : {t / K_IT * 1e3:8.1f} ms/1M",
          flush=True)


def _mk_fb(geom):
    def fb(o, d, mn, mx):
        acc = jnp.zeros(())
        for k in range(K_IT):
            t_, u, v, p, ok = bp.bvh_closest(
                geom.bvh_rows, geom.tri_rows, o + acc * 0.0, d, mn, mx,
                n_nodes=geom.bvh_min.shape[0], n_tris=geom.n_tris)
            acc = acc + jnp.sum(jnp.where(ok, t_, 0.0)) * 1e-30
        return acc
    return fb


if __name__ == "__main__":
    main()
