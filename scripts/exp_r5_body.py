"""Round-5: fresh per-phase anatomy of the config-3 bounce body after
the emitter-record compaction, plus closest-query splits (retier on/off,
v5 vs v6b) and live-footprint statistics (L1s/row, K8s/row) for the
speed-of-light derivation. Protocol = exp_r4_body (each phase its own
jit, ~25 ms dispatch floor on the tunnel; trends not absolutes)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mitsuba_tpu.bsdfs import bsdf_eval, bsdf_pdf, bsdf_sample
from mitsuba_tpu.core import math as m
from mitsuba_tpu.emitters import (eval_and_pdf_environment,
                                  eval_emitter_hit, pdf_direct_area,
                                  sample_direct)
from mitsuba_tpu.integrators.path import (_bounce_order, _perm_pytree,
                                          mi_weight, pixel_morton_perm)
from mitsuba_tpu.render.intersect import (_cap_root_exit, ray_intersect,
                                          ray_test)
from mitsuba_tpu.ops import exact_pallas as ep
from mitsuba_tpu.render.records import Ray
from mitsuba_tpu.render.sampler import Sampler
from mitsuba_tpu.render.scene import textured_mesh_scene


def timed(f, *a, tag=""):
    out = f(*a)
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x).ravel()[0]), out)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        out = f(*a)
        leaves = jax.tree_util.tree_leaves(out)
        _ = float(jnp.asarray(leaves[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"  {tag:28s}: {best*1e3:7.1f} ms", flush=True)
    return out


def main():
    w = h = 512
    spp = 4
    scene = textured_mesh_scene(w, h, backend="cluster")
    geom = scene.geom
    n = w * h * spp
    lane = jnp.arange(n)
    perm = jnp.asarray(pixel_morton_perm(w, h))
    pid = perm[lane // spp]
    px = (pid % w).astype(jnp.float32) / w
    py = (pid // w).astype(jnp.float32) / h
    cam = scene.camera.sample_ray(jnp.stack([px, py], -1))

    @jax.jit
    def mk(scene):
        its = ray_intersect(geom, Ray.make(cam.o, cam.d), coherent=True)
        smp = Sampler(7, jnp.arange(n), jnp.zeros(n, jnp.int32))
        bs = bsdf_sample(scene.materials, its.material_id, its.wi,
                         smp.next_2d(), smp.next_1d())
        d = its.to_world(bs["wo"])
        eps = m.EPSILON * jnp.maximum(1.0, jnp.abs(its.p).max(-1))
        alive = its.valid & bs["valid"]
        ray = Ray.make(its.p, d, mint=eps,
                       maxt=jnp.where(alive, jnp.inf, -1.0))
        return ray, alive

    ray, active = mk(scene)
    throughput = jnp.ones((n, 3))
    L = jnp.zeros((n, 3))
    prev_pdf = jnp.full(n, 0.5)
    prev_delta = jnp.zeros(n, bool)
    print(f"live fraction: "
          f"{float(jnp.mean(active.astype(jnp.float32))):.3f}", flush=True)
    bmin, bmax = geom.bvh_min[0], geom.bvh_max[0]

    sort_f = jax.jit(lambda ray: _bounce_order(ray, bmin, bmax, "full"))
    order, inv = timed(sort_f, ray, tag="argsort+inv (full mode)")
    gather_ray = jax.jit(_perm_pytree)
    ray_s = timed(gather_ray, ray, order, tag="ray gather (packed)")

    dif = geom.ex_caps[0]

    # --- live-footprint stats on the first sorted row chunk ---
    from mitsuba_tpu.ops.worklist_pallas import _pack_rays

    @jax.jit
    def footprint(ray_s):
        r = _cap_root_exit(geom, ray_s)
        mx = jnp.minimum(r.maxt, 1e30)
        rays, _, n_rows = _pack_rays(r.o, r.d, r.mint, mx)
        chunk = rays[:320]
        ids3, blk, ovf = ep.build_exact_items(chunk, geom.ex_tables, dif)
        l1_ids, l1_keys, ovf1 = ep.build_exact_l1(chunk, geom.ex_tables,
                                                  dif)
        live_blocks = jnp.sum(blk < ep._BIG, -1)      # BI-item blocks
        live_l1 = jnp.sum(l1_keys < ep._BIG, -1)
        return (jnp.mean(live_l1.astype(jnp.float32)),
                jnp.percentile(live_l1.astype(jnp.float32), 99),
                jnp.mean(live_blocks.astype(jnp.float32)))

    ml1, p99l1, mblk = footprint(ray_s)
    print(f"  live L1/row mean={float(ml1):.1f} p99={float(p99l1):.0f}  "
          f"live BI-blocks/row={float(mblk):.1f} "
          f"(<= {ep.BI} K8 items each)", flush=True)

    @jax.jit
    def exact_only(ray_s):
        r = _cap_root_exit(geom, ray_s)
        return ep.exact_closest(geom.ex_tables, r.o, r.d, r.mint, r.maxt,
                                caps=dif, v6=0)
    out = timed(exact_only, ray_s, tag="closest exact v5 only")
    print(f"    overflow frac: {float(jnp.mean(out[5])):.4f}", flush=True)

    for blm in (8, 16, 24):
        f = jax.jit(lambda ray_s, blm=blm: (lambda r: ep._exact_closest_jit(
            geom.ex_tables, r.o, r.d, r.mint, r.maxt, caps=dif,
            interpret=False, v6=2, blm=blm))(_cap_root_exit(geom, ray_s)))
        timed(f, ray_s, tag=f"closest exact v6b blm{blm}")

    isect = jax.jit(lambda ray_s: ray_intersect(geom, ray_s))
    its_s = timed(isect, ray_s, tag="closest full (+retier+fb+shade)")

    os.environ["MTS_RETIER"] = "0"
    jax.clear_caches()
    isect2 = jax.jit(lambda ray_s: ray_intersect(geom, ray_s))
    timed(isect2, ray_s, tag="closest full, retier OFF")
    del os.environ["MTS_RETIER"]
    jax.clear_caches()

    ungather = jax.jit(_perm_pytree)
    its = timed(ungather, its_s, inv, tag="its ungather (packed)")

    @jax.jit
    def emit_env_albedo(its, ray, L, throughput, prev_pdf, prev_delta,
                        active):
        esc = active & ~its.valid
        env, env_pdf = eval_and_pdf_environment(scene.emitters, ray.d)
        w_env = jnp.where(prev_delta, 1.0, mi_weight(prev_pdf, env_pdf))
        L = L + jnp.where(esc[:, None], throughput * env * w_env[:, None],
                          0.0)
        act = active & its.valid
        le = eval_emitter_hit(scene.emitters, its.emitter_id, -ray.d,
                              its.geo_n)
        lum_pdf = pdf_direct_area(scene.emitters, its.prim_id, ray.o,
                                  its.p, its.geo_n,
                                  emitter_id=its.emitter_id)
        w_b = jnp.where(prev_delta, 1.0, mi_weight(prev_pdf, lum_pdf))
        L = L + jnp.where(act[:, None], throughput * le * w_b[:, None],
                          0.0)
        mclip = jnp.clip(its.material_id, 0,
                         scene.materials.n_materials - 1)
        tex_id = scene.materials.tex_id[mclip]
        albedo = scene.materials.reflectance[mclip]
        if scene.textures.n_textures > 0:
            from mitsuba_tpu.render.texture import eval_texture
            tex_val = eval_texture(scene.textures, tex_id, its.uv)
            albedo = jnp.where((tex_id >= 0)[:, None], tex_val, albedo)
        return L, act, albedo

    L, act, albedo = timed(emit_env_albedo, its, ray, L, throughput,
                           prev_pdf, prev_delta, active,
                           tag="emit/env/albedo block")

    @jax.jit
    def nee_sd_only(its):
        smp = Sampler(13, jnp.arange(n), jnp.zeros(n, jnp.int32))
        ds = sample_direct(scene.emitters, geom, its.p, smp.next_1d(),
                           smp.next_2d())
        return ds.d
    timed(nee_sd_only, its, tag="NEE sample_direct only")

    @jax.jit
    def nee_beval_only(its, albedo):
        wo = its.to_local(-its.wi)
        f = bsdf_eval(scene.materials, its.material_id, its.wi, wo,
                      albedo=albedo, uv=its.uv)
        pdf = bsdf_pdf(scene.materials, its.material_id, its.wi, wo)
        return f + pdf[:, None]
    timed(nee_beval_only, its, albedo, tag="NEE bsdf_eval+pdf only")

    @jax.jit
    def nee_pend(its, act, albedo, throughput):
        smp = Sampler(13, jnp.arange(n), jnp.zeros(n, jnp.int32))
        ds = sample_direct(scene.emitters, geom, its.p, smp.next_1d(),
                           smp.next_2d())
        nee_ok = act & ds.valid & (ds.pdf > 0)
        eps = m.EPSILON * jnp.maximum(1.0, jnp.abs(its.p).max(-1))
        pend = Ray.make(its.p, ds.d, mint=eps,
                        maxt=jnp.where(nee_ok, ds.dist * (1 - 1e-3),
                                       -1.0))
        return pend
    pend = nee_pend(its, act, albedo, throughput)

    sort2 = jax.jit(lambda ray: _bounce_order(ray, bmin, bmax, "full"))
    so, si = timed(sort2, pend, tag="shadow argsort+inv")
    pend_s = timed(gather_ray, pend, so, tag="shadow gather (packed)")
    anyq = jax.jit(lambda r: ray_test(geom, r))
    occ_s = timed(anyq, pend_s, tag="any v5+retier+fb")

    def anyq6(blm):
        def f(r):
            r = _cap_root_exit(geom, r)
            return ep._exact_any_jit(geom.ex_tables, r.o, r.d, r.mint,
                                     r.maxt, caps=dif, interpret=False,
                                     v6=2, blm=blm)
        return jax.jit(f)
    for blm in (16, 24):
        timed(anyq6(blm), pend_s, tag=f"any exact v6b blm{blm} only")

    unocc = jax.jit(lambda occ, si: occ[si])
    occ = timed(unocc, occ_s, si, tag="occ ungather (1ch)")

    @jax.jit
    def bsdf_next(its, act, albedo, throughput):
        smp = Sampler(17, jnp.arange(n), jnp.zeros(n, jnp.int32))
        bs = bsdf_sample(scene.materials, its.material_id, its.wi,
                         smp.next_2d(), smp.next_1d(), albedo=albedo,
                         uv=its.uv)
        wo_world = its.to_world(bs["wo"])
        alive = act & bs["valid"]
        throughput = throughput * jnp.where(alive[:, None], bs["weight"],
                                            1.0)
        eps = m.EPSILON * jnp.maximum(1.0, jnp.abs(its.p).max(-1))
        ray = Ray.make(its.p, wo_world, mint=eps,
                       maxt=jnp.where(alive, jnp.inf, -1.0))
        return ray, throughput, alive

    _ = timed(bsdf_next, its, act, albedo, throughput,
              tag="bsdf sample+next ray")


if __name__ == "__main__":
    main()
