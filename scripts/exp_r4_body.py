"""Round-4: per-phase timing of the REAL config-3 bounce body.

Unrolls one representative bounce (depth-1 population) with the actual
components path.py uses, each phase its own jit, host-synced: sort |
ray-gather | closest (v5+retier+fb) | its-ungather | emitter/env/albedo
block | NEE sample | shadow sort+any | bsdf sample+RR+next-ray.
Dispatch floor ~25 ms/phase on the tunnel — trends, not absolutes.
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

from mitsuba_tpu.bsdfs import bsdf_eval, bsdf_pdf, bsdf_sample
from mitsuba_tpu.core import math as m
from mitsuba_tpu.emitters import (eval_emitter_hit, eval_environment,
                                  pdf_direct_area, pdf_environment,
                                  sample_direct)
from mitsuba_tpu.integrators.path import (_bounce_order, _perm_pytree,
                                          mi_weight, pixel_morton_perm)
from mitsuba_tpu.render.intersect import ray_intersect, ray_test
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
    print(f"  {tag:24s}: {best*1e3:7.1f} ms", flush=True)
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

    # depth-1 population: trace camera rays, make one diffuse bounce set
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

    print(f"live fraction: {float(jnp.mean(active.astype(jnp.float32))):.3f}",
          flush=True)
    bmin, bmax = geom.bvh_min[0], geom.bvh_max[0]

    sort_f = jax.jit(lambda ray: _bounce_order(ray, bmin, bmax, "full"))
    order, inv = timed(sort_f, ray, tag="argsort+inv (full mode)")

    gather_ray = jax.jit(_perm_pytree)
    ray_s = timed(gather_ray, ray, order, tag="ray gather (packed)")

    from mitsuba_tpu.render.intersect import _cap_root_exit
    dif = geom.ex_caps[0]

    @jax.jit
    def exact_only(ray_s):
        r = _cap_root_exit(geom, ray_s)
        return ep.exact_closest(geom.ex_tables, r.o, r.d, r.mint, r.maxt,
                                caps=dif)
    out = timed(exact_only, ray_s, tag="closest exact only")
    print(f"    overflow frac: {float(jnp.mean(out[5])):.4f}", flush=True)

    isect = jax.jit(lambda ray_s: ray_intersect(geom, ray_s))
    its_s = timed(isect, ray_s, tag="closest +retier+fb")

    ungather = jax.jit(_perm_pytree)
    its = timed(ungather, its_s, inv, tag="its ungather (packed)")

    @jax.jit
    def emit_env_albedo(its, ray, L, throughput, prev_pdf, prev_delta,
                        active):
        esc = active & ~its.valid
        env = eval_environment(scene.emitters, ray.d)
        env_pdf = pdf_environment(scene.emitters, ray.d)
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
    def nee_sample(its, act, albedo, throughput):
        smp = Sampler(13, jnp.arange(n), jnp.zeros(n, jnp.int32))
        ds = sample_direct(scene.emitters, geom, its.p, smp.next_1d(),
                           smp.next_2d())
        wo_local = its.to_local(ds.d)
        fcos = bsdf_eval(scene.materials, its.material_id, its.wi,
                         wo_local, albedo=albedo, uv=its.uv)
        b_pdf = bsdf_pdf(scene.materials, its.material_id, its.wi,
                         wo_local)
        nee_ok = act & ds.valid & (ds.pdf > 0)
        eps = m.EPSILON * jnp.maximum(1.0, jnp.abs(its.p).max(-1))
        pend = Ray.make(its.p, ds.d, mint=eps,
                        maxt=jnp.where(nee_ok, ds.dist * (1 - 1e-3),
                                       -1.0))
        w_nee = jnp.where(ds.delta, 1.0, mi_weight(ds.pdf, b_pdf))
        contrib = throughput * fcos * ds.value * (
            w_nee / jnp.maximum(ds.pdf, 1e-20))[:, None]
        return pend, contrib, nee_ok

    pend, contrib, nee_ok = timed(nee_sample, its, act, albedo,
                                  throughput, tag="NEE sample+bsdfeval")

    @jax.jit
    def nee_sd_only(its):
        smp = Sampler(13, jnp.arange(n), jnp.zeros(n, jnp.int32))
        ds = sample_direct(scene.emitters, geom, its.p, smp.next_1d(),
                           smp.next_2d())
        return ds.d
    timed(nee_sd_only, its, tag="  sample_direct only")

    @jax.jit
    def nee_beval_only(its, albedo):
        wo = its.to_local(-its.wi)
        f = bsdf_eval(scene.materials, its.material_id, its.wi, wo,
                      albedo=albedo, uv=its.uv)
        pdf = bsdf_pdf(scene.materials, its.material_id, its.wi, wo)
        return f + pdf[:, None]
    timed(nee_beval_only, its, albedo, tag="  bsdf_eval+pdf only")

    sort2 = jax.jit(lambda ray: _bounce_order(ray, bmin, bmax, "full"))
    so, si = timed(sort2, pend, tag="shadow argsort+inv")
    pend_s = timed(gather_ray, pend, so, tag="shadow gather (packed)")
    anyq = jax.jit(lambda r: ray_test(geom, r))
    occ_s = timed(anyq, pend_s, tag="any v5+retier+fb")
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
