"""Round-3: v5 build stage split with the Pallas refine kernel, bounce
rays, diffuse caps. Cumulative stops: S0 | +S1(sort) | +S2 | +S3."""
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
from scripts.exp_r3_twopass import bounce_rays, sort_oct_morton, timed

K_IT = 4
R_CHUNK = ep.R_CHUNK


def build_stop(rays, ex, caps, stop):
    E0, E1, E2, E3 = caps
    R = rays.shape[0]

    def refine(ids, keep, live, lo, hi):
        return ep._refine_keys_pallas(rays, ids, keep, live, lo, hi,
                                      False)

    ids0f, tns0f = ep.build_sc_lists(rays, ex["b2_lo"], ex["b2_hi"])
    n0 = jnp.sum(tns0f[:, 0, :] < ep._BIG, -1)
    ids0 = ids0f[:, 0, :E0]
    keep0 = tns0f[:, 0, :E0] < ep._BIG
    live0 = jnp.minimum(n0, E0).astype(jnp.int32)
    if stop == 0:
        return jnp.sum(ids0 % 5) + jnp.sum(live0)
    key1 = refine(ids0, keep0, live0, ex["b2_lo"], ex["b2_hi"])
    key1s, ids1 = jax.lax.sort_key_val(key1, ids0)
    n1 = jnp.sum(key1 < ep._BIG, -1)
    ids1 = ids1[:, :E1]
    keep1 = key1s[:, :E1] < ep._BIG
    live1 = jnp.minimum(n1, E1).astype(jnp.int32) * 8
    if stop == 1:
        return jnp.sum(ids1 % 5) + jnp.sum(live1)
    ids64 = (ids1[:, :, None] * 8
             + jnp.arange(8, dtype=jnp.int32)[None, None]).reshape(R, -1)
    keep64 = jnp.repeat(keep1, 8, axis=1)
    key2 = refine(ids64, keep64, live1, ex["b1_lo"], ex["b1_hi"])
    key2s, ids2 = jax.lax.sort_key_val(key2, ids64)
    n2 = jnp.sum(key2 < ep._BIG, -1)
    ids2 = ids2[:, :E2]
    keep2 = key2s[:, :E2] < ep._BIG
    live2 = jnp.minimum(n2, E2).astype(jnp.int32) * 8
    if stop == 2:
        return jnp.sum(ids2 % 5) + jnp.sum(live2)
    ids8 = (ids2[:, :, None] * 8
            + jnp.arange(8, dtype=jnp.int32)[None, None]).reshape(R, -1)
    keep8 = jnp.repeat(keep2, 8, axis=1)
    key3 = refine(ids8, keep8, live2, ex["b0_lo"], ex["b0_hi"])
    key3s, ids3 = jax.lax.sort_key_val(key3, ids8)
    ids = jnp.where(key3s[:, :E3] < ep._BIG, ids3[:, :E3], 0)
    blk = key3s[:, :E3].reshape(R, E3 // ep.BI, ep.BI)[:, :, 0]
    return jnp.sum(ids % 5) + jnp.sum(blk * (blk < 3e38))


def main():
    scene = textured_mesh_scene(1024, 1024, backend="cluster")
    geom = scene.geom
    ex = geom.ex_tables
    n = 1024 * 1024
    sbmin = np.asarray(geom.bvh_min[0])
    sbmax = np.asarray(geom.bvh_max[0])
    o_b, d_b = bounce_rays(scene, n, 1024, 1024)
    order = sort_oct_morton(o_b, d_b, sbmin, sbmax)
    o = jnp.asarray(o_b[order])
    d = jnp.asarray(d_b[order])
    mint = jnp.full(n, 1e-3)

    @jax.jit
    def exit_cap(o, d):
        inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 3e38)
        t0 = (jnp.asarray(sbmin)[None] - o) * inv
        t1 = (jnp.asarray(sbmax)[None] - o) * inv
        return jnp.maximum(jnp.min(jnp.maximum(t0, t1), -1), 0.0) * 1.0001

    mx = exit_cap(o, d)
    caps = ep.CAPS_DIFFUSE
    prev = 0.0
    for stop in (0, 1, 2, 3):
        @jax.jit
        def f(o, d, mx, stop=stop):
            rays, _, n_rows = _pack_rays(o, d, mint, mx)
            chunks = ep._pad_rows(rays, n_rows)

            def step(s, _):
                outs = jax.lax.map(
                    lambda rc: build_stop(rc + s * 0.0, ex, caps, stop),
                    chunks)
                return jnp.sum(outs) * 1e-30, None
            s, _ = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
            return s
        t = timed(f, o, d, mx) * 1e3 / K_IT
        print(f"stop {stop}: cumulative {t:6.1f} ms/1M  (+{t-prev:6.1f})",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
