"""Round-3: v5 PRODUCTION-path split (child-refine kernels), bounce
rays, diffuse caps. Stops: S0 | +S1 | +S2(child) | +S3(child) = full
build | + item kernel (= exact_closest)."""
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
    ids0f, tns0f = ep.build_sc_lists(rays, ex["b2_lo"], ex["b2_hi"])
    n0 = jnp.sum(tns0f[:, 0, :] < ep._BIG, -1)
    ids0 = ids0f[:, 0, :E0]
    keep0 = tns0f[:, 0, :E0] < ep._BIG
    live0 = jnp.minimum(n0, E0).astype(jnp.int32)
    if stop == 0:
        return jnp.sum(ids0 % 5) + jnp.sum(live0)
    key1 = ep._refine_keys_pallas(rays, ids0, keep0, live0, ex["b2_lo"],
                                  ex["b2_hi"], False)
    key1s, ids1 = jax.lax.sort_key_val(key1, ids0)
    n1 = jnp.sum(key1 < ep._BIG, -1)
    ids1 = ids1[:, :E1]
    keep1 = key1s[:, :E1] < ep._BIG
    live1p = jnp.minimum(n1, E1).astype(jnp.int32)
    if stop == 1:
        return jnp.sum(ids1 % 5) + jnp.sum(live1p)
    ids64 = (ids1[:, :, None] * 8
             + jnp.arange(8, dtype=jnp.int32)[None, None]).reshape(R, -1)
    keep64 = jnp.repeat(keep1, 8, axis=1)
    key2 = ep._child_refine(rays, ids1, live1p, ex["ct1"], keep64, False)
    key2s, ids2 = jax.lax.sort_key_val(key2, ids64)
    n2 = jnp.sum(key2 < ep._BIG, -1)
    ids2 = ids2[:, :E2]
    keep2 = key2s[:, :E2] < ep._BIG
    live2p = jnp.minimum(n2, E2).astype(jnp.int32)
    if stop == 2:
        return jnp.sum(ids2 % 5) + jnp.sum(live2p)
    if stop == 25:  # S3 child kernel, NO final sort
        key3 = ep._child_refine(rays, ids2, live2p, ex["ct0"],
                                jnp.repeat(keep2, 8, axis=1), False)
        return jnp.sum(key3 * 1e-30) + jnp.sum(live2p)
    ids, blk_tn, ovf = ep.build_exact_items(rays, ex, caps)
    return jnp.sum(ids % 5) + jnp.sum(blk_tn * 1e-30)


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
        return jnp.maximum(jnp.min(jnp.maximum(t0, t1), -1), 1e-3)

    maxt = exit_cap(o, d)
    caps = ep.CAPS_DIFFUSE
    prev = 0.0
    for stop in (0, 1, 2, 25, 3):
        @jax.jit
        def run(o, d, mx, stop=stop):
            rays, _, n_rows = _pack_rays(o, d, mint, mx)
            chunks = ep._pad_rows(rays, n_rows)

            def step(s, _):
                out = jax.lax.map(
                    lambda rc: build_stop(rc, ex, caps, stop), chunks)
                return s + jnp.sum(out) * 1e-30, None

            s, _ = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
            return s

        t = timed(run, o, d, maxt)
        ms = t * 1e3 / K_IT
        print(f"stop {stop}: cumulative {ms:6.1f} ms/1M  (+{ms - prev:6.1f})",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
