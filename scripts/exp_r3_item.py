"""Round-3: v5 item kernel in isolation (build hoisted out of timing).

Times _call_items on prebuilt (ids, blk_tn) for bounce rays at diffuse
caps, then re-times with the item list truncated to E3' in
{128, 256, 384, 512} to separate the grid-step floor (scales with
NB = E3/BI) from live MT work (fixed), and an all-dead variant
(maxt < mint, every block skipped) to isolate the pure pipeline cost.
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
from mitsuba_tpu.ops.worklist_pallas import _pack_rays
from scripts.exp_r3_twopass import bounce_rays, sort_oct_morton, timed

K_IT = 4


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

    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 3e38)
    t0 = (jnp.asarray(sbmin)[None] - o) * inv
    t1 = (jnp.asarray(sbmax)[None] - o) * inv
    maxt = jnp.maximum(jnp.min(jnp.maximum(t0, t1), -1), 1e-3)

    caps = ep.CAPS_DIFFUSE
    rays, _, n_rows = _pack_rays(o, d, mint, maxt)
    chunks = ep._pad_rows(rays, n_rows)

    @jax.jit
    def build_all(chunks):
        def f(rc):
            ids, blk, ovf = ep.build_exact_items(rc, ex, caps)
            return ids, blk
        return jax.lax.map(f, chunks)

    ids_c, blk_c = build_all(chunks)
    jax.block_until_ready(ids_c)
    nlive = jnp.sum(blk_c < ep._BIG) / (n_rows)
    print(f"rows {n_rows}, live blocks/row {float(nlive):.2f} of {caps[3]//ep.BI}")

    for e3 in (128, 256, 384, 512):
        ids_t = ids_c[:, :, :e3]
        blk_t = blk_c[:, :, :e3 // ep.BI]

        @jax.jit
        def run(chunks, ids_t, blk_t):
            def step(s, _):
                def f(args):
                    rc, idc, blc = args
                    out = ep._call_items(ex["tri"], rc, idc, blc,
                                         any_hit=False)
                    return jnp.sum(out[:, 0, :]) * 1e-30
                v = jax.lax.map(f, (chunks, ids_t, blk_t))
                return s + jnp.sum(v), None
            s, _ = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
            return s

        t = timed(run, chunks, ids_t, blk_t)
        print(f"E3={e3:4d} (NB={e3//ep.BI:3d}): {t*1e3/K_IT:7.1f} ms/1M",
              flush=True)

    # all-dead rays: every block skipped, pure grid/pipeline floor
    dead = chunks.at[:, :, 7].set(-1.0)

    @jax.jit
    def run_dead(chunks, ids_t, blk_t):
        def step(s, _):
            def f(args):
                rc, idc, blc = args
                out = ep._call_items(ex["tri"], rc, idc, blc,
                                     any_hit=False)
                return jnp.sum(out[:, 0, :]) * 1e-30
            v = jax.lax.map(f, (chunks, ids_t, blk_t))
            return s + jnp.sum(v), None
        s, _ = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
        return s

    t = timed(run_dead, dead, ids_c, blk_c)
    print(f"all-dead (NB=32 grid floor): {t*1e3/K_IT:7.1f} ms/1M", flush=True)

    # all-_BIG blk keys: blocks skipped by the ordered test, rays live
    blk_big = jnp.full_like(blk_c, ep._BIG)
    t = timed(run_dead, chunks, ids_c, blk_big)
    print(f"all-skip (live rays, do=False): {t*1e3/K_IT:7.1f} ms/1M",
          flush=True)


if __name__ == "__main__":
    main()
