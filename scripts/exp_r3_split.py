"""Round-3: v5 cost split on TPU — build (use_kernel on/off) vs MT
kernel, at both cap presets, bounce rays."""
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

    @jax.jit
    def exit_cap(o, d):
        inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 3e38)
        t0 = (jnp.asarray(sbmin)[None] - o) * inv
        t1 = (jnp.asarray(sbmax)[None] - o) * inv
        tex = jnp.maximum(jnp.min(jnp.maximum(t0, t1), -1), 0.0)
        return tex * 1.0001

    mx = exit_cap(o, d)

    for cname, caps in (("coh", ep.CAPS_COHERENT),
                        ("dif", ep.CAPS_DIFFUSE)):
        for uk in (True, False):
            def mk(with_mt):
                @jax.jit
                def f(o, d, mx):
                    rays, _, n_rows = _pack_rays(o, d, mint, mx)
                    chunks = ep._pad_rows(rays, n_rows)

                    def chunk_fn(rays_c):
                        ids, blk, ovf = ep.build_exact_items(
                            rays_c, ex, caps, use_kernel=uk)
                        if with_mt:
                            out = ep._call_items(ex["tri"], rays_c, ids,
                                                 blk, any_hit=False)
                            return jnp.sum(out[:, 0]) * 1e-30
                        return (jnp.sum(blk * (blk < 3e38)) +
                                jnp.sum(ids % 5)) * 1e-30

                    def step(s, _):
                        outs = jax.lax.map(
                            lambda rc: chunk_fn(rc + s * 0.0), chunks)
                        return jnp.sum(outs) * 1e-30, None
                    s, _ = jax.lax.scan(step, jnp.zeros(()), None,
                                        length=K_IT)
                    return s
                return f

            tb = timed(mk(False), o, d, mx)
            tf = timed(mk(True), o, d, mx)
            print(f"{cname} use_kernel={uk}: build {tb*1e3/K_IT:6.1f} "
                  f"ms/1M  build+mt {tf*1e3/K_IT:6.1f} ms/1M", flush=True)


if __name__ == "__main__":
    main()
