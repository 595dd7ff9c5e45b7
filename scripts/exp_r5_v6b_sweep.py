"""v6b blm sweep (12/16/24) at query level, then config-3 e2e at the
best setting. Run on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mitsuba_tpu.ops import exact_pallas as ep
from mitsuba_tpu.render.scene import textured_mesh_scene


def main():
    n = 1 << 20
    scene = textured_mesh_scene(64, 64, backend="cluster")
    geom = scene.geom
    ex = geom.ex_tables
    dif = geom.ex_caps[0]

    rng = np.random.default_rng(7)
    lo = np.asarray(geom.bvh_min[0]); hi = np.asarray(geom.bvh_max[0])
    o = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    key = (d[:, 0] > 0) * 4 + (d[:, 1] > 0) * 2 + (d[:, 2] > 0)
    order = np.argsort(key, kind="stable")
    o = o[order]; d = jnp.asarray(d[order])
    mint = jnp.full((n,), 1e-3); maxt = jnp.full((n,), 1e9)

    def run(v6, any_hit, blm=4):
        f = ep._exact_any_jit if any_hit else ep._exact_closest_jit
        out = jax.jit(lambda: f(ex, o, d, mint, maxt, caps=dif,
                                interpret=False, v6=v6,
                                blm=blm)).lower().compile()
        r = out(); jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); r = out()
            jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
            best = min(best, time.perf_counter() - t0)
        return r, best

    for blm in (12, 16, 24):
        _, dtc = run(2, False, blm)
        _, dta = run(2, True, blm)
        print(f"v6b blm{blm}: closest {dtc*1e3:7.1f} ms  "
              f"any {dta*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
