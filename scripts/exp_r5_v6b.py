"""Round-5 v6b A/B: branchless masked L1-fold (MTS_V6=2) vs shipped v5
and the round-4 branched v6 — exact-match oracle on bounce-like rays,
then query-level timing on the config-3 scene. Run on TPU."""
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
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

    (t5, u5, v5, p5, ok5, ov5), dt5 = run(0, False)
    print(f"closest v5:        {dt5*1e3:7.1f} ms  "
          f"ovf {float(jnp.mean(ov5)):.4f}", flush=True)
    for blm in (4, 8):
        (t6, u6, v6_, p6, ok6, ov6), dt6 = run(2, False, blm)
        cmp = ~(ov5 | ov6)
        same_ok = jnp.mean((ok5 == ok6)[cmp].astype(jnp.float32))
        both = cmp & ok5 & ok6
        dt_rel = jnp.max(jnp.where(both, jnp.abs(t5 - t6) /
                                   jnp.maximum(t5, 1e-6), 0.0))
        same_p = jnp.mean((p5 == p6)[both].astype(jnp.float32))
        print(f"closest v6b blm{blm}: {dt6*1e3:7.1f} ms  "
              f"ovf {float(jnp.mean(ov6)):.4f}  "
              f"agree valid={float(same_ok):.6f} prim={float(same_p):.6f} "
              f"max_rel_dt={float(dt_rel):.2e}", flush=True)
    (a5, aov5), adt5 = run(0, True)
    print(f"any v5:            {adt5*1e3:7.1f} ms", flush=True)
    for blm in (4, 8):
        (a6, aov6), adt6 = run(2, True, blm)
        acmp = ~(aov5 | aov6)
        agree = jnp.mean((a5 == a6)[acmp].astype(jnp.float32))
        print(f"any v6b blm{blm}:     {adt6*1e3:7.1f} ms  "
              f"agree={float(agree):.6f}", flush=True)


if __name__ == "__main__":
    main()
