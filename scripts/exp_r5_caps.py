"""Round-5: exact-cull capacity sweep under v6b. The masked fold has no
S3, so E2/E3 only size the item grid + SMEM; E1 sizes the S2 refine +
its 8*E1-wide sort (a top build stage). Live L1/row p99 = 137 suggests
headroom. e2e per variant (retier catches the extra overflow)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import bench_scene
from mitsuba_tpu.core.types import replace
from mitsuba_tpu.render.scene import textured_mesh_scene


def main():
    s3 = textured_mesh_scene(512, 512, backend="cluster")
    base = s3.geom.ex_caps
    print("base caps:", base, flush=True)
    variants = {
        "base": base,
        "e1_96": (base[0], (base[0][0], 96, base[0][2], base[0][3]),
                  base[1], base[2]),
        "e1_96_e2_288": (base[0],
                         (base[0][0], 96, 288, base[0][3]),
                         base[1], base[2]),
    }
    # ex_caps layout: (diffuse, coherent, xl)
    for name, caps in variants.items():
        if name == "base":
            dif, coh, xl = base
        else:
            _, dif, coh, xl = caps
        sc = replace(s3, geom=replace(s3.geom, ex_caps=(dif, coh, xl)))
        m = bench_scene(sc, spp=4, depth=5, morton=True)
        print(f"{name}: caps_dif={dif} -> {m:.3f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
