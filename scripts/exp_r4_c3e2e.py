"""Round-4: config-3 end-to-end Mrays/s quick check (bench config-3
verbatim, runnable standalone after every landed change)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import bench_scene
from mitsuba_tpu.render.scene import textured_mesh_scene


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    s3 = textured_mesh_scene(res, res, backend="cluster")
    m3 = bench_scene(s3, spp=spp, depth=5, morton=True)
    print(f"config-3 {res}x{res}x{spp} depth-5: {m3:.3f} Mrays/s",
          flush=True)


if __name__ == "__main__":
    main()
