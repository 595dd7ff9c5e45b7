"""Regenerate docs/SCALING.md's measured table on the 8-virtual-CPU-
device mesh (VERDICT round-4 #4: the committed table must describe the
SHIPPED code, not a two-generations-old bounce body). Runs the weak-
scaling harness on both bench-relevant backends:

  * Cornell (brute backend) depth-4 — the round-2 configuration, kept
    for comparability;
  * the bumpy-mesh CLUSTER scene with the exact-cull v5 path forced in
    interpret mode (MTS_FORCE_EXACT=1) — the backend whose row
    structures are population-dependent.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

from mitsuba_tpu.integrators.path import PathConfig
from mitsuba_tpu.parallel.scaling import measure_scaling, scaling_efficiency
from mitsuba_tpu.render.scene import cornell_box


def report(tag, res):
    eff = scaling_efficiency(res)
    print(f"## {tag}")
    print("| devices | rays/s  | efficiency |")
    print("|---------|---------|------------|")
    for nd in sorted(res):
        print(f"| {nd}       | {res[nd]:,.0f} | {eff[nd]:.3f}      |")
    print(flush=True)


def main():
    scene = cornell_box(64, 32, backend="brute")
    cfg = PathConfig(max_depth=4, spp=4, remat=False)
    res = measure_scaling(scene, cfg, rows_per_device=32, rounds=2)
    report("cornell brute depth-4 (weak, 32 rows/device, 4 spp)", res)

    os.environ["MTS_FORCE_EXACT"] = "1"
    jax.clear_caches()
    import importlib.util

    tp = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "test_parallel.py")
    spec = importlib.util.spec_from_file_location("_test_parallel", tp)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sc = mod._bumpy_cluster_scene()
    cfg2 = PathConfig(max_depth=3, spp=2, remat=False)
    res2 = measure_scaling(sc, cfg2, rows_per_device=16, rounds=1,
                           device_counts=[1, 2, 4, 8])
    report("bumpy-mesh cluster v5 exact (interpret) depth-3", res2)


if __name__ == "__main__":
    main()
