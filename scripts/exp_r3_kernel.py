"""Round-3 kernel microbench: decompose the work-list item cost.

Measured components (all dependency-chained inside one jit, K_IT reps):
  A. grid-step floor: near-empty kernel, grid=(W,), scalar-prefetch item
     list, NO block re-fetches (constant index maps)  -> ns/step
  B. + tri-block fetch per step (the real _tri_spec index map) -> DMA cost
  C. MT math ceiling: grid=(1,), fori_loop over R reps of the exact
     _mt_chunks body on a VMEM-resident block -> Gpairs/s ceiling
  D. wl_probe (grid + DMA + slab, no MT) on the real bunny worklist
  E. wl_closest on the same worklist (reference point)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/mts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mitsuba_tpu.ops import worklist_pallas as wp

LANES = 128
K_CL = 32


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timed(f, *a, rounds=3):
    sync(f(*a))
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        sync(f(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_grid_floor(W, fetch_tri: bool, n_tri_blocks=2048):
    """A/B: near-empty kernel over W grid steps."""
    items = jnp.arange(W, dtype=jnp.int32) % n_tri_blocks

    def kernel(items_ref, tri_ref, out_ref):
        w = pl.program_id(0)

        @pl.when(w == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        out_ref[0, 0:1, :] = out_ref[0, 0:1, :] + tri_ref[0, 0:1, :]

    if fetch_tri:
        tri_idx = lambda w, items: (items[w], 0, 0)
    else:
        tri_idx = lambda w, items: (0, 0, 0)
    # (4, 128) f32 = 2 KB = same bytes as the real (32, 16) cluster block
    tri = jnp.ones((n_tri_blocks, 4, LANES), jnp.float32)

    @jax.jit
    def run(items, tri):
        def step(s, _):
            out = pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(W,),
                    in_specs=[pl.BlockSpec((1, 4, LANES), tri_idx,
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((1, 8, LANES),
                                           lambda w, items: (0, 0, 0),
                                           memory_space=pltpu.VMEM),
                ),
                out_shape=jax.ShapeDtypeStruct((1, 8, LANES), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(items + s.astype(jnp.int32) * 0, tri)
            return out[0, 0, 0] * 1e-30, None

        s, _ = jax.lax.scan(step, jnp.zeros(()), None, length=4)
        return s

    t = timed(run, items, tri)
    return t / 4 / W * 1e9   # ns per grid step


def bench_mt_ceiling(R=4096):
    """C: _mt_chunks in a tight loop on resident data."""
    tri = jnp.ones((1, K_CL, 16), jnp.float32) * 0.3
    rays = jnp.ones((8, LANES), jnp.float32) * 0.7

    def kernel(tri_ref, rays_ref, out_ref):
        def body(i, acc):
            t_run, k_run, u_run, v_run = wp._mt_chunks(
                tri_ref, rays_ref[...] + acc * 1e-30,
                jnp.zeros((1, LANES)), jnp.full((1, LANES), 3e38), K_CL)
            return acc + t_run

        out_ref[...] = jax.lax.fori_loop(
            0, R, body, jnp.zeros((8, LANES), jnp.float32))

    @jax.jit
    def run(tri, rays):
        def step(s, _):
            out = pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
            )(tri, rays + s * 0.0)
            return out[0, 0] * 1e-30, None

        s, _ = jax.lax.scan(step, jnp.zeros(()), None, length=4)
        return s

    t = timed(run, tri, rays)
    pairs = 4 * R * K_CL * LANES
    return pairs / (t) / 1e9   # Gpairs/s


def main():
    print(f"A. grid floor (no fetch):   "
          f"{bench_grid_floor(200_000, False):6.1f} ns/step", flush=True)
    print(f"B. grid + tri-block fetch:  "
          f"{bench_grid_floor(200_000, True):6.1f} ns/step", flush=True)
    print(f"C. MT ceiling (resident):   "
          f"{bench_mt_ceiling():6.1f} Gpairs/s "
          f"(= {bench_mt_ceiling() * 1e9 / K_CL / LANES:.0f} items/s eq)",
          flush=True)


if __name__ == "__main__":
    main()
