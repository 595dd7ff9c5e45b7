"""Microbenchmark cluster-test cost components on the real TPU.

Round-2 findings drive the v2 intersector design:
  - (512,10)x(10,128) HIGHEST matmul = 12.8 us/step (!!): K=10 uses 10/128
    of the MXU and the 6-pass f32 emulation multiplies it. The Pluecker-
    on-MXU formulation is rank-10, so the MXU peaks at ~1280 useful
    MACs/cycle while the VPU does 1024-4096 exact f32 flops/cycle.
  - Variants here: DEFAULT (1-pass bf16) matmul, batched-M matmul, raw VPU
    FMA issue rate, a full VPU Moeller-Trumbore 128-tri cluster test,
    empty (gated) grid steps, rotating-DMA steps.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/mts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

STEPS_LO = 2048
STEPS_HI = 16384
K = 128
RPC = 4 * K


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def bench(name, mk, *args, rounds=3):
    """mk(steps) -> jitted fn; slope between two grid sizes cancels the
    ~25 ms axon dispatch floor."""
    ts = []
    for steps in (STEPS_LO, STEPS_HI):
        fn = mk(steps)
        sync(fn(*args))
        best = 1e9
        for _ in range(rounds):
            t0 = time.perf_counter()
            sync(fn(*args))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    per = (ts[1] - ts[0]) / (STEPS_HI - STEPS_LO)
    print(f"{name}: {ts[0]*1e3:.2f}/{ts[1]*1e3:.2f} ms "
          f"-> {per*1e9:.0f} ns/step", flush=True)
    return per


def run_mm(name, precision, m=512, k=10):
    G = jnp.asarray(np.random.randn(m, k), jnp.float32)
    M = jnp.asarray(np.random.randn(k, 128), jnp.float32)

    def kernel(g_ref, m_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        S = jax.lax.dot_general(
            g_ref[...], m_ref[...], (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        o_ref[...] = o_ref[...] + S[0:8, :]

    def mk(steps):
      @jax.jit
      def go(G, M):
        out = pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[pl.BlockSpec((m, k), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((k, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(G, M)
        return out.sum()
      return go

    return bench(name, mk, G, M)


def run_vpu_fma(n_ops=512):
    """Raw VPU issue rate: chain of dependent (8,128) FMAs."""
    a = jnp.asarray(np.random.rand(8, 128) * 0.1 + 0.9, jnp.float32)
    b = jnp.asarray(np.random.rand(8, 128) * 1e-6, jnp.float32)

    def kernel(a_ref, b_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = a_ref[...]

        x = o_ref[...]
        bb = b_ref[...]
        for _ in range(n_ops):
            x = x * 0.999999 + bb
        o_ref[...] = x

    def mk(steps):
      @jax.jit
      def go(a, b):
        out = pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(a, b)
        return out.sum()
      return go

    t = bench(f"vpu chain of {n_ops} dependent (8,128) fma", mk, a, b)
    print(f"  -> {t / n_ops * 1e9:.2f} ns per (8,128) fma "
          f"({1024 / (t / n_ops * 0.94e9 + 1e-12):.2f} lanes*ops/cycle "
          f"@0.94GHz)")


def run_vpu_mt(kcl=128):
    """Full Moeller-Trumbore cluster test on the VPU: kcl tris (8/chunk)
    x 128 rays, f32, with running closest-hit accumulation."""
    tri = jnp.asarray(np.random.rand(1, kcl, 16), jnp.float32)
    rays = jnp.asarray(np.random.rand(1, 8, 128), jnp.float32)

    def kernel(tri_ref, ray_ref, t_o, p_o):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            t_o[...] = jnp.full_like(t_o, 1e9)
            p_o[...] = jnp.full_like(p_o, -1)

        ox, oy, oz = (ray_ref[0, 0:1, :], ray_ref[0, 1:2, :],
                      ray_ref[0, 2:3, :])
        dx, dy, dz = (ray_ref[0, 3:4, :], ray_ref[0, 4:5, :],
                      ray_ref[0, 5:6, :])
        t_run = jnp.full((8, 128), 1e9, jnp.float32)
        k_run = jnp.full((8, 128), -1, jnp.int32)
        for j in range(kcl // 8):
            s = slice(j * 8, j * 8 + 8)
            v0x = tri_ref[0, s, 0:1]
            v0y = tri_ref[0, s, 1:2]
            v0z = tri_ref[0, s, 2:3]
            e1x = tri_ref[0, s, 3:4]
            e1y = tri_ref[0, s, 4:5]
            e1z = tri_ref[0, s, 5:6]
            e2x = tri_ref[0, s, 6:7]
            e2y = tri_ref[0, s, 7:8]
            e2z = tri_ref[0, s, 8:9]
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            tvx = ox - v0x
            tvy = oy - v0y
            tvz = oz - v0z
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            inv = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
            v = (dx * qvx + dy * qvy + dz * qvz) * inv
            t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
            ok = ((jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
                  & (u + v <= 1.0) & (t > 1e-4) & (t < t_run))
            t_run = jnp.where(ok, t, t_run)
            k_run = jnp.where(ok, j, k_run)
        tm = jnp.min(t_run, axis=0, keepdims=True)
        t_o[...] = jnp.minimum(t_o[...], tm)
        p_o[...] = jnp.maximum(p_o[...], jnp.max(k_run, axis=0,
                                                 keepdims=True))

    def mk(steps):
      @jax.jit
      def go(tri, rays):
        t, p = pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[pl.BlockSpec((1, kcl, 16), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 8, 128), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, 128), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((1, 128), jnp.float32),
                       jax.ShapeDtypeStruct((1, 128), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(tri, rays)
        return t.sum() + p.sum()
      return go

    bench(f"vpu-MT {kcl}-tri cluster test", mk, tri, rays)


def run_empty(gate_true):
    G = jnp.asarray(np.random.randn(64, RPC, 16), jnp.float32)

    def kernel(ids_ref, flag_ref, g_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        @pl.when(flag_ref[i] > 0)
        def _():
            o_ref[...] = o_ref[...] + jnp.sum(g_ref[0, 0:8, :], axis=1,
                                              keepdims=True)

    def mk(steps):
      ids = jnp.zeros((steps,), jnp.int32)
      flag = jnp.full((steps,), 1 if gate_true else 0, jnp.int32)
      @jax.jit
      def go(G):
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(steps,),
                in_specs=[pl.BlockSpec((1, RPC, 16),
                                       lambda i, ids, flag: (ids[i], 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, 128),
                                       lambda i, ids, flag: (0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(ids, flag, G)
        return out.sum()
      return go

    return bench(f"gated step (gate={'on' if gate_true else 'off'})",
                 mk, G)


def run_dma_rotate(block_kb=8):
    n_blocks = 64
    rows = block_kb * 1024 // (16 * 4)
    G = jnp.asarray(np.random.randn(n_blocks, rows, 16), jnp.float32)

    def kernel(ids_ref, g_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] = o_ref[...] + jnp.sum(g_ref[0, 0:8, :], axis=1,
                                          keepdims=True)

    def mk(steps):
      ids = jnp.arange(steps, dtype=jnp.int32) % n_blocks
      @jax.jit
      def go(G):
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(steps,),
                in_specs=[pl.BlockSpec((1, rows, 16),
                                       lambda i, ids: (ids[i], 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, 128), lambda i, ids: (0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(ids, G)
        return out.sum()
      return go

    return bench(f"rotating-DMA step ({block_kb}KB/step)", mk, G)


def main():
    print(f"slope between {STEPS_LO} and {STEPS_HI} steps")
    P = jax.lax.Precision
    run_vpu_fma()
    run_vpu_mt(128)
    run_vpu_mt(32)
    run_mm("mm(512,10)x(10,128) DEFAULT", P.DEFAULT)
    run_mm("mm(4096,10)x(10,128) DEFAULT (8-cluster batch)", P.DEFAULT,
           m=4096)
    run_mm("mm(4096,10)x(10,128) HIGHEST (8-cluster batch)", P.HIGHEST,
           m=4096)
    run_mm("mm(512,128)x(128,128) DEFAULT ref", P.DEFAULT, k=128)
    run_empty(False)
    run_empty(True)
    run_dma_rotate(8)
    run_dma_rotate(32)


if __name__ == "__main__":
    main()
