"""Round-5 megakernel spike (VERDICT #2): can a fused Pallas bounce
kernel beat the wavefront glue floor?

The glue is GATHER-bound (law 1: ~11 ms per 1M-lane gather; the
compute between gathers measures <= 60 ms/bounce total and XLA already
fuses it). So the megakernel question reduces to: can an IN-KERNEL
gather from a VMEM-resident table (the env radiance/alias rows, material
rows, shading attributes) beat XLA's gather?  TPU has no per-lane gather
hardware — a kernel gathers by iota-compare one-hot + sum-reduce, whose
cost is lanes*K compares per 128-lane row.  This measures that crossover
vs table size K.

Output: ms per 1M gathered elements, XLA vs in-kernel, K = 512..32768
(the envmap is 32k texels, the material table <= 64 rows)."""
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

N = 1 << 20
LANES = 128


def xla_gather(table, idx):
    return table[idx]


def make_kernel(K):
    def kernel(idx_ref, tab_ref, out_ref):
        idx = jax.lax.bitcast_convert_type(idx_ref[0],
                                           jnp.int32)   # (1, LANES)
        acc = jnp.zeros((1, LANES), jnp.float32)
        # table lives in VMEM as (K//LANES, LANES); one-hot selection:
        # for each table row block, compare the lane's target id against
        # the block's flat iota and accumulate the masked value
        nb = K // LANES
        for b in range(nb):
            col = jax.lax.broadcasted_iota(
                jnp.int32, (LANES, LANES), 0) + b * LANES
            # row k of `col` is table entry b*LANES+k broadcast over
            # lanes; match (k, l) says lane l wants entry k
            match = (jnp.broadcast_to(idx, (LANES, LANES))
                     == col).astype(jnp.float32)          # (K_blk, L)
            tb = tab_ref[b:b + 1, :]                      # (1, LANES)
            # value for lane l = sum_k match[k, l] * tab[b, k]:
            # broadcast tab entries down rows via transpose-free trick:
            # tab row is laid out over LANES; entry k sits at lane k, so
            # multiply match[k, :] by scalar tab[k]... vectorized as a
            # (L, L) x (L, 1) matmul on the MXU
            acc = acc + jax.lax.dot_general(
                tb, match, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[0, :, :] = jnp.broadcast_to(acc, (8, LANES))[:, :]
    return kernel


def pallas_gather(table, idx, K, interpret=False):
    rows = idx.shape[0] // LANES
    idxf = jax.lax.bitcast_convert_type(
        idx.astype(jnp.int32), jnp.float32).reshape(rows, 1, LANES)
    tab = table.reshape(K // LANES, LANES)
    out = pl.pallas_call(
        make_kernel(K),
        grid=(rows,),
        in_specs=[
            pl.BlockSpec((1, 1, LANES), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tab.shape, lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 8, LANES), jnp.float32),
        interpret=interpret,
    )(idxf, tab)
    return out[:, 0, :].reshape(-1)


def timed(f, *a):
    out = f(*a)
    _ = float(jnp.asarray(out).ravel()[0])
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        out = f(*a)
        _ = float(jnp.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    for K in (512, 2048, 8192, 32768):
        table = jnp.asarray(rng.random(K).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, K, N).astype(np.int32))
        t_x = timed(jax.jit(xla_gather), table, idx)
        f_p = jax.jit(lambda t, i, K=K: pallas_gather(t, i, K))
        t_p = timed(f_p, table, idx)
        # MXU one-hot selection rounds through bf16 inputs — compare
        # with tolerance (the selected ELEMENT is right; its low
        # mantissa bits aren't)
        err = float(jnp.max(jnp.abs(pallas_gather(table, idx, K)
                                    - xla_gather(table, idx))))
        print(f"K={K:6d}: XLA {t_x*1e3:7.2f} ms  in-kernel "
              f"{t_p*1e3:7.2f} ms  max_abs_err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
