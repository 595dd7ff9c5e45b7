"""Round-3: XLA build-side costs for the v4 per-row streaming worklist.

  1. full-width SC slab: (8192 rows, 392 SC boxes) interval slab
  2. per-row sort: jax.lax.sort_key_val over (8192, 392)
  3. 1M-lane argsort (per-bounce ray ordering cost check)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


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


def main():
    rng = np.random.RandomState(0)
    K_IT = 8

    keys = jnp.asarray(rng.rand(8192, 392).astype(np.float32))
    vals = jnp.asarray(rng.randint(0, 392, (8192, 392)).astype(np.int32))

    @jax.jit
    def rowsort(keys, vals):
        def step(s, _):
            k, v = jax.lax.sort_key_val(keys + s, vals)
            return k[0, 0] * 1e-30, None
        s, _ = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
        return s

    t = timed(rowsort, keys, vals)
    print(f"1. row sort (8192,392):   {t*1e3/K_IT:7.2f} ms", flush=True)

    k1m = jnp.asarray(rng.randint(0, 2**31 - 1, 1 << 20).astype(np.int32))

    @jax.jit
    def argsort1m(k):
        def step(s, _):
            o = jnp.argsort(k + s.astype(jnp.int32))
            return o[0] * 0 + o[-1] * 0 + 1, None
        s, _ = jax.lax.scan(step, jnp.zeros((), jnp.int32), None,
                            length=K_IT)
        return s

    t = timed(argsort1m, k1m)
    print(f"2. argsort 1M int32:      {t*1e3/K_IT:7.2f} ms", flush=True)

    @jax.jit
    def sortkv1m(k):
        def step(s, _):
            kk, vv = jax.lax.sort_key_val(
                k + s.astype(jnp.int32), jnp.arange(1 << 20, dtype=jnp.int32))
            return kk[0] * 0 + vv[-1] * 0 + 1, None
        s, _ = jax.lax.scan(step, jnp.zeros((), jnp.int32), None,
                            length=K_IT)
        return s

    t = timed(sortkv1m, k1m)
    print(f"3. sort_key_val 1M int32: {t*1e3/K_IT:7.2f} ms", flush=True)

    # full-width slab: rows x SC boxes (computed as in build_worklist)
    olo = jnp.asarray(rng.rand(8192, 3).astype(np.float32))
    ohi = olo + 0.01
    ilo = jnp.asarray(rng.rand(8192, 3).astype(np.float32) + 0.5)
    ihi = ilo + 0.1
    bmin = jnp.asarray(rng.rand(392, 3).astype(np.float32))
    bmax = bmin + 0.2

    @jax.jit
    def slab(olo, ohi, ilo, ihi, bmin, bmax):
        def step(s, _):
            a_lo = bmin[None] - ohi[:, None] + s
            a_hi = bmin[None] - olo[:, None]
            b_lo = bmax[None] - ohi[:, None]
            b_hi = bmax[None] - olo[:, None]

            def mul(alo, ahi, blo, bhi):
                p = [alo * blo, alo * bhi, ahi * blo, ahi * bhi]
                return (jnp.minimum(jnp.minimum(p[0], p[1]),
                                    jnp.minimum(p[2], p[3])),
                        jnp.maximum(jnp.maximum(p[0], p[1]),
                                    jnp.maximum(p[2], p[3])))

            ta_lo, ta_hi = mul(a_lo, a_hi, ilo[:, None], ihi[:, None])
            tb_lo, tb_hi = mul(b_lo, b_hi, ilo[:, None], ihi[:, None])
            tn = jnp.maximum(jnp.minimum(ta_lo, tb_lo).max(-1), 0.0)
            tf = jnp.maximum(ta_hi, tb_hi).min(-1)
            return jnp.sum(tn <= tf).astype(jnp.float32) * 1e-30, None
        s, _ = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
        return s

    t = timed(slab, olo, ohi, ilo, ihi, bmin, bmax)
    print(f"4. slab (8192,392):       {t*1e3/K_IT:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
