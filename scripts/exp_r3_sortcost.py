"""Round-3: cost of the v5 build's XLA pieces in isolation on TPU:
sort_key_val at the stage widths, box gathers, and the conservative S0.
All dependency-chained (K_IT inside one jit)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scripts.exp_r3_twopass import timed

R = 8192
K_IT = 8


def main():
    key = jax.random.PRNGKey(0)
    for E in (192, 256, 768, 1024, 1536):
        k = jax.random.uniform(key, (R, E))
        v = jnp.arange(R * E, dtype=jnp.int32).reshape(R, E)

        @jax.jit
        def f(k, v):
            def step(c, _):
                ks, vs = jax.lax.sort_key_val(k + c, v)
                return jnp.sum(ks[:, 0]) * 1e-9, None
            c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
            return c
        t = timed(f, k, v)
        print(f"sort_key_val ({R},{E}): {t*1e3/K_IT:6.2f} ms", flush=True)

    # gather (R,E,3) boxes from a (C,3) table by (R,E) int ids
    C = 11488
    tab = jax.random.uniform(key, (C, 3))
    for E in (768, 1024):
        ids = jax.random.randint(key, (R, E), 0, C)

        @jax.jit
        def g(ids, tab):
            def step(c, _):
                x = tab[jnp.minimum(ids + c.astype(jnp.int32) * 0, C - 1)]
                return jnp.sum(x[:, 0, 0]) * 1e-9, None
            c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
            return c
        t = timed(g, ids, tab)
        print(f"gather ({R},{E},3): {t*1e3/K_IT:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
