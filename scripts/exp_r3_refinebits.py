"""Round-3: piecewise cost of _refine_keys_pallas at E=3072 on TPU:
(a) id-permute + box gathers + pack, (b) + kernel, (c) + unpack,
(d) + sort. R = 8192 rows processed in R_CHUNK chunks like production."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mitsuba_tpu.ops import exact_pallas as ep
from scripts.exp_r3_twopass import timed

R = 8192
E = 3072
C = 11488
K_IT = 4
RC = ep.R_CHUNK


def main():
    key = jax.random.PRNGKey(0)
    blo = jax.random.uniform(key, (C, 3))
    bhi = blo + 0.1
    ids = jax.random.randint(key, (R, E), 0, C)
    keep = jnp.ones((R, E), bool)
    live = jnp.full((R,), 504, jnp.int32)
    rays = jax.random.uniform(key, (R, 8, 128))

    perm = ep._pack_perm(E)
    inv = jnp.argsort(perm)

    def gp(ids_c):
        idsp = ids_c[:, perm]
        lo = blo[idsp]
        hi = bhi[idsp]
        b = jnp.concatenate([lo, hi,
                             jnp.zeros((ids_c.shape[0], E, 2), lo.dtype)],
                            -1)
        return b.reshape(-1, E // 128, 8, 128)

    def stage(stop):
        @jax.jit
        def f(ids, rays, live):
            def body(carry, c):
                s = c * RC

                def one(q):
                    ids_c = jax.lax.dynamic_slice_in_dim(ids, s, RC) + q
                    rays_c = jax.lax.dynamic_slice_in_dim(rays, s, RC)
                    live_c = jax.lax.dynamic_slice_in_dim(live, s, RC)
                    boxes = gp(ids_c)
                    if stop == 0:
                        return jnp.sum(boxes) * 1e-30
                    out = ep.pl.pallas_call(
                        ep._refine_kernel,
                        grid_spec=ep.pltpu.PrefetchScalarGridSpec(
                            num_scalar_prefetch=1,
                            grid=(RC,),
                            in_specs=[
                                ep.pl.BlockSpec((1, 8, 128),
                                                lambda r, lv: (r, 0, 0),
                                                memory_space=ep.pltpu.VMEM),
                                ep.pl.BlockSpec((1, E // 128, 8, 128),
                                                lambda r, lv: (r, 0, 0, 0),
                                                memory_space=ep.pltpu.VMEM),
                            ],
                            out_specs=ep.pl.BlockSpec(
                                (1, E // 128, 8, 128),
                                lambda r, lv: (r, 0, 0, 0),
                                memory_space=ep.pltpu.VMEM),
                        ),
                        out_shape=jax.ShapeDtypeStruct(
                            (RC, E // 128, 8, 128), jnp.float32),
                        compiler_params=ep.pltpu.CompilerParams(
                            dimension_semantics=("arbitrary",)),
                    )(live_c, rays_c, boxes)
                    if stop == 1:
                        return jnp.sum(out[:, 0, 0, 0]) * 1e-30
                    kp = out.reshape(RC, E // 128, 8, 16, 8)[
                        :, :, :, :, 0].reshape(RC, E)
                    key = kp[:, inv]
                    if stop == 2:
                        return jnp.sum(key[:, 0]) * 1e-30
                    ks, iis = jax.lax.sort_key_val(key, ids_c)
                    return (jnp.sum(ks[:, 0]) + jnp.sum(iis[:, 0])) * 1e-30
                return carry + one(0), None
            tot, _ = jax.lax.scan(body, jnp.zeros(()),
                                  jnp.arange(R // RC, dtype=jnp.int32))
            return tot

        # chain K_IT full passes
        @jax.jit
        def g(ids, rays, live):
            def step(s, _):
                return f(ids, rays, live) * 1e-30 + s * 0.0, None
            s, _ = jax.lax.scan(step, jnp.zeros(()), None, length=K_IT)
            return s
        return g

    prev = 0.0
    for stop, lbl in ((0, "gather+pack"), (1, "+kernel"), (2, "+unpack"),
                      (3, "+sort")):
        t = timed(stage(stop), ids, rays, live) * 1e3 / K_IT
        print(f"{lbl:12s}: {t:6.1f} ms (+{t-prev:6.1f})", flush=True)
        prev = t


if __name__ == "__main__":
    main()
