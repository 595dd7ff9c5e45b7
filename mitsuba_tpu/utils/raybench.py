"""Ray-throughput microbenchmark — the kdbench analog.

Capability parity with src/utils/kdbench.cpp:210-237: trace N random
incoherent rays through a scene's acceleration structure, best-of-3 MRays/s.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.render.intersect import ray_intersect, ray_test
from mitsuba_tpu.render.records import Ray


def random_rays_in_aabb(key, n, bmin, bmax, scale=1.5):
    center = (np.asarray(bmin) + np.asarray(bmax)) * 0.5
    extent = (np.asarray(bmax) - np.asarray(bmin)) * 0.5 * scale
    k1, k2 = jax.random.split(key)
    o = jnp.asarray(center) + (jax.random.uniform(k1, (n, 3)) * 2 - 1) * jnp.asarray(extent)
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return Ray.make(o, d)


def bench_rays(geom, n: int = 5_000_000, rounds: int = 3, shadow: bool = False,
               seed: int = 0):
    """Returns (mrays_per_sec, best_time). Mirrors kdbench: 5M incoherent
    rays, best of `rounds`."""
    bmin = np.asarray(jnp.min(geom.v0, axis=0))
    bmax = np.asarray(
        jnp.max(geom.v0 + jnp.maximum(geom.e1, 0) + jnp.maximum(geom.e2, 0), axis=0)
    )
    ray = random_rays_in_aabb(jax.random.key(seed), n, bmin, bmax)
    fn = jax.jit(lambda g, r: (ray_test(g, r) if shadow else ray_intersect(g, r).t))
    out = fn(geom, ray)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = fn(geom, ray)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return n / best / 1e6, best
