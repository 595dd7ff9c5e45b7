"""Headline benchmark: Cornell-box depth-5 path tracing throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value
is Mrays/s on the current default JAX device (the real TPU chip under the
driver) and vs_baseline is value / 50 (BASELINE.json: >=50 Mrays/s/chip).

Rays counted = closest-hit rays + shadow rays actually traced (the same
accounting as the reference's kdbench MRays/s, src/utils/kdbench.cpp:210).
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from mitsuba_tpu.integrators import PathConfig
    from mitsuba_tpu.integrators.path import path_trace
    from mitsuba_tpu.render.sampler import Sampler
    from mitsuba_tpu.render.scene import cornell_box

    w = h = 256
    spp = 64
    cfg = PathConfig(max_depth=5, spp=spp, remat=False)
    scene = cornell_box(w, h, backend="brute")

    n = w * h * spp
    pixel_id = jnp.arange(n) // spp
    sample_id = (jnp.arange(n) % spp).astype(jnp.int32)

    @jax.jit
    def run(scene, pixel_id, sample_id):
        px = (pixel_id % w).astype(jnp.float32)
        py = (pixel_id // w).astype(jnp.float32)
        sampler = Sampler(0, pixel_id, sample_id)
        offset = sampler.next_2d()
        uv = jnp.stack([(px + offset[:, 0]) / w, (py + offset[:, 1]) / h], -1)
        ray = scene.camera.sample_ray(uv)
        L, aux = path_trace(scene, ray, sampler, cfg)
        img = L.reshape(h, w, spp, 3).mean(axis=2)
        return img, aux["rays_traced"]

    # compile
    img, rays = run(scene, pixel_id, sample_id)
    img.block_until_ready()
    rays_traced = float(rays)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        img, rays = run(scene, pixel_id, sample_id)
        img.block_until_ready()
        best = min(best, time.perf_counter() - t0)

    mrays = rays_traced / best / 1e6
    print(
        json.dumps(
            {
                "metric": "cornell_box_depth5_path_tracing",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 50.0, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
