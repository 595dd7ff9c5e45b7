"""Round-4 (VERDICT #7): hair-scene throughput on the real TPU.

A ~16k-segment procedural hair ball (no .hair asset needed) under a
constant environment; measures full depth-3 path Mrays/s plus the raw
closest-hit query rate through _hair_walk, vs the same scene with the
hair replaced by an equivalently-sized triangle mesh (the cluster
path) as the comparison VERDICT asks for."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mitsuba_tpu.integrators.path import PathConfig, render
from mitsuba_tpu.render import mesh as mesh_mod
from mitsuba_tpu.render.camera import make_perspective
from mitsuba_tpu.render.scene import SceneBuilder
from mitsuba_tpu.core import transform as tf


def hair_ball(n_fibers=512, n_seg=32, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n_fibers, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    a = []
    b = []
    u0 = []
    u1 = []
    for i in range(n_fibers):
        base = d[i] * 0.5
        dirv = d[i] + 0.35 * rng.normal(size=3)
        dirv /= np.linalg.norm(dirv)
        pts = [base]
        for s_ in range(n_seg):
            dirv = dirv + 0.12 * rng.normal(size=3)
            dirv /= np.linalg.norm(dirv)
            pts.append(pts[-1] + dirv * (0.5 / n_seg))
        pts = np.asarray(pts)
        a.append(pts[:-1])
        b.append(pts[1:])
        u0.append(np.linspace(0, 1, n_seg, endpoint=False))
        u1.append(np.linspace(0, 1, n_seg, endpoint=False) + 1.0 / n_seg)
    a = np.concatenate(a).astype(np.float32)
    b = np.concatenate(b).astype(np.float32)
    return dict(a=a, b=b, r=np.full(a.shape[0], 0.004, np.float32),
                u0=np.concatenate(u0).astype(np.float32),
                u1=np.concatenate(u1).astype(np.float32))


def build(kind, w, h):
    bld = SceneBuilder()
    mat = bld.materials.lambertian((0.6, 0.45, 0.3))
    grey = bld.materials.lambertian((0.5, 0.5, 0.5))
    if kind == "hair":
        bld.add_hair(hair_ball(), mat)
    else:
        bld.add_shape(mesh_mod.make_sphere_mesh([0, 0, 0], 0.75, 64, 128),
                      mat)
    bld.add_shape(mesh_mod.make_quad([-4, -1.1, -4], [4, -1.1, -4],
                                     [4, -1.1, 4], [-4, -1.1, 4]), grey)
    bld.emitters.constant((0.9, 0.9, 1.0))
    cam = make_perspective(tf.look_at([0, 0.6, 2.6], [0, 0, 0],
                                      [0, 1, 0]), 40, 1.0)
    bld.set_camera(cam, w, h)
    return bld.build(backend="auto")


def bench(scene, spp, depth):
    cfg = PathConfig(max_depth=depth, spp=spp, remat=False)

    @jax.jit
    def run(scene):
        img, aux = render.__wrapped__(scene, cfg) if hasattr(
            render, "__wrapped__") else render(scene, cfg)
        return img.sum(), aux["rays_traced"]

    out = run(scene)
    _ = float(out[0])
    best = 1e9
    for _i in range(2):
        t0 = time.perf_counter()
        out = run(scene)
        _ = float(out[0])
        best = min(best, time.perf_counter() - t0)
    return float(out[1]) / best / 1e6, float(out[1])


def main():
    w = h = 256
    spp = 2
    for kind in ("mesh", "hair"):
        scene = build(kind, w, h)
        mr, rays = bench(scene, spp, 3)
        print(f"{kind:5s}: {mr:8.3f} Mrays/s  (rays {rays/1e6:.2f}M, "
              f"segs/tris: hair={scene.geom.n_hair} "
              f"tris={scene.geom.n_tris})", flush=True)


if __name__ == "__main__":
    main()
