"""Round-4: what inside sample_direct costs what (config-3 sky emitter)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mitsuba_tpu.render.scene import textured_mesh_scene
from mitsuba_tpu.emitters import sample_direct
from mitsuba_tpu.emitters.envmap import env_sample, env_eval, latlong_uv_to_dir
from mitsuba_tpu.render.sampler import Sampler

K_IT = 4


def timed(f, *a):
    out = f(*a)
    s = float(jnp.asarray(out).ravel()[0])
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        out = f(*a)
        s = float(jnp.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    scene = textured_mesh_scene(512, 512, backend="cluster")
    em = scene.emitters
    n = 1 << 20
    key = jax.random.key(0)
    o = jax.random.uniform(key, (n, 3), minval=-1, maxval=1)
    u1 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    u2 = jax.random.uniform(jax.random.fold_in(key, 2), (n, 2))

    def chain(f):
        def g(o, u1, u2):
            acc = jnp.zeros(())
            for k in range(K_IT):
                acc = acc + f(o + acc * 0.0, u1, u2)
            return acc
        return jax.jit(g)

    def f_sampler(o, u1, u2):
        smp = Sampler(3, jnp.arange(n), jnp.zeros(n, jnp.int32))
        a = smp.next_1d()
        b = smp.next_2d()
        return jnp.sum(a) * 1e-30 + jnp.sum(b) * 1e-30 + o[0, 0] * 0.0
    print(f"sampler 1d+2d : {timed(chain(f_sampler), o, u1, u2)/K_IT*1e3:7.1f} ms/1M", flush=True)

    def f_envsample(o, u1, u2):
        d, pdf = env_sample(em.env_prob, em.env_alias, em.env_pdf_img, u2,
                            from_env=em.env_to_world)
        return jnp.sum(d) * 1e-30 + jnp.sum(pdf) * 1e-30 + o[0, 0] * 0.0
    print(f"env_sample    : {timed(chain(f_envsample), o, u1, u2)/K_IT*1e3:7.1f} ms/1M", flush=True)

    def f_enveval(o, u1, u2):
        d, _ = env_sample(em.env_prob, em.env_alias, em.env_pdf_img, u2,
                          from_env=em.env_to_world)
        v = env_eval(em.env_image, d, to_env=em.env_to_env)
        return jnp.sum(v) * 1e-30 + o[0, 0] * 0.0
    print(f"+ env_eval    : {timed(chain(f_enveval), o, u1, u2)/K_IT*1e3:7.1f} ms/1M", flush=True)

    def f_full(o, u1, u2):
        ds = sample_direct(em, scene.geom, o, u1, u2)
        return jnp.sum(ds.d) * 1e-30 + jnp.sum(ds.value) * 1e-30
    print(f"sample_direct : {timed(chain(f_full), o, u1, u2)/K_IT*1e3:7.1f} ms/1M", flush=True)


if __name__ == "__main__":
    main()
