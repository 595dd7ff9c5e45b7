"""Round-3 MT inner-loop variants: find the fast Möller–Trumbore shape.

All variants: grid=(1,), resident VMEM data, fori_loop of R iterations,
dependency-chained through an accumulator. Reports Gpairs/s.

  V0  pure-FMA ceiling (8 independent (8,128) FMA chains)
  V1  current _mt_chunks (baseline)
  V2  approx-reciprocal + packed-min (t-bits|chunk) tracking
  V3  V2 + explicit one-time broadcast of tri fields to (8,128)
  V4  division-free accept (multiply through by |det|), packed-min
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
_BIG = 3e38


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


def run_variant(make_body, R, work_per_iter, name):
    """make_body(tri_ref, rays_ref) -> body(i, acc) for fori_loop."""
    tri = jnp.asarray(
        np.random.RandomState(0).rand(1, K_CL, 16).astype(np.float32))
    rays = jnp.asarray(
        np.random.RandomState(1).rand(8, LANES).astype(np.float32))

    def kernel(tri_ref, rays_ref, out_ref):
        body = make_body(tri_ref, rays_ref)
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
    rate = 4 * R * work_per_iter / t / 1e9
    print(f"{name}: {rate:7.1f} Gpairs/s", flush=True)
    return rate


def v0_fma(tri_ref, rays_ref):
    b = rays_ref[...]

    def body(i, acc):
        accs = [acc + float(k) for k in range(8)]
        for _ in range(4):
            accs = [a * b + b for a in accs]
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        return out * 1e-6

    return body


def v1_current(tri_ref, rays_ref):
    def body(i, acc):
        t_run, k_run, u_run, v_run = wp._mt_chunks(
            tri_ref, rays_ref[...] + acc * 1e-30,
            jnp.zeros((1, LANES)), jnp.full((1, LANES), 3e38), K_CL)
        return acc + t_run + u_run

    return body


def _f2i(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _mt_v2(tri_ref, rays, mnb, t_cap, k_cl, broadcast_tri: bool):
    """Approx-reciprocal MT; track ONE packed int32 (t-bits<<5 | chunk)
    per sublane; u/v not tracked (re-derived by the caller at resolve)."""
    ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    packed = [jnp.full((8, LANES), 0x7F800000, jnp.int32) for _ in range(2)]
    for j in range(k_cl // 8):
        s = slice(j * 8, j * 8 + 8)
        f = [tri_ref[0, s, c:c + 1] for c in range(9)]
        if broadcast_tri:
            f = [jnp.broadcast_to(x, (8, LANES)) for x in f]
        v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = f
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
        inv = pl.reciprocal(det, approx=True)
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
        v = (dx * qvx + dy * qvy + dz * qvz) * inv
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
        ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t > mnb) & (t < t_cap))
        cand = jnp.where(ok, (_f2i(t) << 2) | j, 0x7F800000)
        g = j & 1
        packed[g] = jnp.minimum(packed[g], cand)
    return jnp.minimum(packed[0], packed[1])


def v2_recip_packed(tri_ref, rays_ref):
    def body(i, acc):
        p = _mt_v2(tri_ref, rays_ref[...] + acc * 1e-30,
                   jnp.zeros((1, LANES)), jnp.full((1, LANES), 3e38),
                   K_CL, broadcast_tri=False)
        return acc + p.astype(jnp.float32) * 1e-9

    return body


def v3_broadcast(tri_ref, rays_ref):
    def body(i, acc):
        p = _mt_v2(tri_ref, rays_ref[...] + acc * 1e-30,
                   jnp.zeros((1, LANES)), jnp.full((1, LANES), 3e38),
                   K_CL, broadcast_tri=True)
        return acc + p.astype(jnp.float32) * 1e-9

    return body


def _mt_v4(tri_ref, rays, mnb, t_cap, k_cl):
    """Division-free accept: multiply accepts through by |det|; approx
    reciprocal only to form comparable t."""
    ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    packed = [jnp.full((8, LANES), 0x7F800000, jnp.int32) for _ in range(2)]
    for j in range(k_cl // 8):
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
        sd = jnp.where(det >= 0, 1.0, -1.0)
        ad = det * sd
        us = (tvx * pvx + tvy * pvy + tvz * pvz) * sd
        vs = (dx * qvx + dy * qvy + dz * qvz) * sd
        ts = (e2x * qvx + e2y * qvy + e2z * qvz) * sd
        t = ts * pl.reciprocal(ad, approx=True)
        ok = ((us >= 0.0) & (vs >= 0.0) & (us + vs <= ad)
              & (t > mnb) & (t < t_cap))
        cand = jnp.where(ok, (_f2i(t) << 2) | j, 0x7F800000)
        g = j & 1
        packed[g] = jnp.minimum(packed[g], cand)
    return jnp.minimum(packed[0], packed[1])


def v4_divfree(tri_ref, rays_ref):
    def body(i, acc):
        p = _mt_v4(tri_ref, rays_ref[...] + acc * 1e-30,
                   jnp.zeros((1, LANES)), jnp.full((1, LANES), 3e38),
                   K_CL)
        return acc + p.astype(jnp.float32) * 1e-9

    return body


def main():
    R = 65536
    pairs = K_CL * LANES
    run_variant(v0_fma, R, 8 * 4 * 8 * LANES, "V0 FMA ceiling (flops eq) ")
    run_variant(v1_current, R, pairs, "V1 current _mt_chunks      ")
    run_variant(v2_recip_packed, R, pairs, "V2 recip+packed-min        ")
    run_variant(v3_broadcast, R, pairs, "V3 V2+explicit broadcast   ")
    run_variant(v4_divfree, R, pairs, "V4 division-free accept    ")


if __name__ == "__main__":
    main()
