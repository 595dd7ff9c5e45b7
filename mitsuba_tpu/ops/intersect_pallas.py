"""Pallas TPU kernels for ray–triangle intersection (brute-force scenes).

The pure-XLA all-pairs intersector (render/intersect.py::_closest_brute)
materializes (N, T, 3) intermediates in HBM — bandwidth-bound at ~11 Mrays/s.
These kernels keep a tile of rays resident in VMEM and loop over triangles
held in SMEM, so each ray field is read from HBM exactly once and all
T × ~60 flops/ray happen on-chip: compute-bound, the speed-of-light
formulation for small scenes (Cornell class; the BVH kernel covers big ones).

Layout: ray fields as (M, 128) f32 (lane dim 128), triangles as an
(T, 9) SMEM table [v0|e1|e2]. Grid over ray tiles of (BM, 128).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BM = 32           # sublane tile: BM*128 rays per program (large tiles
                  # amortize per-program grid overhead)
_DET_EPS = 1e-9


def _mt_tile(tri_ref, j, ox, oy, oz, dx, dy, dz):
    """Möller–Trumbore for one triangle j against a (BM,128) ray tile.
    Returns (t, u, v, det_ok)."""
    v0x, v0y, v0z = tri_ref[j, 0], tri_ref[j, 1], tri_ref[j, 2]
    e1x, e1y, e1z = tri_ref[j, 3], tri_ref[j, 4], tri_ref[j, 5]
    e2x, e2y, e2z = tri_ref[j, 6], tri_ref[j, 7], tri_ref[j, 8]
    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    det_ok = jnp.abs(det) > _DET_EPS
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    return t, u, v, det_ok


_UNROLL_LIMIT = 128    # fully unroll the triangle loop below this count —
                       # Mosaic pipelines straight-line code far better than
                       # an scf.for with SMEM-dependent bodies


def _closest_kernel(n_tris, tri_ref, ox, oy, oz, dx, dy, dz, mint, maxt,
                    t_out, u_out, v_out, prim_out, hit_out):
    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    mn, mx = mint[...], maxt[...]

    def body(j, state):
        t_best, u_best, v_best, prim_best = state
        t, u, v, det_ok = _mt_tile(tri_ref, j, o_x, o_y, o_z, d_x, d_y, d_z)
        hit = (
            det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > mn) & (t < mx) & (t < t_best)
        )
        t_best = jnp.where(hit, t, t_best)
        u_best = jnp.where(hit, u, u_best)
        v_best = jnp.where(hit, v, v_best)
        prim_best = jnp.where(hit, j, prim_best)
        return t_best, u_best, v_best, prim_best

    state = (
        jnp.full(o_x.shape, jnp.inf, jnp.float32),
        jnp.zeros(o_x.shape, jnp.float32),
        jnp.zeros(o_x.shape, jnp.float32),
        jnp.full(o_x.shape, -1, jnp.int32),
    )
    if n_tris <= _UNROLL_LIMIT:
        for j in range(n_tris):
            state = body(j, state)
    else:
        state = jax.lax.fori_loop(0, n_tris, body, state)
    t_best, u_best, v_best, prim_best = state
    t_out[...] = t_best
    u_out[...] = u_best
    v_out[...] = v_best
    prim_out[...] = prim_best
    hit_out[...] = (prim_best >= 0).astype(jnp.int32)


def _any_kernel(n_tris, tri_ref, ox, oy, oz, dx, dy, dz, mint, maxt, hit_out):
    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    mn, mx = mint[...], maxt[...]

    def body(j, occluded):
        t, u, v, det_ok = _mt_tile(tri_ref, j, o_x, o_y, o_z, d_x, d_y, d_z)
        hit = (
            det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > mn) & (t < mx)
        )
        # int32 carry: Mosaic cannot legalize a loop-carried bool vector
        return occluded | hit.astype(jnp.int32)

    occluded = jnp.zeros(o_x.shape, jnp.int32)
    if n_tris <= _UNROLL_LIMIT:
        for j in range(n_tris):
            occluded = body(j, occluded)
    else:
        occluded = jax.lax.fori_loop(0, n_tris, body, occluded)
    hit_out[...] = occluded


def _pack_rays(o, d, mint, maxt):
    """(N,3) ray fields → eight (M,128) planes, padded."""
    n = o.shape[0]
    m = pl.cdiv(n, LANES * BM) * BM
    pad = m * LANES - n

    def plane(x, fill):
        x = jnp.pad(x, (0, pad), constant_values=fill)
        return x.reshape(m, LANES)

    return (
        plane(o[:, 0], 0), plane(o[:, 1], 0), plane(o[:, 2], 0),
        plane(d[:, 0], 0), plane(d[:, 1], 0), plane(d[:, 2], 1),
        plane(mint, 0), plane(maxt, -1.0),   # padded rays: maxt<mint => miss
        n, m,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_hit(tri_table, o, d, mint, maxt, interpret: bool = False):
    """Brute-force closest hit. tri_table: (T, 9) f32 [v0|e1|e2].
    Returns (t, u, v, prim, valid) with prim = -1 on miss."""
    t_count = tri_table.shape[0]
    (ox, oy, oz, dx, dy, dz, mn, mx, n, m) = _pack_rays(o, d, mint, maxt)
    grid = (m // BM,)
    ray_spec = pl.BlockSpec((BM, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_closest_kernel, t_count),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [ray_spec] * 8,
        out_specs=[ray_spec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((m, LANES), jnp.float32),
            jax.ShapeDtypeStruct((m, LANES), jnp.float32),
            jax.ShapeDtypeStruct((m, LANES), jnp.float32),
            jax.ShapeDtypeStruct((m, LANES), jnp.int32),
            jax.ShapeDtypeStruct((m, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(tri_table, ox, oy, oz, dx, dy, dz, mn, mx)
    t, u, v, prim, hit = (x.reshape(-1)[:n] for x in outs)
    return t, u, v, prim, hit.astype(bool)


@functools.partial(jax.jit, static_argnames=("interpret",))
def any_hit(tri_table, o, d, mint, maxt, interpret: bool = False):
    """Brute-force shadow query. Returns bool occlusion mask."""
    t_count = tri_table.shape[0]
    (ox, oy, oz, dx, dy, dz, mn, mx, n, m) = _pack_rays(o, d, mint, maxt)
    grid = (m // BM,)
    ray_spec = pl.BlockSpec((BM, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_any_kernel, t_count),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [ray_spec] * 8,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((m, LANES), jnp.int32),
        interpret=interpret,
    )(tri_table, ox, oy, oz, dx, dy, dz, mn, mx)
    return out.reshape(-1)[:n].astype(bool)


def make_tri_table(v0, e1, e2):
    """Pack triangle SoA into the (T, 9) SMEM layout."""
    return jnp.concatenate([v0, e1, e2], axis=1).astype(jnp.float32)
