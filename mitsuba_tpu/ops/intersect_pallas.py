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


# ---------------------------------------------------------------------------
# Fused closest-hit + shading-record kernel: interpolated normals/uv and
# material/emitter ids come straight out of the kernel, replacing ~15 HBM
# gathers per bounce in render/intersect.py::ray_intersect.
# Triangle table layout (T, 29):
#   [0:9]   v0 | e1 | e2
#   [9:18]  n0 | n1 | n2          (shading normals per corner)
#   [18:24] uv0 | uv1 | uv2
#   [24]    material_id  [25] emitter_id  [26] shape_id  (exact in f32)
#   [27:29] padding
# ---------------------------------------------------------------------------

SHD_COLS = 29


def _shaded_kernel(n_tris, tri_ref, ox, oy, oz, dx, dy, dz, mint, maxt,
                   t_out, u_out, v_out, prim_out, hit_out,
                   gnx, gny, gnz, snx, sny, snz, uvx, uvy, mid_out, eid_out,
                   sid_out):
    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    mn, mx = mint[...], maxt[...]
    zero = jnp.zeros(o_x.shape, jnp.float32)

    def body(j, state):
        (t_b, u_b, v_b, p_b,
         gx, gy, gz, sx, sy, sz, tu, tv, mid, eid, sid) = state
        t, u, v, det_ok = _mt_tile(tri_ref, j, o_x, o_y, o_z, d_x, d_y, d_z)
        hit = (
            det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > mn) & (t < mx) & (t < t_b)
        )
        e1x, e1y, e1z = tri_ref[j, 3], tri_ref[j, 4], tri_ref[j, 5]
        e2x, e2y, e2z = tri_ref[j, 6], tri_ref[j, 7], tri_ref[j, 8]
        # geometric normal (unnormalized; normalized once at the end)
        gnx_j = e1y * e2z - e1z * e2y
        gny_j = e1z * e2x - e1x * e2z
        gnz_j = e1x * e2y - e1y * e2x
        w = 1.0 - u - v
        snx_j = w * tri_ref[j, 9] + u * tri_ref[j, 12] + v * tri_ref[j, 15]
        sny_j = w * tri_ref[j, 10] + u * tri_ref[j, 13] + v * tri_ref[j, 16]
        snz_j = w * tri_ref[j, 11] + u * tri_ref[j, 14] + v * tri_ref[j, 17]
        tu_j = w * tri_ref[j, 18] + u * tri_ref[j, 20] + v * tri_ref[j, 22]
        tv_j = w * tri_ref[j, 19] + u * tri_ref[j, 21] + v * tri_ref[j, 23]

        def sel(a, b):
            return jnp.where(hit, a, b)

        return (
            sel(t, t_b), sel(u, u_b), sel(v, v_b), sel(j, p_b),
            sel(gnx_j, gx), sel(gny_j, gy), sel(gnz_j, gz),
            sel(snx_j, sx), sel(sny_j, sy), sel(snz_j, sz),
            sel(tu_j, tu), sel(tv_j, tv),
            sel(tri_ref[j, 24], mid), sel(tri_ref[j, 25], eid),
            sel(tri_ref[j, 26], sid),
        )

    state = (
        jnp.full(o_x.shape, jnp.inf, jnp.float32), zero, zero,
        jnp.full(o_x.shape, -1, jnp.int32),
        zero, zero, jnp.ones(o_x.shape, jnp.float32),
        zero, zero, jnp.ones(o_x.shape, jnp.float32),
        zero, zero,
        jnp.full(o_x.shape, -1.0, jnp.float32),
        jnp.full(o_x.shape, -1.0, jnp.float32),
        jnp.full(o_x.shape, -1.0, jnp.float32),
    )
    if n_tris <= _UNROLL_LIMIT:
        for j in range(n_tris):
            state = body(j, state)
    else:
        state = jax.lax.fori_loop(0, n_tris, body, state)
    (t_b, u_b, v_b, p_b, gx, gy, gz, sx, sy, sz, tu, tv, mid, eid, sid) = state
    g_inv = jax.lax.rsqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-20))
    s_inv = jax.lax.rsqrt(jnp.maximum(sx * sx + sy * sy + sz * sz, 1e-20))
    t_out[...] = t_b
    u_out[...] = u_b
    v_out[...] = v_b
    prim_out[...] = p_b
    hit_out[...] = (p_b >= 0).astype(jnp.int32)
    gnx[...] = gx * g_inv
    gny[...] = gy * g_inv
    gnz[...] = gz * g_inv
    snx[...] = sx * s_inv
    sny[...] = sy * s_inv
    snz[...] = sz * s_inv
    uvx[...] = tu
    uvy[...] = tv
    mid_out[...] = mid.astype(jnp.int32)
    eid_out[...] = eid.astype(jnp.int32)
    sid_out[...] = sid.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_hit_shaded(tri_table, o, d, mint, maxt, interpret: bool = False):
    """Fused closest hit + shading record. tri_table: (T, 29) — see layout
    above. Returns dict(t,u,v,prim,valid,geo_n,sh_n,uv,material_id,
    emitter_id)."""
    t_count = tri_table.shape[0]
    (ox, oy, oz, dx, dy, dz, mn, mx, n, m) = _pack_rays(o, d, mint, maxt)
    grid = (m // BM,)
    ray_spec = pl.BlockSpec((BM, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((m, LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((m, LANES), jnp.int32)
    outs = pl.pallas_call(
        functools.partial(_shaded_kernel, t_count),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [ray_spec] * 8,
        out_specs=[ray_spec] * 16,
        out_shape=[f32, f32, f32, i32, i32,          # t,u,v,prim,hit
                   f32, f32, f32, f32, f32, f32,     # geo_n, sh_n
                   f32, f32, i32, i32, i32],         # uv, mid, eid, sid
        interpret=interpret,
    )(tri_table, ox, oy, oz, dx, dy, dz, mn, mx)
    flat = [x.reshape(-1)[:n] for x in outs]
    (t, u, v, prim, hit, gx, gy, gz, sx, sy, sz, tu, tv, mid, eid, sid) = flat
    return dict(
        t=t, u=u, v=v, prim=prim, valid=hit.astype(bool),
        geo_n=jnp.stack([gx, gy, gz], -1),
        sh_n=jnp.stack([sx, sy, sz], -1),
        uv=jnp.stack([tu, tv], -1),
        material_id=mid, emitter_id=eid, shape_id=sid,
    )


def make_shading_table(geom):
    """Pack GeometryTables into the (T, 29) fused-kernel layout."""
    t = geom.v0.shape[0]
    return jnp.concatenate(
        [
            geom.v0, geom.e1, geom.e2,
            geom.n0, geom.n1, geom.n2,
            geom.uv0, geom.uv1, geom.uv2,
            geom.material_id[:, None].astype(jnp.float32),
            geom.emitter_id[:, None].astype(jnp.float32),
            geom.shape_id[:, None].astype(jnp.float32),
            jnp.zeros((t, 2), jnp.float32),
        ],
        axis=1,
    )


# ---------------------------------------------------------------------------
# Fused closest-hit+shading AND shadow any-hit in ONE kernel: the path
# tracer's bounce needs both a closest hit (for the new ray) and an
# occlusion test (for the previous bounce's NEE shadow ray).  Processing
# both ray sets in the same triangle loop halves kernel launches and
# reads each SMEM triangle row once for two rays.
# ---------------------------------------------------------------------------

def _shaded_any_kernel(n_tris, tri_ref,
                       ox, oy, oz, dx, dy, dz, mint, maxt,
                       sox, soy, soz, sdx, sdy, sdz, smint, smaxt,
                       t_out, u_out, v_out, prim_out, hit_out,
                       gnx, gny, gnz, snx, sny, snz, uvx, uvy,
                       mid_out, eid_out, sid_out, occ_out):
    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    mn, mx = mint[...], maxt[...]
    s_ox, s_oy, s_oz = sox[...], soy[...], soz[...]
    s_dx, s_dy, s_dz = sdx[...], sdy[...], sdz[...]
    s_mn, s_mx = smint[...], smaxt[...]
    zero = jnp.zeros(o_x.shape, jnp.float32)

    def body(j, state):
        (t_b, u_b, v_b, p_b,
         gx, gy, gz, sx, sy, sz, tu, tv, mid, eid, sid, occ) = state
        t, u, v, det_ok = _mt_tile(tri_ref, j, o_x, o_y, o_z, d_x, d_y, d_z)
        hit = (
            det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > mn) & (t < mx) & (t < t_b)
        )
        e1x, e1y, e1z = tri_ref[j, 3], tri_ref[j, 4], tri_ref[j, 5]
        e2x, e2y, e2z = tri_ref[j, 6], tri_ref[j, 7], tri_ref[j, 8]
        gnx_j = e1y * e2z - e1z * e2y
        gny_j = e1z * e2x - e1x * e2z
        gnz_j = e1x * e2y - e1y * e2x
        w = 1.0 - u - v
        snx_j = w * tri_ref[j, 9] + u * tri_ref[j, 12] + v * tri_ref[j, 15]
        sny_j = w * tri_ref[j, 10] + u * tri_ref[j, 13] + v * tri_ref[j, 16]
        snz_j = w * tri_ref[j, 11] + u * tri_ref[j, 14] + v * tri_ref[j, 17]
        tu_j = w * tri_ref[j, 18] + u * tri_ref[j, 20] + v * tri_ref[j, 22]
        tv_j = w * tri_ref[j, 19] + u * tri_ref[j, 21] + v * tri_ref[j, 23]

        # shadow ray against the same triangle row
        st, su, sv, s_ok = _mt_tile(tri_ref, j, s_ox, s_oy, s_oz,
                                    s_dx, s_dy, s_dz)
        s_hit = (
            s_ok & (su >= 0.0) & (sv >= 0.0) & (su + sv <= 1.0)
            & (st > s_mn) & (st < s_mx)
        )

        def sel(a, b):
            return jnp.where(hit, a, b)

        return (
            sel(t, t_b), sel(u, u_b), sel(v, v_b), sel(j, p_b),
            sel(gnx_j, gx), sel(gny_j, gy), sel(gnz_j, gz),
            sel(snx_j, sx), sel(sny_j, sy), sel(snz_j, sz),
            sel(tu_j, tu), sel(tv_j, tv),
            sel(tri_ref[j, 24], mid), sel(tri_ref[j, 25], eid),
            sel(tri_ref[j, 26], sid),
            occ | s_hit.astype(jnp.int32),
        )

    state = (
        jnp.full(o_x.shape, jnp.inf, jnp.float32), zero, zero,
        jnp.full(o_x.shape, -1, jnp.int32),
        zero, zero, jnp.ones(o_x.shape, jnp.float32),
        zero, zero, jnp.ones(o_x.shape, jnp.float32),
        zero, zero,
        jnp.full(o_x.shape, -1.0, jnp.float32),
        jnp.full(o_x.shape, -1.0, jnp.float32),
        jnp.full(o_x.shape, -1.0, jnp.float32),
        jnp.zeros(o_x.shape, jnp.int32),
    )
    if n_tris <= _UNROLL_LIMIT:
        for j in range(n_tris):
            state = body(j, state)
    else:
        state = jax.lax.fori_loop(0, n_tris, body, state)
    (t_b, u_b, v_b, p_b, gx, gy, gz, sx, sy, sz, tu, tv, mid, eid, sid,
     occ) = state
    g_inv = jax.lax.rsqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-20))
    s_inv = jax.lax.rsqrt(jnp.maximum(sx * sx + sy * sy + sz * sz, 1e-20))
    t_out[...] = t_b
    u_out[...] = u_b
    v_out[...] = v_b
    prim_out[...] = p_b
    hit_out[...] = (p_b >= 0).astype(jnp.int32)
    gnx[...] = gx * g_inv
    gny[...] = gy * g_inv
    gnz[...] = gz * g_inv
    snx[...] = sx * s_inv
    sny[...] = sy * s_inv
    snz[...] = sz * s_inv
    uvx[...] = tu
    uvy[...] = tv
    mid_out[...] = mid.astype(jnp.int32)
    eid_out[...] = eid.astype(jnp.int32)
    sid_out[...] = sid.astype(jnp.int32)
    occ_out[...] = occ


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_hit_shaded_and_any(tri_table, o, d, mint, maxt,
                               so, sd, smint, smaxt,
                               interpret: bool = False):
    """Fused: shading-record closest hit for (o,d) AND any-hit occlusion
    for the shadow rays (so,sd) — one triangle loop, one launch."""
    t_count = tri_table.shape[0]
    (ox, oy, oz, dx, dy, dz, mn, mx, n, m) = _pack_rays(o, d, mint, maxt)
    (sox, soy, soz, sdx, sdy, sdz, smn, smx, _, _) = _pack_rays(
        so, sd, smint, smaxt)
    grid = (m // BM,)
    ray_spec = pl.BlockSpec((BM, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((m, LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((m, LANES), jnp.int32)
    outs = pl.pallas_call(
        functools.partial(_shaded_any_kernel, t_count),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [ray_spec] * 16,
        out_specs=[ray_spec] * 17,
        out_shape=[f32, f32, f32, i32, i32,
                   f32, f32, f32, f32, f32, f32,
                   f32, f32, i32, i32, i32, i32],
        interpret=interpret,
    )(tri_table, ox, oy, oz, dx, dy, dz, mn, mx,
      sox, soy, soz, sdx, sdy, sdz, smn, smx)
    flat = [x.reshape(-1)[:n] for x in outs]
    (t, u, v, prim, hit, gx, gy, gz, sx, sy, sz, tu, tv, mid, eid, sid,
     occ) = flat
    rec = dict(
        t=t, u=u, v=v, prim=prim, valid=hit.astype(bool),
        geo_n=jnp.stack([gx, gy, gz], -1),
        sh_n=jnp.stack([sx, sy, sz], -1),
        uv=jnp.stack([tu, tv], -1),
        material_id=mid, emitter_id=eid, shape_id=sid,
    )
    return rec, occ.astype(bool)
