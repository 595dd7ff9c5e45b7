"""Pallas packet BVH traversal for large scenes.

The XLA per-lane skip-link walk (render/intersect.py::_closest_bvh) is
gather-bound: every step fetches per-ray node rows from HBM (~20 Krays/s at
69k tris).  This kernel instead walks the tree **per ray tile** — all
BM×128 rays share one scalar node pointer; a subtree is skipped only when
NO ray in the tile hits its box (classic packet traversal, the reference's
SSE `RayPacket4` idea at 2048-wide, triaccel_sse.h).  Node/triangle tables
live in VMEM; node fields are extracted as scalars and broadcast, so there
are ZERO per-lane gathers.

Coherent (camera/shadow-to-one-light) packets skip most of the tree;
fully incoherent packets degrade toward visiting every node, which still
beats the gather walk by orders of magnitude because each visit is ~30
cheap vector ops.

Capacity: tables are packed 14 records per 128-lane VMEM row (a naive
(M, 9) layout tiles to 128 lanes and wastes 14x VMEM — the cause of an
early out-of-VMEM failure); ~300k triangles fit alongside the ray tile.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BM = 8            # rays per tile = BM*128; smaller tiles = more coherence
_DET_EPS = 1e-9


RECS_PER_ROW = 14     # 14 x 9 floats = 126 of 128 lanes


def pack_records(table):
    """(R, 9) float table -> (ceil(R/14), 128) VMEM-friendly layout
    (traceable: runs inside jit on device)."""
    r = table.shape[0]
    rows = -(-r // RECS_PER_ROW)
    padded = jnp.pad(table.astype(jnp.float32),
                     ((0, rows * RECS_PER_ROW - r), (0, 0)))
    flat = padded.reshape(rows, RECS_PER_ROW * 9)
    return jnp.pad(flat, ((0, 0), (0, 128 - RECS_PER_ROW * 9)))


def _fetch_record(table_ref, idx):
    """Load record idx from a packed table: one (1,128) sublane slice +
    9 scalar reductions against a shifted lane iota."""
    row_idx = idx // RECS_PER_ROW
    off = (idx % RECS_PER_ROW) * 9
    vrow = table_ref[pl.ds(row_idx, 1), :]          # (1, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def ext(j):
        return jnp.sum(jnp.where(lane == off + j, vrow, 0.0))

    return [ext(j) for j in range(9)]


def _packet_body(nodes_ref, tris_ref, ox, oy, oz, dx, dy, dz, idx_, idy_, idz_,
                 mn, mx, n_nodes, n_tris, shadow: bool):
    """Shared traversal loop. Returns final (t, u, v, prim) or occluded."""

    def mt(tri_idx, t_cap):
        (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z) = _fetch_record(
            tris_ref, tri_idx
        )
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
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        hit = (det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
               & (t > mn) & (t < t_cap))
        return t, u, v, hit

    if shadow:
        init = (jnp.int32(0), jnp.zeros(ox.shape, jnp.int32))
    else:
        init = (
            jnp.int32(0),
            jnp.full(ox.shape, jnp.inf, jnp.float32),
            jnp.zeros(ox.shape, jnp.float32),
            jnp.zeros(ox.shape, jnp.float32),
            jnp.full(ox.shape, -1, jnp.int32),
        )

    def cond(st):
        if shadow:
            nd, occ = st
            # stop early once every ray in the tile is occluded
            return (nd < n_nodes) & (jnp.min(occ) < 1)
        return st[0] < n_nodes

    def body(st):
        nd = st[0]
        (bminx, bminy, bminz, bmaxx, bmaxy, bmaxz, f_f, c_f, s_f) = \
            _fetch_record(nodes_ref, nd)
        first = f_f.astype(jnp.int32)
        count = c_f.astype(jnp.int32)
        skip = s_f.astype(jnp.int32)
        # slab test, scalar bbox vs ray vectors.  The closest walk prunes
        # by min(best-t, maxt): without the maxt term, lanes whose maxt is
        # already exceeded (dead fallback lanes carry maxt=-1; work-list
        # overflow lanes carry an upper bound in maxt) traverse the FULL
        # tree and only discard at the end — measured as the entire
        # config-3 regression (0.5 Mrays/s: every bounce paid a whole-tree
        # packet walk for lanes the work-list had already resolved).
        t_cap = mx if shadow else jnp.minimum(st[1], mx)
        tx0 = (bminx - ox) * idx_
        tx1 = (bmaxx - ox) * idx_
        ty0 = (bminy - oy) * idy_
        ty1 = (bmaxy - oy) * idy_
        tz0 = (bminz - oz) * idz_
        tz1 = (bmaxz - oz) * idz_
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.maximum(jnp.minimum(tz0, tz1), mn),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.minimum(jnp.maximum(tz0, tz1), t_cap),
        )
        box_hit = tnear <= tfar
        if shadow:
            box_hit = box_hit & (st[1] < 1)
        any_hit = jnp.max(box_hit.astype(jnp.float32)) > 0.0
        is_leaf = count > 0

        if shadow:
            occ = st[1]
            for k in range(4):
                t, u, v, hit = mt(jnp.minimum(first + k, n_tris - 1), mx)
                take = hit & box_hit & is_leaf & any_hit & (k < count)
                occ = occ | take.astype(jnp.int32)
            new_nd = jnp.where(any_hit & ~is_leaf, nd + 1, skip)
            return new_nd, occ
        t_b, u_b, v_b, p_b = st[1], st[2], st[3], st[4]
        for k in range(4):
            # cap by maxt too so hits beyond the ray segment never displace
            # a closer in-segment candidate (final t_b < mx check still
            # rejects rows where nothing in-segment was found)
            t, u, v, hit = mt(jnp.minimum(first + k, n_tris - 1),
                              jnp.minimum(t_b, mx))
            take = hit & box_hit & is_leaf & any_hit & (k < count)
            t_b = jnp.where(take, t, t_b)
            u_b = jnp.where(take, u, u_b)
            v_b = jnp.where(take, v, v_b)
            p_b = jnp.where(take, first + k, p_b)
        new_nd = jnp.where(any_hit & ~is_leaf, nd + 1, skip)
        return new_nd, t_b, u_b, v_b, p_b

    return jax.lax.while_loop(cond, body, init)


def _closest_kernel(n_nodes, n_tris, nodes_ref, tris_ref, ox, oy, oz, dx, dy, dz,
                    mint, maxt, t_out, u_out, v_out, prim_out, hit_out):
    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    mn = mint[...]
    mx = maxt[...]

    def rcp(x):
        return jnp.where(x >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(x), 1e-12)

    st = _packet_body(
        nodes_ref, tris_ref, o_x, o_y, o_z, d_x, d_y, d_z,
        rcp(d_x), rcp(d_y), rcp(d_z), mn, mx, n_nodes, n_tris,
        shadow=False,
    )
    # final maxt cap: box pruning already uses min(t_best, maxt), but the
    # triangle test inside the walk caps by t_best alone, so lanes can
    # record hits beyond maxt inside boxes straddling the cap — reject here
    _, t_b, u_b, v_b, p_b = st
    ok = (p_b >= 0) & (t_b < mx)
    t_out[...] = t_b
    u_out[...] = u_b
    v_out[...] = v_b
    prim_out[...] = jnp.where(ok, p_b, -1)
    hit_out[...] = ok.astype(jnp.int32)


def _any_kernel(n_nodes, n_tris, nodes_ref, tris_ref, ox, oy, oz, dx, dy, dz,
                mint, maxt, hit_out):
    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    mn = mint[...]
    mx = maxt[...]

    def rcp(x):
        return jnp.where(x >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(x), 1e-12)

    _, occ = _packet_body(
        nodes_ref, tris_ref, o_x, o_y, o_z, d_x, d_y, d_z,
        rcp(d_x), rcp(d_y), rcp(d_z), mn, mx, n_nodes, n_tris, shadow=True,
    )
    hit_out[...] = occ


def _pack_rays(o, d, mint, maxt):
    n = o.shape[0]
    m = pl.cdiv(n, LANES * BM) * BM
    pad = m * LANES - n

    def plane(x, fill):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(m, LANES)

    return (
        plane(o[:, 0], 0), plane(o[:, 1], 0), plane(o[:, 2], 0),
        plane(d[:, 0], 0), plane(d[:, 1], 0), plane(d[:, 2], 1),
        plane(mint, 0), plane(maxt, -1.0),
        n, m,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "n_nodes", "n_tris"))
def bvh_closest(nodes_packed, tris_packed, o, d, mint, maxt,
                interpret: bool = False, n_nodes: int | None = None,
                n_tris: int | None = None):
    """Packet-traversal closest hit. Tables either (R,9) raw (packed on the
    fly) or pre-packed (rows,128) with explicit n_nodes/n_tris.
    Returns (t,u,v,prim,valid)."""
    if nodes_packed.shape[-1] == 9:
        n_nodes = nodes_packed.shape[0]
        n_tris = tris_packed.shape[0]
        nodes_p = pack_records(nodes_packed)
        tris_p = pack_records(tris_packed)
    else:
        assert n_nodes is not None and n_tris is not None
        nodes_p, tris_p = nodes_packed, tris_packed
    (ox, oy, oz, dx, dy, dz, mn, mx, n, m) = _pack_rays(o, d, mint, maxt)
    grid = (m // BM,)
    ray_spec = pl.BlockSpec((BM, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((m, LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((m, LANES), jnp.int32)
    outs = pl.pallas_call(
        functools.partial(_closest_kernel, n_nodes, n_tris),
        grid=grid,
        in_specs=[table_spec, table_spec] + [ray_spec] * 8,
        out_specs=[ray_spec] * 5,
        out_shape=[f32, f32, f32, i32, i32],
        interpret=interpret,
    )(nodes_p, tris_p, ox, oy, oz, dx, dy, dz, mn, mx)
    t, u, v, prim, hit = (x.reshape(-1)[:n] for x in outs)
    return t, u, v, prim, hit.astype(bool)


@functools.partial(jax.jit, static_argnames=("interpret", "n_nodes", "n_tris"))
def bvh_any(nodes_packed, tris_packed, o, d, mint, maxt,
            interpret: bool = False, n_nodes: int | None = None,
            n_tris: int | None = None):
    if nodes_packed.shape[-1] == 9:
        n_nodes = nodes_packed.shape[0]
        n_tris = tris_packed.shape[0]
        nodes_p = pack_records(nodes_packed)
        tris_p = pack_records(tris_packed)
    else:
        assert n_nodes is not None and n_tris is not None
        nodes_p, tris_p = nodes_packed, tris_packed
    (ox, oy, oz, dx, dy, dz, mn, mx, n, m) = _pack_rays(o, d, mint, maxt)
    grid = (m // BM,)
    ray_spec = pl.BlockSpec((BM, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_any_kernel, n_nodes, n_tris),
        grid=grid,
        in_specs=[table_spec, table_spec] + [ray_spec] * 8,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((m, LANES), jnp.int32),
        interpret=interpret,
    )(nodes_p, tris_p, ox, oy, oz, dx, dy, dz, mn, mx)
    return out.reshape(-1)[:n].astype(bool)
