"""Streaming cluster intersector — Pallas TPU kernels + XLA cull glue.

The TPU-native large-scene answer (replaces per-ray kd-tree traversal,
reference sahkdtree3.h:171): geometry is pre-cut into 128-triangle clusters
grouped 8-per-supercluster (render/clusters.py). Per bounce:

  1. `build_tile_lists` (XLA): conservative interval-arithmetic cull of
     each ray tile's bounds against supercluster AABBs -> per-tile
     front-to-back supercluster id lists. Work scales with
     (tiles x superclusters), all dense vector math - no divergence.
  2. `cluster_closest` / `cluster_any` (Pallas): grid = (tiles, list slots).
     A scalar-prefetch BlockSpec DMAs exactly the listed superclusters'
     Pluecker matrices from HBM (block-sparse pattern, double-buffered by
     the Pallas pipeline). Each step tests 128 rays x 128 tris as a
     (512,10)x(10,128) f32 matmul on the MXU + ~25 VPU passes of
     postprocessing; per-cluster AABB pre-tests skip empty work.

Cost model: skipped list slots cost ~a grid-step bubble (the repeated
last block is not re-fetched); visited clusters cost DMA (64 KiB) overlapped
with ~0.3 us of compute per 512-ray tile. Incoherent rays degrade by
visiting more clusters per tile - Morton sorting (integrators/path.py)
keeps tiles tight.

Correctness does not depend on the cull being tight: lists always contain
every supercluster whose AABB a tile's rays could touch (interval
arithmetic is conservative), and list capacity = C_s (no truncation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mitsuba_tpu.render.clusters import CLUSTER_K, G_COLS, ROWS_PER_TRI, SC_GROUP

LANES = 128
BM = 8                      # ray sublane rows per tile -> BM*128 rays/tile
                            # (TPU block sublane dims must be multiples of 8)
TILE = BM * LANES
_DET_EPS = 1e-12
_BIG = 3e38


# ---------------------------------------------------------------------------
# XLA cull: per-tile conservative supercluster lists
# ---------------------------------------------------------------------------

def _interval_mul(alo, ahi, blo, bhi):
    p1, p2, p3, p4 = alo * blo, alo * bhi, ahi * blo, ahi * bhi
    return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
            jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))


@functools.partial(jax.jit, static_argnames=("n_tiles",))
def build_tile_lists(o, d, maxt, sc_bmin, sc_bmax, n_tiles: int):
    """Conservative cull of ray tiles vs supercluster boxes.

    o,d: (N,3) padded to n_tiles*TILE; maxt (N,). Returns
    (ids (n_tiles, C_s) i32 front-to-back with the last valid id repeated
    in unused slots, counts (n_tiles,) i32)."""
    c_s = sc_bmin.shape[0]
    ot = o.reshape(n_tiles, TILE, 3)
    dt = d.reshape(n_tiles, TILE, 3)
    olo, ohi = ot.min(axis=1), ot.max(axis=1)          # (n_tiles, 3)
    dlo, dhi = dt.min(axis=1), dt.max(axis=1)
    mt = maxt.reshape(n_tiles, TILE)
    mt_hi = jnp.where(mt > 0, mt, 0.0).max(axis=1)     # (n_tiles,)

    # direction reciprocal interval; sign-spanning axes are unconstrained
    spans = (dlo <= 0) & (dhi >= 0)
    safe_lo = jnp.where(spans, 1.0, dlo)
    safe_hi = jnp.where(spans, 1.0, dhi)
    # clamp to _BIG: 0 * inf = NaN would break conservativeness
    ilo = jnp.clip(jnp.minimum(1.0 / safe_lo, 1.0 / safe_hi), -_BIG, _BIG)
    ihi = jnp.clip(jnp.maximum(1.0 / safe_lo, 1.0 / safe_hi), -_BIG, _BIG)

    # slab intervals per (tile, supercluster, axis)
    a_lo = sc_bmin[None] - ohi[:, None]                # (n_tiles, C_s, 3)
    a_hi = sc_bmin[None] - olo[:, None]
    b_lo = sc_bmax[None] - ohi[:, None]
    b_hi = sc_bmax[None] - olo[:, None]
    ta_lo, ta_hi = _interval_mul(a_lo, a_hi, ilo[:, None], ihi[:, None])
    tb_lo, tb_hi = _interval_mul(b_lo, b_hi, ilo[:, None], ihi[:, None])
    ent = jnp.minimum(ta_lo, tb_lo)                    # earliest slab entry
    ext = jnp.maximum(ta_hi, tb_hi)                    # latest slab exit
    ent = jnp.where(spans[:, None], -_BIG, ent)
    ext = jnp.where(spans[:, None], _BIG, ext)
    t_near = jnp.maximum(ent.max(axis=-1), 0.0)        # (n_tiles, C_s)
    t_far = jnp.minimum(ext.min(axis=-1), mt_hi[:, None])
    hit = t_near <= t_far

    key = jnp.where(hit, t_near, _BIG)
    neg_sorted, ids = jax.lax.top_k(-key, c_s)         # ascending t_near
    counts = jnp.sum(hit, axis=-1).astype(jnp.int32)
    # repeat the last valid id in unused slots: the kernel's pipeline then
    # re-uses the already-fetched block (cheap no-op steps)
    slot = jnp.arange(c_s)[None]
    last = jnp.take_along_axis(
        ids, jnp.maximum(counts[:, None] - 1, 0), axis=1)
    ids = jnp.where(slot < counts[:, None], ids, last).astype(jnp.int32)
    return ids, counts


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

_RPC = CLUSTER_K * ROWS_PER_TRI         # rows per cluster (512)


def _ray_matrix(b, ox, oy, oz, dx, dy, dz):
    """Build the (10, 128) Pluecker ray matrix for sublane row b."""
    o_x, o_y, o_z = ox[b:b + 1, :], oy[b:b + 1, :], oz[b:b + 1, :]
    d_x, d_y, d_z = dx[b:b + 1, :], dy[b:b + 1, :], dz[b:b + 1, :]
    m_x = o_y * d_z - o_z * d_y
    m_y = o_z * d_x - o_x * d_z
    m_z = o_x * d_y - o_y * d_x
    one = jnp.ones_like(o_x)
    return jnp.concatenate(
        [o_x, o_y, o_z, d_x, d_y, d_z, m_x, m_y, m_z, one], axis=0)


def _slab_row(aabb_ref, sc, c, o, inv_d, mint, tmax):
    """(1,128) slab test of one cluster AABB against a ray row."""
    bmin = [aabb_ref[sc, c, j] for j in range(3)]
    bmax = [aabb_ref[sc, c, 3 + j] for j in range(3)]
    tn = mint
    tf = tmax
    for j in range(3):
        t0 = (bmin[j] - o[j]) * inv_d[j]
        t1 = (bmax[j] - o[j]) * inv_d[j]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    return tn <= tf


def _cluster_test(G_ref, c, M):
    """Pluecker-test one cluster against a (10,128) ray matrix.

    Returns (t, signed 1/det, P1, P2, eligible) - all (CLUSTER_K, 128);
    t is the ray distance, u = P1*rcp_signed, v = P2*rcp_signed."""
    base = c * _RPC
    Gc = G_ref[0, base:base + _RPC, 0:10]              # (512, 10)
    S = jax.lax.dot_general(
        Gc, M, (((1,), (0,)), ((), ())),
        # HIGHEST: full f32 (default truncates operands to bf16 on the MXU,
        # which loses hits at silhouettes and ~8% of t accuracy)
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)            # (512, 128)
    P0 = S[0 * CLUSTER_K:1 * CLUSTER_K]
    P1 = S[1 * CLUSTER_K:2 * CLUSTER_K]
    P2 = S[2 * CLUSTER_K:3 * CLUSTER_K]
    Qn = S[3 * CLUSTER_K:4 * CLUSTER_K]
    det = P0 + P1 + P2
    smin = jnp.minimum(jnp.minimum(P0, P1), P2)
    smax = jnp.maximum(jnp.maximum(P0, P1), P2)
    pos = smin >= 0.0
    sgn = jnp.where(pos, 1.0, -1.0)
    absdet = det * sgn
    eligible = (pos | (smax <= 0.0)) & (absdet > _DET_EPS)
    rcp = 1.0 / jnp.where(eligible, absdet, 1.0)
    t = Qn * sgn * rcp
    return t, sgn * rcp, P1, P2, eligible


def _closest_kernel(ids_ref, cnt_ref, starts_ref, aabb_ref, G_ref,
                    ox, oy, oz, dx, dy, dz, mn, mx,
                    t_o, u_o, v_o, p_o):
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _init():
        t_o[...] = mx[...]
        u_o[...] = jnp.zeros_like(u_o)
        v_o[...] = jnp.zeros_like(v_o)
        p_o[...] = jnp.full_like(p_o, -1)

    i = pl.program_id(0)
    sc_count = cnt_ref[i]

    @pl.when(l < sc_count)
    def _work():
        sc = ids_ref[i, l]
        krow = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER_K, LANES), 0)
        for b in range(BM):
            o = (ox[b:b + 1, :], oy[b:b + 1, :], oz[b:b + 1, :])
            d = (dx[b:b + 1, :], dy[b:b + 1, :], dz[b:b + 1, :])
            inv_d = tuple(
                jnp.where(x >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(x), 1e-12)
                for x in d)
            mnb = mn[b:b + 1, :]
            M = _ray_matrix(b, ox, oy, oz, dx, dy, dz)
            for c in range(SC_GROUP):
                box = _slab_row(aabb_ref, sc, c, o, inv_d, mnb,
                                t_o[b:b + 1, :])
                nhit = jnp.sum(box.astype(jnp.float32))

                @pl.when(nhit > 0.0)
                def _do(b=b, c=c, M=M, mnb=mnb, sc=sc, krow=krow):
                    t, rcp_s, P1, P2, elig = _cluster_test(G_ref, c, M)
                    tb = t_o[b:b + 1, :]
                    hit = elig & (t > mnb) & (t < tb)
                    t_masked = jnp.where(hit, t, _BIG)
                    tmin = jnp.min(t_masked, axis=0, keepdims=True)
                    improved = tmin < tb
                    win = hit & (t <= tmin)
                    ksel = jnp.min(
                        jnp.where(win, krow, jnp.int32(2 ** 30)),
                        axis=0, keepdims=True)
                    w2 = win & (krow == ksel)
                    w2f = w2.astype(jnp.float32)
                    usel = jnp.sum(w2f * (P1 * rcp_s), axis=0, keepdims=True)
                    vsel = jnp.sum(w2f * (P2 * rcp_s), axis=0, keepdims=True)
                    start_c = starts_ref[sc * SC_GROUP + c]
                    t_o[b:b + 1, :] = jnp.where(improved, tmin, tb)
                    u_o[b:b + 1, :] = jnp.where(improved, usel,
                                                u_o[b:b + 1, :])
                    v_o[b:b + 1, :] = jnp.where(improved, vsel,
                                                v_o[b:b + 1, :])
                    p_o[b:b + 1, :] = jnp.where(improved, start_c + ksel,
                                                p_o[b:b + 1, :])


def _any_kernel(ids_ref, cnt_ref, starts_ref, aabb_ref, G_ref,
                ox, oy, oz, dx, dy, dz, mn, mx, occ_o):
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _init():
        occ_o[...] = jnp.zeros_like(occ_o)

    i = pl.program_id(0)
    sc_count = cnt_ref[i]

    @pl.when(l < sc_count)
    def _work():
        sc = ids_ref[i, l]
        for b in range(BM):
            occ_row = occ_o[b:b + 1, :]
            live = jnp.sum((occ_row == 0).astype(jnp.float32))

            @pl.when(live > 0.0)
            def _row(b=b, sc=sc):
                o = (ox[b:b + 1, :], oy[b:b + 1, :], oz[b:b + 1, :])
                d = (dx[b:b + 1, :], dy[b:b + 1, :], dz[b:b + 1, :])
                inv_d = tuple(
                    jnp.where(x >= 0, 1.0, -1.0)
                    / jnp.maximum(jnp.abs(x), 1e-12) for x in d)
                mnb = mn[b:b + 1, :]
                mxb = mx[b:b + 1, :]
                M = _ray_matrix(b, ox, oy, oz, dx, dy, dz)
                for c in range(SC_GROUP):
                    box = _slab_row(aabb_ref, sc, c, o, inv_d, mnb, mxb)
                    nhit = jnp.sum(box.astype(jnp.float32))

                    @pl.when(nhit > 0.0)
                    def _do(b=b, c=c, M=M, mnb=mnb, mxb=mxb):
                        t, _, _, _, elig = _cluster_test(G_ref, c, M)
                        hit = elig & (t > mnb) & (t < mxb)
                        row_hit = jnp.max(
                            hit.astype(jnp.int32), axis=0, keepdims=True)
                        occ_o[b:b + 1, :] = occ_o[b:b + 1, :] | row_hit


def _pack_rays(o, d, mint, maxt):
    n = o.shape[0]
    m = pl.cdiv(n, TILE) * BM
    pad = m * LANES - n

    def plane(x, fill):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(m, LANES)

    return (
        plane(o[:, 0], 0), plane(o[:, 1], 0), plane(o[:, 2], 0),
        plane(d[:, 0], 0), plane(d[:, 1], 0), plane(d[:, 2], 1),
        plane(mint, 0), plane(maxt, -1.0),   # padded rays: maxt<mint => miss
        n, m,
    )


def _common_call(kernel, n_out, out_dtypes, geom_cl, o, d, mint, maxt,
                 interpret):
    (ox, oy, oz, dx, dy, dz, mn, mx, n, m) = _pack_rays(o, d, mint, maxt)
    n_tiles = m // BM
    ids, counts = build_tile_lists(
        jnp.stack([p.reshape(-1) for p in (ox, oy, oz)], -1),
        jnp.stack([p.reshape(-1) for p in (dx, dy, dz)], -1),
        mx.reshape(-1), geom_cl["sc_bmin"], geom_cl["sc_bmax"], n_tiles)
    c_s = geom_cl["sc_bmin"].shape[0]
    ray_spec = pl.BlockSpec((BM, LANES), lambda i, l, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,      # ids, counts, starts, aabb
        grid=(n_tiles, c_s),
        in_specs=[
            pl.BlockSpec((1, SC_GROUP * _RPC, G_COLS),
                         lambda i, l, ids_ref, *_: (ids_ref[i, l], 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [ray_spec] * 8,
        out_specs=[ray_spec] * n_out,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((m, LANES), dt) for dt in out_dtypes],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(ids, counts, geom_cl["tri_start"], geom_cl["aabb"], geom_cl["G"],
      ox, oy, oz, dx, dy, dz, mn, mx)
    return [x.reshape(-1)[:n] for x in outs]


@functools.partial(jax.jit, static_argnames=("interpret",))
def cluster_closest(geom_cl, o, d, mint, maxt, interpret: bool = False):
    """Closest hit via streamed cluster tests.

    geom_cl: dict with G (C_s, SC_GROUP*512, 16) f32, aabb (C_s, 8, 8) f32,
    tri_start (C,) i32, sc_bmin/sc_bmax (C_s, 3) f32.
    Returns (t, u, v, prim, valid)."""
    t, u, v, prim = _common_call(
        _closest_kernel, 4,
        [jnp.float32, jnp.float32, jnp.float32, jnp.int32],
        geom_cl, o, d, mint, maxt, interpret)
    valid = prim >= 0
    return jnp.where(valid, t, jnp.inf), u, v, prim, valid


@functools.partial(jax.jit, static_argnames=("interpret",))
def cluster_any(geom_cl, o, d, mint, maxt, interpret: bool = False):
    """Shadow/any-hit query. Returns bool occlusion mask."""
    (occ,) = _common_call(
        _any_kernel, 1, [jnp.int32], geom_cl, o, d, mint, maxt, interpret)
    return occ.astype(bool)
