"""Exact-cull item-stream intersector (work-list v5).

Why v5: every earlier work-list (v2/v3 beams, v4 per-row ordered
streaming) culled with CONSERVATIVE per-row interval arithmetic, and on
incoherent bounce rays the row frustum is so fat that ~1700 of 11.5k
8-tri clusters survive per 128-lane row (measured,
scripts/exp_r3_consrv.py) where the TRUE union of per-ray slab hits is
~39 (scripts/exp_r3_footprint2.py). v4 additionally paid ~2.5 us DMA
latency per streamed supercluster. v5 fixes both:

  * the cull is EXACT per lane: a hierarchical XLA build
    (conservative SC256 -> exact SC256 -> exact SC64 -> exact K8)
    computes, fully vectorized over (row, candidate, lane), the union
    over each row's 128 real rays of per-ray slab hits, sorted
    front-to-back by entry distance (ops cost is elementwise+reduce,
    no per-lane control flow anywhere);
  * the kernel is a FLAT ITEM STREAM: grid (rows, item-blocks), each
    step Moeller-Trumbore-tests BI 8-triangle clusters fetched by
    scalar-prefetch BlockSpec index maps (the block-sparse pattern:
    the Pallas pipeline prefetches blocks ahead, so per-item HBM
    latency is fully hidden — v4's manual-DMA wall);
  * ordered early exit at block granularity: items are sorted by
    row-level conservative entry distance, so once a block's key
    exceeds every lane's current best t the block is skipped
    (reference analog: ordered Havran traversal,
    /root/reference/include/mitsuba/render/sahkdtree3.h:171).

Rows whose true candidate count exceeds a cap at any level OVERFLOW;
the caller routes those rows to the complete v4 stream kernel.

Capacity presets: camera/coherent wavefronts use small caps (the whole
build scales linearly with them), diffuse bounce wavefronts large ones.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mitsuba_tpu.ops.worklist_pallas import _pack_rays
from mitsuba_tpu.ops.stream_pallas import build_sc_lists

LANES = 128
BI = 16                 # items (8-tri clusters) per grid step
_BIG = 3e38
_DET_EPS = 1e-12

# (E0, E1, E2, E3): SC256 candidates, SC256 kept, SC64 kept, K8 items.
# E3 must be a multiple of BI.
CAPS_COHERENT = (64, 32, 48, 96)
CAPS_DIFFUSE = (160, 96, 128, 384)


# ---------------------------------------------------------------------------
# build (pure XLA)
# ---------------------------------------------------------------------------

def _exact_refine(rays, ids, keep, blo, bhi):
    """Union-over-lanes exact slab test of boxes blo/bhi[ids] against
    each row's 128 rays. rays (R,8,128) packed planes; ids (R,E).
    Returns tn_min (R,E) with _BIG where no lane hits."""
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    mn = rays[:, 6]
    mx = rays[:, 7]
    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, _BIG)
    lo = blo[ids]
    hi = bhi[ids]
    t0 = (lo[..., None] - o[:, None]) * inv[:, None]   # (R,E,3,128)
    t1 = (hi[..., None] - o[:, None]) * inv[:, None]
    tn = jnp.max(jnp.minimum(t0, t1), axis=2)
    tf = jnp.min(jnp.maximum(t0, t1), axis=2)
    tn = jnp.maximum(tn, mn[:, None])
    tf = jnp.minimum(tf, mx[:, None])
    ok = (tn <= tf) & keep[..., None]
    return jnp.min(jnp.where(ok, tn, _BIG), axis=-1)


def build_exact_items(rays, ex, caps):
    """Hierarchical exact cull. rays (R,8,128); ex: dict with
    b256_lo/hi (C256,3), b64_lo/hi (C64,3), b8_lo/hi (C8,3).
    Returns (ids (R,E3) i32 K8-cluster ids front-to-back [0 for dead
    slots], blk_tn (R, E3/BI) f32 entry key of each BI-block [_BIG if
    fully dead], overflow (R,) bool)."""
    E0, E1, E2, E3 = caps
    R = rays.shape[0]
    # S0: conservative L2 (512-tri block) interval cull, front-to-back
    ids0f, tns0f = build_sc_lists(rays, ex["b2_lo"], ex["b2_hi"])
    n0 = jnp.sum(tns0f[:, 0, :] < _BIG, -1)
    ids0 = ids0f[:, 0, :E0]
    keep0 = tns0f[:, 0, :E0] < _BIG
    # S1: exact L2
    key1 = _exact_refine(rays, ids0, keep0, ex["b2_lo"], ex["b2_hi"])
    key1s, ids1 = jax.lax.sort_key_val(key1, ids0)
    n1 = jnp.sum(key1 < _BIG, -1)
    ids1 = ids1[:, :E1]
    keep1 = key1s[:, :E1] < _BIG
    # S2: exact L1 (64-tri blocks, 8 per L2)
    ids64 = (ids1[:, :, None] * 8
             + jnp.arange(8, dtype=jnp.int32)[None, None]).reshape(R, -1)
    keep64 = jnp.repeat(keep1, 8, axis=1)
    key2 = _exact_refine(rays, ids64, keep64, ex["b1_lo"], ex["b1_hi"])
    key2s, ids2 = jax.lax.sort_key_val(key2, ids64)
    n2 = jnp.sum(key2 < _BIG, -1)
    ids2 = ids2[:, :E2]
    keep2 = key2s[:, :E2] < _BIG
    # S3: exact K8 clusters (8 per L1)
    ids8 = (ids2[:, :, None] * 8
            + jnp.arange(8, dtype=jnp.int32)[None, None]).reshape(R, -1)
    keep8 = jnp.repeat(keep2, 8, axis=1)
    key3 = _exact_refine(rays, ids8, keep8, ex["b0_lo"], ex["b0_hi"])
    key3s, ids3 = jax.lax.sort_key_val(key3, ids8)
    n3 = jnp.sum(key3 < _BIG, -1)
    ids = jnp.where(key3s[:, :E3] < _BIG, ids3[:, :E3], 0)
    blk_tn = key3s[:, :E3].reshape(R, E3 // BI, BI)[:, :, 0]
    overflow = (n0 > E0) | (n1 > E1) | (n2 > E2) | (n3 > E3)
    return ids, blk_tn, overflow


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _mt_item(tri, rays, mnb, t_cap):
    """Moeller-Trumbore of one 8-tri cluster block (8,128) against the
    row's 128 rays. tri lanes: 0:3 v0, 3:6 e1, 6:9 e2, 15 prim id
    (bitcast i32). Returns (t (8,128), u, v, prim)."""
    ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    v0x = tri[:, 0:1]
    v0y = tri[:, 1:2]
    v0z = tri[:, 2:3]
    e1x = tri[:, 3:4]
    e1y = tri[:, 4:5]
    e1z = tri[:, 5:6]
    e2x = tri[:, 6:7]
    e2y = tri[:, 7:8]
    e2z = tri[:, 8:9]
    prim = jax.lax.bitcast_convert_type(tri[:, 15:16], jnp.int32)
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
    ok_det = jnp.abs(det) > _DET_EPS
    inv = 1.0 / jnp.where(ok_det, det, 1.0)
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
    v = (dx * qvx + dy * qvy + dz * qvz) * inv
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
    ok = (ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t > mnb) & (t < t_cap))
    return jnp.where(ok, t, _BIG), u, v, prim


def _make_item_kernel(n_blocks: int, any_hit: bool):
    def kernel(ids_pf, blk_pf, rays_ref, *rest):
        tri_refs = rest[:BI]
        out_ref = rest[BI]
        r = pl.program_id(0)
        b = pl.program_id(1)
        rays = rays_ref[0]
        mnb = rays[6:7, :]
        maxt = rays[7:8, :]

        @pl.when(b == 0)
        def _():
            if any_hit:
                out_ref[0, 0:1, :] = jnp.zeros((1, LANES), jnp.float32)
                out_ref[0, 1:8, :] = jnp.zeros((7, LANES), jnp.float32)
            else:
                out_ref[0, 0:1, :] = maxt
                out_ref[0, 1:3, :] = jnp.zeros((2, LANES), jnp.float32)
                out_ref[0, 3:4, :] = jax.lax.bitcast_convert_type(
                    jnp.full((1, LANES), -1, jnp.int32), jnp.float32)
                out_ref[0, 4:8, :] = jnp.zeros((4, LANES), jnp.float32)

        blk_t = blk_pf[r, b]
        if any_hit:
            # settled when every live lane is occluded (dead lanes have
            # mint > maxt and count as settled)
            occ = out_ref[0, 0:1, :]
            live = (mnb <= maxt).astype(jnp.float32)
            settled = jnp.min(occ + (1.0 - live)) > 0.0
            do = (blk_t < _BIG) & jnp.logical_not(settled)
        else:
            t_best = out_ref[0, 0:1, :]
            do = blk_t <= jnp.max(t_best)

        @pl.when(do)
        def _():
            if any_hit:
                occ = out_ref[0, 0:1, :]
                hit_any = jnp.zeros((1, LANES), jnp.float32)
                for i in range(BI):
                    t_run, _u, _v, _p = _mt_item(
                        tri_refs[i][0], rays, mnb,
                        jnp.where(occ > 0, mnb, maxt))
                    hit_any = jnp.maximum(
                        hit_any,
                        jnp.max((t_run < _BIG).astype(jnp.float32),
                                axis=0, keepdims=True))
                out_ref[0, 0:1, :] = jnp.maximum(occ, hit_any)
            else:
                tb = out_ref[0, 0:1, :]
                ub = out_ref[0, 1:2, :]
                vb = out_ref[0, 2:3, :]
                pb = jax.lax.bitcast_convert_type(out_ref[0, 3:4, :],
                                                  jnp.int32)
                # accumulate a per-sublane running winner across the
                # BI items, then one merge into the row accumulators
                t_run = jnp.full((8, LANES), _BIG, jnp.float32)
                u_run = jnp.zeros((8, LANES), jnp.float32)
                v_run = jnp.zeros((8, LANES), jnp.float32)
                p_run = jnp.zeros((8, LANES), jnp.int32)
                for i in range(BI):
                    t_i, u_i, v_i, p_i = _mt_item(tri_refs[i][0], rays,
                                                  mnb, tb)
                    ok = t_i < t_run
                    t_run = jnp.where(ok, t_i, t_run)
                    u_run = jnp.where(ok, u_i, u_run)
                    v_run = jnp.where(ok, v_i, v_run)
                    p_run = jnp.where(ok, jnp.broadcast_to(
                        p_i, (8, LANES)), p_run)
                tmin = jnp.min(t_run, axis=0, keepdims=True)
                improved = tmin < tb
                sub = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
                win = t_run <= tmin
                ssel = jnp.min(jnp.where(win, sub, 8), axis=0,
                               keepdims=True)
                w2 = (win & (sub == ssel)).astype(jnp.float32)
                usel = jnp.sum(w2 * u_run, axis=0, keepdims=True)
                vsel = jnp.sum(w2 * v_run, axis=0, keepdims=True)
                psel = jnp.sum(w2 * p_run.astype(jnp.float32), axis=0,
                               keepdims=True).astype(jnp.int32)
                out_ref[0, 0:1, :] = jnp.where(improved, tmin, tb)
                out_ref[0, 1:2, :] = jnp.where(improved, usel, ub)
                out_ref[0, 2:3, :] = jnp.where(improved, vsel, vb)
                out_ref[0, 3:4, :] = jax.lax.bitcast_convert_type(
                    jnp.where(improved, psel, pb), jnp.float32)
    return kernel


def _call_items(ex_tri, rays, ids, blk_tn, any_hit: bool,
                interpret: bool = False):
    """One chunk: rays (Rc,8,128), ids (Rc,E3), blk_tn (Rc,NB)."""
    Rc, E3 = ids.shape
    n_blocks = E3 // BI
    tri_specs = [
        pl.BlockSpec((1, 8, LANES),
                     (lambda i: lambda r, b, ids_pf, blk_pf:
                      (ids_pf[r, b * BI + i], 0, 0))(i),
                     memory_space=pltpu.VMEM)
        for i in range(BI)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Rc, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 8, LANES),
                         lambda r, b, ids_pf, blk_pf: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + tri_specs,
        out_specs=pl.BlockSpec((1, 8, LANES),
                               lambda r, b, ids_pf, blk_pf: (r, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _make_item_kernel(n_blocks, any_hit),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rc, 8, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(ids, blk_tn, rays, *([ex_tri] * BI))
    return out


# Rows per chunk: bounds both the SMEM prefetch arrays of one
# pallas_call (ids (Rc,E3) i32 + blk_tn padded to (Rc,128) f32 must fit
# 1 MB SMEM) and the HBM peak of the build's (Rc, E, 3, 128) slab
# intermediates (~1.2 GB at CAPS_DIFFUSE)
R_CHUNK = 384


def _pad_rows(rays, n_rows):
    """Pad the row axis to a multiple of R_CHUNK with dead rows
    (maxt = -1 < mint, so they produce no candidates and no hits)."""
    nc = -(-n_rows // R_CHUNK)
    pad = nc * R_CHUNK - n_rows
    if pad:
        dead = jnp.zeros((pad, 8, LANES), jnp.float32)
        dead = dead.at[:, 7].set(-1.0)
        dead = dead.at[:, 5].set(1.0)
        rays = jnp.concatenate([rays, dead], axis=0)
    return rays.reshape(nc, R_CHUNK, 8, LANES)


def _run_chunked(ex, o, d, mint, maxt, caps, any_hit, interpret):
    rays, n, n_rows = _pack_rays(o, d, mint, maxt)
    chunks = _pad_rows(rays, n_rows)

    def chunk_fn(rays_c):
        ids, blk_tn, ovf = build_exact_items(rays_c, ex, caps)
        out = _call_items(ex["tri"], rays_c, ids, blk_tn,
                          any_hit=any_hit, interpret=interpret)
        return out, ovf

    outs, ovfs = jax.lax.map(chunk_fn, chunks)
    out = outs.reshape(-1, 8, LANES)[:n_rows]
    ovf = ovfs.reshape(-1)[:n_rows]
    return out, ovf, n


@functools.partial(jax.jit, static_argnames=("caps", "interpret"))
def exact_closest(ex, o, d, mint, maxt, caps=CAPS_DIFFUSE,
                  interpret: bool = False):
    """Closest hit. ex: dict from GeometryTables.ex_tables. Returns
    (t, u, v, prim, valid, lane_overflow); overflow lanes (rows whose
    candidate count exceeded a cap) hold a partial result and must be
    re-resolved by a complete backend."""
    out, ovf, n = _run_chunked(ex, o, d, mint, maxt, caps,
                               any_hit=False, interpret=interpret)
    t = out[:, 0, :].reshape(-1)[:n]
    u = out[:, 1, :].reshape(-1)[:n]
    v = out[:, 2, :].reshape(-1)[:n]
    prim = jax.lax.bitcast_convert_type(out[:, 3, :],
                                        jnp.int32).reshape(-1)[:n]
    valid = prim >= 0
    lane_ovf = jnp.repeat(ovf, LANES)[:n]
    return (jnp.where(valid, t, jnp.inf), u, v,
            jnp.where(valid, prim, 0), valid, lane_ovf)


@functools.partial(jax.jit, static_argnames=("caps", "interpret"))
def exact_any(ex, o, d, mint, maxt, caps=CAPS_DIFFUSE,
              interpret: bool = False):
    """Any-hit/shadow query. Returns (occluded, lane_overflow)."""
    out, ovf, n = _run_chunked(ex, o, d, mint, maxt, caps,
                               any_hit=True, interpret=interpret)
    occ = out[:, 0, :].reshape(-1)[:n] > 0.5
    lane_ovf = jnp.repeat(ovf, LANES)[:n]
    return occ, lane_ovf
