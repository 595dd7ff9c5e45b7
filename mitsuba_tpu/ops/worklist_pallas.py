"""Work-list streaming cluster intersector (v2) — VPU Moeller-Trumbore.

The v1 kernel (ops/cluster_pallas.py) sweeps supercluster lists per
1024-ray tile and intersects via a (512,10)x(10,128) Pluecker MXU product.
Both choices measured out badly on the ~70k-tri bunny:

  - camera rays tested ~18k triangles each (lists are tile- and
    supercluster-granular), ~10x over the ~20 ns/ray budget of 50 Mrays/s;
  - the Pluecker product is rank-10, so the MXU runs at 10/128 K
    utilization, and exact f32 needs the 6-pass emulation: 12.8 us per
    matmul measured (scripts/exp_kernel_cost.py) — while the VPU does the
    same ~40 flops/pair in exact f32 at full rate.

v2 therefore:

  1. rays are sorted (Morton [+ direction octant]) and grouped in rows of
     128 lanes;
  2. an XLA cull slab-tests each row's conservative ray interval against
     every *cluster* AABB (interval arithmetic as v1, but row- and
     cluster-granular), then orders each row's surviving clusters
     front-to-back by entry distance;
  3. per-row lists are flattened into ONE static-capacity work list of
     (row, cluster) items; a flat 1-D Pallas grid walks it. Consecutive
     items share the row's ray/output blocks (Pallas re-fetches only when
     the scalar-prefetch block index changes), so each ray row is DMA'd
     once and each item DMAs one 8 KB cluster block;
  4. the kernel runs Moeller-Trumbore on the VPU: 8 triangles per
     sublane-chunk x 128 ray lanes, f32, running closest-hit accumulators
     across chunks, one cross-sublane resolve per item;
  5. in-kernel early exit: an item is skipped once every lane's current
     best t is below the cluster's conservative entry distance
     (front-to-back order makes this the ordered-traversal termination of
     reference sahkdtree3.h:171, re-expressed row-wise).

Work items are packed in one int32 (cid | first | valid | row) to keep the
SMEM scalar-prefetch footprint small; t_near rides in a second int32 array
(monotone float bits). If the work list would overflow its static capacity
(pathologically incoherent rays), intersect.py falls back to the v1 sweep —
correctness never depends on the cap.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


LANES = 128
_BIG = 3e38
_DET_EPS = 1e-12

# default cull-beam sizing for render-path calls (render/intersect.py).
# Wider beams cost more build-time slab tests + sorts but push fewer rows
# into overflow (whose lanes re-resolve through the slow XLA walk) —
# env-overridable so TPU sweeps don't need code edits.
import os as _os

DEFAULT_W_FACTOR = int(_os.environ.get("MTS_WL_W_FACTOR", "48"))
DEFAULT_L_SC = int(_os.environ.get("MTS_WL_L_SC", "48"))
DEFAULT_BEAM_S2 = int(_os.environ.get("MTS_WL_BEAM_S2", "16"))

# scalar-prefetch arrays live in SMEM (1 MB total); the packed item list
# is the big one. Cap items per pallas_call and split the wavefront into
# row-chunks when w_cap would exceed it (wide beams on bounce wavefronts
# otherwise die with 'Allocation would exceed memory (space=smem)').
MAX_ITEMS_PER_CALL = int(_os.environ.get("MTS_WL_MAX_ITEMS", "131072"))

# packed work-item layout (int32): [0:14] cid, [14] first, [15] valid,
# [16:31] row
_CID_BITS = 14
_FIRST_BIT = 1 << _CID_BITS
_VALID_BIT = 1 << (_CID_BITS + 1)
_ROW_SHIFT = _CID_BITS + 2
MAX_CLUSTERS = _FIRST_BIT
MAX_ROWS = 1 << (31 - _ROW_SHIFT)


# ---------------------------------------------------------------------------
# XLA cull: per-row front-to-back cluster lists -> flat work list
# ---------------------------------------------------------------------------

def _interval_mul(alo, ahi, blo, bhi):
    p1, p2, p3, p4 = alo * blo, alo * bhi, ahi * blo, ahi * bhi
    return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
            jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))


def _row_intervals(rays):
    """Per-row conservative ray intervals from the packed (n_rows, 8, 128)
    ray planes (no transpose round-trips — gathers and copies measured as
    the cull's main cost)."""
    olo = rays[:, 0:3].min(axis=2)
    ohi = rays[:, 0:3].max(axis=2)
    dlo = rays[:, 3:6].min(axis=2)
    dhi = rays[:, 3:6].max(axis=2)
    mt = rays[:, 7]
    mt_hi = jnp.where(mt > 0, mt, 0.0).max(axis=1)
    spans = (dlo <= 0) & (dhi >= 0)
    safe_lo = jnp.where(spans, 1.0, dlo)
    safe_hi = jnp.where(spans, 1.0, dhi)
    ilo = jnp.clip(jnp.minimum(1.0 / safe_lo, 1.0 / safe_hi), -_BIG, _BIG)
    ihi = jnp.clip(jnp.maximum(1.0 / safe_lo, 1.0 / safe_hi), -_BIG, _BIG)
    return olo, ohi, ilo, ihi, spans, mt_hi


def _interval_slab(bmin, bmax, olo, ohi, ilo, ihi, spans, mt_hi):
    """Conservative slab test of per-row ray intervals vs boxes.

    bmin/bmax: (n_rows, B, 3). Returns (hit, t_near) of shape
    (n_rows, B).  (A per-axis (n_rows, B)-planes variant measured 8x
    SLOWER end to end: splitting the box gathers per axis triples the
    gather count, which dominates the whole build.)"""
    a_lo = bmin - ohi[:, None]
    a_hi = bmin - olo[:, None]
    b_lo = bmax - ohi[:, None]
    b_hi = bmax - olo[:, None]
    ta_lo, ta_hi = _interval_mul(a_lo, a_hi, ilo[:, None], ihi[:, None])
    tb_lo, tb_hi = _interval_mul(b_lo, b_hi, ilo[:, None], ihi[:, None])
    ent = jnp.minimum(ta_lo, tb_lo)
    ext = jnp.maximum(ta_hi, tb_hi)
    ent = jnp.where(spans[:, None], -_BIG, ent)
    ext = jnp.where(spans[:, None], _BIG, ext)
    t_near = jnp.maximum(ent.max(axis=-1), 0.0)
    t_far = jnp.minimum(ext.min(axis=-1), mt_hi[:, None])
    return t_near <= t_far, t_near


def _beam_stage(bmin_g, bmax_g, ids, ok_in, beam, row_ctx):
    """One beam-search level: slab-test the candidate boxes, sort the
    (narrow) per-row candidate axis by entry distance, keep the `beam`
    nearest. Returns (kept ids (n_rows, beam), kept ok, kept t_near,
    count of true hits). Sort width = candidate count ≤ 128, so the
    sort_key_val stays cheap (the old single-level lax.top_k over all
    388 superclusters was 28 of the 31 ms build)."""
    olo, ohi, ilo, ihi, spans, mt_hi = row_ctx
    hit, tn = _interval_slab(bmin_g, bmax_g, olo, ohi, ilo, ihi, spans,
                             mt_hi)
    hit = hit & ok_in
    key = jnp.where(hit, tn, _BIG)
    key_s, ids_s = jax.lax.sort_key_val(key, ids)
    count = jnp.sum(hit, axis=-1).astype(jnp.int32)
    return (ids_s[:, :beam], key_s[:, :beam] < _BIG, key_s[:, :beam],
            count)


@functools.partial(jax.jit, static_argnames=("w_cap", "l_sc", "beam_s2"))
def build_worklist(rays, cl_bmin, cl_bmax, sc_bmin, sc_bmax,
                   w_cap: int, l_sc: int = 16, beam_s2: int = 8):
    """Build the flat (row, cluster) work list by hierarchical beam cull.

    Three levels, all with NARROW per-row sorts (width ≤ 8·l_sc):
      S2 (8-supercluster groups, ~C/64 boxes) → top 8 by entry distance
      → their 64 superclusters → top l_sc
      → their 8·l_sc clusters → front-to-back item list.
    Rows whose true candidate count exceeds a beam at any level OVERFLOW:
    their result is a lower bound only, the caller must fall back
    (intersect.py routes them through the XLA BVH walk).

    rays: (n_rows, 8, 128) packed planes from _pack_rays.
    Returns (items (W,) i32 packed, total (,) i32, overflow (n_rows,) bool).
    Items are row-major and front-to-back within each row; every row
    contributes >= 1 item (a row with zero candidates gets one invalid
    "first" item so the kernel initialises its outputs)."""
    C = cl_bmin.shape[0]
    n_rows = rays.shape[0]
    c_s = sc_bmin.shape[0]
    row_ctx = _row_intervals(rays)

    # S2 level: groups of 8 consecutive superclusters (BVH order keeps
    # them spatially tight); boxes built in-jit from the SC boxes
    c_s2 = -(-c_s // 8)
    beam_s2 = min(beam_s2, c_s2)
    l_sc = min(l_sc, beam_s2 * 8, c_s)
    pad = c_s2 * 8 - c_s
    s2_bmin = jnp.pad(sc_bmin, ((0, pad), (0, 0)),
                      constant_values=_BIG).reshape(c_s2, 8, 3).min(axis=1)
    s2_bmax = jnp.pad(sc_bmax, ((0, pad), (0, 0)),
                      constant_values=-_BIG).reshape(c_s2, 8, 3).max(axis=1)
    s2_ids = jnp.broadcast_to(jnp.arange(c_s2, dtype=jnp.int32)[None],
                              (n_rows, c_s2))
    ids2, ok2, _, cnt2 = _beam_stage(
        jnp.broadcast_to(s2_bmin[None], (n_rows, c_s2, 3)),
        jnp.broadcast_to(s2_bmax[None], (n_rows, c_s2, 3)),
        s2_ids, jnp.ones((n_rows, c_s2), bool), beam_s2, row_ctx)
    overflow = cnt2 > beam_s2

    # SC level: the kept S2s' superclusters. ONE combined (C, 6) gather
    # per stage (gathers dominate the build; splitting bmin/bmax or axes
    # into separate gathers measured 8x slower)
    sc_boxes = jnp.concatenate([sc_bmin, sc_bmax], axis=1)   # (c_s, 6)
    sc_cand = (ids2[:, :, None] * 8
               + jnp.arange(8, dtype=jnp.int32)[None, None, :]).reshape(
                   n_rows, beam_s2 * 8)
    sc_in = jnp.repeat(ok2, 8, axis=1) & (sc_cand < c_s)
    sc_cand = jnp.minimum(sc_cand, c_s - 1)
    sc_g = sc_boxes[sc_cand]
    sc_ids, sc_ok, _, cnt_sc = _beam_stage(
        sc_g[..., 0:3], sc_g[..., 3:6], sc_cand, sc_in, l_sc, row_ctx)
    overflow = overflow | (cnt_sc > l_sc)

    # cluster level: the kept superclusters' 8 clusters each, ordered
    # front-to-back for the kernel's early exit
    cl_boxes = jnp.concatenate([cl_bmin, cl_bmax], axis=1)   # (C, 6)
    cand = (sc_ids[:, :, None] * 8
            + jnp.arange(8, dtype=jnp.int32)[None, None, :]).reshape(
                n_rows, l_sc * 8)
    cl_in = jnp.repeat(sc_ok, 8, axis=1) & (cand < C)
    cand = jnp.minimum(cand, C - 1)
    cl_g = cl_boxes[cand]
    olo, ohi, ilo, ihi, spans, mt_hi = row_ctx
    hit_b, tn_b = _interval_slab(
        cl_g[..., 0:3], cl_g[..., 3:6], olo, ohi, ilo, ihi, spans, mt_hi)
    hit_b = hit_b & cl_in
    key_b = jnp.where(hit_b, tn_b, _BIG)
    key_s, order = jax.lax.sort_key_val(key_b, cand)
    counts = jnp.sum(hit_b, axis=-1).astype(jnp.int32)

    # flat packing: row r owns slots [off[r], off[r] + max(counts[r], 1)).
    # searchsorted/per-item gathers measured ~17 ms/1M rays; instead the
    # row index comes from a scatter of row starts + cumulative max (an
    # associative scan) and only one small gather remains (off[r]).
    eff = jnp.maximum(counts, 1)
    off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           jnp.cumsum(eff)]).astype(jnp.int32)
    total = off[-1]
    w = jnp.arange(w_cap, dtype=jnp.int32)
    starts = jnp.minimum(off[:-1], w_cap - 1)
    rmark = jnp.zeros(w_cap, jnp.int32).at[starts].max(
        jnp.arange(n_rows, dtype=jnp.int32), mode="drop")
    r = jax.lax.cummax(rmark)
    smark = jnp.zeros(w_cap, jnp.int32).at[starts].max(starts, mode="drop")
    seg_start = jax.lax.cummax(smark)
    k = w - seg_start
    real = w < total
    valid = real & (k < counts[r])
    first = real & (k == 0)
    kc = jnp.minimum(k, l_sc * 8 - 1)
    cid = order[r, kc]
    items = (cid.astype(jnp.int32)
             | jnp.where(first, _FIRST_BIT, 0)
             | jnp.where(valid, _VALID_BIT, 0)
             | (r << _ROW_SHIFT))
    # padding items: repeat the final row/cid so no DMA is issued
    pad_item = ((n_rows - 1) << _ROW_SHIFT) | cid[-1]
    items = jnp.where(real, items, pad_item)
    overflow = overflow | (off[:-1] + counts > w_cap)
    return items, total, overflow


# ---------------------------------------------------------------------------
# Pallas kernels: VPU Moeller-Trumbore over 8-triangle sublane chunks
# ---------------------------------------------------------------------------

def _f32_bits(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _mt_chunks(tri_ref, rays, mnb, t_cap, k_cl):
    """Run MT over all k_cl/8 chunks of the cluster block.

    rays: (8,128) packed ray block; mnb: (1,128) mint; t_cap: (1,128)
    current best t (exclusive upper bound). Returns (t_run, k_run, u_run,
    v_run) as (8,128) running accumulators over chunks (k_run = chunk
    index, sublane = triangle-in-chunk)."""
    ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    # two interleaved accumulator sets: the t_run select chains are the
    # only cross-chunk dependency (VPU dependent-op latency ~4 cycles vs
    # ~1/cycle issue), so even/odd chunks retire in parallel
    t_runs = [jnp.full((8, LANES), _BIG, jnp.float32) for _ in range(2)]
    k_runs = [jnp.zeros((8, LANES), jnp.int32) for _ in range(2)]
    u_runs = [jnp.zeros((8, LANES), jnp.float32) for _ in range(2)]
    v_runs = [jnp.zeros((8, LANES), jnp.float32) for _ in range(2)]
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
        ok_det = jnp.abs(det) > _DET_EPS
        inv = 1.0 / jnp.where(ok_det, det, 1.0)
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
        v = (dx * qvx + dy * qvy + dz * qvz) * inv
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
        g = j & 1
        ok = (ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t > mnb) & (t < t_cap) & (t < t_runs[g]))
        t_runs[g] = jnp.where(ok, t, t_runs[g])
        k_runs[g] = jnp.where(ok, j, k_runs[g])
        u_runs[g] = jnp.where(ok, u, u_runs[g])
        v_runs[g] = jnp.where(ok, v, v_runs[g])
    sel = t_runs[1] < t_runs[0]
    return (jnp.where(sel, t_runs[1], t_runs[0]),
            jnp.where(sel, k_runs[1], k_runs[0]),
            jnp.where(sel, u_runs[1], u_runs[0]),
            jnp.where(sel, v_runs[1], v_runs[0]))


_SUBLANE_IOTA = None


def _prim_cand(k_run):
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    return k_run * 8 + sub


def _slab_can_improve(tri_ref, rays, tb, mnb):
    """(1,128) per-lane test: can this cluster (AABB embedded in the block,
    row 0 cols 9:15) possibly beat the lane's current best t?"""
    o = (rays[0, 0:1, :], rays[0, 1:2, :], rays[0, 2:3, :])
    d = (rays[0, 3:4, :], rays[0, 4:5, :], rays[0, 5:6, :])
    tn = mnb
    tf = tb
    for j in range(3):
        bmin = tri_ref[0, 0:1, 9 + j:10 + j]
        bmax = tri_ref[0, 0:1, 12 + j:13 + j]
        inv = jnp.where(d[j] >= 0, 1.0, -1.0) / jnp.maximum(
            jnp.abs(d[j]), 1e-12)
        t0 = (bmin - o[j]) * inv
        t1 = (bmax - o[j]) * inv
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    return tn <= tf


def _xform_rays(rays, xf_ref):
    """Apply the item's world->object 3x4 transform (xf_ref (1,16):
    row-major [m00..m02 t0 m10..m12 t1 m20..m22 t2 pad]) to the packed
    (8,128) ray planes. The ray PARAMETER t is invariant under an affine
    map when the direction transforms linearly (no renormalization), so
    world mint/maxt/best-t carry over unchanged — instanced clusters
    intersect in object space with zero bookkeeping on t."""
    m = [xf_ref[0, j] for j in range(12)]
    o = [rays[0:1, :], rays[1:2, :], rays[2:3, :]]
    d = [rays[3:4, :], rays[4:5, :], rays[5:6, :]]
    rows = []
    for r in range(3):
        rows.append(m[4 * r + 0] * o[0] + m[4 * r + 1] * o[1]
                    + m[4 * r + 2] * o[2] + m[4 * r + 3])
    for r in range(3):
        rows.append(m[4 * r + 0] * d[0] + m[4 * r + 1] * d[1]
                    + m[4 * r + 2] * d[2])
    return jnp.concatenate(rows + [rays[6:7, :], rays[7:8, :]], axis=0)


def _make_closest_kernel(k_cl, instanced: bool = False):
    # output block (1, 8, 128): rows 0=t, 1=u, 2=v, 3=prim (int32 bits
    # bitcast into the f32 plane), 4-7 pad — Mosaic requires sublane-
    # divisible blocks, so four (1,128) outputs are packed into one
    def kernel(items_ref, *args):
        if instanced:
            blocks_ref, starts_ref, tri_ref, xf_ref, rays, out = args
        else:
            starts_ref, tri_ref, rays, out = args
            xf_ref = None
        w = pl.program_id(0)
        item = items_ref[w]

        @pl.when((item & _FIRST_BIT) != 0)
        def _init():
            z = jnp.zeros((1, LANES), jnp.float32)
            neg1 = jax.lax.bitcast_convert_type(
                jnp.full((1, LANES), -1, jnp.int32), jnp.float32)
            out[0, 0:1, :] = rays[0, 7:8, :]            # t := maxt
            out[0, 1:2, :] = z
            out[0, 2:3, :] = z
            out[0, 3:4, :] = neg1
            out[0, 4:8, :] = jnp.zeros((4, LANES), jnp.float32)

        @pl.when((item & _VALID_BIT) != 0)
        def _work():
            tb = out[0, 0:1, :]
            mnb = rays[0, 6:7, :]
            rp = _xform_rays(rays[0], xf_ref) if instanced else rays[0]
            # per-lane early exit: the cluster block embeds its (object-
            # space) AABB; front-to-back item order makes rows terminate
            # early once every lane's best t is in front of the rest
            can = _slab_can_improve(tri_ref, rp[None], tb, mnb)

            @pl.when(jnp.max(can.astype(jnp.int32)) > 0)
            def _do():
                cid = item & (_FIRST_BIT - 1)
                t_run, k_run, u_run, v_run = _mt_chunks(
                    tri_ref, rp, mnb, tb, k_cl)
                tmin = jnp.min(t_run, axis=0, keepdims=True)
                improved = tmin < tb
                # unique winner: smallest prim among t==tmin
                pc = _prim_cand(k_run)
                win = t_run <= tmin
                psel = jnp.min(jnp.where(win, pc, jnp.int32(2 ** 30)),
                               axis=0, keepdims=True)
                w2 = (win & (pc == psel)).astype(jnp.float32)
                usel = jnp.sum(w2 * u_run, axis=0, keepdims=True)
                vsel = jnp.sum(w2 * v_run, axis=0, keepdims=True)
                start_c = starts_ref[cid]
                prim_new = jax.lax.bitcast_convert_type(
                    start_c + psel, jnp.float32)
                out[0, 0:1, :] = jnp.where(improved, tmin, tb)
                out[0, 1:2, :] = jnp.where(improved, usel, out[0, 1:2, :])
                out[0, 2:3, :] = jnp.where(improved, vsel, out[0, 2:3, :])
                out[0, 3:4, :] = jnp.where(improved, prim_new,
                                           out[0, 3:4, :])
    return kernel


def _make_probe_kernel(k_cl):
    """Diagnostic kernel: same DMA/block pattern as closest-hit but no MT
    math — isolates per-item fixed cost (grid step + cluster DMA + slab)."""
    def kernel(items_ref, starts_ref, tri_ref, rays, out):
        w = pl.program_id(0)
        item = items_ref[w]

        @pl.when((item & _FIRST_BIT) != 0)
        def _init():
            out[0, 0:8, :] = jnp.zeros((8, LANES), jnp.float32)

        @pl.when((item & _VALID_BIT) != 0)
        def _work():
            mnb = rays[0, 6:7, :]
            can = _slab_can_improve(tri_ref, rays, rays[0, 7:8, :], mnb)
            # consume one element of the block so the DMA isn't elided
            out[0, 0:1, :] = (out[0, 0:1, :] + can.astype(jnp.float32)
                              + tri_ref[0, 0:1, 0:1])
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("w_factor", "l_sc", "beam_s2",
                                    "interpret"))
def wl_probe(geom_cl, o, d, mint, maxt, w_factor: int = 16,
             l_sc: int = 24, beam_s2: int = None,
             interpret: bool = False):
    """Fixed-cost probe (diagnostic only)."""
    out, n, overflow = _call(
        _make_probe_kernel(geom_cl["tri"].shape[1]), jnp.float32,
        geom_cl, o, d, mint, maxt, w_factor, l_sc, beam_s2, interpret)
    return out[:, 0, :].reshape(-1)[:n], overflow


def _make_any_kernel(k_cl, instanced: bool = False):
    def kernel(items_ref, *args):
        if instanced:
            blocks_ref, starts_ref, tri_ref, xf_ref, rays, occ_o = args
        else:
            starts_ref, tri_ref, rays, occ_o = args
            xf_ref = None
        w = pl.program_id(0)
        item = items_ref[w]

        @pl.when((item & _FIRST_BIT) != 0)
        def _init():
            occ_o[...] = jnp.zeros_like(occ_o)

        live = jnp.min(occ_o[0, 0:1, :])

        @pl.when(((item & _VALID_BIT) != 0) & (live == 0))
        def _work():
            rp = _xform_rays(rays[0], xf_ref) if instanced else rays[0]
            t_run, _, _, _ = _mt_chunks(
                tri_ref, rp, rays[0, 6:7, :], rays[0, 7:8, :], k_cl)
            hit = t_run < _BIG
            row_hit = jnp.max(hit.astype(jnp.int32), axis=0, keepdims=True)
            occ_o[0, 0:1, :] = occ_o[0, 0:1, :] | row_hit
    return kernel

def _pack_rays(o, d, mint, maxt):
    n = o.shape[0]
    n_rows = pl.cdiv(n, LANES)
    pad = n_rows * LANES - n

    def plane(x, fill):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(
            n_rows, LANES)

    rays = jnp.stack([
        plane(o[:, 0], 0), plane(o[:, 1], 0), plane(o[:, 2], 0),
        plane(d[:, 0], 0), plane(d[:, 1], 0), plane(d[:, 2], 1),
        plane(mint, 0), plane(maxt, -1.0),
    ], axis=1)                                       # (n_rows, 8, 128)
    return rays, n, n_rows


def _row_spec(n_pref):
    idx = {2: lambda w, items, starts: (items[w] >> _ROW_SHIFT, 0, 0),
           3: lambda w, items, blocks, starts: (items[w] >> _ROW_SHIFT,
                                                0, 0)}[n_pref]
    return pl.BlockSpec((1, 8, LANES), idx, memory_space=pltpu.VMEM)


def _tri_spec(k_cl, n_pref):
    # instanced mode (3 prefetch operands): the cluster id indexes the
    # blocks table, which maps to a SHARED object-space triangle block —
    # N instances of a group reference one copy of its triangle data
    idx = {2: lambda w, items, starts: (items[w] & (_FIRST_BIT - 1), 0, 0),
           3: lambda w, items, blocks, starts: (
               blocks[items[w] & (_FIRST_BIT - 1)], 0, 0)}[n_pref]
    return pl.BlockSpec((1, k_cl, 16), idx, memory_space=pltpu.VMEM)


def _xf_spec():
    return pl.BlockSpec(
        (1, 16),
        lambda w, items, blocks, starts: (items[w] & (_FIRST_BIT - 1), 0),
        memory_space=pltpu.VMEM)


def _call(kernel, out_dtype, geom_cl, o, d, mint, maxt, w_factor, l_sc,
          beam_s2=None, interpret=False):
    """Chunked dispatch: the packed item list is a scalar-prefetch (SMEM)
    operand, so items per pallas_call are capped at MAX_ITEMS_PER_CALL;
    wide beams on large wavefronts split into sequential row-chunks."""
    rays, n, n_rows = _pack_rays(o, d, mint, maxt)
    if beam_s2 is None:
        beam_s2 = DEFAULT_BEAM_S2
    chunk_rows = max(1, min(n_rows, MAX_ITEMS_PER_CALL // max(w_factor, 1),
                            MAX_ROWS))
    outs, ovfs = [], []
    for r0 in range(0, n_rows, chunk_rows):
        o_c, ov_c = _call_chunk(kernel, out_dtype, geom_cl,
                                rays[r0:r0 + chunk_rows], w_factor, l_sc,
                                beam_s2, interpret)
        outs.append(o_c)
        ovfs.append(ov_c)
    if len(outs) == 1:
        return outs[0], n, ovfs[0]
    return (jnp.concatenate(outs, axis=0), n,
            jnp.concatenate(ovfs, axis=0))


def _call_chunk(kernel, out_dtype, geom_cl, rays, w_factor, l_sc, beam_s2,
                interpret=False):
    n_rows = rays.shape[0]
    k_cl = geom_cl["tri"].shape[1]
    instanced = geom_cl.get("block_id") is not None
    w_cap = n_rows * w_factor
    items, total, overflow = build_worklist(
        rays, geom_cl["bmin"], geom_cl["bmax"],
        geom_cl["sc_bmin"], geom_cl["sc_bmax"], w_cap, l_sc, beam_s2)
    n_pref = 3 if instanced else 2
    in_specs = [_tri_spec(k_cl, n_pref)]
    operands = [items]
    if instanced:
        operands += [geom_cl["block_id"], geom_cl["tri_start"]]
        in_specs += [_xf_spec()]
    else:
        operands += [geom_cl["tri_start"]]
    in_specs += [_row_spec(n_pref)]
    arrays = [geom_cl["tri"]]
    if instanced:
        arrays += [geom_cl["xform"]]
    arrays += [rays]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_pref,   # items [, blocks], starts
            grid=(w_cap,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 8, LANES),
                {2: lambda w, items, starts: (items[w] >> _ROW_SHIFT, 0, 0),
                 3: lambda w, items, blocks, starts: (
                     items[w] >> _ROW_SHIFT, 0, 0)}[n_pref],
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, 8, LANES), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*operands, *arrays)
    return out, overflow


@functools.partial(jax.jit,
                   static_argnames=("w_factor", "l_sc", "beam_s2",
                                    "interpret"))
def wl_closest(geom_cl, o, d, mint, maxt, w_factor: int = 16,
               l_sc: int = 24, beam_s2: int = None,
               interpret: bool = False):
    """Closest hit. geom_cl: dict with tri (C,K,16) f32, tri_start (C,)
    i32, bmin/bmax (C,3) f32, sc_bmin/sc_bmax (C_s,3) f32.
    Returns (t, u, v, prim, valid, overflow (n_rows,) bool) — lanes in
    overflowing rows carry a LOWER BOUND only; the caller must re-resolve
    them (intersect.py falls back to the XLA BVH walk)."""
    out, n, overflow = _call(
        _make_closest_kernel(geom_cl["tri"].shape[1],
                             geom_cl.get("block_id") is not None),
        jnp.float32,
        geom_cl, o, d, mint, maxt, w_factor, l_sc, beam_s2, interpret)
    t = out[:, 0, :].reshape(-1)[:n]
    u = out[:, 1, :].reshape(-1)[:n]
    v = out[:, 2, :].reshape(-1)[:n]
    prim = jax.lax.bitcast_convert_type(out[:, 3, :],
                                        jnp.int32).reshape(-1)[:n]
    valid = prim >= 0
    return (jnp.where(valid, t, jnp.inf), u, v, prim, valid, overflow)


@functools.partial(jax.jit,
                   static_argnames=("w_factor", "l_sc", "beam_s2",
                                    "interpret"))
def wl_any(geom_cl, o, d, mint, maxt, w_factor: int = 16,
           l_sc: int = 24, beam_s2: int = None,
           interpret: bool = False):
    """Shadow/any-hit query. Returns (occluded bool mask,
    overflow (n_rows,) bool — see wl_closest)."""
    out, n, overflow = _call(
        _make_any_kernel(geom_cl["tri"].shape[1],
                         geom_cl.get("block_id") is not None), jnp.int32,
        geom_cl, o, d, mint, maxt, w_factor, l_sc, beam_s2, interpret)
    occ = out[:, 0, :].reshape(-1)[:n]
    return occ.astype(bool), overflow
