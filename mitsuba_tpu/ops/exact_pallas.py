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

# (E0, E1, E2, E3): L2 candidates, L2 kept, L1 kept, K8 items.
# E0, 8*E1 and 8*E2 must be multiples of 128 (refine-kernel packing);
# E3 of BI. Sized at the p99 row footprint of config-3 bounce rays
# (scripts/exp_r3_caps.py); overflow rows fall back.
CAPS_COHERENT = (128, 16, 32, 96)
CAPS_DIFFUSE = (256, 160, 384, 512)
# second-tier caps for rows that overflow CAPS_DIFFUSE (re-run on the
# compacted overflow rows only — see render/intersect.py _retier);
# ~2x item capacity (round-4 trim from 4x: the XL query's build cost is
# linear in these and the 4x tier cost ~150 ms/1M on top of a 259 ms
# main query, exp_r4_body; rows past 2x go to the stream fallback)
CAPS_XL = (256, 240, 768, 1024)


def auto_caps(n_k8: int):
    """Scene-statistics caps (VERDICT round-3 #3: replace the hard-coded
    config-3 p99). Constraints: E0 and 8*E1 and 8*E2 multiples of 128
    (refine-kernel packing), E3 of BI. Scaling fitted to the measured
    p99 row footprint of the 8.6k-cluster config-3 scene (E3=512 ~=
    0.06*C8) with the exact cull's sub-linear growth in scene size;
    small scenes get proportionally cheaper builds. Returns
    (caps_diffuse, caps_coherent, caps_xl)."""
    def rup(x, m):
        return int(-(-int(x) // m) * m)

    e3 = min(512, max(128, rup(0.06 * n_k8, 16)))
    e2 = min(384, max(48, rup(e3 * 0.75, 16)))
    e1 = min(160, max(16, rup(e2 * 0.42, 16)))
    e0 = 128 if n_k8 // 64 <= 128 else 256
    dif = (e0, e1, e2, e3)
    coh = (128, min(e1, 16), min(e2, 32), min(e3, 96))
    xl = (e0, min(240, ((e1 * 3 // 2) + 15) // 16 * 16),
          min(768, e2 * 2), min(1024, e3 * 2))
    return dif, coh, xl


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


# --- Pallas refine kernel: cost scales with the LIVE prefix, not caps ---

def _refine_kernel(live_pf, rays_ref, box_ref, out_ref):
    """Per-row exact slab keys for packed candidate boxes.

    box layout (1, NG, 8, 128): group g holds 128 entries as 16 chunks
    of 8 (sublane = entry-in-chunk); chunk c's six box fields
    (lo.xyz|hi.xyz) sit at lanes c*8 .. c*8+5. Output keys land at
    lane c*8 of the same (g, sublane) slot. Only ceil(live/128) groups
    are computed — candidates are a sorted live prefix."""
    r = pl.program_id(0)
    NG = box_ref.shape[1]
    rays = rays_ref[0]
    o = (rays[0:1, :], rays[1:2, :], rays[2:3, :])
    d = (rays[3:4, :], rays[4:5, :], rays[5:6, :])
    mn = rays[6:7, :]
    mx = rays[7:8, :]
    inv = [jnp.where(jnp.abs(dj) > 1e-12, 1.0 / dj, _BIG) for dj in d]
    n_g = (live_pf[r] + 127) // 128

    def body(g, _):
        for c in range(16):
            tn = jnp.broadcast_to(mn, (8, LANES))
            tf = jnp.broadcast_to(mx, (8, LANES))
            for j in range(3):
                lo = box_ref[0, g, :, c * 8 + j:c * 8 + j + 1]
                hi = box_ref[0, g, :, c * 8 + 3 + j:c * 8 + 4 + j]
                t0 = (lo - o[j]) * inv[j]
                t1 = (hi - o[j]) * inv[j]
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            key = jnp.min(jnp.where(tn <= tf, tn, _BIG), axis=1,
                          keepdims=True)
            out_ref[0, g, :, c * 8:c * 8 + 1] = key
        return 0

    jax.lax.fori_loop(0, n_g, body, 0)


import numpy as _np


def _pack_perm(E):
    """Static column permutation making the kernel box layout a PURE
    reshape of the gathered (R,E,8) records: packed slot
    e' = g*128 + s*16 + c must hold entry e = g*128 + c*8 + s."""
    g, s, c = _np.meshgrid(_np.arange(E // 128), _np.arange(8),
                           _np.arange(16), indexing="ij")
    return jnp.asarray((g * 128 + c * 8 + s).reshape(-1), jnp.int32)


def _refine_keys_pallas(rays, ids, keep, live, blo, bhi, interpret):
    """Pallas-backed _exact_refine: same contract, plus `live` (R,) i32
    upper bound on the sorted live-candidate prefix length."""
    R, E = ids.shape
    perm = _pack_perm(E)
    idsp = ids[:, perm]
    lo = blo[idsp]
    hi = bhi[idsp]
    b = jnp.concatenate([lo, hi, jnp.zeros((R, E, 2), lo.dtype)], -1)
    boxes = b.reshape(R, E // 128, 8, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, 8, LANES), lambda r, live: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E // 128, 8, LANES),
                         lambda r, live: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, E // 128, 8, LANES),
                               lambda r, live: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _refine_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, E // 128, 8, LANES),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(live, rays, boxes)
    # keys sit at lane c*8 of slot (g, s); slot order (g, s, c) is the
    # permuted entry order — scatter back via the same static perm
    kp = out.reshape(R, E // 128, 8, 16, 8)[:, :, :, :, 0].reshape(R, E)
    key = kp[:, jnp.argsort(perm)]
    # beyond-live groups are uninitialized and dead entries carry
    # garbage boxes: mask both
    return jnp.where(keep, key, _BIG)


# --- child-refine kernel: parents' 8 consecutive children tested from a
# VMEM-resident (C_parent, 8, 128) box table — no XLA gather at all
# (the (R,E,6) box gathers measured 137 ms/1M at diffuse caps) ---

def _child_refine_kernel(live_pf, pids_ref, rays_ref, tab_ref, out_ref):
    """Keys for the 8 children of each listed parent.

    pids_ref SMEM (1, Ep): parent ids, live prefix of length live_pf[r].
    tab_ref VMEM (Cp, 8, 128): sublane = child, lanes 0:3 lo / 3:6 hi.
    out_ref (1, Ep/16, 8, 128): key of (parent rank p, child s) at
    [0, p//16, s, (p%16)*8]."""
    r = pl.program_id(0)
    rays = rays_ref[0]
    o = (rays[0:1, :], rays[1:2, :], rays[2:3, :])
    d = (rays[3:4, :], rays[4:5, :], rays[5:6, :])
    mn = rays[6:7, :]
    mx = rays[7:8, :]
    inv = [jnp.where(jnp.abs(dj) > 1e-12, 1.0 / dj, _BIG) for dj in d]
    n_g = (live_pf[r] + 15) // 16

    def body(g, _):
        for k in range(16):
            pid = pids_ref[0, 0, g * 16 + k]
            blk = tab_ref[pid]
            tn = jnp.broadcast_to(mn, (8, LANES))
            tf = jnp.broadcast_to(mx, (8, LANES))
            for j in range(3):
                lo = blk[:, j:j + 1]
                hi = blk[:, 3 + j:4 + j]
                t0 = (lo - o[j]) * inv[j]
                t1 = (hi - o[j]) * inv[j]
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            key = jnp.min(jnp.where(tn <= tf, tn, _BIG), axis=1,
                          keepdims=True)
            out_ref[0, g, :, k * 8:k * 8 + 1] = key
        return 0

    jax.lax.fori_loop(0, n_g, body, 0)


def _child_refine(rays, pids, live_p, tab, keep8, interpret):
    """Exact keys for the 8 children of each parent in pids (R, Ep).
    Returns (R, Ep*8) keys in child-major order e = p*8 + ch, masked by
    keep8."""
    R, Ep = pids.shape
    # (R, 1, Ep) with a (1, 1, Ep) block: Mosaic requires block dims to
    # divide or equal the array dims (same workaround as stream_pallas)
    pids3 = pids[:, None, :]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, 1, Ep), lambda r, lv: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, LANES), lambda r, lv: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tab.shape, lambda r, lv: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Ep // 16, 8, LANES),
                               lambda r, lv: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _child_refine_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, Ep // 16, 8, LANES),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(live_p, pids3, rays, tab)
    # [r, g, s, k*8] -> entry e = (g*16+k)*8 + s
    kp = out.reshape(R, Ep // 16, 8, 16, 8)[:, :, :, :, 0]
    key = kp.transpose(0, 1, 3, 2).reshape(R, Ep * 8)
    return jnp.where(keep8, key, _BIG)


def pack_child_table(lo, hi):
    """(Cp*8, 3) child boxes -> (Cp, 8, 128) resident kernel table."""
    import numpy as np
    n = lo.shape[0]
    tab = np.zeros((n // 8, 8, 128), np.float32)
    tab[:, :, 0:3] = np.asarray(lo).reshape(-1, 8, 3)
    tab[:, :, 3:6] = np.asarray(hi).reshape(-1, 8, 3)
    return tab


def _seg_on() -> bool:
    """Segmented (sort-free) S2/S3 compaction — NEGATIVE RESULT, default
    OFF (MTS_SEGC=1 enables). Two designs both lost to the wide sorts
    on v5e (config-3 e2e): (R,P,8) masked-rank compaction 0.98 -> 0.22
    Mrays/s (minor-dim-8 arrays pad to 128 lanes: 16x traffic) and the
    flat j-th-set-bit binary search 0.98 -> 0.56 (12 rounds of
    take_along_axis = per-element gathers at ~11 ms/M). XLA's bitonic
    sort keeps everything in vector registers; gather-based compaction
    can't compete at these widths. docs/PERF_NOTES.md round 4."""
    import os

    return os.environ.get("MTS_SEGC", "0") == "1"


def _segmented_compact(key, ids, e_out):
    """Compact live children (key < _BIG) into a prefix of width e_out
    WITHOUT the (R, P*8)-wide sort (TPU sorts at width 3072 were the
    largest single build stage) and WITHOUT any (..., 8)-minor-dim
    arrays (v1 of this used (R, P, 8) masks — TPU pads the minor dim to
    128 lanes, a 16x traffic blowup that made the whole build slower
    than the sort it replaced).

    key/ids: (R, PE) in parent-major order with parents already sorted
    front-to-back, so flat order IS coarse front-to-back; output slot j
    takes the j-th live element: i(j) = index of the j-th set mask bit,
    found by binary search over the inclusive mask cumsum.

    Returns (ids_out (R, e_out) [0 at dead slots], key_out (R, e_out)
    [_BIG at dead slots], n_live (R,))."""
    R, PE = key.shape
    mask = key < _BIG
    c = jnp.cumsum(mask.astype(jnp.int32), axis=1)      # inclusive
    n_live = c[:, -1]
    j1 = jnp.arange(1, e_out + 1, dtype=jnp.int32)[None]   # target count
    lo = jnp.zeros((R, e_out), jnp.int32)
    hi = jnp.full((R, e_out), PE - 1, jnp.int32)
    for _ in range(max(1, int(_np.ceil(_np.log2(max(PE, 2)))))):
        mid = (lo + hi) // 2
        c_mid = jnp.take_along_axis(c, mid, axis=1)
        lt = c_mid < j1
        lo = jnp.where(lt, mid + 1, lo)
        hi = jnp.where(lt, hi, mid)
    ok = j1 <= n_live[:, None]
    ids_out = jnp.where(ok, jnp.take_along_axis(ids, lo, axis=1), 0)
    key_out = jnp.where(ok, jnp.take_along_axis(key, lo, axis=1), _BIG)
    return ids_out, key_out, n_live


def build_exact_items(rays, ex, caps, use_kernel=True, interpret=False):
    """Hierarchical exact cull. rays (R,8,128); ex: dict with
    b2_lo/hi (C8/64,3), b1_lo/hi (C8/8,3), b0_lo/hi (C8,3).
    Returns (ids (R,E3) i32 K8-cluster ids front-to-back [0 for dead
    slots], blk_tn (R, E3/BI) f32 entry key of each BI-block [_BIG if
    fully dead], overflow (R,) bool). E0 and 8*E1 and 8*E2 must be
    multiples of 128 when use_kernel=True."""
    E0, E1, E2, E3 = caps
    R = rays.shape[0]

    def refine(ids, keep, live, lo, hi):
        if use_kernel:
            return _refine_keys_pallas(rays, ids, keep, live, lo, hi,
                                       interpret)
        return _exact_refine(rays, ids, keep, lo, hi)

    c2 = ex["b2_lo"].shape[0]
    ct2 = ex.get("ct2")
    if use_kernel and ct2 is not None and ct2.shape[0] * 8 <= E0:
        # all-L2 exact kernel: every L2 box tested per row straight from
        # the resident virtual-parent table — replaces the conservative
        # S0 prefilter AND S1's (R,E0,3)x2 box gathers with one
        # child-refine pass (the gather elimination that made the
        # S2/S3 child kernels a win, applied to the root level)
        p2 = ct2.shape[0]
        pids = jnp.broadcast_to(
            jnp.arange(p2, dtype=jnp.int32)[None], (R, p2))
        live_p2 = jnp.full((R,), -(-c2 // 8), jnp.int32)
        child = jnp.arange(p2 * 8, dtype=jnp.int32)
        keep_a = jnp.broadcast_to((child < c2)[None], (R, p2 * 8))
        key1 = _child_refine(rays, pids, live_p2, ct2, keep_a, interpret)
        ids0 = jnp.broadcast_to(child[None], (R, p2 * 8))
        n0 = jnp.zeros((R,), jnp.int32)          # exact: no E0 overflow
    else:
        # S0: conservative L2 interval cull + S1 exact refine
        ids0f, tns0f = build_sc_lists(rays, ex["b2_lo"], ex["b2_hi"])
        n0 = jnp.sum(tns0f[:, 0, :] < _BIG, -1)
        ids0 = ids0f[:, 0, :E0]
        keep0 = tns0f[:, 0, :E0] < _BIG
        live0 = jnp.minimum(n0, E0).astype(jnp.int32)
        key1 = refine(ids0, keep0, live0, ex["b2_lo"], ex["b2_hi"])
    key1s, ids1 = jax.lax.sort_key_val(key1, ids0)
    n1 = jnp.sum(key1 < _BIG, -1)
    ids1 = ids1[:, :E1]
    keep1 = key1s[:, :E1] < _BIG
    live1p = jnp.minimum(n1, E1).astype(jnp.int32)
    # S2: exact L1 (64-tri blocks, 8 consecutive per L2) — children read
    # in-kernel from the resident parent table, no XLA box gather
    ids64 = (ids1[:, :, None] * 8
             + jnp.arange(8, dtype=jnp.int32)[None, None]).reshape(R, -1)
    keep64 = jnp.repeat(keep1, 8, axis=1)
    if use_kernel:
        key2 = _child_refine(rays, ids1, live1p, ex["ct1"], keep64,
                             interpret)
    else:
        key2 = refine(ids64, keep64, live1p * 8, ex["b1_lo"],
                      ex["b1_hi"])
    if _seg_on():
        ids2, key2c, n2 = _segmented_compact(key2, ids64, E2)
        keep2 = key2c < _BIG
    else:
        key2s, ids2 = jax.lax.sort_key_val(key2, ids64)
        n2 = jnp.sum(key2 < _BIG, -1)
        ids2 = ids2[:, :E2]
        keep2 = key2s[:, :E2] < _BIG
    live2p = jnp.minimum(n2, E2).astype(jnp.int32)
    # S3: exact K8 clusters (8 consecutive per L1)
    ids8 = (ids2[:, :, None] * 8
            + jnp.arange(8, dtype=jnp.int32)[None, None]).reshape(R, -1)
    keep8 = jnp.repeat(keep2, 8, axis=1)
    if use_kernel:
        key3 = _child_refine(rays, ids2, live2p, ex["ct0"], keep8,
                             interpret)
    else:
        key3 = refine(ids8, keep8, live2p * 8, ex["b0_lo"],
                      ex["b0_hi"])
    if _seg_on():
        ids, key3c, n3 = _segmented_compact(key3, ids8, E3)
        # unsorted within parents: the block key must LOWER-bound every
        # item in the block -> min-reduce instead of first-element
        blk_tn = key3c.reshape(R, E3 // BI, BI).min(-1)
    else:
        key3s, ids3 = jax.lax.sort_key_val(key3, ids8)
        n3 = jnp.sum(key3 < _BIG, -1)
        ids = jnp.where(key3s[:, :E3] < _BIG, ids3[:, :E3], 0)
        blk_tn = key3s[:, :E3].reshape(R, E3 // BI, BI)[:, :, 0]
    overflow = (n0 > E0) | (n1 > E1) | (n2 > E2) | (n3 > E3)
    return ids, blk_tn, overflow


def build_exact_l1(rays, ex, caps, use_kernel=True, interpret=False):
    """v6 build: the S0-S2 prefix of build_exact_items only. Returns
    (l1_ids (R,E2) i32 front-to-back [0 at dead slots], l1_keys (R,E2)
    f32 entry keys [_BIG at dead slots], overflow (R,) bool). The K8
    level (S3 refine + the 3072-wide sort, the largest single build
    stage) moves INTO the item kernel: clusters of an L1 are consecutive
    in ex["tri"], so the kernel prefetches one contiguous (8,8,128) L1
    mega-block per listed L1 and culls its 8 K8 children in-kernel from
    the resident ct0 table — the same exact union the S3 refine
    computes, for free on the VPU."""
    E0, E1, E2, _E3 = caps
    R = rays.shape[0]
    c2 = ex["b2_lo"].shape[0]
    ct2 = ex.get("ct2")
    if use_kernel and ct2 is not None and ct2.shape[0] * 8 <= E0:
        p2 = ct2.shape[0]
        pids = jnp.broadcast_to(
            jnp.arange(p2, dtype=jnp.int32)[None], (R, p2))
        live_p2 = jnp.full((R,), -(-c2 // 8), jnp.int32)
        child = jnp.arange(p2 * 8, dtype=jnp.int32)
        keep_a = jnp.broadcast_to((child < c2)[None], (R, p2 * 8))
        key1 = _child_refine(rays, pids, live_p2, ct2, keep_a, interpret)
        ids0 = jnp.broadcast_to(child[None], (R, p2 * 8))
        n0 = jnp.zeros((R,), jnp.int32)
    else:
        ids0f, tns0f = build_sc_lists(rays, ex["b2_lo"], ex["b2_hi"])
        n0 = jnp.sum(tns0f[:, 0, :] < _BIG, -1)
        ids0 = ids0f[:, 0, :E0]
        keep0 = tns0f[:, 0, :E0] < _BIG
        live0 = jnp.minimum(n0, E0).astype(jnp.int32)
        if use_kernel:
            key1 = _refine_keys_pallas(rays, ids0, keep0, live0,
                                       ex["b2_lo"], ex["b2_hi"],
                                       interpret)
        else:
            key1 = _exact_refine(rays, ids0, keep0, ex["b2_lo"],
                                 ex["b2_hi"])
    key1s, ids1 = jax.lax.sort_key_val(key1, ids0)
    n1 = jnp.sum(key1 < _BIG, -1)
    ids1 = ids1[:, :E1]
    keep1 = key1s[:, :E1] < _BIG
    live1p = jnp.minimum(n1, E1).astype(jnp.int32)
    ids64 = (ids1[:, :, None] * 8
             + jnp.arange(8, dtype=jnp.int32)[None, None]).reshape(R, -1)
    keep64 = jnp.repeat(keep1, 8, axis=1)
    if use_kernel:
        key2 = _child_refine(rays, ids1, live1p, ex["ct1"], keep64,
                             interpret)
    else:
        key2 = _exact_refine(rays, ids64, keep64, ex["b1_lo"],
                             ex["b1_hi"])
    key2s, ids2 = jax.lax.sort_key_val(key2, ids64)
    n2 = jnp.sum(key2 < _BIG, -1)
    l1_ids = jnp.where(key2s[:, :E2] < _BIG, ids2[:, :E2], 0)
    l1_keys = key2s[:, :E2]
    overflow = (n0 > E0) | (n1 > E1) | (n2 > E2)
    return l1_ids, l1_keys, overflow


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
                # slot 0 = occlusion flag; slot 1 = per-lane t_bound:
                # maxt while unoccluded, collapses to mint-1 on occlusion
                # so the ordered block skip below prunes like the
                # closest kernel (round-4: any-hit was 1.8x closest
                # without this — unoccluded lanes forced the full list,
                # and occluded rows kept paying the block sweep)
                out_ref[0, 0:1, :] = jnp.zeros((1, LANES), jnp.float32)
                out_ref[0, 1:2, :] = maxt
                out_ref[0, 2:8, :] = jnp.zeros((6, LANES), jnp.float32)
            else:
                out_ref[0, 0:1, :] = maxt
                out_ref[0, 1:3, :] = jnp.zeros((2, LANES), jnp.float32)
                out_ref[0, 3:4, :] = jax.lax.bitcast_convert_type(
                    jnp.full((1, LANES), -1, jnp.int32), jnp.float32)
                out_ref[0, 4:8, :] = jnp.zeros((4, LANES), jnp.float32)

        blk_t = blk_pf[r, b]
        if any_hit:
            # ordered skip: a block whose entry exceeds every lane's
            # bound cannot occlude anyone; once all lanes are occluded
            # (or dead: maxt<mint) max(t_bound) < blk_t for every block
            t_bound = out_ref[0, 1:2, :]
            do = blk_t <= jnp.max(t_bound)
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
                occ_new = jnp.maximum(occ, hit_any)
                out_ref[0, 0:1, :] = occ_new
                out_ref[0, 1:2, :] = jnp.where(occ_new > 0.0,
                                               mnb - 1.0, maxt)
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


BL = 8                  # L1 mega-blocks per v6 grid step


def _make_l1_kernel(any_hit: bool):
    """v6 item kernel: one grid step covers BL L1 blocks. Per L1:
    ordered skip on its (XLA-sorted) entry key, in-kernel slab cull of
    its 8 K8 children from the resident ct0 table, MT only clusters at
    least one lane's slab interval admits — the exact per-lane union the
    S3 refine used to compute in XLA (plus its 3072-wide sort)."""
    def kernel(ids_pf, key_pf, rays_ref, ct0_ref, *rest):
        tri_refs = rest[:BL]
        out_ref = rest[BL]
        r = pl.program_id(0)
        b = pl.program_id(1)
        rays = rays_ref[0]
        mnb = rays[6:7, :]
        maxt = rays[7:8, :]
        o = (rays[0:1, :], rays[1:2, :], rays[2:3, :])
        d = (rays[3:4, :], rays[4:5, :], rays[5:6, :])
        inv = [jnp.where(jnp.abs(dj) > 1e-12, 1.0 / dj, _BIG)
               for dj in d]

        @pl.when(b == 0)
        def _():
            if any_hit:
                out_ref[0, 0:1, :] = jnp.zeros((1, LANES), jnp.float32)
                out_ref[0, 1:2, :] = maxt
                out_ref[0, 2:8, :] = jnp.zeros((6, LANES), jnp.float32)
            else:
                out_ref[0, 0:1, :] = maxt
                out_ref[0, 1:3, :] = jnp.zeros((2, LANES), jnp.float32)
                out_ref[0, 3:4, :] = jax.lax.bitcast_convert_type(
                    jnp.full((1, LANES), -1, jnp.int32), jnp.float32)
                out_ref[0, 4:8, :] = jnp.zeros((4, LANES), jnp.float32)

        for i in range(BL):
            blk_t = key_pf[r, b * BL + i]
            if any_hit:
                bound = jnp.max(out_ref[0, 1:2, :])
            else:
                bound = jnp.max(out_ref[0, 0:1, :])

            @pl.when(blk_t <= bound)
            def _(i=i, blk_t=blk_t):
                # K8 child slab cull from the resident table: sublane =
                # child cluster, lanes 0:3 lo / 3:6 hi (as _child_refine)
                blk = ct0_ref[ids_pf[r, b * BL + i]]
                tn = jnp.broadcast_to(mnb, (8, LANES))
                tf = jnp.broadcast_to(maxt, (8, LANES))
                for j in range(3):
                    lo = blk[:, j:j + 1]
                    hi = blk[:, 3 + j:4 + j]
                    t0 = (lo - o[j]) * inv[j]
                    t1 = (hi - o[j]) * inv[j]
                    tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                    tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                hit_child = (tn <= tf).astype(jnp.float32)
                for c in range(8):
                    any_c = jnp.max(hit_child[c:c + 1, :])

                    @pl.when(any_c > 0.0)
                    def _(i=i, c=c):
                        tri = tri_refs[i][0, c]
                        if any_hit:
                            occ = out_ref[0, 0:1, :]
                            t_run, _u, _v, _p = _mt_item(
                                tri, rays, mnb,
                                jnp.where(occ > 0, mnb, maxt))
                            hit = jnp.max(
                                (t_run < _BIG).astype(jnp.float32),
                                axis=0, keepdims=True)
                            occ_new = jnp.maximum(occ, hit)
                            out_ref[0, 0:1, :] = occ_new
                            out_ref[0, 1:2, :] = jnp.where(
                                occ_new > 0.0, mnb - 1.0, maxt)
                        else:
                            tb = out_ref[0, 0:1, :]
                            ub = out_ref[0, 1:2, :]
                            vb = out_ref[0, 2:3, :]
                            pb = jax.lax.bitcast_convert_type(
                                out_ref[0, 3:4, :], jnp.int32)
                            t_i, u_i, v_i, p_i = _mt_item(tri, rays,
                                                          mnb, tb)
                            tmin = jnp.min(t_i, axis=0, keepdims=True)
                            improved = tmin < tb
                            sub = jax.lax.broadcasted_iota(
                                jnp.int32, (8, LANES), 0)
                            win = t_i <= tmin
                            ssel = jnp.min(jnp.where(win, sub, 8),
                                           axis=0, keepdims=True)
                            w2 = (win & (sub == ssel)).astype(
                                jnp.float32)
                            usel = jnp.sum(w2 * u_i, axis=0,
                                           keepdims=True)
                            vsel = jnp.sum(w2 * v_i, axis=0,
                                           keepdims=True)
                            psel = jnp.sum(
                                w2 * jnp.broadcast_to(
                                    p_i, (8, LANES)).astype(jnp.float32),
                                axis=0, keepdims=True).astype(jnp.int32)
                            out_ref[0, 0:1, :] = jnp.where(
                                improved, tmin, tb)
                            out_ref[0, 1:2, :] = jnp.where(
                                improved, usel, ub)
                            out_ref[0, 2:3, :] = jnp.where(
                                improved, vsel, vb)
                            out_ref[0, 3:4, :] = \
                                jax.lax.bitcast_convert_type(
                                    jnp.where(improved, psel, pb),
                                    jnp.float32)
    return kernel


def _call_l1_items(ex_tri, ct0, rays, l1_ids, l1_keys, any_hit: bool,
                   interpret: bool = False):
    """v6 chunk: rays (Rc,8,128), l1_ids/l1_keys (Rc,E2)."""
    Rc, E2 = l1_ids.shape
    tri64 = ex_tri.reshape(-1, 8, 8, LANES)
    tri_specs = [
        pl.BlockSpec((1, 8, 8, LANES),
                     (lambda i: lambda r, b, ids_pf, key_pf:
                      (ids_pf[r, b * BL + i], 0, 0, 0))(i),
                     memory_space=pltpu.VMEM)
        for i in range(BL)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Rc, E2 // BL),
        in_specs=[
            pl.BlockSpec((1, 8, LANES),
                         lambda r, b, ids_pf, key_pf: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ct0.shape,
                         lambda r, b, ids_pf, key_pf: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + tri_specs,
        out_specs=pl.BlockSpec((1, 8, LANES),
                               lambda r, b, ids_pf, key_pf: (r, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _make_l1_kernel(any_hit),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rc, 8, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(l1_ids, l1_keys, rays, ct0, *([tri64] * BL))
    return out


def _make_l1_masked_kernel(blm: int, any_hit: bool):
    """v6b item kernel — the BRANCHLESS masked L1-fold. One grid step
    covers `blm` L1 mega-blocks with ONE ordered-skip cond on the step's
    first entry key (keys are sorted ascending, so the first is the
    minimum); inside, ALL blm*8 K8 clusters are Moeller-Trumbore-tested
    unconditionally. v6 paid 72 scalar conds per step (per-L1 skip +
    per-cluster pl.when) and Mosaic serialized on every vector->scalar
    reduction they need (law 6, docs/PERF_NOTES.md); v6b trades ~3x the
    MT pair tests (L1 granularity instead of K8) for zero per-decision
    control flow — the S3 child-refine AND the 3072-wide sort (the
    largest single build stage) still fold away as in v6."""
    def kernel(ids_pf, key_pf, rays_ref, *rest):
        tri_refs = rest[:blm]
        out_ref = rest[blm]
        r = pl.program_id(0)
        b = pl.program_id(1)
        rays = rays_ref[0]
        mnb = rays[6:7, :]
        maxt = rays[7:8, :]

        @pl.when(b == 0)
        def _():
            if any_hit:
                out_ref[0, 0:1, :] = jnp.zeros((1, LANES), jnp.float32)
                out_ref[0, 1:2, :] = maxt
                out_ref[0, 2:8, :] = jnp.zeros((6, LANES), jnp.float32)
            else:
                out_ref[0, 0:1, :] = maxt
                out_ref[0, 1:3, :] = jnp.zeros((2, LANES), jnp.float32)
                out_ref[0, 3:4, :] = jax.lax.bitcast_convert_type(
                    jnp.full((1, LANES), -1, jnp.int32), jnp.float32)
                out_ref[0, 4:8, :] = jnp.zeros((4, LANES), jnp.float32)

        blk_t = key_pf[r, b * blm]
        if any_hit:
            do = blk_t <= jnp.max(out_ref[0, 1:2, :])
        else:
            do = blk_t <= jnp.max(out_ref[0, 0:1, :])

        @pl.when(do)
        def _():
            if any_hit:
                occ = out_ref[0, 0:1, :]
                cap = jnp.where(occ > 0, mnb, maxt)
                hit_any = jnp.zeros((1, LANES), jnp.float32)
                for i in range(blm):
                    for c in range(8):
                        t_run, _u, _v, _p = _mt_item(
                            tri_refs[i][0, c], rays, mnb, cap)
                        hit_any = jnp.maximum(
                            hit_any,
                            jnp.max((t_run < _BIG).astype(jnp.float32),
                                    axis=0, keepdims=True))
                occ_new = jnp.maximum(occ, hit_any)
                out_ref[0, 0:1, :] = occ_new
                out_ref[0, 1:2, :] = jnp.where(occ_new > 0.0,
                                               mnb - 1.0, maxt)
            else:
                tb = out_ref[0, 0:1, :]
                ub = out_ref[0, 1:2, :]
                vb = out_ref[0, 2:3, :]
                pb = jax.lax.bitcast_convert_type(out_ref[0, 3:4, :],
                                                  jnp.int32)
                t_run = jnp.full((8, LANES), _BIG, jnp.float32)
                u_run = jnp.zeros((8, LANES), jnp.float32)
                v_run = jnp.zeros((8, LANES), jnp.float32)
                p_run = jnp.zeros((8, LANES), jnp.int32)
                for i in range(blm):
                    for c in range(8):
                        t_i, u_i, v_i, p_i = _mt_item(
                            tri_refs[i][0, c], rays, mnb, tb)
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


def _call_l1_masked(ex_tri, rays, l1_ids, l1_keys, any_hit: bool,
                    blm: int = 4, interpret: bool = False):
    """v6b chunk: rays (Rc,8,128), l1_ids/l1_keys (Rc,E2)."""
    Rc, E2 = l1_ids.shape
    # grid = E2 // blm steps: blm MUST divide E2 or the trailing
    # E2 % blm slots would silently never be tested (missed hits);
    # clamp to the largest divisor <= requested (E2=32 coherent caps
    # with blm=24 -> 16)
    while E2 % blm:
        blm -= 1
    tri64 = ex_tri.reshape(-1, 8, 8, LANES)
    tri_specs = [
        pl.BlockSpec((1, 8, 8, LANES),
                     (lambda i: lambda r, b, ids_pf, key_pf:
                      (ids_pf[r, b * blm + i], 0, 0, 0))(i),
                     memory_space=pltpu.VMEM)
        for i in range(blm)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Rc, E2 // blm),
        in_specs=[
            pl.BlockSpec((1, 8, LANES),
                         lambda r, b, ids_pf, key_pf: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + tri_specs,
        out_specs=pl.BlockSpec((1, 8, LANES),
                               lambda r, b, ids_pf, key_pf: (r, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _make_l1_masked_kernel(blm, any_hit),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rc, 8, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(l1_ids, l1_keys, rays, *([tri64] * blm))
    return out


def _v6_on() -> int:
    """v6-family L1-granularity item kernels (K8 cull folded in-kernel):
    MTS_V6=2 = branchless masked fold (v6b: one ordered-skip cond per
    grid step, all blm*8 clusters MT'd; bitwise-identical to v5, folds
    away the S3 refine + the 3072-wide sort, +2-3% e2e and -26/-36%
    query-level on uncapped rays), 1 = branched fold (round-4 negative
    result, docs/PERF_NOTES.md law 6), 0 = v5. Unset: compiled TPU runs
    default to 2, interpret-mode (CPU test) runs to 0 — the masked
    fold's blm*8 unrolled MT items are pathological for the Python
    interpreter (set the env var to force either everywhere)."""
    import os

    v = os.environ.get("MTS_V6")
    if v is None:
        import jax

        return 2 if jax.default_backend() == "tpu" else 0
    try:
        return int(v)
    except ValueError:
        return 0


# Rows per chunk: bounds both the SMEM prefetch arrays of one
# pallas_call (ids (Rc,E3) i32 + blk_tn padded to (Rc,128) f32 must fit
# 1 MB SMEM) and the HBM peak of the build's (Rc, E, 3, 128) slab
# intermediates (~1.2 GB at CAPS_DIFFUSE)
R_CHUNK = 320


def _r_chunk(caps):
    """Chunk rows so the item kernel's SMEM prefetch (ids (Rc, E3) i32 +
    blk keys) stays under the 1 MB scalar-memory budget at any caps."""
    e3 = caps[3]
    return max(32, min(R_CHUNK, (900 * 1024) // (e3 * 5)))


def _r_chunk_v6(caps):
    """v6 SMEM budget: l1 ids + l1 keys, both (Rc, E2)."""
    e2 = caps[2]
    return max(32, min(R_CHUNK, (900 * 1024) // (e2 * 8)))


def _pad_rows(rays, n_rows, r_chunk=R_CHUNK):
    """Pad the row axis to a multiple of r_chunk with dead rows
    (maxt = -1 < mint, so they produce no candidates and no hits)."""
    nc = -(-n_rows // r_chunk)
    pad = nc * r_chunk - n_rows
    if pad:
        dead = jnp.zeros((pad, 8, LANES), jnp.float32)
        dead = dead.at[:, 7].set(-1.0)
        dead = dead.at[:, 5].set(1.0)
        rays = jnp.concatenate([rays, dead], axis=0)
    return rays.reshape(nc, r_chunk, 8, LANES)


def _v6_blm() -> int:
    """v6b L1 mega-blocks per grid step (MTS_V6BLM, default 16 — the
    e2e-best valid setting of the round-5 sweep; clamped per call to a
    divisor of the caps' E2). Resolved OUTSIDE the jit by the public
    wrappers (same trap as MTS_V6: a trace-time read would freeze into
    the compile cache)."""
    import os

    try:
        return max(1, int(os.environ.get("MTS_V6BLM", "16")))
    except ValueError:
        return 16


def _run_chunked(ex, o, d, mint, maxt, caps, any_hit, interpret,
                 v6=None, blm=4):
    # maxt=inf breaks the closest kernel's accumulator: misses carry the
    # _BIG sentinel and `improved = tmin < t_best` accepts 3e38 < inf as
    # a hit (garbage prim, every lane "valid"). Round-3's config-3
    # render shipped with exactly this (Ray.make defaults maxt=inf) and
    # silently rendered wrong. Clamp below the sentinel; no scene
    # extends past 1e30.
    maxt = jnp.minimum(maxt, 1e30)
    v6 = int(v6 or 0)
    if ex.get("ct0") is None:
        v6 = 0
    rays, n, n_rows = _pack_rays(o, d, mint, maxt)
    r_chunk = (_r_chunk_v6(caps) if v6 else _r_chunk(caps))
    chunks = _pad_rows(rays, n_rows, r_chunk)

    def chunk_fn(rays_c):
        def run(rays_c):
            if v6:
                l1_ids, l1_keys, ovf = build_exact_l1(
                    rays_c, ex, caps, interpret=interpret)
                if v6 >= 2:
                    out = _call_l1_masked(ex["tri"], rays_c, l1_ids,
                                          l1_keys, any_hit=any_hit,
                                          blm=blm,
                                          interpret=interpret)
                else:
                    out = _call_l1_items(ex["tri"], ex["ct0"], rays_c,
                                         l1_ids, l1_keys,
                                         any_hit=any_hit,
                                         interpret=interpret)
                return out, ovf
            ids, blk_tn, ovf = build_exact_items(rays_c, ex, caps,
                                                 interpret=interpret)
            out = _call_items(ex["tri"], rays_c, ids, blk_tn,
                              any_hit=any_hit, interpret=interpret)
            return out, ovf

        def skip(rays_c):
            # all-miss chunk encoding (matches the kernel's b==0 init)
            out = jnp.zeros((rays_c.shape[0], 8, LANES), jnp.float32)
            if not any_hit:
                out = out.at[:, 0, :].set(rays_c[:, 7])        # t = maxt
                out = out.at[:, 3, :].set(
                    jax.lax.bitcast_convert_type(
                        jnp.full((rays_c.shape[0], LANES), -1, jnp.int32),
                        jnp.float32))
            return out, jnp.zeros((rays_c.shape[0],), bool)

        # wavefronts arrive sorted dead-last: at depth 3+ most row-chunks
        # are fully terminated (maxt < mint on every lane) — skip their
        # whole build+kernel via cond (interpret mode: Pallas calls
        # inside lax.cond branches aren't supported by the interpreter's
        # effect tracing on all versions; the skip is a pure TPU-path
        # optimization anyway)
        if interpret:
            return run(rays_c)
        live = jnp.any(rays_c[:, 7] >= rays_c[:, 6])
        return jax.lax.cond(live, run, skip, rays_c)

    outs, ovfs = jax.lax.map(chunk_fn, chunks)
    out = outs.reshape(-1, 8, LANES)[:n_rows]
    ovf = ovfs.reshape(-1)[:n_rows]
    return out, ovf, n


def exact_closest(ex, o, d, mint, maxt, caps=CAPS_DIFFUSE,
                  interpret: bool = False, v6=None):
    """Closest hit. ex: dict from GeometryTables.ex_tables. Returns
    (t, u, v, prim, valid, lane_overflow); overflow lanes (rows whose
    candidate count exceeded a cap) hold a partial result and must be
    re-resolved by a complete backend.

    v6=None resolves MTS_V6 here, OUTSIDE the jit, so toggling the env
    var between calls takes effect (the resolved bool is the static jit
    arg; reading it at trace time would freeze the first-seen value
    into the compile cache)."""
    if v6 is None:
        v6 = _v6_on()
    return _exact_closest_jit(ex, o, d, mint, maxt, caps=caps,
                              interpret=interpret, v6=int(v6),
                              blm=_v6_blm())


@functools.partial(jax.jit,
                   static_argnames=("caps", "interpret", "v6", "blm"))
def _exact_closest_jit(ex, o, d, mint, maxt, caps, interpret, v6, blm):
    out, ovf, n = _run_chunked(ex, o, d, mint, maxt, caps,
                               any_hit=False, interpret=interpret,
                               v6=v6, blm=blm)
    t = out[:, 0, :].reshape(-1)[:n]
    u = out[:, 1, :].reshape(-1)[:n]
    v = out[:, 2, :].reshape(-1)[:n]
    prim = jax.lax.bitcast_convert_type(out[:, 3, :],
                                        jnp.int32).reshape(-1)[:n]
    valid = prim >= 0
    lane_ovf = jnp.repeat(ovf, LANES)[:n]
    return (jnp.where(valid, t, jnp.inf), u, v,
            jnp.where(valid, prim, 0), valid, lane_ovf)


def exact_any(ex, o, d, mint, maxt, caps=CAPS_DIFFUSE,
              interpret: bool = False, v6=None):
    """Any-hit/shadow query. Returns (occluded, lane_overflow).
    v6=None resolves MTS_V6 outside the jit (see exact_closest)."""
    if v6 is None:
        v6 = _v6_on()
    return _exact_any_jit(ex, o, d, mint, maxt, caps=caps,
                          interpret=interpret, v6=int(v6),
                          blm=_v6_blm())


@functools.partial(jax.jit,
                   static_argnames=("caps", "interpret", "v6", "blm"))
def _exact_any_jit(ex, o, d, mint, maxt, caps, interpret, v6, blm):
    out, ovf, n = _run_chunked(ex, o, d, mint, maxt, caps,
                               any_hit=True, interpret=interpret,
                               v6=v6, blm=blm)
    occ = out[:, 0, :].reshape(-1)[:n] > 0.5
    lane_ovf = jnp.repeat(ovf, LANES)[:n]
    return occ, lane_ovf
