"""Per-row ordered streaming intersector (work-list v4).

The v2/v3 work-list (ops/worklist_pallas.py) flattens (row, cluster)
items into one scalar-prefetch array — which lives in SMEM (1 MB) and
therefore CAPS list length. Round-3 measurement (scripts/exp_r3_octet.py)
showed the cap is structural: on diffuse bounce rays the TRUE conservative
candidate count is ~600 clusters per 128-lane row (and still ~390 for
8-ray groups!) because a static cull cannot prune geometry BEHIND the
first hit — only runtime ordered traversal can. Beams small enough for
SMEM overflow on >80% of bounce rows, and the packet-BVH fallback runs at
~0.5 Mrays/s on incoherent rays: that multiplication produced config-3's
0.67 Mrays/s.

v4 therefore restructures around run-time early termination — the
reference's ordered Havran traversal (sahkdtree3.h:171) re-expressed
row-wise:

  * grid = one step per 128-lane ray row (NOT per work item);
  * the build slab-tests every SUPERCLUSTER (8 clusters = 256 tris) per
    row — full width, no beams, no overflow — and sorts each row's
    survivors front-to-back by conservative entry distance (measured
    4.1 ms for (8192, 392) on v5e);
  * per-row lists live in HBM and stream through per-grid-step SMEM
    blocks (~2 KB/row) — the 1 MB SMEM cap no longer binds;
  * the kernel walks its row's list in a `while_loop`, manually
    double-buffering 16 KB supercluster tri blocks HBM->VMEM with
    `pltpu.make_async_copy` (DMA for entry i+1 issued before entry i is
    processed);
  * TRUE early exit: entries are sorted by entry distance, so once
    t_near(next) exceeds every live lane's current best t the loop
    breaks — geometry behind the nearest hit is never fetched. This is
    what the item-grid kernel could not do (its grid length is fixed at
    trace time).

Correctness does not depend on any capacity: lists always contain every
slab-surviving supercluster, so there is NO overflow and NO fallback
path for non-instanced scenes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mitsuba_tpu.render.clusters import SC_GROUP
from mitsuba_tpu.ops.worklist_pallas import (
    _interval_slab, _pack_rays, _row_intervals,
)

LANES = 128
_BIG = 3e38
_DET_EPS = 1e-12
_SENT = float(_BIG)                # list terminator key


# ---------------------------------------------------------------------------
# build: per-row front-to-back supercluster lists (full width, no beams)
# ---------------------------------------------------------------------------

@jax.jit
def build_sc_lists(rays, sc_bmin, sc_bmax):
    """Slab-test every SC against every row's conservative interval and
    sort each row's survivors by entry distance.

    rays: (n_rows, 8, 128) packed planes. Returns (sc_ids (n_rows, L)
    int32, t_near (n_rows, L) f32) with misses pushed to the tail as
    (id=0, t=_BIG) sentinels; L = c_s padded to a lane multiple."""
    c_s = sc_bmin.shape[0]
    n_rows = rays.shape[0]
    row_ctx = _row_intervals(rays)
    olo, ohi, ilo, ihi, spans, mt_hi = row_ctx
    hit, tn = _interval_slab(
        jnp.broadcast_to(sc_bmin[None], (n_rows, c_s, 3)),
        jnp.broadcast_to(sc_bmax[None], (n_rows, c_s, 3)),
        olo, ohi, ilo, ihi, spans, mt_hi)
    key = jnp.where(hit, tn, _BIG)
    ids = jnp.broadcast_to(jnp.arange(c_s, dtype=jnp.int32)[None],
                           (n_rows, c_s))
    key_s, ids_s = jax.lax.sort_key_val(key, ids)
    # pad by >= 1 so the kernel's next-entry read (i+1) is always in
    # bounds for every real entry i
    pad = ((-(c_s + 1)) % LANES) + 1
    key_s = jnp.pad(key_s, ((0, 0), (0, pad)), constant_values=_BIG)
    ids_s = jnp.pad(ids_s, ((0, 0), (0, pad)))
    # (n_rows, 1, L): Mosaic requires block dims to divide or equal the
    # array dims — a (1, 1, L) block of a 3-D array satisfies that where
    # a (1, L) block of (n_rows, L) does not
    return (jnp.where(key_s < _BIG, ids_s, 0)[:, None, :],
            key_s[:, None, :])


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _mt_chunks_buf(buf, slot, k, rays, mnb, t_cap, k_cl):
    """Möller–Trumbore over the k_cl/8 sublane chunks of cluster `k`
    inside the double-buffer scratch (same math as
    worklist_pallas._mt_chunks). Scratch layout (2, K, 128): sublane =
    tri slot within cluster, lane = cluster*16 + field."""
    ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    c0 = k * 16
    t_runs = [jnp.full((8, LANES), _BIG, jnp.float32) for _ in range(2)]
    k_runs = [jnp.zeros((8, LANES), jnp.int32) for _ in range(2)]
    u_runs = [jnp.zeros((8, LANES), jnp.float32) for _ in range(2)]
    v_runs = [jnp.zeros((8, LANES), jnp.float32) for _ in range(2)]
    for j in range(k_cl // 8):
        r0 = j * 8
        v0x = buf[slot, r0:r0 + 8, c0 + 0:c0 + 1]
        v0y = buf[slot, r0:r0 + 8, c0 + 1:c0 + 2]
        v0z = buf[slot, r0:r0 + 8, c0 + 2:c0 + 3]
        e1x = buf[slot, r0:r0 + 8, c0 + 3:c0 + 4]
        e1y = buf[slot, r0:r0 + 8, c0 + 4:c0 + 5]
        e1z = buf[slot, r0:r0 + 8, c0 + 5:c0 + 6]
        e2x = buf[slot, r0:r0 + 8, c0 + 6:c0 + 7]
        e2y = buf[slot, r0:r0 + 8, c0 + 7:c0 + 8]
        e2z = buf[slot, r0:r0 + 8, c0 + 8:c0 + 9]
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


def _slab_buf(buf, slot, k, rays, tb, mnb):
    """(1,128) per-lane can-improve test against cluster k's AABB
    (embedded in sublane 0, lanes k*16+9 .. k*16+14)."""
    o = (rays[0:1, :], rays[1:2, :], rays[2:3, :])
    d = (rays[3:4, :], rays[4:5, :], rays[5:6, :])
    c0 = k * 16
    tn = mnb
    tf = tb
    for j in range(3):
        bmin = buf[slot, 0:1, c0 + 9 + j:c0 + 10 + j]
        bmax = buf[slot, 0:1, c0 + 12 + j:c0 + 13 + j]
        inv = jnp.where(d[j] >= 0, 1.0, -1.0) / jnp.maximum(
            jnp.abs(d[j]), 1e-12)
        t0 = (bmin - o[j]) * inv
        t1 = (bmax - o[j]) * inv
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    return tn <= tf


def _prim_cand(k_run):
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    return k_run * 8 + sub


def _make_stream_kernel(k_cl: int, sc_cl: int, any_hit: bool):
    """Per-row streaming kernel. Block operands:
    ids (1, L) SMEM, tns (1, L) SMEM, rays (1, 8, 128) VMEM,
    tri (c_s, K, 128) HBM (one aligned 16 KB DMA per SC),
    out (1,8,128) VMEM; scratch: buf (2, K, 128), sem DMA((2,))."""
    rows_per_sc = sc_cl * k_cl

    def kernel(ids_ref, tns_ref, rays_ref, tri_ref, out_ref, buf, sem):
        rays = rays_ref[0]
        mnb = rays[6:7, :]
        maxt = rays[7:8, :]

        def dma_start(i, slot):
            # one aligned (K, 128) copy per SC: lane dim = cluster*16 +
            # field (Mosaic pads HBM minor dims to 128-lane tiling, so
            # any 16-wide slice shape is un-DMA-able — the SC block is
            # re-laid-out host-side to make the full block lane-exact)
            pltpu.make_async_copy(
                tri_ref.at[ids_ref[0, 0, i]], buf.at[slot],
                sem.at[slot]).start()

        def dma_wait(i, slot):
            pltpu.make_async_copy(
                tri_ref.at[ids_ref[0, 0, i]], buf.at[slot],
                sem.at[slot]).wait()

        valid0 = tns_ref[0, 0, 0] < _SENT

        @pl.when(valid0)
        def _():
            dma_start(0, 0)

        if any_hit:
            acc0 = (jnp.zeros((1, LANES), jnp.int32),)
            # lanes that trace nothing count as settled
            live0 = (mnb <= maxt).astype(jnp.int32)
        else:
            acc0 = (maxt,                                  # best t
                    jnp.zeros((1, LANES), jnp.float32),    # u
                    jnp.zeros((1, LANES), jnp.float32),    # v
                    jnp.full((1, LANES), -1, jnp.int32))   # prim

        def cond(st):
            return st[1]

        def body(st):
            (i, _cont, pending, acc) = st
            slot = jax.lax.rem(i, 2)
            # issue next entry's DMA before processing this one (overlaps
            # the 16 KB HBM fetch with this entry's VPU work); a break
            # wastes at most one prefetch (waited on in the epilogue)
            nxt_t = tns_ref[0, 0, i + 1]
            has_next = nxt_t < _SENT

            @pl.when(has_next)
            def _():
                dma_start(i + 1, 1 - slot)

            dma_wait(i, slot)
            if any_hit:
                (occ,) = acc
                for k in range(sc_cl):
                    t_run, _k, _u, _v = _mt_chunks_buf(
                        buf, slot, k, rays, mnb,
                        jnp.where(occ > 0, mnb, maxt), k_cl)
                    hit = jnp.max((t_run < _BIG).astype(jnp.int32),
                                  axis=0, keepdims=True)
                    occ = occ | hit
                acc = (occ,)
                done = jnp.min(occ + (1 - live0)) > 0
                cont = has_next & jnp.logical_not(done)
            else:
                sc = ids_ref[0, 0, i]

                def visit(k, acc_in):
                    tb, ub, vb, pb = acc_in
                    t_run, k_run, u_run, v_run = _mt_chunks_buf(
                        buf, slot, k, rays, mnb, tb, k_cl)
                    tmin = jnp.min(t_run, axis=0, keepdims=True)
                    improved = tmin < tb
                    pc = _prim_cand(k_run)
                    win = t_run <= tmin
                    psel = jnp.min(
                        jnp.where(win, pc, jnp.int32(2 ** 30)),
                        axis=0, keepdims=True)
                    w2 = (win & (pc == psel)).astype(jnp.float32)
                    usel = jnp.sum(w2 * u_run, axis=0, keepdims=True)
                    vsel = jnp.sum(w2 * v_run, axis=0, keepdims=True)
                    # virtual prim id (cluster*K + local); the caller
                    # maps it through tri_start (variable true counts)
                    prim_new = (sc * sc_cl + k) * k_cl + psel
                    return (jnp.where(improved, tmin, tb),
                            jnp.where(improved, usel, ub),
                            jnp.where(improved, vsel, vb),
                            jnp.where(improved, prim_new, pb))

                for k in range(sc_cl):
                    # skip the MT sweep when no lane can improve inside
                    # this cluster's AABB (embedded in the block)
                    can = _slab_buf(buf, slot, k, rays, acc[0], mnb)
                    acc = jax.lax.cond(
                        jnp.max(can.astype(jnp.int32)) > 0,
                        lambda a, k=k: visit(k, a), lambda a: a, acc)
                # ordered early exit: the next entry's conservative entry
                # distance is beyond every live lane's current best
                cont = has_next & (nxt_t <= jnp.max(acc[0]))
            return (i + 1, cont, has_next, acc)

        init = (jnp.int32(0), valid0, valid0, acc0)
        (i_f, _c, pending_f, acc_f) = jax.lax.while_loop(cond, body, init)

        # a prefetched-but-unconsumed DMA must still be waited on
        @pl.when(pending_f)
        def _():
            dma_wait(i_f, jax.lax.rem(i_f, 2))

        if any_hit:
            out_ref[0, 0:1, :] = acc_f[0].astype(jnp.float32)
            out_ref[0, 1:8, :] = jnp.zeros((7, LANES), jnp.float32)
        else:
            (tb, ub, vb, pb) = acc_f
            out_ref[0, 0:1, :] = tb
            out_ref[0, 1:2, :] = ub
            out_ref[0, 2:3, :] = vb
            out_ref[0, 3:4, :] = jax.lax.bitcast_convert_type(
                pb, jnp.float32)
            out_ref[0, 4:8, :] = jnp.zeros((4, LANES), jnp.float32)
    return kernel


def _call_stream(geom_st, o, d, mint, maxt, any_hit: bool,
                 interpret: bool = False):
    # maxt=inf would let the _BIG miss sentinel pass `tmin < tb`
    # (same failure class as exact_pallas round-4 fix); clamp below it
    maxt = jnp.minimum(maxt, 1e30)
    rays, n, n_rows = _pack_rays(o, d, mint, maxt)
    ids, tns = build_sc_lists(rays, geom_st["sc_bmin"], geom_st["sc_bmax"])
    tri = geom_st["sc_tri"]        # (c_s, K, 128): lane = cluster*16+field
    sc_cl = SC_GROUP
    k_cl = tri.shape[1]
    L = ids.shape[2]
    out = pl.pallas_call(
        _make_stream_kernel(k_cl, sc_cl, any_hit),
        grid=(n_rows,),
        in_specs=[
            pl.BlockSpec((1, 1, L), lambda r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, L), lambda r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, LANES), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, 8, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, k_cl, 8 * 16), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(ids, tns, rays, tri)
    return out, n


@functools.partial(jax.jit, static_argnames=("interpret",))
def stream_closest(geom_st, o, d, mint, maxt, interpret: bool = False):
    """Closest hit via per-row ordered streaming. geom_st: dict with
    sc_tri (c_s, K, 128) f32 SC blocks, sc_bmin/sc_bmax (c_s, 3),
    tri_start (C,) i32. Returns (t, u, v, prim, valid) — NO
    overflow: lists are complete."""
    out, n = _call_stream(geom_st, o, d, mint, maxt, any_hit=False,
                          interpret=interpret)
    t = out[:, 0, :].reshape(-1)[:n]
    u = out[:, 1, :].reshape(-1)[:n]
    v = out[:, 2, :].reshape(-1)[:n]
    vp = jax.lax.bitcast_convert_type(out[:, 3, :],
                                      jnp.int32).reshape(-1)[:n]
    valid = vp >= 0
    # virtual (cluster*K + local) -> true prim index: clusters hold
    # variable true counts, tri_start maps each to its soup base
    k_cl = geom_st["sc_tri"].shape[1]
    starts = geom_st["tri_start"]
    vcid = jnp.clip(jnp.where(valid, vp, 0) // k_cl, 0,
                    starts.shape[0] - 1)
    prim = starts[vcid] + jnp.where(valid, vp, 0) % k_cl
    return jnp.where(valid, t, jnp.inf), u, v, prim, valid


@functools.partial(jax.jit, static_argnames=("interpret",))
def stream_any(geom_st, o, d, mint, maxt, interpret: bool = False):
    """Shadow/any-hit via per-row ordered streaming. Returns bool mask."""
    out, n = _call_stream(geom_st, o, d, mint, maxt, any_hit=True,
                          interpret=interpret)
    return out[:, 0, :].reshape(-1)[:n] > 0.5
