"""Triangle clusters for the TPU streaming intersector.

Large-scene acceleration the TPU way: instead of a per-ray (divergent) tree
walk — the reference's Havran kd-tree traversal
(include/mitsuba/render/sahkdtree3.h:171) — geometry is cut into fixed-size
**clusters** of spatially coherent triangles (contiguous BVH subtrees), and
groups of 8 clusters form **superclusters**, the DMA/streaming granularity.

At render time (ops/cluster_pallas.py):
  1. rays are Morton-sorted and tiled (BM*128 rays per tile);
  2. a cheap XLA interval-arithmetic cull intersects each tile's
     conservative ray bounds against supercluster AABBs, producing a
     front-to-back supercluster id list per tile;
  3. a Pallas kernel streams the listed superclusters' precomputed
     intersection matrices from HBM (scalar-prefetch indexed BlockSpec —
     the block-sparse pattern) and tests 128 rays x 128 triangles per step
     as one (512,10)x(10,128) MXU matmul in Pluecker form.

This file holds the host-side numpy build: cluster cutting from the
flattened skip-link BVH (render/bvh.py) and the Pluecker matrix tables.

Pluecker row layout per triangle (columns = [o(3) | d(3) | o x d(3) | 1]):
  row A: [0, v1 x v2, v2 - v1, 0]   -> s12  (sign test / weight of v0)
  row B: [0, v2 x v0, v0 - v2, 0]   -> s20  (-> barycentric u, weight of v1)
  row C: [0, v0 x v1, v1 - v0, 0]   -> s01  (-> barycentric v, weight of v2)
  row D: [-n, 0, 0, n . v0]          -> Q = n.v0 - n.o  (t numerator)
with n = e1 x e2. Identities: s12+s20+s01 = d.n = det (the Moeller-Trumbore
determinant), t = Q/det, u = s20/det, v = s01/det; a ray crosses the
triangle iff s12, s20, s01 share a sign.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

CLUSTER_K = 128        # max triangles per cluster
SC_GROUP = 8           # clusters per supercluster (one DMA block)
ROWS_PER_TRI = 4       # A, B, C, D
G_COLS = 16            # 10 used ([o|d|m|1]), padded for tiling


@dataclass
class ClusterTables:
    """Numpy cluster tables (converted to jnp in GeometryTables)."""
    G: np.ndarray          # (C_s, SC_GROUP*CLUSTER_K*4, G_COLS) f32
    aabb: np.ndarray       # (C_s, SC_GROUP, 8) f32: bmin|bmax|pad
    tri_start: np.ndarray  # (C_s*SC_GROUP,) i32: first tri of each cluster
    sc_bmin: np.ndarray    # (C_s, 3) f32 supercluster bounds
    sc_bmax: np.ndarray    # (C_s, 3) f32
    n_super: int


def cut_clusters(first: np.ndarray, count: np.ndarray, skip: np.ndarray,
                 n_tris: int, max_k: int = CLUSTER_K):
    """Cut the flattened skip-link BVH into contiguous triangle ranges of
    <= max_k triangles, preferring subtree boundaries (tight AABBs).

    In DFS preorder with skip links, node i's subtree covers nodes
    [i, skip[i]) and a CONTIGUOUS triangle range. Greedy walk: emit a
    node's range as one cluster when it fits, else descend into i+1.
    Returns list of (start, count) covering [0, n_tris)."""
    m = first.shape[0]
    # subtree triangle ranges: lo = first tri of first leaf in subtree;
    # hi = lo of the node at skip[i] (or n_tris). Leaves carry their own
    # range. Compute lo by back-propagating in reverse DFS order.
    lo = np.zeros(m + 1, np.int64)
    lo[m] = n_tris
    for i in range(m - 1, -1, -1):
        lo[i] = first[i] if count[i] > 0 else lo[i + 1]
    out = []
    i = 0
    while i < m:
        hi = lo[skip[i]] if skip[i] <= m else n_tris
        n = hi - lo[i]
        if n <= max_k or count[i] > 0:
            if n > 0:
                start = lo[i]
                # an oversized leaf (shouldn't happen, MAX_LEAF=4) still
                # gets split into max_k chunks
                while n > max_k:
                    out.append((int(start), int(max_k)))
                    start += max_k
                    n -= max_k
                out.append((int(start), int(n)))
            i = skip[i]
        else:
            i += 1
    return out


def build_cluster_tables(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
                         ranges) -> ClusterTables:
    """Precompute the Pluecker intersection matrices per cluster.

    v0/e1/e2: (T,3) f32 triangle soup in BVH order; ranges from
    cut_clusters()."""
    v0 = np.asarray(v0, np.float64)
    v1 = v0 + np.asarray(e1, np.float64)
    v2 = v0 + np.asarray(e2, np.float64)
    t = v0.shape[0]

    c = len(ranges)
    c_s = max(1, -(-c // SC_GROUP))
    c_pad = c_s * SC_GROUP
    rows_per_cluster = CLUSTER_K * ROWS_PER_TRI
    G = np.zeros((c_s, SC_GROUP * rows_per_cluster, G_COLS), np.float32)
    aabb = np.zeros((c_s, SC_GROUP, 8), np.float32)
    # empty clusters: inverted AABB so interval tests never pass
    aabb[:, :, 0:3] = 1e30
    aabb[:, :, 3:6] = -1e30
    tri_start = np.zeros(c_pad, np.int32)
    sc_bmin = np.full((c_s, 3), 1e30, np.float32)
    sc_bmax = np.full((c_s, 3), -1e30, np.float32)

    def cross(a, b):
        return np.cross(a, b)

    n_all = cross(v1 - v0, v2 - v0)                      # e1 x e2
    rowA = np.concatenate(                                # s12
        [np.zeros((t, 3)), cross(v1, v2), v2 - v1, np.zeros((t, 1))], axis=1)
    rowB = np.concatenate(                                # s20 -> u
        [np.zeros((t, 3)), cross(v2, v0), v0 - v2, np.zeros((t, 1))], axis=1)
    rowC = np.concatenate(                                # s01 -> v
        [np.zeros((t, 3)), cross(v0, v1), v1 - v0, np.zeros((t, 1))], axis=1)
    rowD = np.concatenate(
        [-n_all, np.zeros((t, 6)), np.sum(n_all * v0, axis=1, keepdims=True)],
        axis=1)

    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)

    for ci, (start, cnt) in enumerate(ranges):
        s = ci // SC_GROUP
        g = ci % SC_GROUP
        sl = slice(start, start + cnt)
        base = g * rows_per_cluster
        G[s, base + 0 * CLUSTER_K: base + 0 * CLUSTER_K + cnt, :10] = rowA[sl]
        G[s, base + 1 * CLUSTER_K: base + 1 * CLUSTER_K + cnt, :10] = rowB[sl]
        G[s, base + 2 * CLUSTER_K: base + 2 * CLUSTER_K + cnt, :10] = rowC[sl]
        G[s, base + 3 * CLUSTER_K: base + 3 * CLUSTER_K + cnt, :10] = rowD[sl]
        bmin = tmin[sl].min(0)
        bmax = tmax[sl].max(0)
        aabb[s, g, 0:3] = bmin
        aabb[s, g, 3:6] = bmax
        tri_start[ci] = start
        sc_bmin[s] = np.minimum(sc_bmin[s], bmin.astype(np.float32))
        sc_bmax[s] = np.maximum(sc_bmax[s], bmax.astype(np.float32))
    return ClusterTables(G=G, aabb=aabb, tri_start=tri_start,
                         sc_bmin=sc_bmin, sc_bmax=sc_bmax, n_super=c_s)


@dataclass
class MTTables:
    """Per-cluster Moeller-Trumbore tables for the VPU work-list kernel
    (ops/worklist_pallas.py). The (512,10)x(10,128) Pluecker MXU product
    is rank-10: at K=10 the MXU runs at ~10/128 utilization (measured
    12.8 us per HIGHEST matmul on v5e), while the VPU does the same
    ~40 flops/pair in exact f32 — so v2 intersects on the VPU from raw
    v0/e1/e2 (8 tris per sublane-chunk x 128 ray lanes)."""
    tri: np.ndarray        # (C_pad, K, 16) f32: [v0(3) e1(3) e2(3) pad];
                           #   row 0 cols 9:15 carry the cluster AABB
    tri_start: np.ndarray  # (C_pad,) i32 first tri of each cluster
    bmin: np.ndarray       # (C_pad, 3) f32 cluster AABBs (inverted when pad)
    bmax: np.ndarray       # (C_pad, 3) f32
    sc_bmin: np.ndarray    # (C_s, 3) supercluster (8-group) AABBs
    sc_bmax: np.ndarray    # (C_s, 3)


def build_mt_tables(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
                    ranges, k: int = CLUSTER_K,
                    sc_group: int = SC_GROUP) -> MTTables:
    """v0/e1/e2: (T,3) f32 triangle soup in BVH order; ranges from
    cut_clusters(..., max_k=k). Clusters are padded to a multiple of
    sc_group and grouped into superclusters (the coarse cull level);
    padding clusters carry inverted AABBs so no test ever passes. Each
    cluster block embeds its own AABB (row 0, cols 9:15) for the kernel's
    per-lane early-exit slab test."""
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    c = len(ranges)
    c_s = max(1, -(-c // sc_group))
    c_pad = c_s * sc_group
    tri = np.zeros((c_pad, k, 16), np.float32)
    tri_start = np.zeros(c_pad, np.int32)
    bmin = np.full((c_pad, 3), 1e30, np.float32)
    bmax = np.full((c_pad, 3), -1e30, np.float32)
    va = v0 + e1
    vb = v0 + e2
    tmin = np.minimum(np.minimum(v0, va), vb)
    tmax = np.maximum(np.maximum(v0, va), vb)
    for ci, (start, cnt) in enumerate(ranges):
        sl = slice(start, start + cnt)
        tri[ci, :cnt, 0:3] = v0[sl]
        tri[ci, :cnt, 3:6] = e1[sl]
        tri[ci, :cnt, 6:9] = e2[sl]
        # padding rows keep e1=e2=0 -> det=0 -> never hit
        tri_start[ci] = start
        bmin[ci] = tmin[sl].min(0)
        bmax[ci] = tmax[sl].max(0)
    tri[:, 0, 9:12] = bmin
    tri[:, 0, 12:15] = bmax
    sc_bmin = bmin.reshape(c_s, sc_group, 3).min(1)
    sc_bmax = bmax.reshape(c_s, sc_group, 3).max(1)
    return MTTables(tri=tri, tri_start=tri_start, bmin=bmin, bmax=bmax,
                    sc_bmin=sc_bmin, sc_bmax=sc_bmax)


@dataclass
class InstancedTables:
    """Work-list tables with TRUE instancing (reference
    src/shapes/instance.cpp nests kd-trees; here N instances of a group
    share ONE copy of its object-space triangle blocks — per-instance
    state is only a world AABB + a world->object transform per cluster).

    tri:        (B, K, 16) shared object-space triangle blocks (cluster
                AABB embedded in row 0 cols 9:15, object space)
    block_id:   (C, ) i32 cluster -> shared block row
    xform:      (C, 16) f32 world->object 3x4 row-major (+4 pad);
                identity rows for non-instanced clusters
    xform_fwd:  (C, 12) f32 object->world 3x4 (shading: tangents/normals)
    tri_start:  (C, ) i32 prim-id base per cluster: real tri index for
                static clusters, T_static + (c - C_static)*K virtual ids
                for instanced ones (decoded in render/intersect.py)
    bmin/bmax:  (C, 3) world cluster AABBs; sc_*: supercluster groups
    """
    tri: np.ndarray
    block_id: np.ndarray
    xform: np.ndarray
    xform_fwd: np.ndarray
    tri_start: np.ndarray
    bmin: np.ndarray
    bmax: np.ndarray
    sc_bmin: np.ndarray
    sc_bmax: np.ndarray
    n_static_clusters: int = 0
    n_static_tris: int = 0


def build_instanced_tables(static_mt: MTTables, n_static_tris: int,
                           group_mts, instances,
                           k: int = CLUSTER_K,
                           sc_group: int = SC_GROUP) -> InstancedTables:
    """Combine the static-geometry MT tables with instanced groups.

    group_mts: list of MTTables built from each group's OBJECT-space soup.
    instances: list of (group_index, to_world (4,4)).
    """
    blocks = [static_mt.tri]
    group_base = []
    for g in group_mts:
        group_base.append(sum(b.shape[0] for b in blocks))
        blocks.append(g.tri)
    tri = np.concatenate(blocks, axis=0)

    c_static = static_mt.tri.shape[0]
    ident = np.zeros(16, np.float32)
    ident[[0, 5, 10]] = 1.0
    rows_bid = [np.arange(c_static, dtype=np.int32)]
    rows_xf = [np.tile(ident, (c_static, 1))]
    rows_fwd = [np.tile(ident[:12], (c_static, 1))]
    rows_start = [static_mt.tri_start]
    rows_bmin = [static_mt.bmin]
    rows_bmax = [static_mt.bmax]
    vcursor = 0
    for gi, m4 in instances:
        g = group_mts[gi]
        m4 = np.asarray(m4, np.float64)
        inv = np.linalg.inv(m4)
        cg = g.tri.shape[0]
        rows_bid.append(group_base[gi] + np.arange(cg, dtype=np.int32))
        rows_xf.append(np.tile(np.concatenate(
            [inv[:3, :4].reshape(-1), np.zeros(4)]).astype(np.float32),
            (cg, 1)))
        rows_fwd.append(np.tile(
            m4[:3, :4].reshape(-1).astype(np.float32), (cg, 1)))
        # virtual prim space: cluster c covers [start, start + K)
        rows_start.append(
            (n_static_tris + vcursor + np.arange(cg) * k).astype(np.int32))
        vcursor += cg * k
        # world box: transform the 8 object-box corners. Group padding
        # clusters carry INVERTED boxes — keep them inverted (transforming
        # their corners would produce all-covering garbage boxes that
        # flood every beam list)
        corners = np.stack(np.meshgrid(*[[0, 1]] * 3, indexing="ij"),
                           -1).reshape(8, 3)
        lo, hi = g.bmin, g.bmax                      # (cg, 3)
        ok_box = (lo <= hi).all(-1)
        pts = lo[:, None, :] + corners[None] * (hi - lo)[:, None, :]
        ptsw = pts @ m4[:3, :3].T + m4[:3, 3]
        rows_bmin.append(np.where(ok_box[:, None], ptsw.min(1),
                                  1e30).astype(np.float32))
        rows_bmax.append(np.where(ok_box[:, None], ptsw.max(1),
                                  -1e30).astype(np.float32))

    bmin = np.concatenate(rows_bmin)
    bmax = np.concatenate(rows_bmax)
    c = bmin.shape[0]
    c_s = max(1, -(-c // sc_group))
    pad = c_s * sc_group - c
    if pad:
        bmin = np.concatenate([bmin, np.full((pad, 3), 1e30, np.float32)])
        bmax = np.concatenate([bmax, np.full((pad, 3), -1e30, np.float32)])
        rows_bid.append(np.zeros(pad, np.int32))
        rows_xf.append(np.tile(ident, (pad, 1)))
        rows_fwd.append(np.tile(ident[:12], (pad, 1)))
        rows_start.append(np.zeros(pad, np.int32))
    sc_bmin = bmin.reshape(c_s, sc_group, 3).min(1)
    sc_bmax = bmax.reshape(c_s, sc_group, 3).max(1)
    return InstancedTables(
        tri=tri,
        block_id=np.concatenate(rows_bid),
        xform=np.concatenate(rows_xf).astype(np.float32),
        xform_fwd=np.concatenate(rows_fwd).astype(np.float32),
        tri_start=np.concatenate(rows_start).astype(np.int32),
        bmin=bmin, bmax=bmax, sc_bmin=sc_bmin, sc_bmax=sc_bmax,
        n_static_clusters=c_static, n_static_tris=int(n_static_tris),
    )
