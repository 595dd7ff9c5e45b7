"""Point kNN structures.

Capability parity with reference include/mitsuba/core/kdtree.h (TKDTree —
generic point kd-tree with kNN queries, used by the photon map and
irradiance cache).  Two implementations:

  * `KDTree` — classic host-side numpy kd-tree (median split) with
    vectorized-per-query kNN; the direct analog.
  * `HashGrid` — the TPU-native replacement: uniform grid with a fixed
    cell→point table; range queries become a static 27-cell gather, fully
    vectorizable over millions of query points inside jit (this is what the
    photon-map gather uses — kNN trees are TPU-hostile, grids are not).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.core.types import pytree_dataclass, static_field


class KDTree:
    """Median-split point kd-tree (host-side)."""

    def __init__(self, points: np.ndarray, leaf_size: int = 16):
        self.points = np.asarray(points, np.float64)
        n = self.points.shape[0]
        self.idx = np.arange(n)
        self.nodes = []  # (axis, split, left, right, start, count)
        self._build(0, n)

    def _build(self, start, end):
        node_id = len(self.nodes)
        self.nodes.append(None)
        count = end - start
        if count <= 16:
            self.nodes[node_id] = (-1, 0.0, -1, -1, start, count)
            return node_id
        pts = self.points[self.idx[start:end]]
        axis = int(np.argmax(pts.max(0) - pts.min(0)))
        order = np.argsort(pts[:, axis], kind="stable")
        self.idx[start:end] = self.idx[start:end][order]
        mid = start + count // 2
        split = self.points[self.idx[mid], axis]
        left = self._build(start, mid)
        right = self._build(mid, end)
        self.nodes[node_id] = (axis, split, left, right, start, end - start)
        return node_id

    def knn(self, query, k: int):
        """k nearest neighbours of a single query point. Returns
        (indices, distances) sorted ascending."""
        query = np.asarray(query, np.float64)
        best_d = np.full(k, np.inf)
        best_i = np.full(k, -1)

        def visit(node_id):
            nonlocal best_d, best_i
            axis, split, left, right, start, count = self.nodes[node_id]
            if axis < 0:
                ids = self.idx[start : start + count]
                d = np.linalg.norm(self.points[ids] - query, axis=1)
                alld = np.concatenate([best_d, d])
                alli = np.concatenate([best_i, ids])
                order = np.argsort(alld)[:k]
                best_d, best_i = alld[order], alli[order]
                return
            delta = query[axis] - split
            near, far = (left, right) if delta <= 0 else (right, left)
            visit(near)
            if abs(delta) < best_d[-1]:
                visit(far)

        visit(0)
        return best_i, best_d

    def range_query(self, query, radius: float):
        query = np.asarray(query, np.float64)
        out = []

        def visit(node_id):
            axis, split, left, right, start, count = self.nodes[node_id]
            if axis < 0:
                ids = self.idx[start : start + count]
                d = np.linalg.norm(self.points[ids] - query, axis=1)
                out.extend(ids[d <= radius].tolist())
                return
            delta = query[axis] - split
            near, far = (left, right) if delta <= 0 else (right, left)
            visit(near)
            if abs(delta) <= radius:
                visit(far)

        visit(0)
        return np.asarray(out, np.int64)


@pytree_dataclass
class HashGrid:
    """Uniform grid over points: cell_start/cell_count into a sorted point
    permutation. Device arrays; queries run inside jit."""
    bmin: jnp.ndarray          # (3,)
    inv_cell: jnp.ndarray      # () 1/cell_size
    cell_start: jnp.ndarray    # (C+1,)
    perm: jnp.ndarray          # (P,) point permutation sorted by cell
    points: jnp.ndarray        # (P, 3)
    payload: jnp.ndarray       # (P, F) arbitrary per-point data
    res: int = static_field(default=16)
    max_per_query: int = static_field(default=64)

    @staticmethod
    def build(points, payload, res: int = 32, max_per_query: int = 64):
        pts = np.asarray(points, np.float64)
        # pre-shuffle so the first max_per_query/27 points of a cell are a
        # uniform random subset: gather_sum truncates dense cells but
        # rescales by count/budget — unbiased only if the kept subset is
        # random (photon deposits arrive depth-major, so without this the
        # kept photons would over-represent early bounces)
        rng = np.random.default_rng(pts.shape[0] * 2654435761 % (2**32))
        shuf = rng.permutation(pts.shape[0])
        pts = pts[shuf]
        payload = np.asarray(payload)[shuf]
        bmin = pts.min(0) - 1e-6
        bmax = pts.max(0) + 1e-6
        cell = (bmax - bmin).max() / res
        ijk = np.clip(((pts - bmin) / cell).astype(np.int64), 0, res - 1)
        cid = (ijk[:, 0] * res + ijk[:, 1]) * res + ijk[:, 2]
        order = np.argsort(cid, kind="stable")
        counts = np.bincount(cid, minlength=res ** 3)
        starts = np.concatenate([[0], np.cumsum(counts)])
        return HashGrid(
            bmin=jnp.asarray(bmin, jnp.float32),
            inv_cell=jnp.asarray(1.0 / cell, jnp.float32),
            cell_start=jnp.asarray(starts, jnp.int32),
            perm=jnp.asarray(shuf[order], jnp.int32),
            points=jnp.asarray(pts[order], jnp.float32),
            payload=jnp.asarray(np.asarray(payload)[order], jnp.float32),
            res=res,
            max_per_query=max_per_query,
        )

    def gather_sum(self, queries, radius, weight_fn=None, contrib_fn=None,
                   contrib_pos_fn=None):
        """Σ payload over points within radius of each query — the photon
        density estimate. queries (N,3) → (N, F).

        weight_fn(dist) -> scalar kernel weight per candidate;
        contrib_fn(payload_rows (N,F), d2 (N,)) -> (N, C) replaces the raw
        payload per candidate (e.g. per-photon BSDF evaluation);
        contrib_pos_fn(rows, d2, dp (N,3)) -> (N, C) additionally receives
        the query-minus-record offset (gradient extrapolation).
        Scans the 27-neighbourhood with a static per-cell budget; cells
        holding more than max_per_query/27 points truncate (log-noted by
        caller if needed).
        """
        import jax

        res = self.res
        per_cell = max(self.max_per_query // 27, 4)
        n = queries.shape[0]
        q_ijk = jnp.clip(
            ((queries - self.bmin) * self.inv_cell).astype(jnp.int32), 0, res - 1
        )
        r2 = radius * radius
        offs = jnp.asarray(
            [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1)
             for dz in (-1, 0, 1)], jnp.int32)
        nijk = q_ijk[None, :, :] + offs[:, None, :]          # (27, N, 3)
        # out-of-range neighbours are masked, NOT clipped: clipping would
        # re-visit border cells (a query in cell 0 would scan cell 0 for
        # both dx=-1 and dx=0), double-counting every photon on a wall at
        # the bbox boundary
        in_grid = jnp.all((nijk >= 0) & (nijk < res), axis=-1)  # (27, N)
        ijk = jnp.clip(nijk, 0, res - 1)
        cid = (ijk[..., 0] * res + ijk[..., 1]) * res + ijk[..., 2]
        start = self.cell_start[cid]
        end = self.cell_start[cid + 1]
        # cells denser than the static budget are subsampled: the first
        # per_cell points are a random subset (build pre-shuffles), so
        # scaling by count/budget keeps the sum unbiased (42% of
        # Cornell-box photons would otherwise be silently dropped)
        scale = jnp.maximum((end - start).astype(jnp.float32) / per_cell,
                            1.0)

        def val_of(pi, d2, dp):
            rows = self.payload[pi]
            if contrib_pos_fn is not None:
                return contrib_pos_fn(rows, d2, dp)
            if contrib_fn is not None:
                return contrib_fn(rows, d2)
            return rows

        out_dim = jax.eval_shape(
            val_of, jnp.zeros((n,), jnp.int32), jnp.zeros((n,)),
            jnp.zeros((n, 3))).shape[1]

        # one scanned body over the 27 neighbour cells (the fully unrolled
        # 27 x per_cell graph took ~40 s to COMPILE per distinct closure)
        def cell(total, xs):
            st, en, ing, sc = xs
            for s in range(per_cell):
                pi = jnp.minimum(st + s, self.points.shape[0] - 1)
                ok = ing & ((st + s) < en)
                dp = queries - self.points[pi]
                d2 = jnp.sum(dp * dp, axis=-1)
                w = jnp.where(ok & (d2 <= r2), sc, 0.0)
                if weight_fn is not None:
                    w = w * weight_fn(jnp.sqrt(jnp.maximum(d2, 0.0)))
                total = total + w[:, None] * val_of(pi, d2, dp)
            return total, None

        total, _ = jax.lax.scan(
            cell, jnp.zeros((n, out_dim)), (start, end, in_grid, scale))
        return total
