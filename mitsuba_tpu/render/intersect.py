"""Ray–scene intersection: SoA triangle tables + closest/any-hit kernels.

TPU-native replacement for the reference's kd-tree traversal + TriAccel
records (include/mitsuba/render/sahkdtree3.h:171 Havran traversal,
triaccel.h:98 Wald test).  Two backends:

  * `brute`  — all-pairs Möller–Trumbore over (rays × triangles), fully
    vectorized; XLA fuses it into a single VPU loop. Fastest for small
    scenes (Cornell box class) and the correctness oracle for everything.
  * `bvh`    — stackless skip-link BVH walk (see render/bvh.py): each step
    gathers one node per ray, tests MAX_LEAF triangles when in a leaf and
    advances via hit/skip links. No stacks, no recursion — one
    `lax.while_loop` over the whole wavefront.

Geometry lives in `GeometryTables`, a pytree of SoA arrays (triangles stored
in BVH order so leaf ranges are contiguous).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.core import math as m
from mitsuba_tpu.core.types import pytree_dataclass, replace, static_field
from mitsuba_tpu.render.bvh import BVH, MAX_LEAF, build_bvh
from mitsuba_tpu.render.records import Intersection, Ray


@pytree_dataclass
class GeometryTables:
    # triangle soup (BVH-permuted order)
    v0: jnp.ndarray        # (T, 3)
    e1: jnp.ndarray        # (T, 3) v1 - v0
    e2: jnp.ndarray        # (T, 3) v2 - v0
    n0: jnp.ndarray        # (T, 3) per-corner shading normals
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray       # (T, 2)
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    material_id: jnp.ndarray  # (T,) int32
    emitter_id: jnp.ndarray   # (T,) int32, -1 = not emissive
    shape_id: jnp.ndarray     # (T,) int32
    # flattened BVH
    bvh_min: jnp.ndarray   # (M, 3)
    bvh_max: jnp.ndarray   # (M, 3)
    bvh_first: jnp.ndarray  # (M,)
    bvh_count: jnp.ndarray  # (M,)
    bvh_skip: jnp.ndarray   # (M,)
    # packed single-gather layouts (ints stored as exact f32 < 2^24):
    bvh_packed: jnp.ndarray = None   # (M, 9) bmin|bmax|first|count|skip
    tri_packed: jnp.ndarray = None   # (T, 9) v0|e1|e2
    # 14-records-per-128-lane-row layouts for the Pallas packet kernel
    bvh_rows: jnp.ndarray = None     # (ceil(M/14), 128)
    tri_rows: jnp.ndarray = None     # (ceil(T/14), 128)
    # work-list cluster tables (ops/worklist_pallas.py; backend="cluster")
    mt_tri: jnp.ndarray = None       # (C, K, 16) per-cluster triangle rows
    mt_start: jnp.ndarray = None     # (C,) first-tri index per cluster
    mt_bmin: jnp.ndarray = None      # (C, 3) cluster AABBs
    mt_bmax: jnp.ndarray = None      # (C, 3)
    cl_sc_bmin: jnp.ndarray = None   # (C_s, 3) supercluster bounds
    cl_sc_bmax: jnp.ndarray = None   # (C_s, 3)
    # analytic primitives (reference src/shapes/sphere.cpp:359 analytic
    # intersection, cylinder.cpp — NOT tessellated). Prim-id space:
    # triangles [0,T), spheres [T,T+S), cylinders [T+S,T+S+C).
    sph_c: jnp.ndarray = None        # (S, 3) centers
    sph_r: jnp.ndarray = None        # (S,)  radii
    sph_mid: jnp.ndarray = None      # (S,) material ids
    sph_eid: jnp.ndarray = None      # (S,) emitter ids (-1 none)
    sph_sid: jnp.ndarray = None      # (S,) shape ids
    cyl_a: jnp.ndarray = None        # (C, 3) axis start
    cyl_b: jnp.ndarray = None        # (C, 3) axis end
    cyl_r: jnp.ndarray = None        # (C,)
    cyl_mid: jnp.ndarray = None
    cyl_eid: jnp.ndarray = None
    cyl_sid: jnp.ndarray = None
    backend: str = static_field(default="brute")

    @property
    def wl_tables(self):
        return dict(tri=self.mt_tri, tri_start=self.mt_start,
                    bmin=self.mt_bmin, bmax=self.mt_bmax,
                    sc_bmin=self.cl_sc_bmin, sc_bmax=self.cl_sc_bmax)

    @property
    def n_tris(self):
        return self.v0.shape[0]

    @property
    def n_spheres(self):
        return 0 if self.sph_r is None else self.sph_r.shape[0]

    @property
    def n_cylinders(self):
        return 0 if self.cyl_r is None else self.cyl_r.shape[0]

    @property
    def has_analytic(self):
        return self.n_spheres + self.n_cylinders > 0


def build_geometry(meshes_with_ids, backend: str = "auto",
                   analytic=None) -> GeometryTables:
    """Assemble GeometryTables from [(TriMesh, material_id, emitter_id
    [, shape_id]), ...].

    backend: 'brute' | 'bvh' | 'cluster' | 'auto' (cluster above 64
    triangles — the streaming cluster kernel on TPU, skip-link BVH walk
    as the CPU fallback).
    analytic: optional dict(spheres=[(c, r, mid, eid, sid)],
    cylinders=[(a, b, r, mid, eid, sid)]) of analytic primitives.
    """
    vs, fs, ns, uvs, mids, eids, sids = [], [], [], [], [], [], []
    voff = 0
    for k, item in enumerate(meshes_with_ids):
        mesh, mat, emit = item[:3]
        sid = item[3] if len(item) > 3 else k
        vs.append(np.asarray(mesh.vertices, np.float32))
        fs.append(np.asarray(mesh.faces, np.int64) + voff)
        n = mesh.normals
        if n is None:
            fn = mesh.face_normals()
            # expand to per-vertex by duplicating flat normals at gather time:
            # store None sentinel -> use face normal below
            n = np.zeros_like(mesh.vertices)
            ncount = np.zeros((mesh.vertices.shape[0], 1))
            for k in range(3):
                np.add.at(n, mesh.faces[:, k], fn)
                np.add.at(ncount, mesh.faces[:, k], 1.0)
            n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        ns.append(np.asarray(n, np.float32))
        uv = mesh.uvs if mesh.uvs is not None else np.zeros((mesh.vertices.shape[0], 2), np.float32)
        uvs.append(np.asarray(uv, np.float32))
        t = mesh.faces.shape[0]
        mids.append(np.full(t, mat, np.int32))
        eids.append(np.full(t, emit, np.int32))
        sids.append(np.full(t, sid, np.int32))
        voff += mesh.vertices.shape[0]
    v = np.concatenate(vs)
    f = np.concatenate(fs)
    n = np.concatenate(ns)
    uv = np.concatenate(uvs)
    mid = np.concatenate(mids)
    eid = np.concatenate(eids)
    sid = np.concatenate(sids)

    if backend == "auto":
        backend = "cluster" if f.shape[0] > 64 else "brute"
    if backend in ("bvh", "cluster"):
        bvh = build_bvh(v, f)
    else:
        # brute force needs no tree: single leaf covering everything
        t = f.shape[0]
        bvh = BVH(
            bounds_min=np.min(v, axis=0, keepdims=True).astype(np.float32),
            bounds_max=np.max(v, axis=0, keepdims=True).astype(np.float32),
            first=np.zeros(1, np.int32),
            count=np.asarray([t], np.int32),
            skip=np.ones(1, np.int32),
            perm=np.arange(t, dtype=np.int64),
        )
    p = bvh.perm
    f = f[p]
    mid, eid, sid = mid[p], eid[p], sid[p]

    tri = v[f]  # (T,3,3)
    cl = {}
    if backend == "cluster":
        from mitsuba_tpu.render.clusters import build_mt_tables, cut_clusters

        ranges = cut_clusters(bvh.first, bvh.count, bvh.skip, f.shape[0],
                              max_k=32)
        mt = build_mt_tables(
            tri[:, 0], tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0],
            ranges, k=32)
        cl = dict(
            mt_tri=jnp.asarray(mt.tri), mt_start=jnp.asarray(mt.tri_start),
            mt_bmin=jnp.asarray(mt.bmin), mt_bmax=jnp.asarray(mt.bmax),
            cl_sc_bmin=jnp.asarray(mt.sc_bmin),
            cl_sc_bmax=jnp.asarray(mt.sc_bmax),
        )
    ana = {}
    if analytic:
        sph = analytic.get("spheres") or []
        cyl = analytic.get("cylinders") or []
        if sph:
            ana.update(
                sph_c=jnp.asarray(np.asarray([x[0] for x in sph],
                                             np.float32)),
                sph_r=jnp.asarray(np.asarray([x[1] for x in sph],
                                             np.float32)),
                sph_mid=jnp.asarray(np.asarray([x[2] for x in sph],
                                               np.int32)),
                sph_eid=jnp.asarray(np.asarray([x[3] for x in sph],
                                               np.int32)),
                sph_sid=jnp.asarray(np.asarray([x[4] for x in sph],
                                               np.int32)),
            )
        if cyl:
            ana.update(
                cyl_a=jnp.asarray(np.asarray([x[0] for x in cyl],
                                             np.float32)),
                cyl_b=jnp.asarray(np.asarray([x[1] for x in cyl],
                                             np.float32)),
                cyl_r=jnp.asarray(np.asarray([x[2] for x in cyl],
                                             np.float32)),
                cyl_mid=jnp.asarray(np.asarray([x[3] for x in cyl],
                                               np.int32)),
                cyl_eid=jnp.asarray(np.asarray([x[4] for x in cyl],
                                               np.int32)),
                cyl_sid=jnp.asarray(np.asarray([x[5] for x in cyl],
                                               np.int32)),
            )
    return GeometryTables(
        **cl,
        **ana,
        v0=jnp.asarray(tri[:, 0]),
        e1=jnp.asarray(tri[:, 1] - tri[:, 0]),
        e2=jnp.asarray(tri[:, 2] - tri[:, 0]),
        n0=jnp.asarray(n[f[:, 0]]),
        n1=jnp.asarray(n[f[:, 1]]),
        n2=jnp.asarray(n[f[:, 2]]),
        uv0=jnp.asarray(uv[f[:, 0]]),
        uv1=jnp.asarray(uv[f[:, 1]]),
        uv2=jnp.asarray(uv[f[:, 2]]),
        material_id=jnp.asarray(mid),
        emitter_id=jnp.asarray(eid),
        shape_id=jnp.asarray(sid),
        bvh_min=jnp.asarray(bvh.bounds_min),
        bvh_max=jnp.asarray(bvh.bounds_max),
        bvh_first=jnp.asarray(bvh.first),
        bvh_count=jnp.asarray(bvh.count),
        bvh_skip=jnp.asarray(bvh.skip),
        bvh_packed=jnp.asarray(_node_pack := np.concatenate(
            [bvh.bounds_min, bvh.bounds_max,
             bvh.first[:, None].astype(np.float32),
             bvh.count[:, None].astype(np.float32),
             bvh.skip[:, None].astype(np.float32)], axis=1
        )),
        tri_packed=jnp.asarray(_tri_pack := np.concatenate(
            [tri[:, 0], tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]],
            axis=1,
        ).astype(np.float32)),
        bvh_rows=jnp.asarray(_pack_rows_np(_node_pack)),
        tri_rows=jnp.asarray(_pack_rows_np(_tri_pack)),
        backend=backend,
    )


def _pack_rows_np(table: np.ndarray) -> np.ndarray:
    """Host-side 14-records-per-row packing (ops/bvh_pallas.py layout).

    NB: build the (rows*per, 9) buffer first and reshape the CONTIGUOUS
    array — assigning through a sliced view's reshape silently writes to a
    temporary (this exact bug once shipped an all-zero node table, which
    made the packet kernel spin forever and crash the TPU worker)."""
    r = table.shape[0]
    per = 14
    rows = -(-r // per)
    flat = np.zeros((rows * per, 9), np.float32)
    flat[:r] = table
    out = np.zeros((rows, 128), np.float32)
    out[:, : per * 9] = flat.reshape(rows, per * 9)
    return out


# ---------------------------------------------------------------------------
# Möller–Trumbore, batched
# ---------------------------------------------------------------------------

_DET_EPS = 1e-9


def _mt_hit(o, d, v0, e1, e2, mint, maxt):
    """Batched Möller–Trumbore. All inputs broadcast to (..., 3).

    Returns (t, u, v, hit_mask)."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > _DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > mint)
        & (t < maxt)
    )
    return t, u, v, hit


def _closest_brute(geom: GeometryTables, ray: Ray):
    """All-pairs closest hit: (N rays) x (T tris)."""
    o = ray.o[:, None, :]
    d = ray.d[:, None, :]
    t, u, v, hit = _mt_hit(
        o, d, geom.v0[None], geom.e1[None], geom.e2[None],
        ray.mint[:, None], ray.maxt[:, None],
    )
    t_masked = jnp.where(hit, t, jnp.inf)
    best = jnp.argmin(t_masked, axis=1)
    n = ray.o.shape[0]
    rows = jnp.arange(n)
    t_best = t_masked[rows, best]
    valid = jnp.isfinite(t_best)
    return t_best, u[rows, best], v[rows, best], best, valid


def _any_brute(geom: GeometryTables, ray: Ray):
    o = ray.o[:, None, :]
    d = ray.d[:, None, :]
    _, _, _, hit = _mt_hit(
        o, d, geom.v0[None], geom.e1[None], geom.e2[None],
        ray.mint[:, None], ray.maxt[:, None],
    )
    return jnp.any(hit, axis=1)


# ---------------------------------------------------------------------------
# Stackless skip-link BVH traversal
# ---------------------------------------------------------------------------

def _slab_test(bmin, bmax, o, inv_d, mint, tmax):
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(tn, axis=-1), mint)
    t_far = jnp.minimum(jnp.min(tf, axis=-1), tmax)
    return t_near <= t_far


def _closest_bvh(geom: GeometryTables, ray: Ray):
    """Packed-row traversal: ONE (N,9) node gather + MAX_LEAF (N,9) triangle
    gathers per step (the naive version did ~10 separate (N,) gathers per
    step — gathers dominate TPU cost)."""
    n = ray.o.shape[0]
    m_nodes = geom.bvh_min.shape[0]
    inv_d = m.safe_rcp(ray.d)
    nodes = geom.bvh_packed
    tris = geom.tri_packed

    def cond(state):
        node, _, _, _, _ = state
        return jnp.any(node < m_nodes)

    def body(state):
        node, t_best, uv_best, prim_best, valid = state
        nd = jnp.minimum(node, m_nodes - 1)
        row = nodes[nd]                       # (N, 9): one gather
        bmin, bmax = row[:, 0:3], row[:, 3:6]
        first = row[:, 6].astype(jnp.int32)
        count = row[:, 7].astype(jnp.int32)
        skip = row[:, 8].astype(jnp.int32)
        active = node < m_nodes
        box_hit = active & _slab_test(bmin, bmax, ray.o, inv_d, ray.mint, t_best)
        is_leaf = count > 0
        do_tris = box_hit & is_leaf
        for k in range(MAX_LEAF):
            ti = jnp.minimum(first + k, geom.n_tris - 1)
            trow = tris[ti]                   # (N, 9): one gather
            t, u, v, hit = _mt_hit(
                ray.o, ray.d, trow[:, 0:3], trow[:, 3:6], trow[:, 6:9],
                ray.mint, jnp.minimum(ray.maxt, t_best),
            )
            hit = hit & do_tris & (k < count)
            closer = hit & (t < t_best)
            t_best = jnp.where(closer, t, t_best)
            uv_best = jnp.where(closer[:, None], jnp.stack([u, v], -1), uv_best)
            prim_best = jnp.where(closer, ti, prim_best)
            valid = valid | closer
        next_node = jnp.where(box_hit & ~is_leaf, nd + 1, skip)
        next_node = jnp.where(active, next_node, node)
        return next_node, t_best, uv_best, prim_best, valid

    init = (
        jnp.zeros(n, jnp.int32),
        jnp.full(n, jnp.inf),
        jnp.zeros((n, 2)),
        jnp.zeros(n, jnp.int32),
        jnp.zeros(n, bool),
    )
    node, t_best, uv_best, prim_best, valid = jax.lax.while_loop(cond, body, init)
    return t_best, uv_best[:, 0], uv_best[:, 1], prim_best, valid


def _any_bvh(geom: GeometryTables, ray: Ray):
    n = ray.o.shape[0]
    m_nodes = geom.bvh_min.shape[0]
    inv_d = m.safe_rcp(ray.d)
    nodes = geom.bvh_packed
    tris = geom.tri_packed

    def cond(state):
        node, occluded = state
        return jnp.any((node < m_nodes) & ~occluded)

    def body(state):
        node, occluded = state
        nd = jnp.minimum(node, m_nodes - 1)
        row = nodes[nd]
        bmin, bmax = row[:, 0:3], row[:, 3:6]
        first = row[:, 6].astype(jnp.int32)
        count = row[:, 7].astype(jnp.int32)
        skip = row[:, 8].astype(jnp.int32)
        active = (node < m_nodes) & ~occluded
        box_hit = active & _slab_test(bmin, bmax, ray.o, inv_d, ray.mint, ray.maxt)
        is_leaf = count > 0
        do_tris = box_hit & is_leaf
        hit_any = jnp.zeros_like(occluded)
        for k in range(MAX_LEAF):
            ti = jnp.minimum(first + k, geom.n_tris - 1)
            trow = tris[ti]
            _, _, _, hit = _mt_hit(
                ray.o, ray.d, trow[:, 0:3], trow[:, 3:6], trow[:, 6:9],
                ray.mint, ray.maxt,
            )
            hit_any = hit_any | (hit & do_tris & (k < count))
        occluded = occluded | hit_any
        next_node = jnp.where(box_hit & ~is_leaf, nd + 1, skip)
        next_node = jnp.where(active, next_node, node)
        return next_node, occluded

    init = (jnp.zeros(n, jnp.int32), jnp.zeros(n, bool))
    _, occluded = jax.lax.while_loop(cond, body, init)
    return occluded


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _ray_intersect_tri(geom: GeometryTables, ray: Ray) -> Intersection:
    """Triangle-only closest-hit query → full Intersection record
    (reference skdtree.h:352 fillIntersectionRecord equivalent)."""
    if geom.backend == "brute" and _use_pallas():
        # fused kernel: shading record interpolated on-chip, no HBM gathers
        from mitsuba_tpu.ops import intersect_pallas as ip

        table = ip.make_shading_table(geom)
        r = ip.closest_hit_shaded(table, ray.o, ray.d, ray.mint, ray.maxt)
        valid = r["valid"]
        # finite position on miss: inf positions NaN downstream VJPs
        # (NEE directions at escaped lanes), even though masked
        p = ray.at(jnp.where(valid, r["t"], 1.0))
        frame = m.Frame.from_normal(r["sh_n"])
        wi = frame.to_local(-ray.d)
        prim = jnp.where(valid, r["prim"], 0)
        return Intersection(
            valid=valid,
            t=jnp.where(valid, r["t"], jnp.inf),
            p=p,
            geo_n=r["geo_n"],
            sh_n=r["sh_n"],
            uv=r["uv"],
            # frame tangent instead of e1[prim]: avoids an HBM gather; no
            # consumer needs the true parametric dpdu yet (bump maps would)
            dp_du=frame.s,
            wi=wi,
            prim_id=jnp.where(valid, prim, -1),
            material_id=jnp.where(valid, r["material_id"], -1),
            emitter_id=jnp.where(valid, r["emitter_id"], -1),
            shape_id=jnp.where(valid, r["shape_id"], -1),
        )
    if geom.backend == "cluster" and _use_pallas():
        from mitsuba_tpu.ops import worklist_pallas as wp

        t, u, v, prim, valid, ovf = wp.wl_closest(
            geom.wl_tables, ray.o, ray.d, ray.mint, ray.maxt)
        # rows that overflowed a cull beam carry a lower bound only:
        # re-resolve those lanes through the XLA packed-row walk (rays in
        # non-overflow rows get mint>maxt -> their walk exits immediately)
        lane_ovf = jnp.repeat(ovf, wp.LANES)[:ray.o.shape[0]] & (
            ray.mint <= ray.maxt)
        fb_ray = replace(ray, maxt=jnp.where(lane_ovf, ray.maxt, -1.0))
        tf_, uf, vf, pf, okf = _closest_bvh(geom, fb_ray)
        t = jnp.where(lane_ovf, tf_, t)
        u = jnp.where(lane_ovf, uf, u)
        v = jnp.where(lane_ovf, vf, v)
        prim = jnp.where(lane_ovf, pf, prim)
        valid = jnp.where(lane_ovf, okf, valid)
    elif geom.backend == "bvh" and _use_pallas():
        from mitsuba_tpu.ops import bvh_pallas as bp

        t, u, v, prim, valid = bp.bvh_closest(
            geom.bvh_rows, geom.tri_rows, ray.o, ray.d, ray.mint,
            ray.maxt, n_nodes=geom.bvh_min.shape[0],
            n_tris=geom.n_tris,
        )
        prim = jnp.where(valid, prim, 0)
    elif geom.backend in ("bvh", "cluster"):
        t, u, v, prim, valid = _closest_bvh(geom, ray)
    else:
        t, u, v, prim, valid = _closest_brute(geom, ray)
    prim = jnp.where(valid, prim, 0)
    p = ray.at(jnp.where(valid, t, 1.0))   # finite on miss (see above)
    w = 1.0 - u - v
    geo_n = m.normalize(jnp.cross(geom.e1[prim], geom.e2[prim]))
    sh_n = m.normalize(
        w[:, None] * geom.n0[prim] + u[:, None] * geom.n1[prim] + v[:, None] * geom.n2[prim]
    )
    uv = (
        w[:, None] * geom.uv0[prim] + u[:, None] * geom.uv1[prim] + v[:, None] * geom.uv2[prim]
    )
    # true parametric dp_du from the uv parameterization (reference
    # trimesh.cpp fillIntersectionRecord): solve [e1 e2] = [dp_du dp_dv]
    # * [duv1 duv2]; falls back to e1 for degenerate uv charts
    duv1 = geom.uv1[prim] - geom.uv0[prim]
    duv2 = geom.uv2[prim] - geom.uv0[prim]
    det_uv = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    ok_uv = jnp.abs(det_uv) > 1e-12
    inv_det = 1.0 / jnp.where(ok_uv, det_uv, 1.0)
    dp_du = jnp.where(
        ok_uv[:, None],
        (duv2[:, 1:2] * geom.e1[prim] - duv1[:, 1:2] * geom.e2[prim])
        * inv_det[:, None],
        geom.e1[prim])
    frame = m.Frame.from_normal_tangent(sh_n, dp_du)
    wi = frame.to_local(-ray.d)
    return Intersection(
        valid=valid,
        t=jnp.where(valid, t, jnp.inf),
        p=p,
        geo_n=geo_n,
        sh_n=sh_n,
        uv=uv,
        dp_du=dp_du,
        wi=wi,
        prim_id=jnp.where(valid, prim, -1),
        shape_id=jnp.where(valid, geom.shape_id[prim], -1),
        material_id=jnp.where(valid, geom.material_id[prim], -1),
        emitter_id=jnp.where(valid, geom.emitter_id[prim], -1),
    )


def _ray_intersect_and_test_tri(geom: GeometryTables, ray: Ray,
                                sray: Ray):
    """Fused closest-hit (ray) + shadow any-hit (sray) — one Pallas launch
    with a shared triangle loop on the TPU brute path; separate queries
    elsewhere.  Returns (Intersection, occluded)."""
    if geom.backend == "brute" and _use_pallas():
        from mitsuba_tpu.ops import intersect_pallas as ip

        table = ip.make_shading_table(geom)
        r, occ = ip.closest_hit_shaded_and_any(
            table, ray.o, ray.d, ray.mint, ray.maxt,
            sray.o, sray.d, sray.mint, sray.maxt,
        )
        valid = r["valid"]
        # finite position on miss: inf positions NaN downstream VJPs
        # (NEE directions at escaped lanes), even though masked
        p = ray.at(jnp.where(valid, r["t"], 1.0))
        frame = m.Frame.from_normal(r["sh_n"])
        wi = frame.to_local(-ray.d)
        prim = jnp.where(valid, r["prim"], 0)
        its = Intersection(
            valid=valid,
            t=jnp.where(valid, r["t"], jnp.inf),
            p=p,
            geo_n=r["geo_n"],
            sh_n=r["sh_n"],
            uv=r["uv"],
            dp_du=frame.s,
            wi=wi,
            prim_id=jnp.where(valid, prim, -1),
            material_id=jnp.where(valid, r["material_id"], -1),
            emitter_id=jnp.where(valid, r["emitter_id"], -1),
            shape_id=jnp.where(valid, r["shape_id"], -1),
        )
        return its, occ
    return _ray_intersect_tri(geom, ray), _ray_test_tri(geom, sray)


def _ray_test_tri(geom: GeometryTables, ray: Ray) -> jnp.ndarray:
    if geom.backend == "cluster" and _use_pallas():
        from mitsuba_tpu.ops import worklist_pallas as wp

        occ, ovf = wp.wl_any(
            geom.wl_tables, ray.o, ray.d, ray.mint, ray.maxt)
        lane_ovf = jnp.repeat(ovf, wp.LANES)[:ray.o.shape[0]] & (
            ray.mint <= ray.maxt) & ~occ
        fb_ray = replace(ray, maxt=jnp.where(lane_ovf, ray.maxt, -1.0))
        return occ | (_any_bvh(geom, fb_ray) & lane_ovf)
    if geom.backend in ("bvh", "cluster"):
        if _use_pallas():
            from mitsuba_tpu.ops import bvh_pallas as bp

            return bp.bvh_any(
                geom.bvh_rows, geom.tri_rows, ray.o, ray.d, ray.mint,
                ray.maxt, n_nodes=geom.bvh_min.shape[0],
                n_tris=geom.n_tris,
            )
        return _any_bvh(geom, ray)
    if _use_pallas():
        from mitsuba_tpu.ops import intersect_pallas as ip

        table = ip.make_tri_table(geom.v0, geom.e1, geom.e2)
        return ip.any_hit(table, ray.o, ray.d, ray.mint, ray.maxt)
    return _any_brute(geom, ray)


# ---------------------------------------------------------------------------
# Analytic primitives (reference src/shapes/sphere.cpp, cylinder.cpp):
# intersected in plain XLA against every ray (S and C are small) and merged
# with the triangle result — no prim-type switch inside the Pallas kernels.
# ---------------------------------------------------------------------------

def _sphere_closest(geom: GeometryTables, ray: Ray):
    """(t, sphere_index, valid) of the nearest analytic sphere hit."""
    c = geom.sph_c
    r = geom.sph_r
    oc = ray.o[:, None, :] - c[None]                  # (N, S, 3)
    b = jnp.sum(oc * ray.d[:, None, :], axis=-1)      # (N, S)
    cq = jnp.sum(oc * oc, axis=-1) - r[None] ** 2
    disc = b * b - cq
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    mn = ray.mint[:, None]
    mx = ray.maxt[:, None]
    t = jnp.where(ok & (t0 > mn), t0,
                  jnp.where(ok & (t1 > mn), t1, jnp.inf))
    t = jnp.where(t < mx, t, jnp.inf)
    idx = jnp.argmin(t, axis=-1).astype(jnp.int32)
    tb = jnp.take_along_axis(t, idx[:, None], axis=-1)[:, 0]
    return tb, idx, jnp.isfinite(tb)


def _cylinder_closest(geom: GeometryTables, ray: Ray):
    """(t, cyl_index, valid): finite open cylinder (no end caps —
    reference cylinder.cpp)."""
    a = geom.cyl_a
    bb = geom.cyl_b
    r = geom.cyl_r
    ax = bb - a
    ln = jnp.maximum(jnp.linalg.norm(ax, axis=-1), 1e-12)
    u = ax / ln[:, None]                                # (C, 3)
    oc = ray.o[:, None, :] - a[None]                    # (N, C, 3)
    du = jnp.sum(ray.d[:, None, :] * u[None], axis=-1)  # (N, C)
    ou = jnp.sum(oc * u[None], axis=-1)
    dp = ray.d[:, None, :] - du[..., None] * u[None]
    op = oc - ou[..., None] * u[None]
    A = jnp.maximum(jnp.sum(dp * dp, axis=-1), 1e-12)
    B = jnp.sum(dp * op, axis=-1)
    Cq = jnp.sum(op * op, axis=-1) - r[None] ** 2
    disc = B * B - A * Cq
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-B - sq) / A
    t1 = (-B + sq) / A
    mn = ray.mint[:, None]
    mx = ray.maxt[:, None]

    def axial_ok(t):
        s_ax = ou + t * du
        return (s_ax >= 0.0) & (s_ax <= ln[None])

    ok0 = ok & (t0 > mn) & axial_ok(t0)
    ok1 = ok & (t1 > mn) & axial_ok(t1)
    t = jnp.where(ok0, t0, jnp.where(ok1, t1, jnp.inf))
    t = jnp.where(t < mx, t, jnp.inf)
    idx = jnp.argmin(t, axis=-1).astype(jnp.int32)
    tb = jnp.take_along_axis(t, idx[:, None], axis=-1)[:, 0]
    return tb, idx, jnp.isfinite(tb)


def _analytic_any(geom: GeometryTables, ray: Ray):
    occ = jnp.zeros(ray.o.shape[0], bool)
    if geom.n_spheres > 0:
        _, _, v = _sphere_closest(geom, ray)
        occ = occ | v
    if geom.n_cylinders > 0:
        _, _, v = _cylinder_closest(geom, ray)
        occ = occ | v
    return occ


def _merge_analytic(geom: GeometryTables, ray: Ray, its: Intersection):
    """Override the triangle Intersection where an analytic primitive is
    nearer. Prim-id space: spheres [T, T+S), cylinders [T+S, T+S+C)."""
    T = geom.n_tris
    best = its
    if geom.n_spheres > 0:
        t, i, v = _sphere_closest(geom, ray)
        closer = v & (t < best.t)
        p = ray.at(jnp.where(closer, t, 1.0))
        n = m.normalize(p - geom.sph_c[i])
        # reference sphere.cpp uv: phi/theta spherical parameterisation
        phi = jnp.arctan2(n[:, 1], n[:, 0])
        theta = jnp.arccos(jnp.clip(n[:, 2], -1.0, 1.0))
        uv = jnp.stack([phi * (0.5 / jnp.pi) + 0.5, theta / jnp.pi], -1)
        dpdu = m.normalize(jnp.stack(
            [-n[:, 1], n[:, 0], jnp.zeros_like(n[:, 0])], -1)
            + 1e-12 * jnp.ones((1, 3)))
        # same frame construction as Intersection.frame() (wi/to_world
        # consistency)
        frame = m.Frame.from_normal_tangent(n, dpdu)
        wi = frame.to_local(-ray.d)
        best = Intersection(
            valid=best.valid | closer,
            t=jnp.where(closer, t, best.t),
            p=jnp.where(closer[:, None], p, best.p),
            geo_n=jnp.where(closer[:, None], n, best.geo_n),
            sh_n=jnp.where(closer[:, None], n, best.sh_n),
            uv=jnp.where(closer[:, None], uv, best.uv),
            dp_du=jnp.where(closer[:, None], dpdu, best.dp_du),
            wi=jnp.where(closer[:, None], wi, best.wi),
            prim_id=jnp.where(closer, T + i, best.prim_id),
            shape_id=jnp.where(closer, geom.sph_sid[i], best.shape_id),
            material_id=jnp.where(closer, geom.sph_mid[i],
                                  best.material_id),
            emitter_id=jnp.where(closer, geom.sph_eid[i], best.emitter_id),
        )
    if geom.n_cylinders > 0:
        t, i, v = _cylinder_closest(geom, ray)
        closer = v & (t < best.t)
        a = geom.cyl_a[i]
        ax = geom.cyl_b[i] - a
        ln = jnp.maximum(jnp.linalg.norm(ax, axis=-1), 1e-12)
        u_ax = ax / ln[:, None]
        p = ray.at(jnp.where(closer, t, 1.0))
        s_ax = jnp.sum((p - a) * u_ax, axis=-1)
        n = m.normalize(p - a - s_ax[:, None] * u_ax)
        frame_phi = m.Frame.from_normal(u_ax)
        lp = frame_phi.to_local(n)
        phi = jnp.arctan2(lp[:, 1], lp[:, 0])
        uv = jnp.stack([phi * (0.5 / jnp.pi) + 0.5, s_ax / ln], -1)
        dpdu = m.normalize(jnp.cross(u_ax, n))
        frame = m.Frame.from_normal_tangent(n, dpdu)
        wi = frame.to_local(-ray.d)
        S = geom.n_spheres
        best = Intersection(
            valid=best.valid | closer,
            t=jnp.where(closer, t, best.t),
            p=jnp.where(closer[:, None], p, best.p),
            geo_n=jnp.where(closer[:, None], n, best.geo_n),
            sh_n=jnp.where(closer[:, None], n, best.sh_n),
            uv=jnp.where(closer[:, None], uv, best.uv),
            dp_du=jnp.where(closer[:, None], dpdu, best.dp_du),
            wi=jnp.where(closer[:, None], wi, best.wi),
            prim_id=jnp.where(closer, T + S + i, best.prim_id),
            shape_id=jnp.where(closer, geom.cyl_sid[i], best.shape_id),
            material_id=jnp.where(closer, geom.cyl_mid[i],
                                  best.material_id),
            emitter_id=jnp.where(closer, geom.cyl_eid[i], best.emitter_id),
        )
    return best


def ray_intersect(geom: GeometryTables, ray: Ray) -> Intersection:
    """Closest-hit query → full Intersection record; triangles via the
    backend kernels, analytic primitives merged in XLA."""
    its = _ray_intersect_tri(geom, ray)
    if geom.has_analytic:
        its = _merge_analytic(geom, ray, its)
    return its


def ray_test(geom: GeometryTables, ray: Ray) -> jnp.ndarray:
    """Any-hit (shadow ray) query → bool occlusion mask (reference
    scene.h:241 isOccluded equivalent)."""
    occ = _ray_test_tri(geom, ray)
    if geom.has_analytic:
        occ = occ | _analytic_any(geom, ray)
    return occ


def ray_intersect_and_test(geom: GeometryTables, ray: Ray, sray: Ray):
    """Fused closest-hit (ray) + shadow any-hit (sray) — one Pallas launch
    with a shared triangle loop on the TPU brute path; separate queries
    elsewhere.  Returns (Intersection, occluded)."""
    its, occ = _ray_intersect_and_test_tri(geom, ray, sray)
    if geom.has_analytic:
        its = _merge_analytic(geom, ray, its)
        occ = occ | _analytic_any(geom, sray)
    return its, occ
