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
    # ONE row-gather for the whole shading record (law 1,
    # docs/PERF_NOTES.md: the ~11 per-prim attribute gathers of the
    # Intersection build each cost like a full (N,)-gather; packed they
    # amortize into one). Columns: e1|e2|n0|n1|n2|uv0|uv1|uv2|
    # mid(bitcast)|eid(bitcast)|sid(bitcast)
    shade_pack: jnp.ndarray = None   # (T, 24)
    # 14-records-per-128-lane-row layouts for the Pallas packet kernel
    bvh_rows: jnp.ndarray = None     # (ceil(M/14), 128)
    tri_rows: jnp.ndarray = None     # (ceil(T/14), 128)
    # work-list cluster tables (ops/worklist_pallas.py; backend="cluster")
    mt_tri: jnp.ndarray = None       # (B, K, 16) triangle blocks (shared)
    mt_start: jnp.ndarray = None     # (C,) prim base per cluster
    mt_bmin: jnp.ndarray = None      # (C, 3) world cluster AABBs
    mt_bmax: jnp.ndarray = None      # (C, 3)
    cl_sc_bmin: jnp.ndarray = None   # (C_s, 3) supercluster bounds
    cl_sc_bmax: jnp.ndarray = None   # (C_s, 3)
    # TRUE instancing (reference src/shapes/instance.cpp — nested trees;
    # here instances share object-space blocks, see clusters.py
    # InstancedTables). Virtual prim ids >= n_tris decode to
    # (cluster, local) and shade through the obj_* tables below.
    mt_block_id: jnp.ndarray = None  # (C,) cluster -> shared block row
    mt_xform: jnp.ndarray = None     # (C, 16) world->object 3x4 rows
    mt_xform_fwd: jnp.ndarray = None  # (C, 12) object->world 3x4 rows
    obj_v0: jnp.ndarray = None       # (B*K, 3) block-aligned object tris
    obj_e1: jnp.ndarray = None
    obj_e2: jnp.ndarray = None
    obj_n0: jnp.ndarray = None
    obj_n1: jnp.ndarray = None
    obj_n2: jnp.ndarray = None
    obj_uv0: jnp.ndarray = None      # (B*K, 2)
    obj_uv1: jnp.ndarray = None
    obj_uv2: jnp.ndarray = None
    obj_mid: jnp.ndarray = None      # (B*K,) material ids
    obj_sid: jnp.ndarray = None      # (B*K,) shape ids
    # exact per-instance walks (CPU path + overflow-row fallback):
    # object-space sub-geometries per GROUP + per-instance transforms
    inst_groups: tuple = None        # tuple of GeometryTables (pytrees)
    inst_tri2virt: tuple = None      # per group: (T_g,) tri -> cid*K+local
    inst_xf_inv: jnp.ndarray = None  # (I, 12) world->object rows
    inst_gid: tuple = static_field(default=())   # group index per instance
    inst_vp_base: tuple = static_field(default=())  # virtual prim bases
    n_static_clusters: int = static_field(default=0)
    mt_k: int = static_field(default=32)
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
    # hair fiber segments (reference src/shapes/hair.cpp:132 — exact
    # per-segment cylinders in a dedicated kd-tree; here a skip-link
    # segment BVH walked by _hair_walk). Prim-id space continues after
    # cylinders: [T+S+C, T+S+C+H).
    hair_nodes: jnp.ndarray = None   # (Mh, 9) packed skip-link nodes
    hair_segs: jnp.ndarray = None    # (H, 16): a3 b3 r u0 u1 mid eid sid pad
    # exact-cull item-stream tables (ops/exact_pallas.py, v5): K8
    # clusters with an 8x box hierarchy (K8 -> 64-tri -> 512-tri)
    ex_tri: jnp.ndarray = None       # (C8, 8, 128) f32, lane 15 = prim
    ex_b0lo: jnp.ndarray = None      # (C8, 3) K8 cluster AABBs
    ex_b0hi: jnp.ndarray = None
    ex_b1lo: jnp.ndarray = None      # (C8/8, 3)
    ex_b1hi: jnp.ndarray = None
    ex_b2lo: jnp.ndarray = None      # (C8/64, 3)
    ex_b2hi: jnp.ndarray = None
    ex_ct1: jnp.ndarray = None       # (C8/64, 8, 128) L1-child box table
    ex_ct0: jnp.ndarray = None       # (C8/8, 8, 128) K8-child box table
    ex_ct2: jnp.ndarray = None       # (pad(C8/64)/8, 8, 128) root table
    # scene-statistics cull capacities (exact_pallas.auto_caps):
    # (diffuse, coherent, xl) cap tuples; None -> module defaults
    ex_caps: tuple = static_field(default=None)
    backend: str = static_field(default="brute")

    @property
    def has_instances(self):
        return self.mt_block_id is not None

    @property
    def ex_tables(self):
        return dict(tri=self.ex_tri,
                    b0_lo=self.ex_b0lo, b0_hi=self.ex_b0hi,
                    b1_lo=self.ex_b1lo, b1_hi=self.ex_b1hi,
                    b2_lo=self.ex_b2lo, b2_hi=self.ex_b2hi,
                    ct1=self.ex_ct1, ct0=self.ex_ct0, ct2=self.ex_ct2)

    @property
    def wl_tables(self):
        d = dict(tri=self.mt_tri, tri_start=self.mt_start,
                 bmin=self.mt_bmin, bmax=self.mt_bmax,
                 sc_bmin=self.cl_sc_bmin, sc_bmax=self.cl_sc_bmax)
        if self.mt_block_id is not None:
            d["block_id"] = self.mt_block_id
            d["xform"] = self.mt_xform
        return d

    @property
    def st_tables(self):
        """Tables for the per-row streaming kernel (ops/stream_pallas.py).
        SC block layout (c_s, K, 128): sublane = tri slot, lane =
        cluster_in_sc*16 + field — the full block is 128-lane exact, so
        the kernel's manual HBM->VMEM DMA slices stay tile-aligned
        (Mosaic pads HBM minor dims to (1,128) tiling; any 16-wide slice
        shape is rejected)."""
        C, K, F = self.mt_tri.shape
        sc_tri = self.mt_tri.reshape(C // 8, 8, K, F).transpose(
            0, 2, 1, 3).reshape(C // 8, K, 8 * F)
        return dict(
            sc_tri=sc_tri,
            sc_bmin=self.cl_sc_bmin, sc_bmax=self.cl_sc_bmax,
            tri_start=self.mt_start,
        )

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
    def n_hair(self):
        return 0 if self.hair_segs is None else self.hair_segs.shape[0]

    @property
    def has_analytic(self):
        return self.n_spheres + self.n_cylinders > 0


def _pad_boxes(lo, hi, mult=128):
    """Pad a box list to a multiple of `mult` with far-away degenerate
    boxes (2e30 corners: any slab entry lands beyond every clamped
    maxt, so padding never produces candidates; NOT +-inf, whose slab
    arithmetic NaNs)."""
    n = lo.shape[0]
    pad = (-n) % mult
    if pad:
        lo = np.concatenate([lo, np.full((pad, 3), 2e30, np.float32)])
        hi = np.concatenate([hi, np.full((pad, 3), 2e30, np.float32)])
    return lo, hi


def build_geometry(meshes_with_ids, backend: str = "auto",
                   analytic=None, instanced=None, hair=None) -> GeometryTables:
    """Assemble GeometryTables from [(TriMesh, material_id, emitter_id
    [, shape_id]), ...].

    backend: 'brute' | 'bvh' | 'cluster' | 'auto' (cluster above 64
    triangles — the streaming cluster kernel on TPU, skip-link BVH walk
    as the CPU fallback).
    analytic: optional dict(spheres=[(c, r, mid, eid, sid)],
    cylinders=[(a, b, r, mid, eid, sid)]) of analytic primitives.
    instanced: optional (groups, instances) for TRUE instancing
    (cluster backend only): groups = list of [(TriMesh, material_id,
    shape_id), ...] in OBJECT space; instances = [(group_idx, 4x4
    to_world), ...]. Instance triangles share one object-space copy;
    they cannot be emitters or carry interior media.
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
        from mitsuba_tpu.render.clusters import (
            build_instanced_tables, build_mt_tables, cut_clusters,
        )

        K = 32
        ranges = cut_clusters(bvh.first, bvh.count, bvh.skip, f.shape[0],
                              max_k=K)
        mt = build_mt_tables(
            tri[:, 0], tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0],
            ranges, k=K)
        cl = dict(
            mt_tri=jnp.asarray(mt.tri), mt_start=jnp.asarray(mt.tri_start),
            mt_bmin=jnp.asarray(mt.bmin), mt_bmax=jnp.asarray(mt.bmax),
            cl_sc_bmin=jnp.asarray(mt.sc_bmin),
            cl_sc_bmax=jnp.asarray(mt.sc_bmax),
            mt_k=K,
        )
        if not (instanced and instanced[1]):
            # exact-cull (v5) tables: an independent K=8 cut with an
            # 8x AABB hierarchy; prim ids embedded in the tri blocks
            mt8 = build_mt_tables(
                tri[:, 0], tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0],
                cut_clusters(bvh.first, bvh.count, bvh.skip, f.shape[0],
                             max_k=8), k=8, sc_group=64)
            from mitsuba_tpu.ops.exact_pallas import pack_child_table
            C8 = mt8.bmin.shape[0]
            b1lo = mt8.bmin.reshape(C8 // 8, 8, 3).min(1)
            b1hi = mt8.bmax.reshape(C8 // 8, 8, 3).max(1)
            tri128 = np.zeros((C8, 8, 128), np.float32)
            tri128[:, :, :9] = mt8.tri[:, :, :9]
            prim8 = (mt8.tri_start[:, None]
                     + np.arange(8, dtype=np.int32)[None]).astype(np.int32)
            tri128[:, :, 15] = prim8.view(np.float32)
            cl.update(
                ex_tri=jnp.asarray(tri128),
                ex_b0lo=jnp.asarray(mt8.bmin),
                ex_b0hi=jnp.asarray(mt8.bmax),
                ex_b1lo=jnp.asarray(b1lo),
                ex_b1hi=jnp.asarray(b1hi),
                ex_b2lo=jnp.asarray(b1lo.reshape(C8 // 64, 8, 3).min(1)),
                ex_b2hi=jnp.asarray(b1hi.reshape(C8 // 64, 8, 3).max(1)),
                ex_ct1=jnp.asarray(pack_child_table(b1lo, b1hi)),
                ex_ct0=jnp.asarray(pack_child_table(mt8.bmin, mt8.bmax)),
                ex_ct2=jnp.asarray(pack_child_table(*_pad_boxes(
                    b1lo.reshape(C8 // 64, 8, 3).min(1),
                    b1hi.reshape(C8 // 64, 8, 3).max(1)))),
                ex_caps=__import__(
                    "mitsuba_tpu.ops.exact_pallas",
                    fromlist=["auto_caps"]).auto_caps(C8),
            )
        if instanced and instanced[1]:
            groups, instances = instanced
            group_mts = []
            group_attr = []
            for gitems in groups:
                gsub = build_geometry(
                    [(msh, mi, -1, si) for msh, mi, si in gitems],
                    backend="cluster")
                # re-derive the group's MT tables + block-aligned attrs
                granges = None
                gtri = np.stack([np.asarray(gsub.v0),
                                 np.asarray(gsub.v0) + np.asarray(gsub.e1),
                                 np.asarray(gsub.v0) + np.asarray(gsub.e2)],
                                axis=1)
                gmt_tri = np.asarray(gsub.mt_tri)
                group_mts.append(type(mt)(
                    tri=gmt_tri,
                    tri_start=np.asarray(gsub.mt_start),
                    bmin=np.asarray(gsub.mt_bmin),
                    bmax=np.asarray(gsub.mt_bmax),
                    sc_bmin=np.asarray(gsub.cl_sc_bmin),
                    sc_bmax=np.asarray(gsub.cl_sc_bmax)))
                group_attr.append(gsub)
            it = build_instanced_tables(mt, f.shape[0], group_mts,
                                        instances, k=K)
            # block-aligned object attrs: rows [block*K + local]; static
            # blocks keep zeros (their prims shade via the world tables)
            B = it.tri.shape[0]

            def blk(field, width):
                out = np.zeros((B * K, width), np.float32) if width > 1 \
                    else np.zeros(B * K, np.int32)
                base = mt.tri.shape[0]
                for gsub, gmts in zip(group_attr, group_mts):
                    starts = np.asarray(gsub.mt_start)
                    src = np.asarray(getattr(gsub, field))
                    for ci in range(gmts.tri.shape[0]):
                        s = int(starts[ci])
                        cnt = min(K, src.shape[0] - s) if s < src.shape[0] \
                            else 0
                        # padding clusters repeat start 0 rows; their tri
                        # blocks are zero and never hit, so garbage attrs
                        # here are unreachable
                        if cnt > 0:
                            out[(base + ci) * K:(base + ci) * K + cnt] = \
                                src[s:s + cnt]
                    base += gmts.tri.shape[0]
                return out

            cl.update(
                mt_tri=jnp.asarray(it.tri),
                mt_start=jnp.asarray(it.tri_start),
                mt_bmin=jnp.asarray(it.bmin), mt_bmax=jnp.asarray(it.bmax),
                cl_sc_bmin=jnp.asarray(it.sc_bmin),
                cl_sc_bmax=jnp.asarray(it.sc_bmax),
                mt_block_id=jnp.asarray(it.block_id),
                mt_xform=jnp.asarray(it.xform),
                mt_xform_fwd=jnp.asarray(it.xform_fwd),
                obj_v0=jnp.asarray(blk("v0", 3)),
                obj_e1=jnp.asarray(blk("e1", 3)),
                obj_e2=jnp.asarray(blk("e2", 3)),
                obj_n0=jnp.asarray(blk("n0", 3)),
                obj_n1=jnp.asarray(blk("n1", 3)),
                obj_n2=jnp.asarray(blk("n2", 3)),
                obj_uv0=jnp.asarray(blk("uv0", 2)),
                obj_uv1=jnp.asarray(blk("uv1", 2)),
                obj_uv2=jnp.asarray(blk("uv2", 2)),
                obj_mid=jnp.asarray(blk("material_id", 1)),
                obj_sid=jnp.asarray(blk("shape_id", 1)),
                n_static_clusters=it.n_static_clusters,
            )
            # exact-walk side tables: per-group tri -> (cluster*K + local)
            tri2virt = []
            for gsub, gmts in zip(group_attr, group_mts):
                t2v = np.zeros(gsub.n_tris, np.int64)
                starts = np.asarray(gsub.mt_start)
                for ci in range(gmts.tri.shape[0]):
                    s = int(starts[ci])
                    cnt = min(K, gsub.n_tris - s) if s < gsub.n_tris else 0
                    if cnt > 0:
                        t2v[s:s + cnt] = ci * K + np.arange(cnt)
                tri2virt.append(jnp.asarray(t2v, jnp.int32))
            vp_base = []
            ccur = it.n_static_clusters
            xf_inv = []
            for gi_i, m4 in instances:
                vp_base.append(f.shape[0] + (ccur - it.n_static_clusters)
                               * K)
                ccur += group_mts[gi_i].tri.shape[0]
                inv = np.linalg.inv(np.asarray(m4, np.float64))
                xf_inv.append(inv[:3, :4].reshape(-1))
            cl.update(
                inst_groups=tuple(group_attr),
                inst_tri2virt=tuple(tri2virt),
                inst_xf_inv=jnp.asarray(np.asarray(xf_inv, np.float32)),
                inst_gid=tuple(int(g) for g, _ in instances),
                inst_vp_base=tuple(int(v_) for v_ in vp_base),
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
    if hair is not None and hair["a"].shape[0] > 0:
        ana.update(_pack_hair(hair))
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
        shade_pack=jnp.asarray(np.concatenate(
            [(tri[:, 1] - tri[:, 0]).astype(np.float32),
             (tri[:, 2] - tri[:, 0]).astype(np.float32),
             n[f[:, 0]].astype(np.float32),
             n[f[:, 1]].astype(np.float32),
             n[f[:, 2]].astype(np.float32),
             uv[f[:, 0]].astype(np.float32),
             uv[f[:, 1]].astype(np.float32),
             uv[f[:, 2]].astype(np.float32),
             mid.astype(np.int32).view(np.float32)[:, None],
             eid.astype(np.int32).view(np.float32)[:, None],
             sid.astype(np.int32).view(np.float32)[:, None]], axis=1)),
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


def predicted_hit_bound(geom: GeometryTables, ray: Ray, pred_prim):
    """Exact MT test of each ray against ONE predicted triangle
    (hash-based ray-path prediction, arXiv:1910.01304: rays from the same
    spatial cell + direction octant tend to hit the same primitive).

    Any hit yields an exact UPPER BOUND on the nearest-hit distance —
    feeding it back as maxt tightens the work-list cull's conservative
    row intervals and the kernel's early-exit, without changing results
    (traversal still resolves the true nearest within the bound). For
    shadow rays the hit itself answers the any-hit query (the classic
    shadow cache). Returns (t, hit) — only static prims (< n_tris)
    participate; others report miss."""
    ok = (pred_prim >= 0) & (pred_prim < geom.n_tris)
    prim = jnp.clip(pred_prim, 0, geom.n_tris - 1)
    t, _u, _v, hit = _mt_hit(ray.o, ray.d, geom.v0[prim], geom.e1[prim],
                             geom.e2[prim], ray.mint, ray.maxt)
    return t, hit & ok


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


def _closest_bvh_unrolled(geom: GeometryTables, ray: Ray):
    """Packed-row traversal: ONE (N,9) node gather + MAX_LEAF (N,9) triangle
    gathers per step (the naive version did ~10 separate (N,) gathers per
    step — gathers dominate TPU cost).

    NOTE: kept as the CPU/test oracle. On TPU, a while_loop whose body
    carries several million-lane gathers crashes the worker when embedded
    in a scan at ~1M lanes (reproduced: masked 2-iteration runs die;
    single-gather bodies with hundreds of iterations survive) — TPU
    callers use _closest_bvh below, which issues one node and one
    triangle gather per iteration with an explicit step bound."""
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


def _walk_phased(geom: GeometryTables, ray: Ray, any_hit: bool):
    """Skip-link walk with ONE node gather + ONE triangle gather per
    iteration (leaf triangles consumed one per step through carried leaf
    state). Strictly bounded: each step either advances the node cursor
    or consumes a leaf triangle, so steps <= (MAX_LEAF+1)*n_nodes — the
    cond carries that cap explicitly. This body shape is required on TPU:
    see _closest_bvh_unrolled's note."""
    n = ray.o.shape[0]
    m_nodes = geom.bvh_min.shape[0]
    inv_d = m.safe_rcp(ray.d)
    nodes = geom.bvh_packed
    tris = geom.tri_packed
    cap = (MAX_LEAF + 1) * m_nodes + 8

    def cond(state):
        (node, lf, lc, lk, steps, t_best, uv, prim, valid) = state
        live = (node < m_nodes) | (lk < lc)
        if any_hit:
            live = live & ~valid
        return jnp.any(live) & (steps < cap)

    def body(state):
        (node, lf, lc, lk, steps, t_best, uv_best, prim_best,
         valid) = state
        in_leaf = lk < lc
        if any_hit:
            in_leaf = in_leaf & ~valid
        # --- triangle phase (lanes inside a leaf test one triangle) ----
        ti = jnp.minimum(lf + jnp.minimum(lk, MAX_LEAF - 1),
                         geom.n_tris - 1)
        trow = tris[ti]                          # one gather
        t, u, v, hit = _mt_hit(ray.o, ray.d, trow[:, 0:3], trow[:, 3:6],
                               trow[:, 6:9], ray.mint,
                               jnp.minimum(ray.maxt, t_best))
        closer = in_leaf & hit & (t < t_best)
        t_best = jnp.where(closer, t, t_best)
        uv_best = jnp.where(closer[:, None], jnp.stack([u, v], -1),
                            uv_best)
        prim_best = jnp.where(closer, ti, prim_best)
        valid = valid | closer
        lk = jnp.where(in_leaf, lk + 1, lk)
        # --- node phase (lanes not in a leaf advance the cursor) --------
        do_node = ~in_leaf & (node < m_nodes)
        if any_hit:
            do_node = do_node & ~valid
        nd = jnp.minimum(node, m_nodes - 1)
        row = nodes[nd]                          # one gather
        bmin, bmax = row[:, 0:3], row[:, 3:6]
        first = row[:, 6].astype(jnp.int32)
        count = row[:, 7].astype(jnp.int32)
        skip = row[:, 8].astype(jnp.int32)
        box_hit = do_node & _slab_test(bmin, bmax, ray.o, inv_d,
                                       ray.mint,
                                       jnp.minimum(ray.maxt, t_best))
        is_leaf = count > 0
        enter = box_hit & is_leaf
        lf = jnp.where(enter, first, lf)
        lc = jnp.where(enter, jnp.minimum(count, MAX_LEAF), lc)
        lk = jnp.where(enter, 0, lk)
        nxt = jnp.where(box_hit & ~is_leaf, nd + 1, skip)
        node = jnp.where(do_node, nxt, node)
        return (node, lf, lc, lk, steps + 1, t_best, uv_best, prim_best,
                valid)

    init = (jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
            jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
            jnp.zeros((), jnp.int32), jnp.full(n, jnp.inf),
            jnp.zeros((n, 2)), jnp.zeros(n, jnp.int32),
            jnp.zeros(n, bool))
    (_, _, _, _, _, t_best, uv_best, prim_best, valid) = \
        jax.lax.while_loop(cond, body, init)
    return t_best, uv_best[:, 0], uv_best[:, 1], prim_best, valid


def _closest_bvh(geom: GeometryTables, ray: Ray):
    if _use_pallas():
        return _walk_phased(geom, ray, any_hit=False)
    return _closest_bvh_unrolled(geom, ray)


def _xf_ray(ray: Ray, xf_row):
    """Transform a ray by a (12,) world->object 3x4 row (t is invariant:
    the direction transforms linearly, no renormalization)."""
    M = xf_row.reshape(3, 4)
    o = ray.o @ M[:, :3].T + M[:, 3]
    d = ray.d @ M[:, :3].T
    return Ray(o=o, d=d, mint=ray.mint, maxt=ray.maxt)


def _instances_closest(geom: GeometryTables, ray: Ray, t_best, uv_b,
                       prim_b, valid_b):
    """Exact closest-hit against every instance via the per-group walk
    (trace-time loop over instances; groups shared). Merges into the
    incoming best record; instanced prims are virtual ids >= n_tris."""
    u_b, v_b = uv_b
    for ii, gi in enumerate(geom.inst_gid):
        sub = geom.inst_groups[gi]
        r2 = _xf_ray(ray, geom.inst_xf_inv[ii])
        r2 = replace(r2, maxt=jnp.minimum(r2.maxt, t_best))
        t, u, v, p, ok = _closest_bvh(sub, r2)
        closer = ok & (t < t_best)
        vp = geom.inst_vp_base[ii] + geom.inst_tri2virt[gi][
            jnp.clip(p, 0, sub.n_tris - 1)]
        t_best = jnp.where(closer, t, t_best)
        u_b = jnp.where(closer, u, u_b)
        v_b = jnp.where(closer, v, v_b)
        prim_b = jnp.where(closer, vp, prim_b)
        valid_b = valid_b | closer
    return t_best, u_b, v_b, prim_b, valid_b


def _instances_any(geom: GeometryTables, ray: Ray):
    occ = jnp.zeros(ray.o.shape[0], bool)
    for ii, gi in enumerate(geom.inst_gid):
        sub = geom.inst_groups[gi]
        r2 = _xf_ray(ray, geom.inst_xf_inv[ii])
        occ = occ | _any_bvh(sub, r2)
    return occ


def _any_bvh(geom: GeometryTables, ray: Ray):
    if _use_pallas():
        t, u, v, prim, valid = _walk_phased(geom, ray, any_hit=True)
        return valid
    return _any_bvh_unrolled(geom, ray)


def _any_bvh_unrolled(geom: GeometryTables, ray: Ray):
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


def _stream_on() -> bool:
    """Work-list v4 (per-row ordered streaming) kill switch: set
    MTS_STREAM=0 to fall back to the v2/v3 item-grid work-list."""
    import os

    return os.environ.get("MTS_STREAM", "1") != "0"


def _force_exact() -> bool:
    """MTS_FORCE_EXACT=1: run the exact-cull cluster path in Pallas
    interpret mode on non-TPU backends. The v5 row build (128-lane row
    population, retier compaction, overflow fallbacks) is population-
    dependent; this lets the sharded==single equality test exercise it
    on the virtual CPU mesh instead of only the XLA walk."""
    import os

    return os.environ.get("MTS_FORCE_EXACT", "0") == "1"


def _exact_on() -> bool:
    """Work-list v5 (exact-cull item stream) kill switch: set MTS_EXACT=0
    to fall back to v4/v3. v5 culls exactly per lane (hierarchical
    refine kernels) and streams front-to-back 8-tri clusters with
    pipeline-prefetched blocks — ~10x v4 on incoherent bounce rays."""
    import os

    return os.environ.get("MTS_EXACT", "1") != "0"


def _overflow_fb() -> str:
    """Cluster-backend overflow fallback: 'pallas' packet-BVH kernel
    (default) or 'xla' packed-row walk (env MTS_OVERFLOW_FB).

    The XLA per-lane walk is only safe for near-empty fallback sets: on
    ~1M-lane incoherent bounce wavefronts (depth>=3 diffuse bounces, where
    most rows overflow the cull beams) its giant gather graph reproducibly
    crashes the TPU worker process — measured on config-3, and the same
    failure PERF_NOTES.md recorded for the pre-packing walk. The packet
    kernel handles both extremes, so it is the default."""
    import os

    return os.environ.get("MTS_OVERFLOW_FB", "pallas")


def _rootcap_on() -> bool:
    """Root-exit maxt capping kill switch (MTS_ROOTCAP=0 disables)."""
    import os

    return os.environ.get("MTS_ROOTCAP", "1") != "0"


def _cap_root_exit(geom: GeometryTables, ray: Ray) -> Ray:
    """Clamp maxt to the root-AABB exit distance (dead where the root box
    is missed). Semantically free for triangle queries — nothing lies
    outside the root — but it tightens every per-lane slab footprint in
    the exact cull: escaping bounce rays and envmap NEE shadow rays
    otherwise carry maxt=inf and accumulate candidates along their whole
    infinite extent (more items per row, more capacity overflow)."""
    lo = geom.bvh_min[0][None]
    hi = geom.bvh_max[0][None]
    inv = jnp.where(jnp.abs(ray.d) > 1e-12, 1.0 / ray.d, 3e38)
    t0 = (lo - ray.o) * inv
    t1 = (hi - ray.o) * inv
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    # small relative+absolute slack: the cull/kernels recompute slabs
    # with different op orders; a hit exactly at the boundary must stay
    # inside the capped interval
    cap = tf * 1.0002 + 1e-5
    hit = (tf >= jnp.maximum(tn, ray.mint)) & (tf > 0)
    return replace(ray, maxt=jnp.where(hit, jnp.minimum(ray.maxt, cap),
                                       -1.0))


def _fallback_closest(geom: GeometryTables, ray: Ray, t, u, v, prim,
                      valid, lane_ovf, use_pallas_fb: bool = True):
    """Re-resolve overflow lanes of a partial work-list result through a
    complete backend and merge (shared by the v3 and v5 dispatch arms).

    An overflow lane holds a PARTIAL result: any hit it found is a true
    hit and therefore an UPPER bound on the nearest distance (only a
    subset of clusters was tested) — the fallback walk's maxt is capped
    with it so the packet walk prunes everything behind it. When NO lane
    overflowed (the common case for the exact v5 cull) the entire
    fallback launch is skipped via lax.cond."""
    fb_maxt = jnp.where(valid & jnp.isfinite(t), t, ray.maxt)
    fb_ray = replace(ray, maxt=jnp.where(lane_ovf, fb_maxt, -1.0))

    def run(fb_ray):
        if use_pallas_fb:
            from mitsuba_tpu.ops import bvh_pallas as bp

            tf_, uf, vf, pf, okf = bp.bvh_closest(
                geom.bvh_rows, geom.tri_rows, fb_ray.o, fb_ray.d,
                fb_ray.mint, fb_ray.maxt,
                n_nodes=geom.bvh_min.shape[0], n_tris=geom.n_tris)
        else:
            tf_, uf, vf, pf, okf = _closest_bvh(geom, fb_ray)
        if geom.has_instances:
            # the static walk doesn't see instances: extend the fallback
            # with the exact per-instance walks (virtual prim ids)
            tf_, uf, vf, pf, okf = _instances_closest(
                geom, fb_ray, tf_, (uf, vf), pf, okf)
        return tf_, uf, vf, pf, okf

    def skip(fb_ray):
        z = jnp.zeros_like(t)
        return z, z, z, jnp.zeros_like(prim), jnp.zeros_like(valid)

    tf_, uf, vf, pf, okf = jax.lax.cond(jnp.any(lane_ovf), run, skip,
                                        fb_ray)
    # keep the NEARER of the work-list result (a true hit, possibly not
    # the nearest in an overflow row) and the fallback walk
    take_fb = lane_ovf & okf & (~valid | (tf_ < t))
    t = jnp.where(take_fb, tf_, t)
    u = jnp.where(take_fb, uf, u)
    v = jnp.where(take_fb, vf, v)
    prim = jnp.where(take_fb, pf, prim)
    valid = jnp.where(lane_ovf, okf | valid, valid)
    return t, u, v, prim, valid


def _fallback_any(geom: GeometryTables, ray: Ray, occ, lane_ovf,
                  use_pallas_fb: bool = True):
    """Any-hit analog of _fallback_closest: occluded overflow lanes
    stand (any hit is a hit); unoccluded overflow lanes re-test through
    a complete backend, skipped entirely when none overflowed."""
    lane_ovf = lane_ovf & ~occ
    fb_ray = replace(ray, maxt=jnp.where(lane_ovf, ray.maxt, -1.0))

    def run(fb_ray):
        if use_pallas_fb:
            from mitsuba_tpu.ops import bvh_pallas as bp

            fb = bp.bvh_any(
                geom.bvh_rows, geom.tri_rows, fb_ray.o, fb_ray.d,
                fb_ray.mint, fb_ray.maxt,
                n_nodes=geom.bvh_min.shape[0], n_tris=geom.n_tris)
        else:
            fb = _any_bvh(geom, fb_ray)
        if geom.has_instances:
            fb = fb | _instances_any(geom, fb_ray)
        return fb

    fb = jax.lax.cond(jnp.any(lane_ovf), run,
                      lambda r: jnp.zeros_like(occ), fb_ray)
    return occ | (fb & lane_ovf)


def _retier_perm(lane_ovf, n):
    """Row-compaction permutation putting overflow rows first.

    Returns (lane_perm (R*128,), inv (R*128,)): gathering rays through
    lane_perm concentrates all overflow rows at the front, so the XL
    re-run only materializes the first R_XL rows (capacity below)."""
    R = -(-n // LANE_ROW)
    pad = R * LANE_ROW - n
    ovf_p = jnp.pad(lane_ovf, (0, pad))
    row_ovf = jnp.any(ovf_p.reshape(R, LANE_ROW), axis=1)
    row_order = jnp.argsort(~row_ovf)        # stable: overflow rows first
    lane_perm = (row_order[:, None] * LANE_ROW
                 + jnp.arange(LANE_ROW, dtype=row_order.dtype)[None]
                 ).reshape(-1)
    inv = jnp.zeros(R * LANE_ROW, lane_perm.dtype).at[lane_perm].set(
        jnp.arange(R * LANE_ROW, dtype=lane_perm.dtype),
        unique_indices=True)
    return lane_perm, inv


LANE_ROW = 128


def _retier_on() -> bool:
    """XL middle tier kill switch (MTS_RETIER=0 routes overflow rows
    straight to the compacted complete stream fallback)."""
    import os

    return os.environ.get("MTS_RETIER", "1") != "0"


def _retier_capacity(n):
    """XL-tier row budget: 1/16 of the wavefront's rows (measured
    overflow runs ~4 % of rows on config-3 bounce wavefronts, round-4
    exp_r4_body — the previous 1/8 budget doubled the XL re-run's
    compacted width for headroom that was never used); rows beyond it
    stay flagged for the complete stream fallback."""
    R = -(-n // LANE_ROW)
    return max(8, R // 16)


def _retier_closest(geom: GeometryTables, ray: Ray, t, u, v, prim, valid,
                    lane_ovf, interp: bool = False):
    """Re-resolve CAPS_DIFFUSE-overflow rows at CAPS_XL on a row-
    compacted, CAPACITY-BOUNDED ray subset (~4 % of bounce rows
    overflow; the complete-backend fallback they previously hit cost
    more than the whole main query). Returns merged results + the
    residual (XL-overflow or beyond-capacity) lane mask."""
    from mitsuba_tpu.ops import exact_pallas as ep

    n = ray.o.shape[0]
    r_xl = _retier_capacity(n)
    m_xl = r_xl * LANE_ROW

    def run(args):
        t, u, v, prim, valid, lane_ovf = args
        perm, inv = _retier_perm(lane_ovf, n)
        sel = perm[:m_xl]
        fb_maxt = jnp.where(valid & jnp.isfinite(t), t, ray.maxt)
        mx = jnp.where(lane_ovf, fb_maxt, -1.0)

        def g(x, fill=0.0):
            xp = jnp.pad(x, ((0, perm.shape[0] - n),) + ((0, 0),)
                         * (x.ndim - 1), constant_values=fill)
            return xp[sel]

        xl = geom.ex_caps[2] if geom.ex_caps else ep.CAPS_XL
        t2, u2, v2, p2, ok2, ovf2 = ep.exact_closest(
            geom.ex_tables, g(ray.o), g(ray.d), g(ray.mint, 1.0),
            g(mx, -1.0), caps=xl, interpret=interp)

        # map back: original lane i sits at rank inv[i]; ranks >= m_xl
        # were not re-run (beyond capacity) and stay overflowed. ONE
        # packed (m_xl, 6) row-gather instead of six full-wavefront
        # gathers (law 1: these are (N,)-sized, ~11 ms each)
        rk = inv[:n]
        in_xl = rk < m_xl
        rkc = jnp.minimum(rk, m_xl - 1)
        pk = jnp.stack(
            [t2, u2, v2,
             jax.lax.bitcast_convert_type(p2, jnp.float32),
             ok2.astype(jnp.float32), ovf2.astype(jnp.float32)],
            axis=1)[rkc]
        t2 = pk[:, 0]
        u2 = pk[:, 1]
        v2 = pk[:, 2]
        p2 = jax.lax.bitcast_convert_type(pk[:, 3], jnp.int32)
        ok2 = (pk[:, 4] > 0.5) & in_xl
        ovf2 = pk[:, 5] > 0.5
        take = lane_ovf & ok2 & (~valid | (t2 < t))
        t = jnp.where(take, t2, t)
        u = jnp.where(take, u2, u)
        v = jnp.where(take, v2, v)
        prim = jnp.where(take, p2, prim)
        resolved = lane_ovf & in_xl & ~ovf2
        valid = jnp.where(resolved, ok2 | valid, valid)
        residual = lane_ovf & (~in_xl | ovf2)
        return t, u, v, prim, valid, residual

    def skip(args):
        return args

    return jax.lax.cond(jnp.any(lane_ovf), run, skip,
                        (t, u, v, prim, valid, lane_ovf))


def _retier_any(geom: GeometryTables, ray: Ray, occ, lane_ovf,
                interp: bool = False):
    """Any-hit analog of _retier_closest."""
    from mitsuba_tpu.ops import exact_pallas as ep

    n = ray.o.shape[0]
    r_xl = _retier_capacity(n)
    m_xl = r_xl * LANE_ROW

    def run(args):
        occ, lane_ovf = args
        todo = lane_ovf & ~occ
        perm, inv = _retier_perm(todo, n)
        sel = perm[:m_xl]
        mx = jnp.where(todo, ray.maxt, -1.0)

        def g(x, fill=0.0):
            xp = jnp.pad(x, ((0, perm.shape[0] - n),) + ((0, 0),)
                         * (x.ndim - 1), constant_values=fill)
            return xp[sel]

        xl = geom.ex_caps[2] if geom.ex_caps else ep.CAPS_XL
        occ2, ovf2 = ep.exact_any(
            geom.ex_tables, g(ray.o), g(ray.d), g(ray.mint, 1.0),
            g(mx, -1.0), caps=xl, interpret=interp)
        rk = inv[:n]
        in_xl = rk < m_xl
        rkc = jnp.minimum(rk, m_xl - 1)
        pk = jnp.stack([occ2.astype(jnp.float32),
                        ovf2.astype(jnp.float32)], axis=1)[rkc]
        occ2 = (pk[:, 0] > 0.5) & in_xl
        ovf2 = pk[:, 1] > 0.5
        return occ | (occ2 & todo), todo & (~in_xl | ovf2) & ~occ2

    def skip(args):
        return args

    return jax.lax.cond(jnp.any(lane_ovf), run, skip, (occ, lane_ovf))


def _fallback_closest_stream(geom: GeometryTables, ray: Ray, t, u, v,
                             prim, valid, lane_ovf,
                             interp: bool = False):
    """Complete re-resolve of residual overflow lanes via the v4
    streaming intersector (full per-row lists, ordered early exit, no
    capacity). Rows are row-compacted to a 1/8 capacity first — the
    stream call's fixed costs (full-width conservative build + one grid
    step per row) were ~360 ms on a full 1M-lane set when only a few %%
    of rows needed it. Residuals beyond capacity re-run on the full set
    (pathological; practically never)."""
    from mitsuba_tpu.ops import stream_pallas as sp

    n = ray.o.shape[0]
    r_xl = _retier_capacity(n)
    m_xl = r_xl * LANE_ROW
    fb_maxt = jnp.where(valid & jnp.isfinite(t), t, ray.maxt)
    mx_all = jnp.where(lane_ovf, fb_maxt, -1.0)

    def merge(t, u, v, prim, valid, tf_, uf, vf, pf, okf):
        take = lane_ovf & okf & (~valid | (tf_ < t))
        return (jnp.where(take, tf_, t), jnp.where(take, uf, u),
                jnp.where(take, vf, v), jnp.where(take, pf, prim),
                jnp.where(lane_ovf, okf | valid, valid))

    def run(args):
        t, u, v, prim, valid = args
        perm, inv = _retier_perm(lane_ovf, n)
        n_rows_ovf = jnp.sum(jnp.any(
            jnp.pad(lane_ovf, (0, perm.shape[0] - n)).reshape(
                -1, LANE_ROW), axis=1))

        def compacted(_):
            sel = perm[:m_xl]

            def g(x, fill=0.0):
                xp = jnp.pad(x, ((0, perm.shape[0] - n),) + ((0, 0),)
                             * (x.ndim - 1), constant_values=fill)
                return xp[sel]

            tf_, uf, vf, pf, okf = sp.stream_closest(
                geom.st_tables, g(ray.o), g(ray.d), g(ray.mint, 1.0),
                g(mx_all, -1.0), interpret=interp)
            rk = inv[:n]
            rkc = jnp.minimum(rk, m_xl - 1)
            in_xl = rk < m_xl
            # one packed row-gather for the rank map (see _retier_closest)
            pk = jnp.stack(
                [tf_, uf, vf,
                 jax.lax.bitcast_convert_type(pf, jnp.float32),
                 okf.astype(jnp.float32)], axis=1)[rkc]
            return (pk[:, 0], pk[:, 1], pk[:, 2],
                    jax.lax.bitcast_convert_type(pk[:, 3], jnp.int32),
                    (pk[:, 4] > 0.5) & in_xl)

        def full(_):
            return sp.stream_closest(geom.st_tables, ray.o, ray.d,
                                     ray.mint, mx_all, interpret=interp)

        tf_, uf, vf, pf, okf = jax.lax.cond(n_rows_ovf <= r_xl,
                                            compacted, full, 0)
        return merge(t, u, v, prim, valid, tf_, uf, vf, pf, okf)

    def skip(args):
        return args

    return jax.lax.cond(jnp.any(lane_ovf), run, skip,
                        (t, u, v, prim, valid))


def _fallback_any_stream(geom: GeometryTables, ray: Ray, occ, lane_ovf,
                         interp: bool = False):
    """Any-hit analog of _fallback_closest_stream (row-compacted)."""
    from mitsuba_tpu.ops import stream_pallas as sp

    n = ray.o.shape[0]
    r_xl = _retier_capacity(n)
    m_xl = r_xl * LANE_ROW
    lane_ovf = lane_ovf & ~occ
    mx_all = jnp.where(lane_ovf, ray.maxt, -1.0)

    def run(occ):
        perm, inv = _retier_perm(lane_ovf, n)
        n_rows_ovf = jnp.sum(jnp.any(
            jnp.pad(lane_ovf, (0, perm.shape[0] - n)).reshape(
                -1, LANE_ROW), axis=1))

        def compacted(_):
            sel = perm[:m_xl]

            def g(x, fill=0.0):
                xp = jnp.pad(x, ((0, perm.shape[0] - n),) + ((0, 0),)
                             * (x.ndim - 1), constant_values=fill)
                return xp[sel]

            fb = sp.stream_any(geom.st_tables, g(ray.o), g(ray.d),
                               g(ray.mint, 1.0), g(mx_all, -1.0),
                               interpret=interp)
            rk = inv[:n]
            return fb[jnp.minimum(rk, m_xl - 1)] & (rk < m_xl)

        def full(_):
            return sp.stream_any(geom.st_tables, ray.o, ray.d, ray.mint,
                                 mx_all, interpret=interp)

        fb = jax.lax.cond(n_rows_ovf <= r_xl, compacted, full, 0)
        return occ | (fb & lane_ovf)

    return jax.lax.cond(jnp.any(lane_ovf), run, lambda occ: occ, occ)


def _ray_intersect_tri(geom: GeometryTables, ray: Ray,
                       coherent: bool = False) -> Intersection:
    """Triangle-only closest-hit query → full Intersection record
    (reference skdtree.h:352 fillIntersectionRecord equivalent).
    coherent: camera/low-divergence wavefront hint — the exact-cull
    backend then builds at the small CAPS_COHERENT capacity preset
    (the build cost scales with the caps)."""
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
    if geom.backend == "cluster" and (_use_pallas() or _force_exact()) \
            and not geom.has_instances and _exact_on() \
            and geom.ex_tri is not None:
        # exact-cull item stream (work-list v5): per-lane exact
        # hierarchical cull -> front-to-back 8-tri cluster lists,
        # pipeline-prefetched flat item kernel (ops/exact_pallas.py).
        # Rows whose true candidate count exceeds a cap hold a PARTIAL
        # result (subset tested) and re-resolve via the packet-BVH walk.
        from mitsuba_tpu.ops import exact_pallas as ep

        interp = not _use_pallas()
        if _rootcap_on():
            ray = _cap_root_exit(geom, ray)
        dif, coh, _xl = geom.ex_caps or (ep.CAPS_DIFFUSE,
                                         ep.CAPS_COHERENT, ep.CAPS_XL)
        t, u, v, prim, valid, lane_ovf = ep.exact_closest(
            geom.ex_tables, ray.o, ray.d, ray.mint, ray.maxt,
            caps=coh if coherent else dif, interpret=interp)
        lane_ovf = lane_ovf & (ray.mint <= ray.maxt)
        if _retier_on():
            t, u, v, prim, valid, lane_ovf = _retier_closest(
                geom, ray, t, u, v, prim, valid, lane_ovf,
                interp=interp)
        t, u, v, prim, valid = _fallback_closest_stream(
            geom, ray, t, u, v, prim, valid, lane_ovf, interp=interp)
    elif geom.backend == "cluster" and _use_pallas() \
            and not geom.has_instances and _stream_on():
        # per-row ordered streaming kernel (work-list v4): complete
        # front-to-back SC lists + run-time early exit — no overflow,
        # no fallback (ops/stream_pallas.py)
        from mitsuba_tpu.ops import stream_pallas as sp

        t, u, v, prim, valid = sp.stream_closest(
            geom.st_tables, ray.o, ray.d, ray.mint, ray.maxt)
    elif geom.backend == "cluster" and _use_pallas():
        from mitsuba_tpu.ops import worklist_pallas as wp

        t, u, v, prim, valid, ovf = wp.wl_closest(
            geom.wl_tables, ray.o, ray.d, ray.mint, ray.maxt,
            w_factor=wp.DEFAULT_W_FACTOR, l_sc=wp.DEFAULT_L_SC)
        # rows that overflowed a cull beam carry a lower bound only:
        # re-resolve those lanes through a complete backend (the pallas
        # packet-BVH kernel by default -- see _overflow_fb)
        lane_ovf = jnp.repeat(ovf, wp.LANES)[:ray.o.shape[0]] & (
            ray.mint <= ray.maxt)
        t, u, v, prim, valid = _fallback_closest(
            geom, ray, t, u, v, prim, valid, lane_ovf,
            use_pallas_fb=_overflow_fb() == "pallas")
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
        if geom.has_instances:
            t, u, v, prim, valid = _instances_closest(
                geom, ray, t, (u, v), prim, valid)
    else:
        t, u, v, prim, valid = _closest_brute(geom, ray)
    prim_raw = jnp.where(valid, prim, 0)
    is_inst = jnp.zeros_like(valid)
    if geom.has_instances:
        is_inst = valid & (prim_raw >= geom.n_tris)
    prim = jnp.where(is_inst, 0, prim_raw)
    p = ray.at(jnp.where(valid, t, 1.0))   # finite on miss (see above)
    w = 1.0 - u - v
    if geom.shade_pack is not None:
        # the whole shading record in ONE (N, 24) row-gather (field
        # layout: GeometryTables.shade_pack)
        sp_row = geom.shade_pack[prim]
        e1g, e2g = sp_row[:, 0:3], sp_row[:, 3:6]
        n0g, n1g, n2g = sp_row[:, 6:9], sp_row[:, 9:12], sp_row[:, 12:15]
        uv0g, uv1g, uv2g = (sp_row[:, 15:17], sp_row[:, 17:19],
                            sp_row[:, 19:21])
        material_id = jax.lax.bitcast_convert_type(sp_row[:, 21],
                                                   jnp.int32)
        emitter_id = jax.lax.bitcast_convert_type(sp_row[:, 22],
                                                  jnp.int32)
        shape_id = jax.lax.bitcast_convert_type(sp_row[:, 23], jnp.int32)
    else:
        e1g, e2g = geom.e1[prim], geom.e2[prim]
        n0g, n1g, n2g = geom.n0[prim], geom.n1[prim], geom.n2[prim]
        uv0g, uv1g, uv2g = geom.uv0[prim], geom.uv1[prim], geom.uv2[prim]
        material_id = geom.material_id[prim]
        emitter_id = geom.emitter_id[prim]
        shape_id = geom.shape_id[prim]
    geo_n = m.normalize(jnp.cross(e1g, e2g))
    sh_n = m.normalize(
        w[:, None] * n0g + u[:, None] * n1g + v[:, None] * n2g
    )
    uv = (
        w[:, None] * uv0g + u[:, None] * uv1g + v[:, None] * uv2g
    )
    if geom.has_instances:
        # virtual prims: decode (cluster, local) and shade from the shared
        # object-space block tables, rotating directions to world space
        # (contravariant via the forward 3x3, normals via the inverse
        # transpose = the stored world->object rows transposed)
        K = geom.mt_k
        vp = jnp.maximum(prim_raw - geom.n_tris, 0)
        vcid = geom.n_static_clusters + vp // K
        vcid = jnp.clip(vcid, 0, geom.mt_block_id.shape[0] - 1)
        oid = geom.mt_block_id[vcid] * K + vp % K
        fwd = geom.mt_xform_fwd[vcid]            # (N, 12) object->world
        inv = geom.mt_xform[vcid]                # (N, 16) world->object

        def rot_fwd(vec):
            return jnp.stack(
                [fwd[:, 0] * vec[:, 0] + fwd[:, 1] * vec[:, 1]
                 + fwd[:, 2] * vec[:, 2],
                 fwd[:, 4] * vec[:, 0] + fwd[:, 5] * vec[:, 1]
                 + fwd[:, 6] * vec[:, 2],
                 fwd[:, 8] * vec[:, 0] + fwd[:, 9] * vec[:, 1]
                 + fwd[:, 10] * vec[:, 2]], axis=-1)

        def rot_normal(nvec):
            # world normal ∝ M_wo^T n_obj  (M_wo = inverse linear part)
            return jnp.stack(
                [inv[:, 0] * nvec[:, 0] + inv[:, 4] * nvec[:, 1]
                 + inv[:, 8] * nvec[:, 2],
                 inv[:, 1] * nvec[:, 0] + inv[:, 5] * nvec[:, 1]
                 + inv[:, 9] * nvec[:, 2],
                 inv[:, 2] * nvec[:, 0] + inv[:, 6] * nvec[:, 1]
                 + inv[:, 10] * nvec[:, 2]], axis=-1)

        e1w = rot_fwd(geom.obj_e1[oid])
        e2w = rot_fwd(geom.obj_e2[oid])
        geo_n_i = m.normalize(jnp.cross(e1w, e2w))
        n_obj = (w[:, None] * geom.obj_n0[oid]
                 + u[:, None] * geom.obj_n1[oid]
                 + v[:, None] * geom.obj_n2[oid])
        sh_n_i = m.normalize(rot_normal(n_obj))
        uv_i = (w[:, None] * geom.obj_uv0[oid]
                + u[:, None] * geom.obj_uv1[oid]
                + v[:, None] * geom.obj_uv2[oid])
        mask = is_inst[:, None]
        geo_n = jnp.where(mask, geo_n_i, geo_n)
        sh_n = jnp.where(mask, sh_n_i, sh_n)
        uv = jnp.where(mask, uv_i, uv)
        material_id = jnp.where(is_inst, geom.obj_mid[oid], material_id)
        emitter_id = jnp.where(is_inst, -1, emitter_id)
        shape_id = jnp.where(is_inst, geom.obj_sid[oid], shape_id)
    # true parametric dp_du from the uv parameterization (reference
    # trimesh.cpp fillIntersectionRecord): solve [e1 e2] = [dp_du dp_dv]
    # * [duv1 duv2]; falls back to e1 for degenerate uv charts
    duv1 = uv1g - uv0g
    duv2 = uv2g - uv0g
    det_uv = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    ok_uv = jnp.abs(det_uv) > 1e-12
    inv_det = 1.0 / jnp.where(ok_uv, det_uv, 1.0)
    dp_du = jnp.where(
        ok_uv[:, None],
        (duv2[:, 1:2] * e1g - duv1[:, 1:2] * e2g)
        * inv_det[:, None],
        e1g)
    if geom.has_instances:
        duv1i = geom.obj_uv1[oid] - geom.obj_uv0[oid]
        duv2i = geom.obj_uv2[oid] - geom.obj_uv0[oid]
        det_i = duv1i[:, 0] * duv2i[:, 1] - duv1i[:, 1] * duv2i[:, 0]
        ok_i = jnp.abs(det_i) > 1e-12
        inv_i = 1.0 / jnp.where(ok_i, det_i, 1.0)
        dp_du_i = jnp.where(
            ok_i[:, None],
            (duv2i[:, 1:2] * e1w - duv1i[:, 1:2] * e2w) * inv_i[:, None],
            e1w)
        dp_du = jnp.where(is_inst[:, None], dp_du_i, dp_du)
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
        prim_id=jnp.where(valid, prim_raw, -1),
        shape_id=jnp.where(valid, shape_id, -1),
        material_id=jnp.where(valid, material_id, -1),
        emitter_id=jnp.where(valid, emitter_id, -1),
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
    if geom.backend == "cluster" and (_use_pallas() or _force_exact()) \
            and not geom.has_instances and _exact_on() \
            and geom.ex_tri is not None:
        from mitsuba_tpu.ops import exact_pallas as ep

        interp = not _use_pallas()
        if _rootcap_on():
            ray = _cap_root_exit(geom, ray)
        dif = (geom.ex_caps or (ep.CAPS_DIFFUSE,))[0]
        occ, lane_ovf = ep.exact_any(
            geom.ex_tables, ray.o, ray.d, ray.mint, ray.maxt, caps=dif,
            interpret=interp)
        lane_ovf = lane_ovf & (ray.mint <= ray.maxt)
        if _retier_on():
            occ, lane_ovf = _retier_any(geom, ray, occ, lane_ovf,
                                        interp=interp)
        return _fallback_any_stream(geom, ray, occ, lane_ovf,
                                    interp=interp)
    if geom.backend == "cluster" and _use_pallas() \
            and not geom.has_instances and _stream_on():
        from mitsuba_tpu.ops import stream_pallas as sp

        return sp.stream_any(geom.st_tables, ray.o, ray.d, ray.mint,
                             ray.maxt)
    if geom.backend == "cluster" and _use_pallas():
        from mitsuba_tpu.ops import worklist_pallas as wp

        occ, ovf = wp.wl_any(
            geom.wl_tables, ray.o, ray.d, ray.mint, ray.maxt,
            w_factor=wp.DEFAULT_W_FACTOR, l_sc=wp.DEFAULT_L_SC)
        lane_ovf = jnp.repeat(ovf, wp.LANES)[:ray.o.shape[0]] & (
            ray.mint <= ray.maxt)
        return _fallback_any(geom, ray, occ, lane_ovf,
                             use_pallas_fb=_overflow_fb() == "pallas")
    if geom.backend in ("bvh", "cluster"):
        if _use_pallas():
            from mitsuba_tpu.ops import bvh_pallas as bp

            return bp.bvh_any(
                geom.bvh_rows, geom.tri_rows, ray.o, ray.d, ray.mint,
                ray.maxt, n_nodes=geom.bvh_min.shape[0],
                n_tris=geom.n_tris,
            )
        occ = _any_bvh(geom, ray)
        if geom.has_instances:
            occ = occ | _instances_any(geom, ray)
        return occ
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
    """(t, sphere_index, valid) of the nearest analytic sphere hit.

    Static Python loop over the (few) spheres with flat (N,) math: the
    previous (N, S, 3) formulation forced TPU minor-dim padding (S and 3
    pad toward (8, 128) tiles) — ONE sphere over 1M rays cost 45 ms; the
    flat loop is ~20 elementwise (N,) ops per sphere."""
    S = geom.sph_c.shape[0]
    t_best = jnp.full(ray.o.shape[0], jnp.inf)
    idx = jnp.zeros(ray.o.shape[0], jnp.int32)
    for si in range(S):
        c = geom.sph_c[si]
        r = geom.sph_r[si]
        oc = ray.o - c[None]
        b = jnp.sum(oc * ray.d, axis=-1)
        cq = jnp.sum(oc * oc, axis=-1) - r * r
        disc = b * b - cq
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        t = jnp.where(ok & (t0 > ray.mint), t0,
                      jnp.where(ok & (t1 > ray.mint), t1, jnp.inf))
        t = jnp.where(t < ray.maxt, t, jnp.inf)
        better = t < t_best
        t_best = jnp.where(better, t, t_best)
        idx = jnp.where(better, si, idx)
    return t_best, idx, jnp.isfinite(t_best)


def _cylinder_closest(geom: GeometryTables, ray: Ray):
    """(t, cyl_index, valid): finite open cylinder (no end caps —
    reference cylinder.cpp). Flat static loop — see _sphere_closest."""
    C = geom.cyl_a.shape[0]
    t_best = jnp.full(ray.o.shape[0], jnp.inf)
    idx = jnp.zeros(ray.o.shape[0], jnp.int32)
    for ci in range(C):
        a = geom.cyl_a[ci]
        ax = geom.cyl_b[ci] - a
        r = geom.cyl_r[ci]
        ln = jnp.maximum(jnp.linalg.norm(ax), 1e-12)
        u = ax / ln
        oc = ray.o - a[None]
        du = jnp.sum(ray.d * u[None], axis=-1)
        ou = jnp.sum(oc * u[None], axis=-1)
        dp = ray.d - du[:, None] * u[None]
        op = oc - ou[:, None] * u[None]
        A = jnp.maximum(jnp.sum(dp * dp, axis=-1), 1e-12)
        B = jnp.sum(dp * op, axis=-1)
        Cq = jnp.sum(op * op, axis=-1) - r * r
        disc = B * B - A * Cq
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = (-B - sq) / A
        t1 = (-B + sq) / A

        def axial_ok(t):
            s_ax = ou + t * du
            return (s_ax >= 0.0) & (s_ax <= ln)

        ok0 = ok & (t0 > ray.mint) & axial_ok(t0)
        ok1 = ok & (t1 > ray.mint) & axial_ok(t1)
        t = jnp.where(ok0, t0, jnp.where(ok1, t1, jnp.inf))
        t = jnp.where(t < ray.maxt, t, jnp.inf)
        better = t < t_best
        t_best = jnp.where(better, t, t_best)
        idx = jnp.where(better, ci, idx)
    return t_best, idx, jnp.isfinite(t_best)


def _pack_hair(hair):
    """Pack hair segments + their skip-link BVH into GeometryTables
    fields. hair: dict(a, b, r, u0, u1, mid, eid, sid) arrays."""
    from mitsuba_tpu.render.bvh import build_bvh_boxes

    a = np.asarray(hair["a"], np.float32)
    b = np.asarray(hair["b"], np.float32)
    r = np.asarray(hair["r"], np.float32)
    pmin = np.minimum(a, b) - r[:, None]
    pmax = np.maximum(a, b) + r[:, None]
    bvh = build_bvh_boxes(pmin, pmax)
    perm = bvh.perm
    segs = np.zeros((a.shape[0], 16), np.float32)
    segs[:, 0:3] = a[perm]
    segs[:, 3:6] = b[perm]
    segs[:, 6] = r[perm]
    segs[:, 7] = np.asarray(hair["u0"], np.float32)[perm]
    segs[:, 8] = np.asarray(hair["u1"], np.float32)[perm]
    segs[:, 9] = np.asarray(hair["mid"], np.float32)[perm]
    segs[:, 10] = np.asarray(hair["eid"], np.float32)[perm]
    segs[:, 11] = np.asarray(hair["sid"], np.float32)[perm]
    nodes = np.concatenate(
        [bvh.bounds_min, bvh.bounds_max,
         bvh.first[:, None].astype(np.float32),
         bvh.count[:, None].astype(np.float32),
         bvh.skip[:, None].astype(np.float32)], axis=1)
    return dict(hair_nodes=jnp.asarray(nodes), hair_segs=jnp.asarray(segs))


def _cyl_seg_hit(o, d, rows, mint, tcap):
    """Finite open-cylinder test of gathered segment rows (N, 16)
    against per-lane rays. Returns (t, axial_frac, valid)."""
    a = rows[:, 0:3]
    ax = rows[:, 3:6] - a
    r = rows[:, 6]
    ln = jnp.maximum(jnp.linalg.norm(ax, axis=-1), 1e-12)
    u = ax / ln[:, None]
    oc = o - a
    du = jnp.sum(d * u, axis=-1)
    ou = jnp.sum(oc * u, axis=-1)
    dp = d - du[:, None] * u
    op = oc - ou[:, None] * u
    A = jnp.maximum(jnp.sum(dp * dp, axis=-1), 1e-12)
    B = jnp.sum(dp * op, axis=-1)
    Cq = jnp.sum(op * op, axis=-1) - r * r
    disc = B * B - A * Cq
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-B - sq) / A
    t1 = (-B + sq) / A

    def axial_ok(t):
        s_ax = ou + t * du
        return (s_ax >= 0.0) & (s_ax <= ln)

    ok0 = ok & (t0 > mint) & axial_ok(t0)
    ok1 = ok & (t1 > mint) & axial_ok(t1)
    t = jnp.where(ok0, t0, jnp.where(ok1, t1, jnp.inf))
    valid = (ok0 | ok1) & (t < tcap)
    frac = jnp.clip((ou + t * du) / ln, 0.0, 1.0)
    return t, frac, valid


def _hair_walk(geom: GeometryTables, ray: Ray, any_hit: bool):
    """Phased skip-link walk over the hair segment BVH — same body
    shape as _walk_phased (one node gather + one segment gather per
    iteration) with the cylinder test in place of Moeller-Trumbore."""
    n = ray.o.shape[0]
    m_nodes = geom.hair_nodes.shape[0]
    n_segs = geom.hair_segs.shape[0]
    inv_d = m.safe_rcp(ray.d)
    nodes = geom.hair_nodes
    segs = geom.hair_segs
    cap = (MAX_LEAF + 1) * m_nodes + 8

    def cond(st):
        node, lf, lc, lk, steps, t_best, frac, prim, valid = st
        live = (node < m_nodes) | (lk < lc)
        if any_hit:
            live = live & ~valid
        return jnp.any(live) & (steps < cap)

    def body(st):
        node, lf, lc, lk, steps, t_best, frac_b, prim_b, valid = st
        in_leaf = lk < lc
        if any_hit:
            in_leaf = in_leaf & ~valid
        si = jnp.minimum(lf + jnp.minimum(lk, MAX_LEAF - 1), n_segs - 1)
        rows = segs[si]                         # one gather
        t, frac, hit = _cyl_seg_hit(ray.o, ray.d, rows, ray.mint,
                                    jnp.minimum(ray.maxt, t_best))
        closer = in_leaf & hit & (t < t_best)
        t_best = jnp.where(closer, t, t_best)
        frac_b = jnp.where(closer, frac, frac_b)
        prim_b = jnp.where(closer, si, prim_b)
        valid = valid | closer
        lk = jnp.where(in_leaf, lk + 1, lk)
        do_node = ~in_leaf & (node < m_nodes)
        if any_hit:
            do_node = do_node & ~valid
        nd = jnp.minimum(node, m_nodes - 1)
        row = nodes[nd]                         # one gather
        first = row[:, 6].astype(jnp.int32)
        count = row[:, 7].astype(jnp.int32)
        skip = row[:, 8].astype(jnp.int32)
        box_hit = do_node & _slab_test(row[:, 0:3], row[:, 3:6], ray.o,
                                       inv_d, ray.mint,
                                       jnp.minimum(ray.maxt, t_best))
        is_leaf = count > 0
        enter = box_hit & is_leaf
        lf = jnp.where(enter, first, lf)
        lc = jnp.where(enter, jnp.minimum(count, MAX_LEAF), lc)
        lk = jnp.where(enter, 0, lk)
        node = jnp.where(
            do_node, jnp.where(box_hit & ~is_leaf, nd + 1, skip), node)
        return (node, lf, lc, lk, steps + 1, t_best, frac_b, prim_b,
                valid)

    z = jnp.zeros(n, jnp.int32)
    st = (z, z, z, z, jnp.zeros((), jnp.int32),
          jnp.where(jnp.isfinite(ray.maxt), ray.maxt, jnp.inf),
          jnp.zeros(n), z, jnp.zeros(n, bool))
    st = jax.lax.while_loop(cond, body, st)
    return st[5], st[6], st[7], st[8]


def _hair_any(geom: GeometryTables, ray: Ray):
    _, _, _, valid = _hair_walk(geom, ray, any_hit=True)
    return valid


def _merge_hair(geom: GeometryTables, ray: Ray, its: Intersection):
    """Override the Intersection where a hair segment is nearer.
    uv: u = phi around the fiber, v = arclength along the fiber."""
    t, frac, si, valid = _hair_walk(geom, ray, any_hit=False)
    closer = valid & (t < its.t)
    rows = geom.hair_segs[si]
    a = rows[:, 0:3]
    ax = rows[:, 3:6] - a
    ln = jnp.maximum(jnp.linalg.norm(ax, axis=-1), 1e-12)
    u_ax = ax / ln[:, None]
    p = ray.at(jnp.where(closer, t, 1.0))
    s_ax = jnp.sum((p - a) * u_ax, axis=-1)
    nrm = m.normalize(p - a - s_ax[:, None] * u_ax)
    frame_phi = m.Frame.from_normal(u_ax)
    lp = frame_phi.to_local(nrm)
    phi = jnp.arctan2(lp[:, 1], lp[:, 0])
    v_par = rows[:, 7] + frac * (rows[:, 8] - rows[:, 7])
    uv = jnp.stack([phi * (0.5 / jnp.pi) + 0.5, v_par], -1)
    dpdu = m.normalize(jnp.cross(u_ax, nrm))
    frame = m.Frame.from_normal_tangent(nrm, dpdu)
    wi = frame.to_local(-ray.d)
    base = geom.n_tris + geom.n_spheres + geom.n_cylinders
    c2 = closer[:, None]
    return Intersection(
        valid=its.valid | closer,
        t=jnp.where(closer, t, its.t),
        p=jnp.where(c2, p, its.p),
        geo_n=jnp.where(c2, nrm, its.geo_n),
        sh_n=jnp.where(c2, nrm, its.sh_n),
        uv=jnp.where(c2, uv, its.uv),
        dp_du=jnp.where(c2, dpdu, its.dp_du),
        wi=jnp.where(c2, wi, its.wi),
        prim_id=jnp.where(closer, base + si, its.prim_id),
        shape_id=jnp.where(closer, rows[:, 11].astype(jnp.int32),
                           its.shape_id),
        material_id=jnp.where(closer, rows[:, 9].astype(jnp.int32),
                              its.material_id),
        emitter_id=jnp.where(closer, rows[:, 10].astype(jnp.int32),
                             its.emitter_id),
    )


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


def ray_intersect(geom: GeometryTables, ray: Ray,
                  coherent: bool = False) -> Intersection:
    """Closest-hit query → full Intersection record; triangles via the
    backend kernels, analytic primitives merged in XLA. coherent: see
    _ray_intersect_tri."""
    its = _ray_intersect_tri(geom, ray, coherent=coherent)
    if geom.has_analytic:
        its = _merge_analytic(geom, ray, its)
    if geom.n_hair > 0:
        its = _merge_hair(geom, ray, its)
    return its


def ray_test(geom: GeometryTables, ray: Ray) -> jnp.ndarray:
    """Any-hit (shadow ray) query → bool occlusion mask (reference
    scene.h:241 isOccluded equivalent)."""
    occ = _ray_test_tri(geom, ray)
    if geom.has_analytic:
        occ = occ | _analytic_any(geom, ray)
    if geom.n_hair > 0:
        occ = occ | _hair_any(geom, ray)
    return occ


def ray_intersect_and_test(geom: GeometryTables, ray: Ray, sray: Ray):
    """Fused closest-hit (ray) + shadow any-hit (sray) — one Pallas launch
    with a shared triangle loop on the TPU brute path; separate queries
    elsewhere.  Returns (Intersection, occluded)."""
    its, occ = _ray_intersect_and_test_tri(geom, ray, sray)
    if geom.has_analytic:
        its = _merge_analytic(geom, ray, its)
        occ = occ | _analytic_any(geom, sray)
    if geom.n_hair > 0:
        its = _merge_hair(geom, ray, its)
        occ = occ | _hair_any(geom, sray)
    return its, occ
