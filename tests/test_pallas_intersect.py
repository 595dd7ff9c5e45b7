"""Pallas brute-force intersector vs the XLA oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.ops import intersect_pallas as ip
from mitsuba_tpu.render.intersect import _any_brute, _closest_brute, build_geometry
from mitsuba_tpu.render.records import Ray
from tests.test_intersect import random_mesh, random_rays


def test_pallas_closest_matches_oracle():
    msh = random_mesh(0, 60)
    geom = build_geometry([(msh, 0, -1)], backend="brute")
    ray = random_rays(1, 700)
    t0, u0, v0, p0, h0 = _closest_brute(geom, ray)
    table = ip.make_tri_table(geom.v0, geom.e1, geom.e2)
    t1, u1, v1, p1, h1 = ip.closest_hit(
        table, ray.o, ray.d, ray.mint, ray.maxt, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
    hit = np.asarray(h0)
    np.testing.assert_allclose(np.asarray(t0)[hit], np.asarray(t1)[hit], rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(p0)[hit], np.asarray(p1)[hit])
    np.testing.assert_allclose(np.asarray(u0)[hit], np.asarray(u1)[hit], atol=2e-5)


def test_pallas_any_matches_oracle():
    msh = random_mesh(2, 40)
    geom = build_geometry([(msh, 0, -1)], backend="brute")
    ray = random_rays(3, 900)
    a0 = _any_brute(geom, ray)
    table = ip.make_tri_table(geom.v0, geom.e1, geom.e2)
    a1 = ip.any_hit(table, ray.o, ray.d, ray.mint, ray.maxt, interpret=True)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))


def test_pallas_respects_mint_maxt():
    from mitsuba_tpu.core.types import replace
    from mitsuba_tpu.render import mesh as mesh_mod

    box = mesh_mod.make_box([-1, -1, -1], [1, 1, 1])
    geom = build_geometry([(box, 0, -1)], backend="brute")
    table = ip.make_tri_table(geom.v0, geom.e1, geom.e2)
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[1.0, 0, 0]])
    _, _, _, _, hit = ip.closest_hit(
        table, o, d, jnp.asarray([1.5]), jnp.asarray([jnp.inf]), interpret=True
    )
    assert not bool(hit[0])
    _, _, _, _, hit = ip.closest_hit(
        table, o, d, jnp.asarray([1e-4]), jnp.asarray([0.5]), interpret=True
    )
    assert not bool(hit[0])


def test_pallas_shaded_matches_record():
    """Fused shading kernel must reproduce ray_intersect's record fields."""
    from mitsuba_tpu.ops.intersect_pallas import closest_hit_shaded, make_shading_table
    from mitsuba_tpu.render.intersect import ray_intersect

    msh = random_mesh(7, 80)
    geom = build_geometry([(msh, 3, 1)], backend="brute")
    ray = random_rays(8, 600)
    its = ray_intersect(geom, ray)     # CPU reference path (no pallas)
    table = make_shading_table(geom)
    r = closest_hit_shaded(table, ray.o, ray.d, ray.mint, ray.maxt,
                           interpret=True)
    hit = np.asarray(its.valid)
    np.testing.assert_array_equal(hit, np.asarray(r["valid"]))
    np.testing.assert_allclose(
        np.asarray(its.t)[hit], np.asarray(r["t"])[hit], rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(its.geo_n)[hit], np.asarray(r["geo_n"])[hit], atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(its.sh_n)[hit], np.asarray(r["sh_n"])[hit], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(its.uv)[hit], np.asarray(r["uv"])[hit], atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(r["material_id"])[hit], 3
    )
    np.testing.assert_array_equal(np.asarray(r["emitter_id"])[hit], 1)


def test_packet_bvh_matches_oracle():
    """Packet-traversal kernel vs the XLA BVH walk (interpret mode)."""
    from mitsuba_tpu.ops.bvh_pallas import bvh_any, bvh_closest
    from mitsuba_tpu.render.intersect import _any_bvh, _closest_bvh

    msh = random_mesh(11, 300)
    geom = build_geometry([(msh, 0, -1)], backend="bvh")
    ray = random_rays(12, 800)
    t0, u0, v0, p0, h0 = _closest_bvh(geom, ray)
    t1, u1, v1, p1, h1 = bvh_closest(
        geom.bvh_packed, geom.tri_packed, ray.o, ray.d, ray.mint, ray.maxt,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
    hit = np.asarray(h0)
    np.testing.assert_allclose(
        np.asarray(t0)[hit], np.asarray(t1)[hit], rtol=3e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(p0)[hit], np.asarray(p1)[hit])
    a0 = _any_bvh(geom, ray)
    a1 = bvh_any(geom.bvh_packed, geom.tri_packed, ray.o, ray.d, ray.mint,
                 ray.maxt, interpret=True)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))


def test_host_row_packing_matches_device_packing():
    """GeometryTables' host-side packed rows must equal ops.bvh_pallas'
    traceable pack_records (an all-zero host packing once crashed the TPU
    worker via an infinite traversal loop)."""
    from mitsuba_tpu.ops.bvh_pallas import pack_records

    msh = random_mesh(13, 150)
    geom = build_geometry([(msh, 0, -1)], backend="bvh")
    np.testing.assert_array_equal(
        np.asarray(geom.bvh_rows), np.asarray(pack_records(geom.bvh_packed))
    )
    np.testing.assert_array_equal(
        np.asarray(geom.tri_rows), np.asarray(pack_records(geom.tri_packed))
    )
    assert np.abs(np.asarray(geom.bvh_rows)).sum() > 0


def test_fused_shaded_and_any_matches_separate():
    """closest_hit_shaded_and_any == (closest_hit_shaded, any_hit) on the
    same ray sets (interpret mode)."""
    import numpy as np

    from mitsuba_tpu.ops.intersect_pallas import (
        any_hit, closest_hit_shaded, closest_hit_shaded_and_any,
        make_shading_table,
    )
    from mitsuba_tpu.render.scene import cornell_box

    scene = cornell_box(width=8, height=8)
    table = make_shading_table(scene.geom)
    rng = np.random.default_rng(0)
    n = 257   # non-multiple of tile size exercises padding
    o = jnp.asarray(rng.uniform(50, 500, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    so = jnp.asarray(rng.uniform(50, 500, (n, 3)), jnp.float32)
    sd = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    sd = sd / jnp.linalg.norm(sd, axis=1, keepdims=True)
    mint = jnp.full((n,), 1e-3)
    maxt = jnp.full((n,), 1e6)
    smaxt = jnp.asarray(rng.uniform(10, 2000, (n,)), jnp.float32)
    rec, occ = closest_hit_shaded_and_any(
        table, o, d, mint, maxt, so, sd, mint, smaxt, interpret=True)
    ref = closest_hit_shaded(table, o, d, mint, maxt, interpret=True)
    occ_ref = any_hit(table[:, :9], so, sd, mint, smaxt, interpret=True)
    np.testing.assert_array_equal(np.asarray(rec["prim"]), np.asarray(ref["prim"]))
    np.testing.assert_allclose(np.asarray(rec["t"]), np.asarray(ref["t"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rec["sh_n"]), np.asarray(ref["sh_n"]), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(rec["material_id"]),
                                  np.asarray(ref["material_id"]))
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_ref))
    # maxt = -1 shadow rays never occlude (the deferred-NEE dead-lane case)
    _, occ2 = closest_hit_shaded_and_any(
        table, o, d, mint, maxt, so, sd, mint, jnp.full((n,), -1.0),
        interpret=True)
    assert not bool(np.asarray(occ2).any())
