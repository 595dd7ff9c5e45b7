"""Work-list v4 (per-row ordered streaming, ops/stream_pallas.py):
closest/any-hit vs the brute-force oracle, interpret mode on CPU.

Covers: multi-row wavefronts, dead lanes (maxt < mint), miss rays,
finite shadow segments, and the virtual->true prim mapping through
tri_start (clusters with variable true counts)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.ops import stream_pallas as sp
from mitsuba_tpu.render.intersect import (
    GeometryTables, _any_brute, _closest_brute, build_geometry,
)
from mitsuba_tpu.render.mesh import TriMesh
from mitsuba_tpu.render.records import Ray


def _rand_mesh(n_tri, seed, scale=1.0, offset=(0, 0, 0)):
    rng = np.random.RandomState(seed)
    v0 = rng.rand(n_tri, 3) * scale + np.asarray(offset)
    e1 = (rng.rand(n_tri, 3) - 0.5) * 0.4 * scale
    e2 = (rng.rand(n_tri, 3) - 0.5) * 0.4 * scale
    verts = np.concatenate([v0, v0 + e1, v0 + e2]).astype(np.float32)
    faces = np.arange(3 * n_tri).reshape(3, n_tri).T.astype(np.int64)
    return TriMesh(vertices=verts, faces=faces)


@pytest.fixture(scope="module")
def geom():
    # two spatially separated blobs -> multiple superclusters
    m1 = _rand_mesh(333, 0)
    m2 = _rand_mesh(200, 1, scale=0.7, offset=(1.8, 0.3, -0.2))
    return build_geometry([(m1, 0, -1), (m2, 1, -1)], backend="cluster")


def _rays(n, seed, geom):
    rng = np.random.RandomState(seed)
    o = rng.rand(n, 3).astype(np.float32) * 3.0 - 0.5
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    mint = np.full(n, 1e-4, np.float32)
    maxt = np.full(n, 1e9, np.float32)
    # dead lanes + finite segments
    maxt[::7] = -1.0
    maxt[3::11] = rng.rand(((n - 4) // 11) + 1).astype(np.float32) * 2.0
    return Ray(o=jnp.asarray(o), d=jnp.asarray(d),
               mint=jnp.asarray(mint), maxt=jnp.asarray(maxt))


def test_stream_closest_matches_brute(geom):
    n = 640   # 5 rows
    ray = _rays(n, 2, geom)
    t0, u0, v0, p0, ok0 = _closest_brute(geom, ray)
    t1, u1, v1, p1, ok1 = sp.stream_closest(
        geom.st_tables, ray.o, ray.d, ray.mint, ray.maxt, interpret=True)
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok0))
    m = np.asarray(ok0)
    np.testing.assert_allclose(np.asarray(t1)[m], np.asarray(t0)[m],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(p1)[m], np.asarray(p0)[m])
    np.testing.assert_allclose(np.asarray(u1)[m], np.asarray(u0)[m],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1)[m], np.asarray(v0)[m],
                               rtol=1e-4, atol=1e-5)


def test_stream_any_matches_brute(geom):
    n = 640
    ray = _rays(n, 3, geom)
    occ0 = _any_brute(geom, ray)
    occ1 = sp.stream_any(geom.st_tables, ray.o, ray.d, ray.mint,
                         ray.maxt, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ1), np.asarray(occ0))


def test_stream_all_dead_row(geom):
    """A wavefront whose rows trace nothing must return all-miss."""
    n = 128
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    mint = jnp.full(n, 1e-4)
    maxt = jnp.full(n, -1.0)
    t, u, v, p, ok = sp.stream_closest(geom.st_tables, o, d, mint, maxt,
                                       interpret=True)
    assert not bool(np.asarray(ok).any())
    occ = sp.stream_any(geom.st_tables, o, d, mint, maxt, interpret=True)
    assert not bool(np.asarray(occ).any())
