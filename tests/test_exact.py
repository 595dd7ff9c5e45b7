"""Exact-cull item-stream intersector (ops/exact_pallas.py, v5) vs the
brute-force oracle, in Pallas interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.render.intersect import build_geometry, _closest_brute
from mitsuba_tpu.render.mesh import TriMesh
from mitsuba_tpu.render.records import Ray
from mitsuba_tpu.ops import exact_pallas as ep


def _mesh_scene(n_seg=12):
    """A bumpy sphere-ish mesh + ground plane: ~few hundred tris."""
    th = np.linspace(0.1, np.pi - 0.1, n_seg)
    ph = np.linspace(0, 2 * np.pi, n_seg, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    r = 1.0 + 0.25 * np.sin(3 * T) * np.cos(2 * P)
    v = np.stack([r * np.sin(T) * np.cos(P), r * np.cos(T),
                  r * np.sin(T) * np.sin(P)], -1).reshape(-1, 3)
    f = []
    for i in range(n_seg - 1):
        for j in range(n_seg):
            a = i * n_seg + j
            b = i * n_seg + (j + 1) % n_seg
            c = (i + 1) * n_seg + j
            d = (i + 1) * n_seg + (j + 1) % n_seg
            f += [[a, b, c], [b, d, c]]
    f = np.asarray(f, np.int64)
    g = np.asarray([[-3, -1.4, -3], [3, -1.4, -3], [3, -1.4, 3],
                    [-3, -1.4, 3]], np.float32)
    v = np.concatenate([v, g]).astype(np.float32)
    f = np.concatenate([f, np.asarray([[len(v) - 4, len(v) - 3, len(v) - 2],
                                       [len(v) - 4, len(v) - 2,
                                        len(v) - 1]])])
    m = TriMesh(v, f.astype(np.int32))
    return build_geometry([(m, 0, -1, 0)], backend="cluster")


def _rays(n, seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(k)
    o = jax.random.uniform(k1, (n, 3), minval=-2.5, maxval=2.5)
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


@pytest.fixture(scope="module")
def geom():
    return _mesh_scene()


def test_exact_closest_matches_oracle(geom):
    n = 512
    o, d = _rays(n)
    mint = jnp.full(n, 1e-3)
    maxt = jnp.full(n, 1e9)
    caps = (128, 16, 32, 64)
    t, u, v, prim, valid, ovf = ep.exact_closest(
        geom.ex_tables, o, d, mint, maxt, caps=caps, interpret=True)
    ray = Ray(o=o, d=d, mint=mint, maxt=maxt)
    t0, u0, v0, p0, ok0 = _closest_brute(geom, ray)
    ok0 = np.asarray(ok0)
    ovf = np.asarray(ovf)
    m = ~ovf
    assert m.mean() > 0.9, "too many overflow rows for this tiny scene"
    assert (np.asarray(valid)[m] == ok0[m]).all()
    both = m & ok0 & np.asarray(valid)
    np.testing.assert_allclose(np.asarray(t)[both], np.asarray(t0)[both],
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(prim)[both] == np.asarray(p0)[both]).mean() > 0.999
    np.testing.assert_allclose(np.asarray(u)[both], np.asarray(u0)[both],
                               rtol=1e-4, atol=1e-4)


def test_exact_any_matches_oracle(geom):
    n = 512
    o, d = _rays(n, seed=1)
    mint = jnp.full(n, 1e-3)
    # finite maxt exercises the capped any-hit path
    maxt = jnp.full(n, 2.5)
    caps = (128, 16, 32, 64)
    occ, ovf = ep.exact_any(geom.ex_tables, o, d, mint, maxt,
                            caps=caps, interpret=True)
    ray = Ray(o=o, d=d, mint=mint, maxt=maxt)
    t0, _u, _v, _p, ok0 = _closest_brute(geom, ray)
    m = ~np.asarray(ovf)
    assert (np.asarray(occ)[m] == np.asarray(ok0)[m]).all()


def test_exact_overflow_rows_flagged_not_wrong(geom):
    """With absurdly small caps most rows overflow — flagged rows may be
    partial, but non-overflow rows must still be exact."""
    n = 256
    o, d = _rays(n, seed=2)
    mint = jnp.full(n, 1e-3)
    maxt = jnp.full(n, 1e9)
    caps = (128, 16, 16, 16)
    t, u, v, prim, valid, ovf = ep.exact_closest(
        geom.ex_tables, o, d, mint, maxt, caps=caps, interpret=True)
    ray = Ray(o=o, d=d, mint=mint, maxt=maxt)
    t0, _u, _v, p0, ok0 = _closest_brute(geom, ray)
    m = ~np.asarray(ovf)
    if m.any():
        assert (np.asarray(valid)[m] == np.asarray(ok0)[m]).all()
        both = m & np.asarray(ok0)
        np.testing.assert_allclose(np.asarray(t)[both],
                                   np.asarray(t0)[both], rtol=1e-5,
                                   atol=1e-5)


def test_exact_closest_maxt_inf_no_bogus_hits(geom):
    """maxt=inf regression (round-4 find): the closest accumulator once
    accepted the _BIG miss sentinel as an improvement over t_best=inf,
    making EVERY lane report a garbage hit — the render passes
    Ray.make's default maxt=inf straight in."""
    n = 256
    o, d = _rays(n, seed=3)
    mint = jnp.full(n, 1e-3)
    caps = (128, 16, 32, 96)
    t, u, v, prim, valid, ovf = ep.exact_closest(
        geom.ex_tables, o, d, mint, jnp.full(n, jnp.inf), caps=caps,
        interpret=True)
    ray = Ray(o=o, d=d, mint=mint, maxt=jnp.full(n, jnp.inf))
    t0, u0, v0, p0, ok0 = _closest_brute(geom, ray)
    m = ~np.asarray(ovf)
    assert (np.asarray(valid)[m] == np.asarray(ok0)[m]).all()
    occ, ovf_a = ep.exact_any(geom.ex_tables, o, d, mint,
                              jnp.full(n, jnp.inf), caps=caps,
                              interpret=True)
    m = ~np.asarray(ovf_a)
    assert (np.asarray(occ)[m] == np.asarray(ok0)[m]).all()


def test_exact_closest_auto_caps(geom):
    """auto_caps(C8) must yield correct results (overflow-flagged rows
    excluded) at every tier for a small scene."""
    n = 256
    o, d = _rays(n, seed=5)
    mint = jnp.full(n, 1e-3)
    maxt = jnp.full(n, 1e9)
    dif, coh, xl = ep.auto_caps(geom.ex_tables["tri"].shape[0])
    ray = Ray(o=o, d=d, mint=mint, maxt=maxt)
    t0, _, _, _, ok0 = _closest_brute(geom, ray)
    for caps in (dif, coh, xl):
        t, u, v, prim, valid, ovf = ep.exact_closest(
            geom.ex_tables, o, d, mint, maxt, caps=caps, interpret=True)
        m = ~np.asarray(ovf)
        assert (np.asarray(valid)[m] == np.asarray(ok0)[m]).all(), caps
