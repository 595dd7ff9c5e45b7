"""Smoke tests for off-default kernel paths so negative-result
archaeology can't silently rot (VERDICT round-4 #6): every MTS_* knob
that switches a perf-critical code path gets one oracle-gated run in the
fast lane. The default-on paths are covered by test_exact/test_cluster/
test_stream; these cover the OFF-default variants."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.ops import exact_pallas as ep
from tests.test_exact import _mesh_scene, _rays

CAPS = (128, 16, 32, 64)


@pytest.fixture(scope="module")
def geom():
    return _mesh_scene()


def _query(geom, v6, n=384, seed=1):
    o, d = _rays(n, seed)
    mint = jnp.full(n, 1e-3)
    maxt = jnp.full(n, 1e9)
    t, u, v, prim, ok, ovf = ep.exact_closest(
        geom.ex_tables, o, d, mint, maxt, caps=CAPS, interpret=True,
        v6=v6)
    occ, aovf = ep.exact_any(
        geom.ex_tables, o, d, mint, maxt, caps=CAPS, interpret=True,
        v6=v6)
    return (np.asarray(t), np.asarray(prim), np.asarray(ok),
            np.asarray(ovf), np.asarray(occ), np.asarray(aovf))


@pytest.mark.parametrize("v6", [1, 2])
def test_v6_fold_matches_v5(geom, v6, monkeypatch):
    """MTS_V6=1 (branched L1-fold, round-4 negative result) and =2
    (branchless masked fold, the TPU default) must stay bitwise-
    consistent with v5 on rows neither overflowed."""
    # small blm: the interpreter pays per unrolled MT item (blm*8 of
    # them per grid step) — the TPU-default 16 is pathological here
    monkeypatch.setenv("MTS_V6BLM", "4")
    t0, p0, ok0, ov0, occ0, aov0 = _query(geom, 0)
    t1, p1, ok1, ov1, occ1, aov1 = _query(geom, v6)
    cmp = ~(ov0 | ov1)
    assert cmp.any()
    assert (ok0 == ok1)[cmp].all()
    both = cmp & ok0 & ok1
    assert (p0 == p1)[both].all()
    assert np.allclose(t0[both], t1[both], rtol=1e-5)
    acmp = ~(aov0 | aov1)
    assert (occ0 == occ1)[acmp].all()


def test_segc_compaction_matches_sorts(geom, monkeypatch):
    """MTS_SEGC=1 (sort-free segmented compaction, round-4 negative
    result) must produce the same hits as the wide-sort build."""
    t0, p0, ok0, ov0, occ0, aov0 = _query(geom, 0, seed=2)
    monkeypatch.setenv("MTS_SEGC", "1")
    jax.clear_caches()      # _seg_on() is read at trace time
    try:
        t1, p1, ok1, ov1, occ1, aov1 = _query(geom, 0, seed=2)
    finally:
        monkeypatch.delenv("MTS_SEGC")
        jax.clear_caches()
    cmp = ~(ov0 | ov1)
    assert cmp.any()
    assert (ok0 == ok1)[cmp].all()
    both = cmp & ok0 & ok1
    assert (p0 == p1)[both].all()
    assert np.allclose(t0[both], t1[both], rtol=1e-5)
    assert (occ0 == occ1)[~(aov0 | aov1)].all()


def test_glue_chunks_render_matches(monkeypatch):
    """MTS_GLUE_CHUNKS (chunked bounce glue with all-dead chunk skip)
    must not change the image: live chunks compute identically, dead
    chunks reproduce the masked body's outputs exactly."""
    from mitsuba_tpu.integrators.path import PathConfig, render
    from mitsuba_tpu.render.scene import cornell_box

    sc = cornell_box(16, 16, backend="cluster")
    cfg = PathConfig(max_depth=4, spp=2)
    monkeypatch.setenv("MTS_GLUE_CHUNKS", "1")
    jax.clear_caches()
    img0, _ = render(sc, cfg, seed=9)
    monkeypatch.setenv("MTS_GLUE_CHUNKS", "8")
    jax.clear_caches()
    try:
        img1, _ = render(sc, cfg, seed=9)
    finally:
        monkeypatch.delenv("MTS_GLUE_CHUNKS")
        jax.clear_caches()
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1),
                               rtol=1e-6, atol=1e-7)


def test_fusesort_render_matches(monkeypatch):
    """MTS_FUSESORT=1 (shared sort epoch for closest+shadow, measured
    slower on config-3 but kept for coherent scenes) must render
    identically — the fused path reorders queries, not results."""
    from mitsuba_tpu.integrators.path import PathConfig, render
    from mitsuba_tpu.render.scene import cornell_box

    sc = cornell_box(24, 24, backend="cluster")
    cfg = PathConfig(max_depth=3, spp=2)
    img0, _ = render(sc, cfg, seed=5)
    monkeypatch.setenv("MTS_FUSESORT", "1")
    jax.clear_caches()      # env is read at trace time in the bounce
    try:
        img1, _ = render(sc, cfg, seed=5)
    finally:
        monkeypatch.delenv("MTS_FUSESORT")
        jax.clear_caches()
    assert np.allclose(np.asarray(img0), np.asarray(img1),
                       rtol=1e-5, atol=1e-6)
