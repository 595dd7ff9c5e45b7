"""Sharded rendering must match single-device rendering (to float
reassociation tolerance — the random streams are identical by construction),
and the sharded training step must run — the test strategy the reference
lacked (SURVEY.md §4: mtssrv had no mock cluster; we test on a virtual
mesh)."""
import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.core.types import replace
from mitsuba_tpu.integrators import PathConfig, render
from mitsuba_tpu.parallel import make_mesh, render_sharded, training_step_sharded
from mitsuba_tpu.render.scene import cornell_box


def test_sharded_matches_single():
    scene = cornell_box(16, 16)
    cfg = PathConfig(max_depth=3, spp=4, remat=False)
    img1, _ = render(scene, cfg, seed=3)
    mesh = make_mesh(jax.devices()[:8])
    img8, _ = render_sharded(scene, cfg, seed=3, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(img1), np.asarray(img8), rtol=2e-5, atol=1e-7
    )


def test_sharded_subset_devices():
    scene = cornell_box(16, 16)
    cfg = PathConfig(max_depth=2, spp=2, remat=False)
    img1, _ = render(scene, cfg, seed=1)
    for nd in (2, 4):
        mesh = make_mesh(jax.devices()[:nd])
        imgn, _ = render_sharded(scene, cfg, seed=1, mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(img1), np.asarray(imgn), rtol=2e-5, atol=1e-7
        )


def _bumpy_cluster_scene():
    """Small mesh scene on the CLUSTER backend with deliberately tiny
    exact-cull caps so the overflow retier + stream fallback paths are
    POPULATED (their row compaction is built from the local shard's lane
    population — exactly the part the brute-backend test can't see)."""
    from mitsuba_tpu.render import mesh as mesh_mod
    from mitsuba_tpu.render.scene import SceneBuilder

    import numpy as np

    b = SceneBuilder()
    lm = b.materials.lambertian((0.6, 0.55, 0.5))
    th = np.linspace(0.1, np.pi - 0.1, 10)
    ph = np.linspace(0, 2 * np.pi, 10, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    r = 1.0 + 0.25 * np.sin(3 * T) * np.cos(2 * P)
    v = np.stack([r * np.sin(T) * np.cos(P), r * np.cos(T),
                  r * np.sin(T) * np.sin(P)], -1).reshape(-1, 3)
    f = []
    for i in range(9):
        for j in range(10):
            a = i * 10 + j
            c = i * 10 + (j + 1) % 10
            d = (i + 1) * 10 + j
            e = (i + 1) * 10 + (j + 1) % 10
            f += [[a, c, d], [c, e, d]]
    from mitsuba_tpu.render.mesh import TriMesh

    b.add_shape(TriMesh(v.astype(np.float32),
                        np.asarray(f, np.int32)), lm)
    floor = mesh_mod.make_quad([-3, -1.4, -3], [3, -1.4, -3],
                               [3, -1.4, 3], [-3, -1.4, 3])
    b.add_shape(floor, lm)
    b.emitters.constant((0.7, 0.8, 0.9))
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.render.camera import make_perspective

    cam = make_perspective(tf.look_at((0, 0.5, 3.2), (0, 0, 0),
                                      (0, 1, 0)), 40.0, 1.0)
    b.set_camera(cam, 16, 16)
    scene = b.build(backend="cluster")
    # tiny caps: many rows overflow CAPS -> retier XL -> stream fallback
    tiny = ((128, 16, 32, 32), (128, 16, 32, 32), (128, 16, 64, 64))
    return replace(scene, geom=replace(scene.geom, ex_caps=tiny))


def test_sharded_matches_single_cluster_exact(monkeypatch):
    """Sharded == single on the CLUSTER/v5 path (VERDICT round-4 weak
    #3): row structures are built from the local shard's lane
    population and overflow/retier behavior is population-dependent —
    per-lane results must still be identical for any device count."""
    monkeypatch.setenv("MTS_FORCE_EXACT", "1")
    jax.clear_caches()
    try:
        scene = _bumpy_cluster_scene()
        cfg = PathConfig(max_depth=2, spp=2, remat=False)
        img1, _ = render(scene, cfg, seed=2)
        mesh = make_mesh(jax.devices()[:4])
        img4, _ = render_sharded(scene, cfg, seed=2, mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(img1), np.asarray(img4), rtol=2e-5, atol=1e-7
        )
    finally:
        monkeypatch.delenv("MTS_FORCE_EXACT")
        jax.clear_caches()


def test_training_step_sharded():
    scene = cornell_box(8, 8)
    cfg = PathConfig(max_depth=2, spp=2, remat=True)
    mesh = make_mesh(jax.devices()[:4])
    params = {"reflectance": scene.materials.reflectance}

    def apply_params(sc, p):
        return replace(sc, materials=replace(sc.materials, reflectance=p["reflectance"]))

    target = jnp.zeros((8, 8, 3))
    new_params, loss = training_step_sharded(
        scene, cfg, target, params, apply_params, seed=0, mesh=mesh
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    delta = np.abs(
        np.asarray(new_params["reflectance"]) - np.asarray(params["reflectance"])
    )
    assert delta.max() > 0, "no gradient reached the material parameters"


def test_scaling_harness_runs():
    """Weak-scaling measurement mechanism on virtual devices (real numbers
    need a pod; this validates plumbing + reports are sane)."""
    from mitsuba_tpu.parallel.scaling import measure_scaling, scaling_efficiency

    scene = cornell_box(16, 16)
    cfg = PathConfig(max_depth=2, spp=2, remat=False)
    res = measure_scaling(scene, cfg, device_counts=[1, 2], rows_per_device=16,
                          rounds=1)
    eff = scaling_efficiency(res)
    assert set(res) == {1, 2}
    assert all(v > 0 for v in res.values())
    assert 0 < eff[2]  # virtual-CPU efficiency is not meaningful, just finite
