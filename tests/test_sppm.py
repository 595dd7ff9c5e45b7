"""Stochastic progressive photon mapping (reference sppm.cpp:33) —
per-pixel (R, N, tau) statistics, distinct from ppm_render's global
radius schedule."""
import numpy as np

from mitsuba_tpu.core import transform as tf
from mitsuba_tpu.integrators import PathConfig, render
from mitsuba_tpu.integrators.photonmap import ppm_render, sppm_render
from mitsuba_tpu.render import mesh as mesh_mod
from mitsuba_tpu.render.camera import make_perspective
from mitsuba_tpu.render.scene import SceneBuilder, cornell_box


def test_sppm_statistics_update():
    """Per-pixel radii shrink only where photons arrive, N accumulates
    alpha*M, and the estimate is finite and lit."""
    scene = cornell_box(12, 12)
    img, aux = sppm_render(scene, PathConfig(max_depth=4, spp=1),
                           n_photons_per_pass=20_000, n_passes=3, seed=1)
    a = np.asarray(img)
    assert np.isfinite(a).all()
    assert a.mean() > 0.01
    assert aux["mean_N"] > 0
    assert aux["min_radius"] < aux["mean_radius"]   # some pixels shrank


def test_sppm_matches_path_tracer():
    scene = cornell_box(12, 12)
    ref, _ = render(scene, PathConfig(max_depth=4, spp=256), seed=3)
    img, _ = sppm_render(scene, PathConfig(max_depth=4, spp=1),
                         n_photons_per_pass=60_000, n_passes=6, seed=1)
    r = float(np.asarray(ref).mean())
    s = float(np.asarray(img).mean())
    assert abs(s - r) / r < 0.2, (s, r)


def _caustic_scene():
    b = SceneBuilder()
    lm = b.materials.lambertian((0.7, 0.7, 0.7))
    glass = b.materials.dielectric(int_ior=1.5)
    black = b.materials.lambertian((0.0, 0.0, 0.0))
    floor = mesh_mod.make_quad([-3, -3, 0], [3, -3, 0],
                               [3, 3, 0], [-3, 3, 0])
    b.add_shape(floor, lm)
    b.add_sphere((0, 0, 1.2), 0.7, glass)
    b.add_sphere_emitter((0, 0, 4.5), 0.3, black, (60.0,) * 3)
    cam = make_perspective(tf.look_at([0, -4.5, 2.2], [0, 0, 0.4],
                                      [0, 0, 1]), 35, 1.0)
    b.set_camera(cam, 16, 16)
    return b.build(backend="brute")


def test_sppm_caustic_adaptive_and_convergent():
    """The per-pixel statistics must do what SPPM promises (sppm.cpp /
    Hachisuka & Jensen 2009): radii shrink WHERE photons arrive (the
    caustic under the glass sphere shrinks harder than the background),
    the error against a long run decreases with passes, and the estimate
    agrees with global-schedule PPM on the image mean. (A fixed-pass
    "SPPM beats PPM" noise comparison is NOT asserted: at small pass
    counts SPPM's aggressively shrunk caustic radii are noisier — its
    advantage is asymptotic.)"""
    scene = _caustic_scene()
    cfg = PathConfig(max_depth=6, spp=1)
    ref, aux_ref = sppm_render(scene, cfg, n_photons_per_pass=50_000,
                               n_passes=20, seed=9)
    ref = np.asarray(ref)
    s5, _ = sppm_render(scene, cfg, n_photons_per_pass=50_000,
                        n_passes=5, seed=2)
    s12, _ = sppm_render(scene, cfg, n_photons_per_pass=50_000,
                         n_passes=12, seed=2)
    err5 = float(((np.asarray(s5) - ref) ** 2).mean())
    err12 = float(((np.asarray(s12) - ref) ** 2).mean())
    assert np.isfinite(err5) and np.isfinite(err12)
    assert err12 < 0.7 * err5, (err12, err5)       # converging
    p_img, _ = ppm_render(scene, PathConfig(max_depth=6, spp=1),
                          n_photons_per_pass=50_000, n_passes=5, seed=2)
    pm = float(np.asarray(p_img).mean())
    sm = float(np.asarray(s12).mean())
    assert abs(sm - pm) / pm < 0.25, (sm, pm)      # same estimand
    # adaptivity: radii shrink hardest where the photons concentrate —
    # the caustic spot = the brightest region of the reference render
    rmap = aux_ref["radius_map"]
    lum = ref.mean(-1)
    bright = lum >= np.quantile(lum, 0.9)
    assert rmap[bright].mean() < 0.9 * rmap[~bright].mean(), (
        float(rmap[bright].mean()), float(rmap[~bright].mean()))
