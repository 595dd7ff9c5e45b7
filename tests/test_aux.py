"""Aux subsystems: logging/stats/progress, animated transforms, checkpoints."""
import io

import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.core import transform as tf
from mitsuba_tpu.core.track import AnimatedTransform
from mitsuba_tpu.utils.checkpoint import FilmCheckpoint, load_pytree, save_pytree
from mitsuba_tpu.utils.logging import (
    LogLevel, Logger, ProgressReporter, Statistics,
)


def test_logger_levels_and_appenders():
    log = Logger(LogLevel.WARN)
    seen = []
    log.clear_appenders()
    log.add_appender(lambda lv, msg: seen.append((lv, msg)))
    log.info("hidden")
    log.warn("visible %d", 42, cls="Test")
    assert len(seen) == 1
    assert "visible 42" in seen[0][1] and "[Test]" in seen[0][1]


def test_statistics():
    st = Statistics()
    st.increment("Path tracer", "rays", 100)
    st.increment("Path tracer", "rays", 50)
    st.increment("Path tracer", "avg path length", 12, base=4)
    assert st.value("Path tracer", "rays") == 150
    out = io.StringIO()
    st.print_stats(out)
    assert "rays: 150" in out.getvalue()
    assert "avg path length: 3" in out.getvalue()


def test_progress_reporter():
    out = io.StringIO()
    pr = ProgressReporter("render", 10, stream=out, min_interval=0.0)
    pr.update(5)
    pr.finish()
    s = out.getvalue()
    assert "50.0%" in s and "100.0%" in s


def test_animated_transform_interpolation():
    at = AnimatedTransform()
    at.append_transform(0.0, np.asarray(tf.translate([0, 0, 0])))
    at.append_transform(1.0, np.asarray(tf.translate([2, 0, 0])))
    m = at.eval(jnp.asarray([0.0, 0.5, 1.0]))
    np.testing.assert_allclose(np.asarray(m)[:, 0, 3], [0, 1, 2], atol=1e-5)
    # rotation keys slerp: 0 -> 90 deg about z, eval at half = 45 deg
    at2 = AnimatedTransform()
    at2.append_transform(0.0, np.asarray(tf.rotate([0, 0, 1], 0)))
    at2.append_transform(1.0, np.asarray(tf.rotate([0, 0, 1], 90)))
    m45 = np.asarray(at2.eval(jnp.asarray(0.5)))
    expect = np.asarray(tf.rotate([0, 0, 1], 45))
    np.testing.assert_allclose(m45, expect, atol=1e-5)


def test_pytree_checkpoint_roundtrip(tmp_path):
    from mitsuba_tpu.render.scene import cornell_box

    scene = cornell_box(8, 8)
    p = str(tmp_path / "scene.ckpt")
    save_pytree(p, scene)
    back = load_pytree(p, scene)
    np.testing.assert_array_equal(
        np.asarray(back.geom.v0), np.asarray(scene.geom.v0)
    )
    np.testing.assert_array_equal(
        np.asarray(back.materials.reflectance),
        np.asarray(scene.materials.reflectance),
    )
    assert back.width == scene.width


def test_film_checkpoint(tmp_path):
    fc = FilmCheckpoint(4, 4)
    img1 = np.full((4, 4, 3), 1.0)
    img2 = np.full((4, 4, 3), 3.0)
    fc.add_pass(img1, 8)
    p = str(tmp_path / "film.npz")
    fc.save(p)
    fc2 = FilmCheckpoint.load(p)
    fc2.add_pass(img2, 8)
    np.testing.assert_allclose(fc2.image, 2.0)
    assert fc2.count == 16
