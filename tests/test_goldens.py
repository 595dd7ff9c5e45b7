"""Golden-image regression gates (VERDICT round-1 weak #5).

Per-pixel Welch t-test between a fresh render and the committed golden
(mean + variance at high spp), mirroring the reference's image comparison
harness (src/librender/testcase.cpp:168-250): a pixel fails when |t|
exceeds the 99.99% two-sided critical value; the image fails when more
than 1% of pixels fail (MC leaves a tail even for identical estimators).
"""
import os

import numpy as np
import pytest

from tests.golden_scenes import DIR, SCENES, TEST_SPP, render_stats

_CRIT = 3.9     # ~99.99% two-sided normal critical value


def _welch_fail_fraction(m1, v1, n1, m2, v2, n2):
    se = np.sqrt(v1 / n1 + v2 / n2)
    t = (m1 - m2) / np.maximum(se, 1e-6)
    return float((np.abs(t) > _CRIT).any(axis=-1).mean())


@pytest.mark.parametrize("name", sorted(SCENES))
def test_golden(name):
    path = os.path.join(DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated")
    if name == "bunny_lambert" and not os.path.exists(
            "/root/reference/data/tests/bunny.ply"):
        pytest.skip("bunny.ply unavailable")
    g = np.load(path)
    out = SCENES[name]()
    scene, depth = out[0], out[1]
    kind = out[2] if len(out) > 2 else "path"
    mean, var = render_stats(scene, depth, TEST_SPP, seed=777, kind=kind)
    frac = _welch_fail_fraction(mean, var, TEST_SPP,
                                g["mean"], g["var"], int(g["spp"]))
    assert frac < 0.01, (name, frac)
