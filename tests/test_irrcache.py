"""Irradiance caching: coverage + agreement with path tracing."""
import numpy as np

from mitsuba_tpu.integrators import PathConfig, render
from mitsuba_tpu.integrators.irrcache import irrcache_render
from mitsuba_tpu.render.scene import cornell_box


def test_irrcache_matches_path_tracer():
    scene = cornell_box(24, 24)
    img_ic, aux = irrcache_render(
        scene, PathConfig(max_depth=4, spp=4, remat=False),
        cache_res=48, hemi_samples=48, seed=0,
    )
    img_pt, _ = render(scene, PathConfig(max_depth=5, spp=32, remat=False), seed=1)
    a = np.asarray(img_ic).mean(-1)
    b = np.asarray(img_pt).mean(-1)
    assert np.isfinite(a).all()
    assert aux["coverage"] > 0.95
    cut = np.quantile(b, 0.98)
    sel = b < cut
    ratio = a[sel].mean() / b[sel].mean()
    assert 0.75 < ratio < 1.25, ratio
    corr = np.corrcoef(a[sel], b[sel])[0, 1]
    assert corr > 0.7, corr
