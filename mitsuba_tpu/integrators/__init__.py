from mitsuba_tpu.integrators.path import PathConfig, path_trace, render
from mitsuba_tpu.integrators.direct import direct_trace
from mitsuba_tpu.integrators.vpl import VPLSet, generate_vpls, render_vpl
from mitsuba_tpu.integrators.bre import (
    beam_radiance_estimate, bre_render, shoot_photons_media,
)
from mitsuba_tpu.integrators.photonmap import (
    photonmap_render, photonmapper_render, ppm_render,
)

__all__ = ["PathConfig", "path_trace", "render", "direct_trace",
           "VPLSet", "generate_vpls", "render_vpl",
           "beam_radiance_estimate", "bre_render", "shoot_photons_media",
           "photonmap_render", "photonmapper_render", "ppm_render"]
