from mitsuba_tpu.integrators.path import PathConfig, path_trace, render
from mitsuba_tpu.integrators.direct import direct_trace
from mitsuba_tpu.integrators.vpl import VPLSet, generate_vpls, render_vpl

__all__ = ["PathConfig", "path_trace", "render", "direct_trace",
           "VPLSet", "generate_vpls", "render_vpl"]
