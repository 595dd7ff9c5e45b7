from mitsuba_tpu.integrators.path import PathConfig, path_trace, render
from mitsuba_tpu.integrators.direct import direct_trace

__all__ = ["PathConfig", "path_trace", "render", "direct_trace"]
