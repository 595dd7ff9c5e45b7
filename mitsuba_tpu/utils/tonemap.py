"""Image utilities: tonemap, addimages, joinrgb — the reference's
src/utils/{tonemap,addimages,joinrgb}.cpp as library functions + CLI hooks."""
from __future__ import annotations

import numpy as np

from mitsuba_tpu.core.spectrum import to_srgb
import jax.numpy as jnp


def tonemap(img, exposure_ev: float = 0.0, gamma: float = -1.0):
    """HDR -> LDR. gamma=-1 means sRGB curve (reference tonemap.cpp)."""
    img = np.asarray(img, np.float32) * (2.0 ** exposure_ev)
    if gamma == -1.0:
        out = np.asarray(to_srgb(jnp.asarray(img)))
    else:
        out = np.clip(img, 0, 1) ** (1.0 / gamma)
    return (out * 255 + 0.5).astype(np.uint8)


def add_images(a, b, weight_a: float = 1.0, weight_b: float = 1.0):
    """Weighted sum of two HDR images (reference addimages.cpp)."""
    return np.asarray(a, np.float32) * weight_a + np.asarray(b, np.float32) * weight_b


def join_rgb(r, g, b):
    """Merge three single-channel images into RGB (reference joinrgb.cpp)."""
    def chan(x):
        x = np.asarray(x, np.float32)
        return x[..., 0] if x.ndim == 3 else x
    return np.stack([chan(r), chan(g), chan(b)], axis=-1)
