"""Image utilities: tonemap, addimages, joinrgb — the reference's
src/utils/{tonemap,addimages,joinrgb}.cpp as library functions + CLI hooks."""
from __future__ import annotations

import numpy as np


def _srgb_np(x):
    """sRGB OETF, pure numpy — tonemapping is host-side post-processing
    and must not initialize a device backend (core/spectrum.py has the
    jnp twin for on-device use)."""
    x = np.clip(x, 0.0, 1.0)
    return np.where(x <= 0.0031308, 12.92 * x,
                    1.055 * np.power(np.maximum(x, 1e-12), 1 / 2.4) - 0.055)


def tonemap(img, exposure_ev: float = 0.0, gamma: float = -1.0):
    """HDR -> LDR. gamma=-1 means sRGB curve (reference tonemap.cpp)."""
    img = np.asarray(img, np.float32) * (2.0 ** exposure_ev)
    if gamma == -1.0:
        out = _srgb_np(img)
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
