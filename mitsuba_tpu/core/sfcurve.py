"""Hilbert space-filling curve (reference include/mitsuba/core/sfcurve.h:33
HilbertCurve2D) — used to order pixels for cache-coherent block rendering
(reference renderBlock Hilbert ordering, integrator.cpp:131)."""
from __future__ import annotations

import numpy as np


def hilbert_d2xy(order: int, d):
    """Distance along the curve → (x, y), vectorized. Grid is 2^order."""
    d = np.asarray(d, np.int64).copy()
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    t = d.copy()
    s = 1
    while s < (1 << order):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        x = x + s * rx
        y = y + s * ry
        t //= 4
        s *= 2
    return x, y


def hilbert_xy2d(order: int, x, y):
    """(x, y) → distance along the Hilbert curve, vectorized."""
    x = np.asarray(x, np.int64).copy()
    y = np.asarray(y, np.int64).copy()
    d = np.zeros_like(x)
    s = (1 << order) // 2
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant (masked lanes)
        swap = ry == 0
        flip = swap & (rx == 1)
        x0, y0 = x, y
        x = np.where(swap, np.where(flip, s - 1 - y0, y0), x0)
        y = np.where(swap, np.where(flip, s - 1 - x0, x0), y0)
        s //= 2
    return d


def hilbert_pixel_order(width: int, height: int):
    """Permutation of pixel indices in Hilbert order covering the image."""
    order = int(np.ceil(np.log2(max(width, height, 2))))
    n = 1 << order
    d = np.arange(n * n)
    x, y = hilbert_d2xy(order, d)
    mask = (x < width) & (y < height)
    return (y[mask] * width + x[mask]).astype(np.int64)
