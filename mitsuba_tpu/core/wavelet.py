"""Haar wavelet transforms, 2-D and 3-D, plus sparse thresholding.

Capability parity with reference include/mitsuba/core/wavelet.h
(Wavelet2D/Wavelet3D non-standard Haar decompositions at :49,129 and the
sparse representations SparseWavelet2D/SparseWaveletOctree :201,340 —
here sparsity = coefficient thresholding, which is what the reference's
sparse classes are for: compressed storage of mostly-zero transforms).
Fully vectorized; input sizes must be powers of two.
"""
from __future__ import annotations

import numpy as np

_S2 = np.sqrt(2.0)


def haar_fwd_2d(img):
    """Non-standard 2-D Haar decomposition (in-place pyramid layout)."""
    a = np.asarray(img, np.float64).copy()
    n = a.shape[0]
    assert a.shape[0] == a.shape[1] and (n & (n - 1)) == 0
    size = n
    while size > 1:
        h = size // 2
        blk = a[:size, :size].copy()
        # rows
        lo = (blk[:, 0::2] + blk[:, 1::2]) / _S2
        hi = (blk[:, 0::2] - blk[:, 1::2]) / _S2
        blk[:, :h], blk[:, h:size] = lo, hi
        # cols
        lo = (blk[0::2, :] + blk[1::2, :]) / _S2
        hi = (blk[0::2, :] - blk[1::2, :]) / _S2
        blk[:h, :], blk[h:size, :] = lo, hi
        a[:size, :size] = blk
        size = h
    return a


def haar_inv_2d(coeffs):
    a = np.asarray(coeffs, np.float64).copy()
    n = a.shape[0]
    size = 2
    while size <= n:
        h = size // 2
        blk = a[:size, :size].copy()
        out = np.empty_like(blk)
        out[0::2, :] = (blk[:h, :] + blk[h:size, :]) / _S2
        out[1::2, :] = (blk[:h, :] - blk[h:size, :]) / _S2
        blk = out
        out = np.empty_like(blk)
        out[:, 0::2] = (blk[:, :h] + blk[:, h:size]) / _S2
        out[:, 1::2] = (blk[:, :h] - blk[:, h:size]) / _S2
        a[:size, :size] = out
        size *= 2
    return a


def haar_fwd_3d(vol):
    a = np.asarray(vol, np.float64).copy()
    n = a.shape[0]
    assert a.shape == (n, n, n) and (n & (n - 1)) == 0
    size = n
    while size > 1:
        h = size // 2
        blk = a[:size, :size, :size].copy()
        for axis in range(3):
            blk = np.moveaxis(blk, axis, 0)
            lo = (blk[0::2] + blk[1::2]) / _S2
            hi = (blk[0::2] - blk[1::2]) / _S2
            blk = np.concatenate([lo, hi], axis=0)
            blk = np.moveaxis(blk, 0, axis)
        a[:size, :size, :size] = blk
        size = h
    return a


def haar_inv_3d(coeffs):
    a = np.asarray(coeffs, np.float64).copy()
    n = a.shape[0]
    size = 2
    while size <= n:
        h = size // 2
        blk = a[:size, :size, :size].copy()
        for axis in range(3):
            blk = np.moveaxis(blk, axis, 0)
            out = np.empty_like(blk)
            out[0::2] = (blk[:h] + blk[h:size]) / _S2
            out[1::2] = (blk[:h] - blk[h:size]) / _S2
            blk = np.moveaxis(out, 0, axis)
        a[:size, :size, :size] = blk
        size *= 2
    return a


def sparsify(coeffs, keep_fraction: float):
    """Keep the largest-|coeff| fraction, zero the rest (SparseWavelet
    compression). Returns (sparse_coeffs, kept_count)."""
    a = np.asarray(coeffs).copy()
    flat = np.abs(a).ravel()
    k = max(1, int(round(keep_fraction * flat.size)))
    thresh = np.partition(flat, -k)[-k]
    mask = np.abs(a) >= thresh
    return np.where(mask, a, 0.0), int(mask.sum())
