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


# ---------------------------------------------------------------------------
# sparse representations
# ---------------------------------------------------------------------------
#
# Capability parity with the reference's SparseWavelet2D /
# SparseWaveletOctree (include/mitsuba/core/wavelet.h:201,340,
# src/libcore/wavelet.cpp:324-919): a mostly-zero Haar transform stored
# as explicit (key -> coefficient) entries with point evaluation and
# line integrals over the reconstruction.  Re-designed for vector
# hardware instead of hash maps + recursive descent: coefficients live
# in per-level SORTED packed-key arrays, lookups are np.searchsorted
# over whole batches, and line integrals enumerate every cell-boundary
# crossing of the segment at once (one vectorized evaluation of all
# crossed cells) rather than stepping a scalar DDA.  The reconstruction
# convention matches haar_fwd_2d/_3d above (orthonormal pyramid), so
# sparse-vs-dense equivalence is exactly testable.

def _pack2(level, type_, i, j):
    return (((np.int64(level) * 4 + type_) << 32)
            | (np.int64(i) << 16) | np.int64(j))


def _pack3(level, type_, i, j, k):
    return ((np.int64(level) * 8 + type_) << 48) \
        | (np.int64(i) << 32) | (np.int64(j) << 16) | np.int64(k)


class _SortedMap:
    """Immutable-after-bake packed-key -> float map with vectorized get."""

    def __init__(self):
        self._dict = {}
        self._keys = None
        self._vals = None

    def put(self, key, value):
        self._dict[int(key)] = float(value)
        self._keys = None

    def _bake(self):
        if self._keys is None:
            ks = np.fromiter(self._dict.keys(), np.int64,
                             count=len(self._dict))
            order = np.argsort(ks)
            self._keys = ks[order]
            self._vals = np.asarray(
                list(self._dict.values()), np.float64)[order]

    def get(self, keys):
        """Vectorized lookup; missing keys read 0."""
        if not self._dict:
            return np.zeros(np.shape(keys), np.float64)
        self._bake()
        keys = np.asarray(keys, np.int64)
        idx = np.searchsorted(self._keys, keys)
        idx = np.minimum(idx, len(self._keys) - 1)
        hit = self._keys[idx] == keys
        return np.where(hit, self._vals[idx], 0.0)

    def __len__(self):
        return len(self._dict)


def _crossings(p0, p1, ndim):
    """All cell-boundary crossing parameters of the segment p0->p1 in
    cell coordinates. Returns (t_breaks sorted incl. 0 and T, T) where
    T = |p1-p0|."""
    p0 = np.asarray(p0, np.float64)
    d = np.asarray(p1, np.float64) - p0
    T = float(np.linalg.norm(d))
    if T == 0.0:
        return np.array([0.0]), 0.0
    d = d / T
    ts = [np.array([0.0, T])]
    for ax in range(ndim):
        if abs(d[ax]) < 1e-12:
            continue
        lo = min(p0[ax], p0[ax] + d[ax] * T)
        hi = max(p0[ax], p0[ax] + d[ax] * T)
        planes = np.arange(np.ceil(lo), np.floor(hi) + 1.0)
        ts.append((planes - p0[ax]) / d[ax])
    t = np.unique(np.concatenate(ts))
    return t[(t >= 0.0) & (t <= T)], T


class SparseWavelet2D:
    """Sparse non-standard 2-D Haar representation (wavelet.h:201).

    Keys are (level, type, i, j): level 0 is the coarsest detail band
    (1x1), type 0/1/2 = detail along axis-1 / axis-0 / both, (i, j) the
    row/column block offset at that level. `scaling` holds the single
    scaling-function coefficient. from_dense/to_dense convert to the
    haar_fwd_2d pyramid layout."""

    def __init__(self, size):
        assert size & (size - 1) == 0
        self.size = int(size)
        self.max_level = self.size.bit_length() - 2  # log2(size) - 1
        self.scaling = 0.0
        self._m = _SortedMap()

    def put(self, level, type_, i, j, value):
        self._m.put(_pack2(level, type_, i, j), value)

    def get(self, level, type_, i, j):
        return float(self._m.get(np.asarray([_pack2(level, type_, i, j)]))[0])

    def n_coefficients(self):
        return len(self._m)

    @classmethod
    def from_dense(cls, coeffs, threshold=0.0):
        """Build from a haar_fwd_2d pyramid, dropping |c| <= threshold."""
        a = np.asarray(coeffs, np.float64)
        sw = cls(a.shape[0])
        sw.scaling = float(a[0, 0])
        for lvl in range(sw.max_level + 1):
            h = 1 << lvl
            blocks = ((0, h, 0), (h, 0, 1), (h, h, 2))
            for (bi, bj, t) in blocks:
                blk = a[bi:bi + h, bj:bj + h]
                ii, jj = np.nonzero(np.abs(blk) > threshold)
                for i, j in zip(ii, jj):
                    sw.put(lvl, t, i, j, blk[i, j])
        return sw

    def to_dense(self):
        a = np.zeros((self.size, self.size))
        a[0, 0] = self.scaling
        self._m._bake()
        if len(self._m) == 0:
            return a
        keys, vals = self._m._keys, self._m._vals
        lvl_t = keys >> 32
        lvl = lvl_t >> 2
        t = lvl_t & 3
        i = (keys >> 16) & 0xFFFF
        j = keys & 0xFFFF
        h = (1 << lvl).astype(np.int64)
        bi = np.where(t == 0, i, h + i)
        bj = np.where(t == 1, j, h + j)
        a[bi, bj] = vals
        return a

    def get_pixel(self, pts):
        """Reconstructed image value at integer pixel (y, x) positions.
        pts: (..., 2) int array; vectorized over all points."""
        pts = np.asarray(pts, np.int64)
        y = pts[..., 0]
        x = pts[..., 1]
        L = self.max_level + 1  # log2(size)
        val = np.full(y.shape, self.scaling / self.size, np.float64)
        for lvl in range(L):
            shift = L - lvl - 1
            qy = (y >> shift) & 1
            qx = (x >> shift) & 1
            i = y >> (shift + 1)
            j = x >> (shift + 1)
            amp = float(1 << lvl) / self.size
            base = (np.int64(lvl) * 4 << 32) | (i << 16) | j
            c0 = self._m.get(base | (np.int64(0) << 32))
            c1 = self._m.get(base | (np.int64(1) << 32))
            c2 = self._m.get(base | (np.int64(2) << 32))
            s_x = 1.0 - 2.0 * qx
            s_y = 1.0 - 2.0 * qy
            val = val + amp * (c0 * s_x + c1 * s_y + c2 * s_x * s_y)
        return val

    def line_integral(self, start, end):
        """Integral of the reconstruction along the segment start->end
        (fractional pixel coordinates, units of pixels): every crossed
        pixel is evaluated once, vectorized."""
        t, T = _crossings(start, end, 2)
        if T == 0.0 or len(t) < 2:
            return 0.0
        start = np.asarray(start, np.float64)
        d = (np.asarray(end, np.float64) - start) / T
        mid = start[None, :] + 0.5 * (t[:-1] + t[1:])[:, None] * d[None, :]
        cell = np.clip(np.floor(mid).astype(np.int64), 0, self.size - 1)
        vals = self.get_pixel(cell)   # coordinates are (axis0, axis1)
        return float(np.sum(vals * (t[1:] - t[:-1])))


class SparseWaveletOctree:
    """Sparse 3-D Haar representation (wavelet.h:340).

    The reference stores reconstructed per-octant sums in an explicit
    octree and walks it recursively per query ray; here the SAME
    function (the Haar reconstruction) is evaluated from per-level
    sorted coefficient tables, and a line integral evaluates every
    crossed voxel in one vectorized pass per level. Types 1..7 carry
    detail-axis bits (bit2, bit1, bit0) = differencing along (axis0,
    axis1, axis2)."""

    def __init__(self, size):
        assert size & (size - 1) == 0
        self.size = int(size)
        self.max_level = self.size.bit_length() - 2
        self.scaling = 0.0
        self._m = _SortedMap()

    def put(self, level, i, j, k, coeffs7):
        """Set all 7 detail coefficients of block (i,j,k) at `level`
        (reference wavelet.cpp:757 put)."""
        for t in range(1, 8):
            c = float(coeffs7[t - 1])
            if c != 0.0:
                self._m.put(_pack3(level, t, i, j, k), c)

    @classmethod
    def from_dense(cls, coeffs, threshold=0.0):
        """Build from a haar_fwd_3d pyramid, dropping |c| <= threshold."""
        a = np.asarray(coeffs, np.float64)
        sw = cls(a.shape[0])
        sw.scaling = float(a[0, 0, 0])
        for lvl in range(sw.max_level + 1):
            h = 1 << lvl
            for t in range(1, 8):
                b0 = h if (t >> 2) & 1 else 0
                b1 = h if (t >> 1) & 1 else 0
                b2 = h if t & 1 else 0
                blk = a[b0:b0 + h, b1:b1 + h, b2:b2 + h]
                ii, jj, kk = np.nonzero(np.abs(blk) > threshold)
                for i, j, k in zip(ii, jj, kk):
                    sw._m.put(_pack3(lvl, t, i, j, k), blk[i, j, k])
        return sw

    def n_coefficients(self):
        return len(self._m)

    def get_voxel(self, pts):
        """Reconstruction at integer voxel (i, j, k) positions."""
        pts = np.asarray(pts, np.int64)
        L = self.max_level + 1
        n32 = float(self.size) ** 1.5
        val = np.full(pts.shape[:-1], self.scaling / n32, np.float64)
        for lvl in range(L):
            shift = L - lvl - 1
            q = (pts >> shift) & 1               # (..., 3) quadrant bits
            blk = pts >> (shift + 1)
            amp = (float(1 << lvl) / self.size) ** 1.5
            base = ((np.int64(lvl) * 8) << 48) | (blk[..., 0] << 32) \
                | (blk[..., 1] << 16) | blk[..., 2]
            for t in range(1, 8):
                bits = np.array([(t >> 2) & 1, (t >> 1) & 1, t & 1],
                                np.int64)
                sgn = 1.0 - 2.0 * ((q * bits).sum(-1) & 1)
                c = self._m.get(base | (np.int64(t) << 48))
                val = val + amp * c * sgn
        return val

    def line_integral(self, start, end):
        """Integral of the reconstruction along start->end (fractional
        voxel coordinates, units of voxels)."""
        t, T = _crossings(start, end, 3)
        if T == 0.0 or len(t) < 2:
            return 0.0
        start = np.asarray(start, np.float64)
        d = (np.asarray(end, np.float64) - start) / T
        mid = start[None, :] + 0.5 * (t[:-1] + t[1:])[:, None] * d[None, :]
        cell = np.clip(np.floor(mid).astype(np.int64), 0, self.size - 1)
        return float(np.sum(self.get_voxel(cell) * (t[1:] - t[:-1])))
