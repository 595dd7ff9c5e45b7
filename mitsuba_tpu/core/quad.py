"""Numerical quadrature: adaptive Gauss-Lobatto + tensor-product integration.

Capability parity with reference include/mitsuba/core/quad.h
(GaussLobattoIntegrator, NDIntegrator). The adaptive Lobatto rule runs
host-side (numpy recursion — used for test-time pdf integration, not in the
render path); `sphere_integrate` is a fixed-order jnp tensor rule used by the
χ² harness.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_ALPHA = np.sqrt(2.0 / 3.0)
_BETA = 1.0 / np.sqrt(5.0)


def gauss_lobatto(f, a, b, abs_err=1e-8, rel_err=1e-8, max_depth=20):
    """Adaptive Gauss-Lobatto-Kronrod quadrature (Gander & Gautschi),
    the same scheme as the reference's GaussLobattoIntegrator."""
    m_, h = 0.5 * (a + b), 0.5 * (b - a)
    x = m_ + h * np.array([-1.0, -_ALPHA, -_BETA, 0.0, _BETA, _ALPHA, 1.0])
    y = np.array([f(xi) for xi in x])
    i2 = (h / 6.0) * (y[0] + y[6] + 5.0 * (y[2] + y[4]))
    i1 = (h / 1470.0) * (
        77.0 * (y[0] + y[6]) + 432.0 * (y[1] + y[5]) + 625.0 * (y[2] + y[4]) + 672.0 * y[3]
    )
    scale = max(abs(i1), abs_err / rel_err) if rel_err > 0 else abs(i1)
    tol = max(abs_err, rel_err * abs(scale))

    def rec(f, a, b, fa, fb, tol, depth):
        m_, h = 0.5 * (a + b), 0.5 * (b - a)
        mll, ml, mr, mrr = m_ - _ALPHA * h, m_ - _BETA * h, m_ + _BETA * h, m_ + _ALPHA * h
        fmll, fml, fm, fmr, fmrr = f(mll), f(ml), f(m_), f(mr), f(mrr)
        i2 = (h / 6.0) * (fa + fb + 5.0 * (fml + fmr))
        i1 = (h / 1470.0) * (
            77.0 * (fa + fb) + 432.0 * (fmll + fmrr) + 625.0 * (fml + fmr) + 672.0 * fm
        )
        if depth >= max_depth or abs(i1 - i2) <= tol * (b - a) or mll <= a or b <= mrr:
            return i1
        return (
            rec(f, a, mll, fa, fmll, tol, depth + 1)
            + rec(f, mll, ml, fmll, fml, tol, depth + 1)
            + rec(f, ml, m_, fml, fm, tol, depth + 1)
            + rec(f, m_, mr, fm, fmr, tol, depth + 1)
            + rec(f, mr, mrr, fmr, fmrr, tol, depth + 1)
            + rec(f, mrr, b, fmrr, fb, tol, depth + 1)
        )

    return rec(f, a, b, y[0], y[6], tol / max(h, 1e-300), 0)


def sphere_bin_integrate(pdf_fn, theta_res, phi_res, sub=8):
    """Integrate a solid-angle pdf over a (theta_res x phi_res) grid of bins.

    Used by the χ² harness: returns (theta_res, phi_res) expected bin masses.
    Fixed-order midpoint × sin(theta) weighting on a sub×sub refinement of
    each bin — fully vectorized replacement for the reference's per-bin
    adaptive Lobatto (chisquare.cpp).
    """
    t_edges = jnp.linspace(0.0, jnp.pi, theta_res + 1)
    p_edges = jnp.linspace(0.0, 2.0 * jnp.pi, phi_res + 1)
    dt = (t_edges[1] - t_edges[0]) / sub
    dp = (p_edges[1] - p_edges[0]) / sub
    t_sub = (jnp.arange(theta_res * sub) + 0.5) * dt
    p_sub = (jnp.arange(phi_res * sub) + 0.5) * dp
    tt, pp = jnp.meshgrid(t_sub, p_sub, indexing="ij")
    st, ct = jnp.sin(tt), jnp.cos(tt)
    d = jnp.stack([st * jnp.cos(pp), st * jnp.sin(pp), ct], axis=-1)
    vals = pdf_fn(d) * st * dt * dp
    vals = vals.reshape(theta_res, sub, phi_res, sub).sum(axis=(1, 3))
    return vals


# ---------------------------------------------------------------------------
# adaptive N-D cubature (reference NDIntegrator, quad.h:136)
# ---------------------------------------------------------------------------
#
# Genz & Malik's embedded degree-7/5 rule over N-dimensional rectangles
# with error-driven region subdivision — the same published algorithm
# the reference wraps (quad.h cites Genz & Malik 1980 / Berntsen,
# Espelid & Genz 1991).  Written batch-first for vector hardware: every
# pending region's full point set is evaluated in ONE call to the
# integrand (points stacked along the leading axis), so `f` may be a
# jitted JAX function; the region queue is plain numpy (host-side
# control, like the reference's CPU cubature).

def _genz_malik_rule(dim):
    """Points (P, dim) in [-1,1]^dim and weights (w7 (P,), w5 (P,)) of
    the embedded degree-7/5 Genz-Malik rule, plus the index slices of
    the lambda2/lambda3 axis points used for the split heuristic."""
    l2 = np.sqrt(9.0 / 70.0)
    l3 = np.sqrt(9.0 / 10.0)
    l4 = np.sqrt(9.0 / 10.0)
    l5 = np.sqrt(9.0 / 19.0)
    n = dim
    pts = [np.zeros((1, n))]
    # +-lambda2 e_i, then +-lambda3 e_i (order matters for the split rule)
    for lam in (l2, l3):
        block = np.zeros((2 * n, n))
        for i in range(n):
            block[2 * i, i] = lam
            block[2 * i + 1, i] = -lam
        pts.append(block)
    # (+-l4, +-l4) on every axis pair
    pairs = []
    for i in range(n):
        for j in range(i + 1, n):
            for si in (l4, -l4):
                for sj in (l4, -l4):
                    row = np.zeros(n)
                    row[i] = si
                    row[j] = sj
                    pairs.append(row)
    if pairs:
        pts.append(np.asarray(pairs))
    # full corners at +-l5
    corners = np.stack(np.meshgrid(*([np.array([l5, -l5])] * n),
                                   indexing="ij"), -1).reshape(-1, n)
    pts.append(corners)
    pts = np.concatenate(pts, 0)

    w1 = (12824.0 - 9120.0 * n + 400.0 * n * n) / 19683.0
    w2 = 980.0 / 6561.0
    w3 = (1820.0 - 400.0 * n) / 19683.0
    w4 = 200.0 / 19683.0
    w5c = 6859.0 / 19683.0 / (1 << n)
    w1e = (729.0 - 950.0 * n + 50.0 * n * n) / 729.0
    w2e = 245.0 / 486.0
    w3e = (265.0 - 100.0 * n) / 1458.0
    w4e = 25.0 / 729.0
    npair = 2 * n * (n - 1)
    w7 = np.concatenate([
        [w1], np.full(2 * n, w2), np.full(2 * n, w3),
        np.full(npair, w4), np.full(1 << n, w5c)])
    w5 = np.concatenate([
        [w1e], np.full(2 * n, w2e), np.full(2 * n, w3e),
        np.full(npair, w4e), np.zeros(1 << n)])
    return pts, w7, w5, l2, l3


def ndintegrate(f, fdim, lo, hi, max_evals=0, abs_err=0.0, rel_err=1e-6,
                max_regions=10000):
    """Adaptively integrate `f` over the box [lo, hi].

    f: callable (P, dim) -> (P, fdim) evaluated on batches of points.
    Returns (result (fdim,), error (fdim,), n_evals).  Mirrors the
    reference NDIntegrator::integrateVectorized contract (quad.h:200)
    with numpy arrays in place of pointer blocks."""
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    dim = lo.shape[0]
    if dim == 0:
        raise ValueError("dim must be >= 1")
    pts, w7, w5, l2, l3 = _genz_malik_rule(dim)
    P = pts.shape[0]
    ratio = (l2 * l2) / (l3 * l3)

    def eval_regions(centers, halfw):
        """centers/halfw (R, dim) -> (I7 (R,fdim), err (R,fdim),
        split_dim (R,))."""
        Rn = centers.shape[0]
        x = centers[:, None, :] + pts[None, :, :] * halfw[:, None, :]
        y = np.asarray(f(x.reshape(Rn * P, dim)), np.float64)
        y = y.reshape(Rn, P, fdim)
        vol = np.prod(2.0 * halfw, -1)    # weights are mean-normalized
        i7 = np.einsum("rpf,p->rf", y, w7) * vol[:, None]
        i5 = np.einsum("rpf,p->rf", y, w5) * vol[:, None]
        err = np.abs(i7 - i5)
        # fourth-difference split heuristic over the lambda2/lambda3 axes
        fc = y[:, 0:1, :]
        f2 = y[:, 1:1 + 2 * dim, :].reshape(Rn, dim, 2, fdim).sum(2)
        f3 = y[:, 1 + 2 * dim:1 + 4 * dim, :].reshape(
            Rn, dim, 2, fdim).sum(2)
        diff = np.abs(f2 - 2.0 * fc - ratio * (f3 - 2.0 * fc)).sum(-1)
        return i7, err, np.argmax(diff, -1)

    centers = (lo + hi)[None, :] * 0.5
    halfw = (hi - lo)[None, :] * 0.5
    i7, err, sd = eval_regions(centers, halfw)
    n_evals = P
    # region heap as flat arrays (few regions; numpy argmax is the heap)
    R_c, R_h, R_i, R_e, R_s = [centers], [halfw], [i7], [err], [sd]

    def totals():
        vals = np.concatenate(R_i, 0).sum(0)
        errs = np.concatenate(R_e, 0).sum(0)
        return vals, errs

    while True:
        vals, errs = totals()
        tol = np.maximum(abs_err, rel_err * np.abs(vals))
        if np.all(errs <= tol):
            break
        if max_evals and n_evals >= max_evals:
            break
        if sum(c.shape[0] for c in R_c) >= max_regions:
            break
        # split the worst region along its suggested dimension
        allc = np.concatenate(R_c, 0)
        allh = np.concatenate(R_h, 0)
        alli = np.concatenate(R_i, 0)
        alle = np.concatenate(R_e, 0)
        alls = np.concatenate(R_s, 0)
        worst = np.argmax(alle.sum(-1))
        c0 = allc[worst]
        h0 = allh[worst].copy()
        d0 = alls[worst]
        h0[d0] *= 0.5
        c_lo = c0.copy()
        c_lo[d0] -= h0[d0]
        c_hi = c0.copy()
        c_hi[d0] += h0[d0]
        nc = np.stack([c_lo, c_hi], 0)
        nh = np.stack([h0, h0], 0)
        ni, ne, ns = eval_regions(nc, nh)
        n_evals += 2 * P
        keep = np.ones(allc.shape[0], bool)
        keep[worst] = False
        R_c = [allc[keep], nc]
        R_h = [allh[keep], nh]
        R_i = [alli[keep], ni]
        R_e = [alle[keep], ne]
        R_s = [alls[keep], ns]

    vals, errs = totals()
    return vals, errs, n_evals
