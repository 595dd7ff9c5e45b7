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
