"""Brent's method root finder, batched (reference include/mitsuba/core/brent.h:36).

Vectorized over lanes with a fixed iteration budget inside jit — every lane
runs the bisection / secant / inverse-quadratic hybrid in lockstep, masked
once converged (textbook Brent–Dekker with the `mflag` conditions)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def brent(f, a, b, xtol: float = 1e-7, ftol: float = 1e-12, max_iter: int = 80):
    """Find roots of f on brackets [a, b] per lane (f(a)·f(b) <= 0).

    Returns (x, converged)."""
    a = jnp.asarray(a, jnp.float32) * 1.0
    b = jnp.asarray(b, jnp.float32) * 1.0
    fa = f(a)
    fb = f(b)
    bad = fa * fb > 0
    # ensure |f(a)| >= |f(b)|
    swap = jnp.abs(fa) < jnp.abs(fb)
    a, b = jnp.where(swap, b, a), jnp.where(swap, a, b)
    fa, fb = jnp.where(swap, fb, fa), jnp.where(swap, fa, fb)
    c, fc = a, fa
    d = a  # only used after mflag set
    mflag = jnp.ones_like(a, bool)

    def body(i, st):
        a, b, c, d, fa, fb, fc, mflag, done = st
        # candidate s
        use_iqi = (fa != fc) & (fb != fc)
        denom1 = jnp.where((fa - fb) == 0, 1.0, (fa - fb))
        denom2 = jnp.where((fa - fc) == 0, 1.0, (fa - fc))
        denom3 = jnp.where((fb - fc) == 0, 1.0, (fb - fc))
        s_iqi = (
            a * fb * fc / (denom1 * denom2)
            - b * fa * fc / (denom1 * denom3)
            + c * fa * fb / (denom2 * denom3)
        )
        s_sec = b - fb * (b - a) / denom1
        s = jnp.where(use_iqi, s_iqi, s_sec)
        lo = (3 * a + b) / 4
        cond1 = ~(((s > lo) & (s < b)) | ((s < lo) & (s > b)))
        cond2 = mflag & (jnp.abs(s - b) >= jnp.abs(b - c) / 2)
        cond3 = ~mflag & (jnp.abs(s - b) >= jnp.abs(c - d) / 2)
        cond4 = mflag & (jnp.abs(b - c) < xtol)
        cond5 = ~mflag & (jnp.abs(c - d) < xtol)
        bisect = cond1 | cond2 | cond3 | cond4 | cond5
        s = jnp.where(bisect, (a + b) / 2, s)
        new_mflag = bisect
        fs = f(s)
        d_new = c
        c_new, fc_new = b, fb
        take_left = fa * fs < 0
        a2 = jnp.where(take_left, a, s)
        fa2 = jnp.where(take_left, fa, fs)
        b2 = jnp.where(take_left, s, b)
        fb2 = jnp.where(take_left, fs, fb)
        swap2 = jnp.abs(fa2) < jnp.abs(fb2)
        a3 = jnp.where(swap2, b2, a2)
        b3 = jnp.where(swap2, a2, b2)
        fa3 = jnp.where(swap2, fb2, fa2)
        fb3 = jnp.where(swap2, fa2, fb2)
        new_done = done | (jnp.abs(fb3) <= ftol) | (jnp.abs(b3 - a3) < xtol)

        def sel(old, new):
            return jnp.where(done, old, new)

        return (
            sel(a, a3), sel(b, b3), sel(c, c_new), sel(d, d_new),
            sel(fa, fa3), sel(fb, fb3), sel(fc, fc_new),
            sel(mflag, new_mflag), new_done,
        )

    done0 = bad | (jnp.abs(fb) <= ftol)
    st = jax.lax.fori_loop(
        0, max_iter, body, (a, b, c, d, fa, fb, fc, mflag, done0)
    )
    b_final = st[1]
    fb_final = st[5]
    return b_final, (jnp.abs(fb_final) < 1e-4) & ~bad
