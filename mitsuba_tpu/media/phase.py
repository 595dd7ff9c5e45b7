"""Phase functions: isotropic, Henyey–Greenstein, Kajiya–Kay, microflake.

Capability parity with reference src/phase/ (isotropic.cpp, hg.cpp,
kajiyakay.cpp, microflake.cpp).  Conventions: wi points toward where the
light came FROM (backward along the incident ray), wo is the new outgoing
direction; cos_theta below is dot(-wi_ray_dir_convention)… concretely we
follow the reference: eval(wi_dir, wo) with wi_dir the propagation
direction of the incoming ray, so forward scattering means
dot(wi_dir, wo) ≈ +1.  pdfs are w.r.t. solid angle and equal eval (phase
functions are normalized densities).
"""
from __future__ import annotations

import jax.numpy as jnp

from mitsuba_tpu.core import math as m
from mitsuba_tpu.core import warp

ISOTROPIC, HG, KAJIYA_KAY, MICROFLAKE = 0, 1, 2, 3


def _hg(cos_t, g):
    """cos_t = dot(propagation_dir, wo): forward peak at +1 for g>0.
    (The reference hg.cpp writes +2g·cosθ because its wi points TOWARD the
    source — opposite sign convention, same function.)"""
    denom = 1.0 + g * g - 2.0 * g * cos_t
    return m.INV_FOURPI * (1.0 - g * g) / jnp.power(jnp.maximum(denom, 1e-8), 1.5)


def phase_eval(kind: int, g, wi_dir, wo, fiber_axis=None):
    """Phase value (= pdf, normalized) for propagation dir wi_dir → wo."""
    if kind == ISOTROPIC:
        return jnp.full(wi_dir.shape[:-1], m.INV_FOURPI)
    if kind == HG:
        return _hg(m.dot(wi_dir, wo), g)
    if kind == KAJIYA_KAY:
        # reference kajiyakay.cpp: scattering about the local fiber axis;
        # normalized sin-lobe around the axis-orthogonal plane
        axis = fiber_axis if fiber_axis is not None else jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0]), wi_dir.shape
        )
        cos_o = m.dot(axis, wo)
        sin_o = jnp.sqrt(jnp.maximum(1.0 - cos_o * cos_o, 0.0))
        # normalization: int sin(theta_axis) dω = pi^2 -> p = sin / pi^2... use
        # exact: ∫ sinθ dω = 2π·∫ sin²θ dθ = π² ⇒ pdf = sinθ/π²
        return sin_o / (jnp.pi * jnp.pi)
    if kind == MICROFLAKE:
        # sin^2-distributed flakes (fiber-like) — normalized sin² lobe:
        # ∫ sin²θ dω = 2π·(4/3)·... = 8π/3 ⇒ pdf = 3 sin²θ / (8π)
        axis = fiber_axis if fiber_axis is not None else jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0]), wi_dir.shape
        )
        cos_o = m.dot(axis, wo)
        sin2 = jnp.maximum(1.0 - cos_o * cos_o, 0.0)
        return 3.0 * sin2 / (8.0 * jnp.pi)
    raise ValueError(kind)


def phase_pdf(kind: int, g, wi_dir, wo, fiber_axis=None):
    return phase_eval(kind, g, wi_dir, wo, fiber_axis)


def phase_sample(kind: int, g, wi_dir, u2, fiber_axis=None):
    """Sample wo ~ phase(wi_dir, ·). Returns (wo, pdf). weight = 1 (exact)."""
    if kind == ISOTROPIC:
        wo = warp.square_to_uniform_sphere(u2)
        return wo, jnp.full(wi_dir.shape[:-1], m.INV_FOURPI)
    if kind == HG:
        g_safe = jnp.where(jnp.abs(g) < 1e-4, 1e-4, g)
        sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * u2[..., 0])
        cos_t = jnp.where(
            jnp.abs(g) < 1e-4,
            1.0 - 2.0 * u2[..., 0],
            (1.0 + g * g - sqr * sqr) / (2.0 * g_safe),
        )
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        phi = 2.0 * jnp.pi * u2[..., 1]
        local = jnp.stack(
            [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
        )
        frame = m.Frame.from_normal(wi_dir)
        wo = frame.to_world(local)
        return wo, _hg(m.dot(wi_dir, wo), g)
    if kind in (KAJIYA_KAY, MICROFLAKE):
        # sample via inversion of the sin / sin² marginal around the axis
        axis = fiber_axis if fiber_axis is not None else jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0]), wi_dir.shape
        )
        u0 = u2[..., 0]
        if kind == KAJIYA_KAY:
            # marginal p(θ) = 2sin²θ/π, cdf(θ) = (θ - sinθcosθ)/π:
            # bisection (endpoint derivatives vanish, Newton is unstable)
            lo = jnp.zeros_like(u0)
            hi = jnp.full_like(u0, jnp.pi)
            for _ in range(24):
                mid = 0.5 * (lo + hi)
                cdf = (mid - jnp.sin(mid) * jnp.cos(mid)) / jnp.pi
                lo = jnp.where(cdf < u0, mid, lo)
                hi = jnp.where(cdf < u0, hi, mid)
            cos_t = jnp.cos(0.5 * (lo + hi))
        else:
            # sin²-lobe: cdf over c=cosθ decreasing: (c³/3 - c + 2/3)/(4/3)
            lo = jnp.full_like(u0, -1.0)
            hi = jnp.ones_like(u0)
            for _ in range(24):
                mid = 0.5 * (lo + hi)
                cdf = (mid ** 3 / 3.0 - mid + 2.0 / 3.0) / (4.0 / 3.0)
                # cdf decreases with c; want cdf(c) = u0
                hi = jnp.where(cdf < u0, mid, hi)
                lo = jnp.where(cdf < u0, lo, mid)
            cos_t = 0.5 * (lo + hi)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        phi = 2.0 * jnp.pi * u2[..., 1]
        local = jnp.stack(
            [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
        )
        frame = m.Frame.from_normal(axis)
        wo = frame.to_world(local)
        return wo, phase_eval(kind, g, wi_dir, wo, fiber_axis)
    raise ValueError(kind)
