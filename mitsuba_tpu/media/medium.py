"""Participating media: homogeneous closed-form + heterogeneous grids with
Woodcock (delta) tracking.

Capability parity with reference src/medium/homogeneous.cpp (closed-form
sampleDistance/getTransmittance) and src/medium/heterogeneous.cpp:79-96,317
(grid densities + Woodcock tracking), and the grid volume data sources
(src/volume/gridvolume.cpp, constvolume.cpp).

A scene carries ONE ambient medium table (v1 scope: the medium fills space;
shape-interior binding is tracked for a later round).  All functions are
batched over the wavefront and differentiable in sigma_s/sigma_a.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.core.types import pytree_dataclass, static_field
from mitsuba_tpu.media.phase import HG, ISOTROPIC

HOMOGENEOUS, HETEROGENEOUS = 0, 1


@pytree_dataclass
class MediumTable:
    sigma_s: jnp.ndarray        # (3,) scattering coefficient
    sigma_a: jnp.ndarray        # (3,) absorption
    phase_g: jnp.ndarray        # () HG anisotropy
    density: jnp.ndarray        # (D, H, W) density grid (hetero) or (1,1,1)
    world_to_grid: jnp.ndarray  # (4, 4)
    density_scale: jnp.ndarray  # ()
    max_density: jnp.ndarray    # () Woodcock majorant
    kind: int = static_field(default=HOMOGENEOUS)
    phase_kind: int = static_field(default=ISOTROPIC)
    enabled: bool = static_field(default=False)

    @property
    def sigma_t(self):
        return self.sigma_s + self.sigma_a


def no_medium() -> MediumTable:
    return MediumTable(
        sigma_s=jnp.zeros(3), sigma_a=jnp.zeros(3),
        phase_g=jnp.zeros(()), density=jnp.ones((1, 1, 1)),
        world_to_grid=jnp.eye(4), density_scale=jnp.ones(()),
        max_density=jnp.zeros(()), kind=HOMOGENEOUS,
        phase_kind=ISOTROPIC, enabled=False,
    )


def make_homogeneous(sigma_s, sigma_a, g: float = 0.0,
                     phase_kind: int = None) -> MediumTable:
    pk = HG if (phase_kind is None and g != 0.0) else (
        phase_kind if phase_kind is not None else ISOTROPIC
    )
    return MediumTable(
        sigma_s=jnp.asarray(sigma_s, jnp.float32),
        sigma_a=jnp.asarray(sigma_a, jnp.float32),
        phase_g=jnp.asarray(g, jnp.float32),
        density=jnp.ones((1, 1, 1)),
        world_to_grid=jnp.eye(4),
        density_scale=jnp.ones(()),
        max_density=jnp.ones(()),
        kind=HOMOGENEOUS, phase_kind=pk, enabled=True,
    )


def make_heterogeneous(density_grid, world_to_grid, sigma_s, sigma_a,
                       density_scale: float = 1.0, g: float = 0.0) -> MediumTable:
    """density_grid: (D, H, W) densities; world_to_grid maps world points to
    grid index space [0,D)x[0,H)x[0,W) (z,y,x order)."""
    grid = jnp.asarray(density_grid, jnp.float32)
    return MediumTable(
        sigma_s=jnp.asarray(sigma_s, jnp.float32),
        sigma_a=jnp.asarray(sigma_a, jnp.float32),
        phase_g=jnp.asarray(g, jnp.float32),
        density=grid,
        world_to_grid=jnp.asarray(world_to_grid, jnp.float32),
        density_scale=jnp.asarray(density_scale, jnp.float32),
        max_density=jnp.max(grid) * density_scale,
        kind=HETEROGENEOUS,
        phase_kind=HG if g != 0.0 else ISOTROPIC,
        enabled=True,
    )


def lookup_density(med: MediumTable, p):
    """Trilinear density lookup at world points p (N,3). 0 outside the grid
    (reference gridvolume.cpp lookupFloat)."""
    if med.kind == HOMOGENEOUS:
        return jnp.ones(p.shape[:-1]) * med.density_scale
    from mitsuba_tpu.core import transform as tf

    g = tf.apply_point(med.world_to_grid, p)   # (N,3) in (x,y,z) grid coords
    d, h, w = med.density.shape
    x, y, z = g[..., 0], g[..., 1], g[..., 2]
    inside = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1) & (z >= 0) & (z <= d - 1)
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    z = jnp.clip(z, 0.0, d - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2) if w > 1 else jnp.zeros_like(x, jnp.int32)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2) if h > 1 else jnp.zeros_like(y, jnp.int32)
    z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, d - 2) if d > 1 else jnp.zeros_like(z, jnp.int32)
    fx = x - x0
    fy = y - y0
    fz = z - z0
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    z1 = jnp.minimum(z0 + 1, d - 1)
    dd = med.density
    c = (
        dd[z0, y0, x0] * (1 - fx) * (1 - fy) * (1 - fz)
        + dd[z0, y0, x1] * fx * (1 - fy) * (1 - fz)
        + dd[z0, y1, x0] * (1 - fx) * fy * (1 - fz)
        + dd[z0, y1, x1] * fx * fy * (1 - fz)
        + dd[z1, y0, x0] * (1 - fx) * (1 - fy) * fz
        + dd[z1, y0, x1] * fx * (1 - fy) * fz
        + dd[z1, y1, x0] * (1 - fx) * fy * fz
        + dd[z1, y1, x1] * fx * fy * fz
    )
    return jnp.where(inside, c * med.density_scale, 0.0)


def medium_transmittance(med: MediumTable, o, d, dist, u=None, n_steps: int = 32):
    """Transmittance along segments [o, o + d*dist] (reference
    Medium::getTransmittance, medium.h:141).

    Homogeneous: exp(-sigma_t·dist) exactly.  Heterogeneous: ratio tracking
    with a fixed step budget (unbiased in expectation given u; falls back to
    quadrature ray marching when u is None)."""
    if not med.enabled:
        return jnp.ones(o.shape[:-1] + (3,))
    if med.kind == HOMOGENEOUS:
        return jnp.exp(-med.sigma_t[None, :] * dist[..., None])
    # heterogeneous: composite midpoint ray marching of optical depth
    # (reference heterogeneous.cpp ray marching branch)
    ts = (jnp.arange(n_steps) + 0.5) / n_steps     # (S,)
    pts = o[:, None, :] + d[:, None, :] * (dist[:, None] * ts[None, :])[..., None]
    rho = lookup_density(med, pts.reshape(-1, 3)).reshape(o.shape[0], n_steps)
    tau = rho.sum(axis=1) * (dist / n_steps)
    return jnp.exp(-med.sigma_t[None, :] * tau[..., None])


def sample_distance(med: MediumTable, o, d, max_dist, u_channel, u_dist,
                    key=None, n_woodcock: int = 64):
    """Sample a medium interaction along rays (reference
    Medium::sampleDistance, medium.h:110).

    Returns dict(valid: interacted before max_dist, t, p, weight (3,),
    surface_weight (3,)): `weight` multiplies throughput on a medium event
    (sigma_s/pdf already folded: = sigma_s/sigma_t for the analog schemes);
    `surface_weight` multiplies throughput when the surface is reached
    (accounts for transmittance/pdf ratio = 1 for analog sampling).
    """
    n = o.shape[0]
    if not med.enabled:
        return dict(
            valid=jnp.zeros(n, bool), t=max_dist, p=o + d * max_dist[:, None],
            weight=jnp.ones((n, 3)), surface_weight=jnp.ones((n, 3)),
        )
    sigma_t = med.sigma_t
    if med.kind == HOMOGENEOUS:
        # channel-stratified exponential sampling (reference homogeneous.cpp
        # strategy EBalance): pick channel uniformly, pdf = mean over channels
        ch = jnp.clip((u_channel * 3).astype(jnp.int32), 0, 2)
        st_ch = sigma_t[ch]
        # branch-safe divisor: max(st, eps) has an O(1/eps^2) partial that
        # overflows to inf for vacuum lanes, and 0-cotangent * inf = NaN in
        # reverse mode — divide by 1 there instead (result masked anyway)
        st_div = jnp.where(st_ch > 0, st_ch, 1.0)
        t_raw = -jnp.log(jnp.maximum(1.0 - u_dist, 1e-20)) / st_div
        t = jnp.where(st_ch > 0, t_raw, max_dist)
        valid = (t < max_dist) & (st_ch > 0)
        t_clamped = jnp.minimum(t, max_dist)
        tr = jnp.exp(-sigma_t[None, :] * t_clamped[:, None])       # (N,3)
        # pdf of sampling t (medium event): mean_c sigma_c exp(-sigma_c t)
        pdf_t = jnp.mean(sigma_t[None, :] * tr, axis=1)
        # prob of exceeding max_dist: mean_c exp(-sigma_c·max)
        tr_max = jnp.exp(-sigma_t[None, :] * max_dist[:, None])
        pdf_surf = jnp.mean(tr_max, axis=1)
        weight = med.sigma_s[None, :] * tr / jnp.maximum(pdf_t, 1e-20)[:, None]
        surface_weight = tr_max / jnp.maximum(pdf_surf, 1e-20)[:, None]
        return dict(
            valid=valid, t=t_clamped, p=o + d * t_clamped[:, None],
            weight=weight, surface_weight=surface_weight,
        )
    # ---- heterogeneous: Woodcock / delta tracking (heterogeneous.cpp:317)
    assert key is not None, "woodcock tracking needs a PRNG key"
    # majorant: max channel extinction × max grid density (already scaled)
    sig_m = jnp.maximum(jnp.max(sigma_t) * med.max_density, 1e-6)

    def body(i, state):
        t, done, accept, k = state
        k, k1, k2 = jax.random.split(k, 3)
        step = -jnp.log(jnp.maximum(1.0 - jax.random.uniform(k1, (n,)), 1e-20)) / sig_m
        t_new = t + step
        escaped = t_new >= max_dist
        p = o + d * jnp.minimum(t_new, max_dist)[:, None]
        rho = lookup_density(med, p)   # includes density_scale
        real = jax.random.uniform(k2, (n,)) < (rho * jnp.max(sigma_t) / sig_m)
        newly_escaped = ~done & escaped
        newly_real = ~done & ~escaped & real
        t = jnp.where(done, t, t_new)
        accept = accept | newly_real
        done = done | newly_escaped | newly_real
        return t, done, accept, k

    t0 = jnp.zeros(n)
    done0 = jnp.zeros(n, bool)
    acc0 = jnp.zeros(n, bool)
    t, done, accept, _ = jax.lax.fori_loop(0, n_woodcock, body, (t0, done0, acc0, key))
    t = jnp.where(accept, t, max_dist)
    valid = accept
    # analog delta tracking: weight = sigma_s/sigma_t (single-channel gray
    # assumption for the spectral shape; exact for gray media)
    weight = jnp.broadcast_to(
        med.sigma_s / jnp.maximum(jnp.max(sigma_t), 1e-8), (n, 3)
    )
    return dict(
        valid=valid, t=t, p=o + d * t[:, None],
        weight=weight, surface_weight=jnp.ones((n, 3)),
    )


# ---------------------------------------------------------------------------
# Shape-attached interior media (reference: Shape::setInteriorMedium /
# BSDF boundaries in volpath.cpp; media bind to shapes in the scene XML).
# TPU re-design: a small SoA stack of HOMOGENEOUS media; every lane carries
# its current medium index (-1 = vacuum/ambient), parameters are fetched
# with a one-hot gather, and the closed-form homogeneous sampling runs
# per-lane on the gathered sigmas.  Heterogeneous grids stay ambient-only.
# ---------------------------------------------------------------------------

@pytree_dataclass
class MediumStack:
    sigma_s: jnp.ndarray      # (K, 3)
    sigma_a: jnp.ndarray      # (K, 3)
    phase_g: jnp.ndarray      # (K,)

    @property
    def n_media(self):
        return self.sigma_s.shape[0]


def make_medium_stack(media) -> MediumStack:
    """media: list of (sigma_s, sigma_a, g) triples."""
    if not media:
        return MediumStack(
            sigma_s=jnp.zeros((0, 3)), sigma_a=jnp.zeros((0, 3)),
            phase_g=jnp.zeros((0,)),
        )
    ss = jnp.asarray([m_[0] for m_ in media], jnp.float32)
    sa = jnp.asarray([m_[1] for m_ in media], jnp.float32)
    g = jnp.asarray([m_[2] for m_ in media], jnp.float32)
    return MediumStack(sigma_s=ss, sigma_a=sa, phase_g=g)


def stack_params(stack: MediumStack, cur):
    """Per-lane (sigma_s, sigma_a, g, inside) for medium index cur (N,)
    (-1 = vacuum -> zeros).  One-hot gather (K is tiny)."""
    n = cur.shape[0]
    if stack is None or stack.n_media == 0:
        z = jnp.zeros((n, 3))
        return z, z, jnp.zeros(n), jnp.zeros(n, bool)
    onehot = (cur[:, None] == jnp.arange(stack.n_media)[None, :]).astype(
        jnp.float32)
    inside = cur >= 0
    # cotangent firewall: the @ contraction sums EVERY lane's cotangent
    # into the parameter gradient, including garbage from masked vacuum
    # lanes (inf partials x zero values -> NaN). Gating with where() kills
    # masked-lane cotangents before they reach the matmul.
    gate = inside[:, None]
    ss = jnp.where(gate, onehot @ stack.sigma_s, 0.0)
    sa = jnp.where(gate, onehot @ stack.sigma_a, 0.0)
    g = jnp.where(inside, onehot @ stack.phase_g, 0.0)
    return ss, sa, g, inside


def stack_sample_distance(ss, sa, max_dist, u_channel, u_dist):
    """Per-lane closed-form homogeneous distance sampling (same estimator
    as sample_distance's HOMOGENEOUS branch, with (N,3) sigmas).

    Detached-sampling convention (matches the surface estimator): the
    sampled distance and the sampling pdfs are stop-gradiented DECISIONS;
    sigma-dependence flows only through the differentiable re-evaluation
    of sigma_s·Tr.  This is also what keeps reverse-mode clean — the
    decision chains (positions, loop geometry) carry no sigma partials."""
    detach = jax.lax.stop_gradient
    st = ss + sa
    ch = jnp.clip((u_channel * 3).astype(jnp.int32), 0, 2)
    st_ch = jnp.take_along_axis(st, ch[:, None], axis=1)[:, 0]
    # branch-safe divisor: avoids 0 * inf = NaN in reverse mode on vacuum
    st_div = jnp.where(st_ch > 0, st_ch, 1.0)
    t_raw = -jnp.log(jnp.maximum(1.0 - u_dist, 1e-20)) / st_div
    t = jnp.where(st_ch > 0, t_raw, max_dist)
    max_d = detach(max_dist)
    t_cl = detach(jnp.minimum(t, max_d))
    valid = detach(t < max_d) & (st_ch > 0)
    tr = jnp.exp(-st * t_cl[:, None])
    pdf_t = detach(jnp.mean(st * tr, axis=1))
    tr_max = jnp.exp(-st * max_d[:, None])
    pdf_surf = detach(jnp.mean(tr_max, axis=1))
    weight = ss * tr / jnp.maximum(pdf_t, 1e-20)[:, None]
    surface_weight = tr_max / jnp.maximum(pdf_surf, 1e-20)[:, None]
    return dict(valid=valid, t=t_cl, weight=weight,
                surface_weight=surface_weight)


def stack_transmittance(ss, sa, dist):
    """exp(-(sigma_t) * dist) per lane (homogeneous closed form)."""
    return jnp.exp(-(ss + sa) * dist[:, None])
