"""Dipole BSSRDF subsurface scattering (Jensen et al. 2001).

Capability parity with reference src/subsurface/dipole.cpp:362-468 (+ the
parallel irradiance sampling process irrproc.cpp and the octree gather
irrtree.cpp).  TPU re-design:

  * irradiance sample points: area-weighted surface samples, ALL points'
    irradiance estimated in one vectorized NEE batch (the reference runs an
    `IrradianceSamplingProcess` over worker threads);
  * the octree hierarchy (irrtree.cpp) is replaced by a dense
    (hits × samples) contraction: Lo(x) = Ft/π Σ_i Rd(|x-xi|) E_i A_i —
    a large elementwise+reduction map that XLA tiles well; for big M use
    chunked scan.  No pointer-chasing, no hierarchy.

The adipole/multipole variants (src/subsurface/{adipole,multipole}.cpp)
share this machinery with a different Rd profile; `dipole_rd` is the
classic isotropic profile.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.core import math as m
from mitsuba_tpu.core import warp
from mitsuba_tpu.core.fresnel import fresnel
from mitsuba_tpu.core.types import pytree_dataclass, static_field
from mitsuba_tpu.emitters import sample_direct
from mitsuba_tpu.render.intersect import ray_test
from mitsuba_tpu.render.records import Ray


@pytree_dataclass
class DipoleParams:
    sigma_s: jnp.ndarray      # (3,) scattering
    sigma_a: jnp.ndarray      # (3,) absorption
    g: jnp.ndarray            # () HG anisotropy (reduces sigma_s)
    eta: jnp.ndarray          # () relative IOR
    # derived (build-time)
    sigma_tr: jnp.ndarray     # (3,) effective transport coefficient
    zr: jnp.ndarray           # (3,) real source depth
    zv: jnp.ndarray           # (3,) virtual source depth
    alpha_p: jnp.ndarray      # (3,) reduced albedo


def make_dipole(sigma_s, sigma_a, g: float = 0.0, eta: float = 1.33) -> DipoleParams:
    ss = jnp.asarray(sigma_s, jnp.float32)
    sa = jnp.asarray(sigma_a, jnp.float32)
    ss_p = ss * (1.0 - g)                       # reduced scattering
    st_p = ss_p + sa
    alpha_p = ss_p / jnp.maximum(st_p, 1e-9)
    sigma_tr = jnp.sqrt(3.0 * sa * st_p)
    # boundary condition (reference dipole.cpp configure)
    fdr = -1.440 / eta ** 2 + 0.710 / eta + 0.668 + 0.0636 * eta
    a_bc = (1.0 + fdr) / (1.0 - fdr)
    zr = 1.0 / jnp.maximum(st_p, 1e-9)
    zv = zr * (1.0 + 4.0 / 3.0 * a_bc)
    return DipoleParams(
        sigma_s=ss, sigma_a=sa, g=jnp.asarray(g, jnp.float32),
        eta=jnp.asarray(eta, jnp.float32),
        sigma_tr=sigma_tr, zr=zr, zv=zv, alpha_p=alpha_p,
    )


def dipole_rd(p: DipoleParams, r):
    """Diffuse reflectance profile Rd(r) (Jensen dipole; reference
    dipole.cpp Rd evaluation). r: (...,) distances → (..., 3)."""
    r = jnp.maximum(r, 1e-4)[..., None]
    dr = jnp.sqrt(r * r + p.zr ** 2)
    dv = jnp.sqrt(r * r + p.zv ** 2)
    c1 = p.zr * (p.sigma_tr + 1.0 / dr)
    c2 = p.zv * (p.sigma_tr + 1.0 / dv)
    rd = (p.alpha_p / (4.0 * jnp.pi)) * (
        c1 * jnp.exp(-p.sigma_tr * dr) / (dr * dr)
        + c2 * jnp.exp(-p.sigma_tr * dv) / (dv * dv)
    )
    return jnp.maximum(rd, 0.0)


def sample_irradiance_points(mesh_or_geom, n_points: int, seed: int = 0,
                             shape_id: int | None = None):
    """Area-weighted surface sample points (host side).

    mesh_or_geom: GeometryTables; optionally restrict to one shape id.
    Returns (points (M,3), normals (M,3), area_per_point ())."""
    v0 = np.asarray(mesh_or_geom.v0)
    e1 = np.asarray(mesh_or_geom.e1)
    e2 = np.asarray(mesh_or_geom.e2)
    sid = np.asarray(mesh_or_geom.shape_id)
    if shape_id is not None:
        mask = sid == shape_id
        v0, e1, e2 = v0[mask], e1[mask], e2[mask]
    areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    total = areas.sum()
    rng = np.random.default_rng(seed)
    ti = rng.choice(len(areas), size=n_points, p=areas / total)
    u = rng.uniform(size=(n_points, 2))
    a = np.sqrt(np.maximum(1.0 - u[:, 0], 0.0))
    b0 = 1.0 - a
    b1 = a * u[:, 1]
    pts = v0[ti] + e1[ti] * b0[:, None] + e2[ti] * b1[:, None]
    nrm = np.cross(e1[ti], e2[ti])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
    return (
        jnp.asarray(pts, jnp.float32), jnp.asarray(nrm, jnp.float32),
        jnp.asarray(total / n_points, jnp.float32),
    )


def compute_irradiance(scene, points, normals, n_samples: int = 8, seed: int = 0):
    """NEE irradiance estimate at every sample point, vectorized (the
    reference's IrradianceSamplingProcess, irrproc.cpp)."""
    m_pts = points.shape[0]
    e_total = jnp.zeros((m_pts, 3))
    for s in range(n_samples):
        k = jax.random.fold_in(jax.random.key(seed), s)
        u1 = jax.random.uniform(jax.random.fold_in(k, 1), (m_pts,))
        u2 = jax.random.uniform(jax.random.fold_in(k, 2), (m_pts, 2))
        ds = sample_direct(scene.emitters, scene.geom, points, u1, u2)
        cos_i = jnp.maximum(jnp.sum(normals * ds.d, axis=-1), 0.0)
        eps = m.EPSILON * jnp.maximum(1.0, jnp.abs(points).max(-1))
        shadow = Ray.make(points, ds.d, mint=eps, maxt=ds.dist * (1 - 1e-3))
        occ = ray_test(scene.geom, shadow)
        ok = ds.valid & ~occ & (ds.pdf > 0)
        contrib = ds.value * (cos_i / jnp.maximum(ds.pdf, 1e-20))[:, None]
        e_total = e_total + jnp.where(ok[:, None], contrib, 0.0)
    return e_total / n_samples


@pytree_dataclass
class DipoleCache:
    params: DipoleParams
    points: jnp.ndarray       # (M, 3)
    irradiance: jnp.ndarray   # (M, 3)
    area: jnp.ndarray         # () per-point area


def prepare_dipole(scene, params: DipoleParams, n_points: int = 1024,
                   n_irr_samples: int = 8, seed: int = 0,
                   shape_id: int | None = None) -> DipoleCache:
    pts, nrm, area = sample_irradiance_points(
        scene.geom, n_points, seed=seed, shape_id=shape_id
    )
    irr = compute_irradiance(scene, pts, nrm, n_samples=n_irr_samples, seed=seed)
    return DipoleCache(params=params, points=pts, irradiance=irr, area=area)


def dipole_lo(cache: DipoleCache, x, wo_cos, chunk: int = 512):
    """Outgoing subsurface radiance at hit points x (N,3) with |cos| of the
    outgoing direction (for the Fresnel transmission term).

    Lo = Ft(wo)/pi * Σ_i Rd(|x - p_i|) E_i A_i  (reference dipole.cpp Lo).
    The Σ runs as a scan over sample chunks — dense, vectorized, no octree.
    """
    p = cache.params
    n_pts = cache.points.shape[0]
    pad = (-n_pts) % chunk
    pts = jnp.pad(cache.points, ((0, pad), (0, 0)))
    irr = jnp.pad(cache.irradiance, ((0, pad), (0, 0)))
    pts_c = pts.reshape(-1, chunk, 3)
    irr_c = irr.reshape(-1, chunk, 3)

    def step(acc, ci):
        cp, ce = ci
        d = jnp.linalg.norm(x[:, None, :] - cp[None, :, :], axis=-1)  # (N, C)
        rd = dipole_rd(p, d)                                          # (N, C, 3)
        return acc + jnp.sum(rd * ce[None, :, :], axis=1), None

    acc0 = jnp.zeros((x.shape[0], 3))
    mo, _ = jax.lax.scan(step, acc0, (pts_c, irr_c))
    ft = 1.0 - fresnel(wo_cos, jnp.ones_like(p.eta), p.eta)
    return mo * cache.area * (ft * m.INV_PI)[..., None]


# ---------------------------------------------------------------------------
# Profile variants: multipole (thin slabs) and adipole (anisotropic)
# (reference src/subsurface/multipole.cpp, adipole.cpp — both share the
# sample-point machinery above with a different Rd)
# ---------------------------------------------------------------------------

def multipole_rd(p: DipoleParams, r, thickness: float, n_poles: int = 3):
    """Thin-slab multipole Rd: mirror image sources across both slab
    boundaries (Donner & Jensen 2005; reference multipole.cpp).

    thickness: slab thickness in the same units as r."""
    r = jnp.maximum(r, 1e-4)[..., None]
    d_slab = thickness + p.zv - p.zr   # effective extrapolated slab depth
    total = jnp.zeros(r.shape[:-1] + (3,))
    for i in range(-n_poles, n_poles + 1):
        zri = 2.0 * i * d_slab + p.zr
        zvi = 2.0 * i * d_slab - p.zv
        dr = jnp.sqrt(r * r + zri ** 2)
        dv = jnp.sqrt(r * r + zvi ** 2)
        # signed depths: for i=0, zvi = -zv so the -c2 term reduces to the
        # dipole's +zv virtual-source contribution
        c1 = zri * (p.sigma_tr + 1.0 / dr)
        c2 = zvi * (p.sigma_tr + 1.0 / dv)
        total = total + (p.alpha_p / (4.0 * jnp.pi)) * (
            c1 * jnp.exp(-p.sigma_tr * dr) / (dr * dr)
            - c2 * jnp.exp(-p.sigma_tr * dv) / (dv * dv)
        )
    return jnp.maximum(total, 0.0)


def adipole_rd(p: DipoleParams, r_vec, aniso_dir, aniso_ratio: float = 2.0):
    """Anisotropic dipole (fork's adipole.cpp capability): the diffusion
    length differs along a preferred surface direction — distances are
    measured in a stretched metric.

    r_vec: (..., 3) surface offset vectors (not just radii);
    aniso_dir: unit direction of slower diffusion."""
    along = jnp.sum(r_vec * aniso_dir, axis=-1)
    perp = r_vec - along[..., None] * aniso_dir
    r_eff = jnp.sqrt(
        (along / aniso_ratio) ** 2 + jnp.sum(perp * perp, axis=-1)
    )
    return dipole_rd(p, r_eff)
