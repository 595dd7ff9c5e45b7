"""3-D MIP map over density volumes.

Capability parity with reference include/mitsuba/render/mipmap3d.h
(SparseMipmap3D — adaptive octree line integrals over a density volume
and their inversion; NOTE the reference class has no in-tree consumer,
it is a utility for medium implementations).

TPU re-design: instead of a sparse octree walked per ray (divergent,
gather-bound), a dense power-of-two box pyramid; line integrals are
fixed-count trilinear sample sums at a caller-chosen level, fully
vectorized over rays — level selection replaces adaptive subdivision
(coarser level == the octree's collapsed interior nodes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.core.types import pytree_dataclass, static_field


@pytree_dataclass
class MIPMap3D:
    levels: tuple            # tuple of (R,R,R) arrays, level 0 finest
    bmin: jnp.ndarray        # (3,)
    bmax: jnp.ndarray        # (3,)
    n_levels: int = static_field(default=1)


def build_mipmap3d(density, bmin, bmax) -> MIPMap3D:
    """density: (R,R,R) with R a power of two (resampled if not)."""
    d = np.asarray(density, np.float32)
    r = 1 << int(np.ceil(np.log2(max(d.shape))))
    if d.shape != (r, r, r):
        # nearest-neighbour resample onto the pow2 cube
        idx = [np.minimum((np.arange(r) * s / r).astype(np.int64), s - 1)
               for s in d.shape]
        d = d[np.ix_(idx[0], idx[1], idx[2])]
    levels = [jnp.asarray(d)]
    while d.shape[0] > 1:
        d = d.reshape(d.shape[0] // 2, 2, d.shape[1] // 2, 2,
                      d.shape[2] // 2, 2).mean(axis=(1, 3, 5))
        levels.append(jnp.asarray(d))
    return MIPMap3D(levels=tuple(levels),
                    bmin=jnp.asarray(bmin, jnp.float32),
                    bmax=jnp.asarray(bmax, jnp.float32),
                    n_levels=len(levels))


def _trilinear(vol, p01):
    """vol: (R,R,R); p01: (N,3) in [0,1] -> (N,) trilinear samples."""
    r = vol.shape[0]
    x = jnp.clip(p01 * r - 0.5, 0.0, r - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, r - 1)
    f = x - x0
    out = 0.0
    for cx, wx in ((x0[:, 0], 1 - f[:, 0]), (x1[:, 0], f[:, 0])):
        for cy, wy in ((x0[:, 1], 1 - f[:, 1]), (x1[:, 1], f[:, 1])):
            for cz, wz in ((x0[:, 2], 1 - f[:, 2]), (x1[:, 2], f[:, 2])):
                out = out + wx * wy * wz * vol[cx, cy, cz]
    return out


def _clip_ray(mip, o, d, mint, maxt):
    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 1e12)
    t0 = (mip.bmin - o) * inv
    t1 = (mip.bmax - o) * inv
    tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), mint)
    tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), -1), maxt)
    return tn, tf


def line_integral(mip: MIPMap3D, o, d, mint, maxt, level: int = 0,
                  n_steps: int = 64):
    """∫ density dt along o + t·d over [mint, maxt] ∩ volume (reference
    SparseMipmap3D::lineIntegral). Midpoint rule with n_steps trilinear
    samples at the given pyramid level; all rays vectorized."""
    vol = mip.levels[min(level, mip.n_levels - 1)]
    tn, tf = _clip_ray(mip, o, d, mint, maxt)
    span = jnp.maximum(tf - tn, 0.0)
    dt = span / n_steps
    ext = mip.bmax - mip.bmin

    def step(acc, i):
        t = tn + (i + 0.5) * dt
        p01 = (o + t[:, None] * d - mip.bmin) / ext
        return acc + _trilinear(vol, p01) * dt, None

    acc, _ = jax.lax.scan(step, jnp.zeros(o.shape[0]),
                          jnp.arange(n_steps, dtype=jnp.float32))
    return acc


def invert_line_integral(mip: MIPMap3D, o, d, mint, maxt, desired,
                         level: int = 0, n_steps: int = 64):
    """March until `desired` density accumulates (reference
    SparseMipmap3D::invertLineIntegral). Returns (success, accum, t_sample,
    density_at_sample); on failure accum is the total line integral."""
    vol = mip.levels[min(level, mip.n_levels - 1)]
    tn, tf = _clip_ray(mip, o, d, mint, maxt)
    span = jnp.maximum(tf - tn, 0.0)
    dt = span / n_steps
    ext = mip.bmax - mip.bmin

    def step(carry, i):
        acc, t_hit, dens_hit, done = carry
        t = tn + (i + 0.5) * dt
        p01 = (o + t[:, None] * d - mip.bmin) / ext
        dens = _trilinear(vol, p01)
        acc_new = acc + dens * dt
        cross = ~done & (acc_new >= desired)
        # linear sub-step placement of the crossing point
        frac = jnp.where(dens * dt > 1e-20,
                         (desired - acc) / jnp.maximum(dens * dt, 1e-20),
                         0.0)
        t_cross = t - 0.5 * dt + jnp.clip(frac, 0.0, 1.0) * dt
        t_hit = jnp.where(cross, t_cross, t_hit)
        dens_hit = jnp.where(cross, dens, dens_hit)
        done = done | cross
        acc = jnp.where(done & ~cross, acc, acc_new)
        return (acc, t_hit, dens_hit, done), None

    init = (jnp.zeros(o.shape[0]), jnp.zeros(o.shape[0]),
            jnp.zeros(o.shape[0]), jnp.zeros(o.shape[0], bool))
    (acc, t_hit, dens_hit, done), _ = jax.lax.scan(
        step, init, jnp.arange(n_steps, dtype=jnp.float32))
    return done, jnp.where(done, desired, acc), t_hit, dens_hit
