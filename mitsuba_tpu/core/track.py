"""Keyframed animated transforms.

Capability parity with reference include/mitsuba/core/track.h:29,159
(`AnimatedTransform` with per-channel `AbstractAnimationTrack`s): transforms
decompose into translation / rotation (quaternion) / scale keyframes,
interpolated with lerp + slerp, then recomposed.  Evaluation is vectorized
over batched times (motion blur needs one transform per lane).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _mat_to_quat(m3):
    """Rotation matrix → quaternion (w, x, y, z)."""
    m = np.asarray(m3, np.float64)
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (m[2, 1] - m[1, 2]) / s
        y = (m[0, 2] - m[2, 0]) / s
        z = (m[1, 0] - m[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(m)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(m[i, i] - m[j, j] - m[k, k] + 1.0, 1e-12)) * 2
        q = np.zeros(4)
        q[1 + i] = 0.25 * s
        q[0] = (m[k, j] - m[j, k]) / s
        q[1 + j] = (m[j, i] + m[i, j]) / s
        q[1 + k] = (m[k, i] + m[i, k]) / s
        w, x, y, z = q
    q = np.asarray([w, x, y, z])
    return q / np.linalg.norm(q)


def _quat_to_mat(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], -2)


def _slerp(q0, q1, t):
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    use_lerp = sin_t < 1e-5
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1 - t) * theta) / jnp.where(use_lerp, 1.0, sin_t))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_t))
    q = w0 * q0 + w1 * q1
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


class AnimatedTransform:
    """Keyframed rigid+scale transform, slerp/lerp interpolated."""

    def __init__(self):
        self._times = []
        self._trans = []
        self._quats = []
        self._scales = []

    def append_transform(self, time: float, mat4):
        m = np.asarray(mat4, np.float64)
        t = m[:3, 3]
        a = m[:3, :3]
        # polar-lite decomposition: scale = column norms (no shear support,
        # same limitation as the reference's track decomposition)
        s = np.linalg.norm(a, axis=0)
        r = a / np.maximum(s, 1e-12)
        self._times.append(float(time))
        self._trans.append(t)
        self._quats.append(_mat_to_quat(r))
        self._scales.append(s)
        return self

    @property
    def n_keys(self):
        return len(self._times)

    def eval(self, times):
        """times: (...,) → (..., 4, 4) interpolated transforms."""
        times = jnp.asarray(times)
        kt = jnp.asarray(self._times)
        tr = jnp.asarray(np.asarray(self._trans), jnp.float32)
        qu = jnp.asarray(np.asarray(self._quats), jnp.float32)
        sc = jnp.asarray(np.asarray(self._scales), jnp.float32)
        if self.n_keys == 1:
            m = jnp.zeros(times.shape + (4, 4))
            rot = _quat_to_mat(qu[0]) * sc[0][None, :]
            m = m.at[..., :3, :3].set(rot)
            m = m.at[..., :3, 3].set(tr[0])
            m = m.at[..., 3, 3].set(1.0)
            return m
        i1 = jnp.clip(jnp.searchsorted(kt, times, side="right"), 1, self.n_keys - 1)
        i0 = i1 - 1
        t0 = kt[i0]
        t1 = kt[i1]
        f = jnp.clip((times - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
        trans = tr[i0] + (tr[i1] - tr[i0]) * f[..., None]
        scale = sc[i0] + (sc[i1] - sc[i0]) * f[..., None]
        quat = _slerp(qu[i0], qu[i1], f[..., None])
        rot = _quat_to_mat(quat) * scale[..., None, :]
        m = jnp.zeros(times.shape + (4, 4))
        m = m.at[..., :3, :3].set(rot)
        m = m.at[..., :3, 3].set(trans)
        m = m.at[..., 3, 3].set(1.0)
        return m
