"""Quaternion / rotation utilities (wxyz convention, world-frame kinematics).

All functions are jit-safe and operate on arrays whose leading dimensions are
arbitrary batch dimensions; the quaternion axis is the last one, stored as
(w, x, y, z) — the same convention the reference exports
(reference: simulation_exporter.cpp:743-747).
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_multiply(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_to_matrix(q):
    """Rotation matrix R (body->world) from unit quaternion. Shape [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def quat_integrate(q, omega_world, dt):
    """Advance orientation by world-frame angular velocity over dt.

    Uses the exponential map: q+ = exp(dt/2 * omega) * q, which is exact for
    constant omega and matches first-order schemes to O(dt^2).

    Gradient-safe at omega == 0: the norm is never differentiated at zero
    (sqrt only touches a clamped argument; the small branch is a series in
    the squared norm), so jax.grad through resting bodies stays finite.
    """
    theta = omega_world * dt  # rotation vector
    sq = jnp.sum(theta * theta, axis=-1, keepdims=True)
    small = sq < 1e-16
    sq_safe = jnp.where(small, 1.0, sq)
    angle = jnp.sqrt(sq_safe)
    half = 0.5 * angle
    w = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
    k = jnp.where(small, 0.5 * (1.0 - sq / 24.0), jnp.sin(half) / angle)
    dq = jnp.concatenate([w, theta * k], axis=-1)
    return quat_normalize(quat_multiply(dq, q))


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion q (body->world)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inverse(q, v):
    qc = jnp.concatenate([q[..., 0:1], -q[..., 1:4]], axis=-1)
    return quat_rotate(qc, v)


def cardan_xyz_from_quat(q):
    """Cardan (Tait-Bryan) XYZ angles: R = Rx(a) @ Ry(b) @ Rz(c).

    This matches Chrono's GetCardanAnglesXYZ used by the reference for
    hydrostatic rotational displacement (reference: hydro_forces.cpp:280-289)
    and for the exporter's orientation_xyz channel
    (simulation_exporter.cpp:743-747). Returns [..., 3] = (a, b, c).
    """
    r = quat_to_matrix(q)
    b = jnp.arcsin(jnp.clip(r[..., 0, 2], -1.0, 1.0))
    a = jnp.arctan2(-r[..., 1, 2], r[..., 2, 2])
    c = jnp.arctan2(-r[..., 0, 1], r[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


def quat_from_cardan_xyz(angles):
    """Inverse of cardan_xyz_from_quat: q = qx(a) * qy(b) * qz(c)."""
    a, b, c = angles[..., 0] / 2, angles[..., 1] / 2, angles[..., 2] / 2
    zero = jnp.zeros_like(a)
    qx = jnp.stack([jnp.cos(a), jnp.sin(a), zero, zero], axis=-1)
    qy = jnp.stack([jnp.cos(b), zero, jnp.sin(b), zero], axis=-1)
    qz = jnp.stack([jnp.cos(c), zero, zero, jnp.sin(c)], axis=-1)
    return quat_multiply(qx, quat_multiply(qy, qz))


def skew(v):
    """Cross-product (hat) matrix: skew(v) @ u == cross(v, u). Shape [..., 3, 3]."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))
