"""Quaternion / Cardan-angle math tests."""

import numpy as np
import jax.numpy as jnp

from hydrochrono_tpu.physics.rotations import (
    cardan_xyz_from_quat,
    quat_from_cardan_xyz,
    quat_integrate,
    quat_multiply,
    quat_rotate,
    quat_to_matrix,
)


def rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def test_cardan_roundtrip():
    rng = np.random.RandomState(0)
    ang = rng.uniform(-0.9, 0.9, size=(50, 3))
    q = quat_from_cardan_xyz(jnp.asarray(ang))
    back = np.asarray(cardan_xyz_from_quat(q))
    np.testing.assert_allclose(back, ang, atol=1e-12)


def test_cardan_matches_matrix_composition():
    a, b, c = 0.3, -0.2, 0.5
    q = quat_from_cardan_xyz(jnp.asarray([a, b, c]))
    R = np.asarray(quat_to_matrix(q))
    np.testing.assert_allclose(R, rot_x(a) @ rot_y(b) @ rot_z(c), atol=1e-12)


def test_quat_rotate_matches_matrix():
    rng = np.random.RandomState(1)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    v = rng.normal(size=3)
    R = np.asarray(quat_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(
        np.asarray(quat_rotate(jnp.asarray(q), jnp.asarray(v))), R @ v, atol=1e-12
    )


def test_quat_integrate_small_angle():
    q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    omega = jnp.asarray([0.0, 0.1, 0.0])
    q1 = quat_integrate(q0, omega, 0.01)
    ang = np.asarray(cardan_xyz_from_quat(q1))
    np.testing.assert_allclose(ang, [0.0, 0.001, 0.0], atol=1e-9)


def test_quat_integrate_exact_rotation():
    # constant omega for total angle pi/2 about z
    q = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    omega = jnp.asarray([0.0, 0.0, np.pi / 2])
    q = quat_integrate(q, omega, 1.0)
    R = np.asarray(quat_to_matrix(q))
    np.testing.assert_allclose(R, rot_z(np.pi / 2), atol=1e-12)
