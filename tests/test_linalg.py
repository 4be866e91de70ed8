"""Unrolled batched Cholesky / KKT solver tests against numpy."""

import numpy as np
import jax.numpy as jnp

from hydrochrono_tpu.ops.linalg import solve_kkt, solve_spd


def random_spd(rng, b, n):
    A = rng.normal(size=(b, n, n))
    return A @ np.swapaxes(A, -1, -2) + n * np.eye(n)


def test_solve_spd_matches_numpy():
    rng = np.random.RandomState(0)
    A = random_spd(rng, 7, 12)
    b = rng.normal(size=(7, 12))
    x = np.asarray(solve_spd(jnp.asarray(A), jnp.asarray(b)))
    want = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(x, want, rtol=1e-9, atol=1e-9)


def test_solve_spd_multirhs():
    rng = np.random.RandomState(1)
    A = random_spd(rng, 3, 9)
    B = rng.normal(size=(3, 9, 4))
    x = np.asarray(solve_spd(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(x, np.linalg.solve(A, B), rtol=1e-9, atol=1e-9)


def test_solve_kkt_matches_dense():
    rng = np.random.RandomState(2)
    b, nv, m = 5, 12, 5
    M = random_spd(rng, b, nv)
    J = rng.normal(size=(m, nv))
    r = rng.normal(size=(b, nv))
    g = rng.normal(size=(b, m))

    v, lam = solve_kkt(jnp.asarray(M), jnp.asarray(J), jnp.asarray(r), jnp.asarray(g))
    v, lam = np.asarray(v), np.asarray(lam)

    for i in range(b):
        kkt = np.zeros((nv + m, nv + m))
        kkt[:nv, :nv] = M[i]
        kkt[:nv, nv:] = J.T
        kkt[nv:, :nv] = J
        sol = np.linalg.solve(kkt, np.concatenate([r[i], g[i]]))
        np.testing.assert_allclose(v[i], sol[:nv], rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(lam[i], sol[nv:], rtol=1e-8, atol=1e-8)


def test_solve_kkt_batched_jacobian():
    rng = np.random.RandomState(3)
    b, nv, m = 4, 6, 2
    M = random_spd(rng, b, nv)
    J = rng.normal(size=(b, m, nv))
    r = rng.normal(size=(b, nv))
    g = rng.normal(size=(b, m))
    v, lam = solve_kkt(jnp.asarray(M), jnp.asarray(J), jnp.asarray(r), jnp.asarray(g))
    for i in range(b):
        kkt = np.zeros((nv + m, nv + m))
        kkt[:nv, :nv] = M[i]
        kkt[:nv, nv:] = J[i].T
        kkt[nv:, :nv] = J[i]
        sol = np.linalg.solve(kkt, np.concatenate([r[i], g[i]]))
        np.testing.assert_allclose(np.asarray(v)[i], sol[:nv], rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(lam)[i], sol[nv:], rtol=1e-8, atol=1e-8)
