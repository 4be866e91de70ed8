"""State-space radiation model.

BEMIO files carry per-DOF-pair LTI fits of the radiation IRF
(body*/hydro_coeffs/radiation_damping/state_space/{A,B,C,D}): for DOF pair
(i, j) of order o,

    xdot_ij = A_ij x_ij + B_ij v_j
    F_i     = sum_j C_ij x_ij + D_ij v_j

The reference DECLARES a `radiation_calculation: state_space` YAML option
(hydro_types.h:24) but never implements it (SURVEY.md §5); here it is
implemented as a first-class alternative to the convolution: the velocity
history buffer disappears entirely — per-step state is [6N, 6N, o] — which
removes the radiation HBM traffic altogether. Exact zero-order-hold
discretization (matrix exponential) is precomputed on the host.
"""

from __future__ import annotations

import dataclasses

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


@dataclasses.dataclass(frozen=True)
class StateSpaceRadiation:
    """Discretized system tensors, host-side float64.

    Ad [R, C, o, o], Bd [R, C, o], Cm [R, C, o], Dm [R, C] with R = 6N rows
    (forces) and C = 6N cols (velocities), rho-scaled like the RIRF kernel.
    """

    Ad: np.ndarray
    Bd: np.ndarray
    Cm: np.ndarray
    Dm: np.ndarray

    @property
    def order(self) -> int:
        return self.Ad.shape[-1]


def load_state_space(path: str, num_bodies: int, rho: float, dt: float) -> StateSpaceRadiation:
    """Read + ZOH-discretize the BEMIO state-space radiation fit."""
    from scipy.linalg import expm

    A_blocks, B_blocks, C_blocks, D_blocks = [], [], [], []
    with h5py.File(path, "r") as f:
        for b in range(num_bodies):
            g = f[f"body{b + 1}/hydro_coeffs/radiation_damping/state_space"]
            A = np.asarray(g["A/all"], dtype=np.float64)  # [6, 6N, o, o]
            B = np.asarray(g["B/all"], dtype=np.float64)  # [6, 6N, o, 1]
            C = np.asarray(g["C/all"], dtype=np.float64)  # [6, 6N, 1, o]
            D = np.asarray(g["D/all"], dtype=np.float64)  # [6, 6N]
            A_blocks.append(A)
            B_blocks.append(B[..., 0])
            C_blocks.append(C[..., 0, :])
            D_blocks.append(D)

    A = np.concatenate(A_blocks, axis=0)  # [6N, 6N, o, o]
    B = np.concatenate(B_blocks, axis=0)
    C = np.concatenate(C_blocks, axis=0)
    D = np.concatenate(D_blocks, axis=0)
    R, Cc, o, _ = A.shape

    Ad = np.zeros_like(A)
    Bd = np.zeros_like(B)
    for i in range(R):
        for j in range(Cc):
            a = A[i, j]
            if not np.isfinite(a).all() or np.allclose(a, 0.0):
                continue
            ad = expm(a * dt)
            Ad[i, j] = ad
            # ZOH: Bd = A^-1 (Ad - I) B; fall back to Euler for singular A
            try:
                Bd[i, j] = np.linalg.solve(a, (ad - np.eye(o)) @ B[i, j])
            except np.linalg.LinAlgError:
                Bd[i, j] = dt * B[i, j]

    # rho scaling, matching the RIRF convention (h5fileinfo.cpp:321-323)
    return StateSpaceRadiation(Ad=Ad, Bd=Bd, Cm=C * rho, Dm=D * rho)


def radiation_force_ss(Cm, Dm, x, v):
    """F_i = sum_j C_ij . x_ij + D_ij v_j  (jit-safe).

    Cm [R, C, o], Dm [R, C], x [..., R, C, o], v [..., C] -> [..., R]
    """
    import jax.numpy as jnp

    from hydrochrono_tpu.ops.mxu import FULL

    return (jnp.einsum("rco,...rco->...r", Cm, x, precision=FULL)
            + jnp.einsum("rc,...c->...r", Dm, v, precision=FULL))


def advance_ss(Ad, Bd, x, v):
    """x+_ij = Ad_ij x_ij + Bd_ij v_j (jit-safe)."""
    import jax.numpy as jnp

    from hydrochrono_tpu.ops.mxu import FULL

    return (jnp.einsum("rcop,...rcp->...rco", Ad, x, precision=FULL)
            + Bd * v[..., None, :, None])


def ss_step_fused(Ad, Bd, Cm, Dm, x, v):
    """(F, x+) in ONE pass over the state tensor.

    Algebraically identical to radiation_force_ss + advance_ss, but
    phrased as order-unrolled elementwise multiply-adds + one reduction
    instead of two tiny-contraction dot-generals, so XLA fuses the whole
    thing into a single kernel that reads x once and writes x+ once. The
    farm-scale step is HBM-bound on exactly this traffic (the [B, 6N, 6N,
    o] state dwarfs everything else at 6N = 48): measured ~2x on the
    8-sphere farm bench (PERF.md round 3).
    """
    import jax.numpy as jnp

    from hydrochrono_tpu.ops.mxu import FULL

    o = x.shape[-1]
    vb = v[..., None, :]  # [..., 1, C]
    F = jnp.einsum("rc,...c->...r", Dm, v, precision=FULL)
    cols = []
    for i in range(o):
        xi = Bd[..., i] * vb
        for p in range(o):
            xi = xi + Ad[..., i, p] * x[..., p]
        cols.append(xi)
        F = F + (Cm[..., i] * x[..., i]).sum(-1)
    return F, jnp.stack(cols, axis=-1)
