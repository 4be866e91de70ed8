"""Direct frequency-domain response solver (beyond-reference).

The reference validates its models by sweeping regular-wave periods in the
time domain and Fourier-extracting steady-state amplitudes (one full
simulation per period; demos + tests/regression RAO comparisons against
WEC-Sim). This module solves the same linear seakeeping problem *directly*
in the frequency domain,

    [ -w^2 (M + A(w)) + i w (B(w) + C) + K ] X(w) = F_exc(w),

which is both an independent cross-check of the time-domain path and a
designer's tool (RAO / mean-power curves in milliseconds instead of one
simulation per period).

TPU-first twist: K and C are NOT re-derived element by element. They are
obtained by `jax.jacfwd` of the *production* force assembly
(`Simulation._forces_mech` + hydrostatics + mooring) about the reference
configuration — so every force the time domain applies (TSDA/RSDA incl.
tabulated curves, linear viscous damping, nonlinear hydrostatics, catenary
mooring) is linearized exactly and automatically, something the C++
reference could not do without hand-written Jacobians. Radiation A(w)/B(w)
come from the Ogilvie relations applied to the SAME rho-scaled impulse-
response kernel the time domain convolves (io/bemio.py), and the excitation
phasor reuses `waves.build_regular_wave` (the reference's frequency
indexing, wave_types.cpp:289-352) so FD and TD agree to time-stepping +
kernel-truncation error — gated in tests/test_freqdomain.py.

Constrained systems (joints) are handled by projecting onto the null space
of the constraint Jacobian at the reference configuration — valid for the
small motions the frequency domain assumes. Driven motors have no
steady-state linearization and are rejected.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hydrochrono_tpu.io.bemio import trapezoid_widths
from hydrochrono_tpu.physics import waves as wv
from hydrochrono_tpu.physics.rotations import quat_multiply


# ---------------------------------------------------------------------------
# linearization about the reference configuration
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LinearizedSystem:
    """Small-motion model about the reference (initial) configuration.

    All arrays are host-side float64, in the simulation's generalized
    coordinates x = [body0(dx,dy,dz,rx,ry,rz), body1(...), ...] over the
    MOVING bodies (world-frame rotation increments, matching the velocity
    layout of the stepper's constraint Jacobian, stepper.py
    `_constraint_jacobian`).
    """

    M: np.ndarray  # [nv, nv] rigid-body mass (I_w at the reference pose)
    K: np.ndarray  # [nv, nv] stiffness  = -dF/dx   (hydrostatic+elements+mooring)
    C: np.ndarray  # [nv, nv] damping    = -dF/dv   (elements + linear viscous)
    C_el: np.ndarray  # [nv, nv] element-only damping (TSDA/RSDA — the PTO)
    S: np.ndarray  # [nv, 6Nh] hydro-DOF scatter (columns = hydro bodies)
    Z: np.ndarray  # [nv, nf] orthonormal null-space basis of J(q0) (I if free)
    Ainf: np.ndarray  # [6Nh, 6Nh]


def _pose_from_disp(sim, x, pos0, quat0):
    """pos/quat at small displacement x [nv]: world-frame increments.

    q(theta) = normalize([1, theta/2]) * q0 — exact first derivative at
    theta = 0 equals the world-angular-velocity tangent used by
    `_constraint_jacobian` (stepper.py: qdot = 0.5 * [0, w] * q)."""
    d = x.reshape(sim.n_moving, 6)
    pos = pos0 + d[:, :3]
    half = 0.5 * d[:, 3:]
    dq = jnp.concatenate([jnp.ones_like(half[:, :1]), half], axis=-1)
    dq = dq / jnp.linalg.norm(dq, axis=-1, keepdims=True)
    return pos, quat_multiply(dq, quat0)


def linearize(sim, state=None) -> LinearizedSystem:
    """Linearize the production force assembly about `state` (default: the
    initial state — assumed to be the static equilibrium the BEM
    coefficients were computed about)."""
    if getattr(sim, "n_motors", 0):
        raise ValueError(
            "frequency-domain linearization does not support driven motors "
            "(no steady-state small-motion model); remove the motor or use "
            "the time domain")
    params = sim.params
    # wave-sweep batching (reg_*/irr_eta) is harmless — the FD excitation is
    # rebuilt from the coefficient tables — but a swept STRUCTURAL param
    # would silently produce batched force Jacobians
    _structural = ("mass", "tsda_k", "tsda_c", "rsda_k", "rsda_c",
                   "visc_lin", "visc_quad")
    base_ndim = sim._param_base_ndim()
    if any(k in params and np.ndim(params[k]) > base_ndim[k]
           for k in _structural):
        raise ValueError(
            "frequency-domain linearization needs unbatched structural "
            "parameters (mass/TSDA/RSDA/viscous sweeps detected); "
            "linearize per sweep point instead")
    const = params["_const"]
    st = sim.init_state(params) if state is None else state
    pos0 = jnp.asarray(st.pos)
    quat0 = jnp.asarray(st.quat)
    nv = sim.nv
    zer = jnp.zeros((nv,), jnp.float64 if sim.dtype == jnp.float64 else sim.dtype)

    def f_of_x(x):
        pos, quat = _pose_from_disp(sim, x, pos0, quat0)
        lv = jnp.zeros((sim.n_moving, 3), x.dtype)
        F, _ = sim._forces_mech(params, pos, quat, lv, lv)
        if sim.hydro is not None:
            F = sim._scatter_hydro(F, sim._hydrostatic(params, pos, quat))
        return F

    def f_of_v(v):
        d = v.reshape(sim.n_moving, 6)
        F, _ = sim._forces_mech(params, pos0, quat0, d[:, :3], d[:, 3:])
        return F

    def f_el_of_v(v):
        if not (sim.spec.tsdas or sim.spec.rsdas):
            return jnp.zeros((nv,), v.dtype)
        d = v.reshape(sim.n_moving, 6)
        return sim._element_forces(params, const, pos0, quat0, d[:, :3], d[:, 3:])

    K = -np.asarray(jax.jacfwd(f_of_x)(zer), np.float64)
    C = -np.asarray(jax.jacfwd(f_of_v)(zer), np.float64)
    C_el = -np.asarray(jax.jacfwd(f_el_of_v)(zer), np.float64)

    # rigid mass: blockdiag(m I3, R0 I_body R0^T) per moving body
    from hydrochrono_tpu.physics.rotations import quat_to_matrix

    M = np.zeros((nv, nv))
    mass = np.asarray(params["mass"], np.float64)
    R = np.asarray(quat_to_matrix(quat0), np.float64)
    Ib = np.asarray(const["inertia_body"], np.float64)
    for s in range(sim.n_moving):
        M[s * 6 : s * 6 + 3, s * 6 : s * 6 + 3] = mass[s] * np.eye(3)
        M[s * 6 + 3 : s * 6 + 6, s * 6 + 3 : s * 6 + 6] = R[s] @ Ib[s] @ R[s].T

    # hydro scatter + A_inf
    if sim.hydro is not None:
        nh = sim.n_hydro
        S = np.zeros((nv, 6 * nh))
        for hb, slot in enumerate(sim.hydro_slots):
            for k in range(6):
                S[slot * 6 + k, hb * 6 + k] = 1.0
        Ainf = np.asarray(sim.hydro.hydro.inf_added_mass, np.float64)
    else:
        S = np.zeros((nv, 0))
        Ainf = np.zeros((0, 0))

    # constraint null space at the reference configuration
    if sim.n_constraints:
        J = np.asarray(
            sim._constraint_jacobian(const, pos0, quat0), np.float64)
        _, sv, Vt = np.linalg.svd(J)
        rank = int((sv > max(J.shape) * (sv[0] if sv.size else 1.0) * 1e-12).sum())
        Z = Vt[rank:].T  # [nv, nv - rank], orthonormal
    else:
        Z = np.eye(nv)

    return LinearizedSystem(M=M, K=K, C=C, C_el=C_el, S=S, Z=Z, Ainf=Ainf)


# ---------------------------------------------------------------------------
# radiation coefficients from the impulse-response kernel (Ogilvie 1964)
# ---------------------------------------------------------------------------


def radiation_coeffs(hd, omegas):
    """A(w), B(w) [Nw, 6N, 6N] from the rho-scaled RIRF via the Ogilvie
    relations — the inverse of the transform BEM codes use to build the
    kernel, so the FD coefficients are consistent with what the time
    domain actually convolves (reference kernel load:
    h5fileinfo.cpp:321-323):

        B(w) =          int_0^Tmax K(t) cos(wt) dt
        A(w) = A_inf -  (1/w) int_0^Tmax K(t) sin(wt) dt
    """
    omegas = np.asarray(omegas, np.float64).reshape(-1)
    if (omegas <= 0).any():
        raise ValueError("omegas must be positive")
    t = np.asarray(hd.rirf_time, np.float64)
    wts = trapezoid_widths(t)
    Kt = np.asarray(hd.rirf, np.float64) * wts  # [6N, 6N, Tr]
    wt = np.outer(omegas, t)  # [Nw, Tr]
    B = np.einsum("ijt,wt->wij", Kt, np.cos(wt))
    A = hd.inf_added_mass[None] - np.einsum("ijt,wt->wij", Kt, np.sin(wt)) \
        / omegas[:, None, None]
    return A, B


# ---------------------------------------------------------------------------
# the solve
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FreqResponse:
    """Complex steady-state response per unit wave amplitude.

    x_j(t) = Re{ X_j exp(i w t) } for eta(t) = cos(w t) at the body —
    the phasor convention of the time domain's excitation
    F_j(t) = mag_j cos(w t + phase_j) (stepper.py `_wave_force`)."""

    omegas: np.ndarray  # [Nw]
    X: np.ndarray  # [Nw, nv] complex
    lin: LinearizedSystem

    @property
    def rao(self) -> np.ndarray:
        """|X| [Nw, nv] — response amplitude operator per DOF."""
        return np.abs(self.X)

    @property
    def phase(self) -> np.ndarray:
        return np.angle(self.X)

    def mean_pto_power(self, amplitude: float = 1.0) -> np.ndarray:
        """Mean power absorbed by the spring-damper elements [Nw] (W) at
        wave amplitude `amplitude`: P = 1/2 w^2 A^2 X^H C_el X for the
        linearized element damping matrix (symmetric PSD for pure
        dampers)."""
        Xa = self.X * amplitude
        q = np.einsum("wi,ij,wj->w", Xa.conj(), self.lin.C_el, Xa).real
        return 0.5 * self.omegas**2 * q


def solve_response(sim, omegas, direction: float = 0.0,
                   axisymmetric: bool = False,
                   lin: LinearizedSystem | None = None,
                   replicate_phase_bug: bool = False) -> FreqResponse:
    """Direct frequency-domain solve over an omega grid.

    The excitation phasor reuses `waves.build_regular_wave` (reference
    frequency indexing + optional body-1-phase quirk) and
    `waves.resolve_wave_direction` for non-zero headings — identical
    excitation to a time-domain regular-wave run at the same omega, so the
    two paths are directly comparable.
    """
    if sim.hydro is None:
        raise ValueError("frequency-domain solve needs hydrodynamics")
    omegas = np.asarray(omegas, np.float64).reshape(-1)
    L = linearize(sim) if lin is None else lin
    hd = sim.hydro.hydro
    d0 = float(hd.wave_directions[0]) if hd.wave_directions is not None else 0.0
    if float(direction) != d0:
        body_xy = None
        if hd.num_bodies > 1:
            body_xy = np.stack([
                np.asarray(sim.spec.bodies[i].pos0, np.float64)[:2]
                for i in sim.hydro.body_indices])
        hd = wv.resolve_wave_direction(hd, float(direction),
                                       axisymmetric=axisymmetric,
                                       body_xy=body_xy)

    A, B = radiation_coeffs(hd, omegas)
    rw = wv.build_regular_wave(
        hd, wv.RegularWave(amplitude=np.ones_like(omegas), omega=omegas),
        replicate_phase_bug=replicate_phase_bug)
    Fh = rw.force_mag * np.exp(1j * rw.force_phase)  # [Nw, 6Nh]

    S, Z = L.S, L.Z
    M_eff = L.M[None] + np.einsum("ik,wkl,jl->wij", S, A, S)  # [Nw, nv, nv]
    C_eff = L.C[None] + np.einsum("ik,wkl,jl->wij", S, B, S)
    D = (-(omegas**2)[:, None, None] * M_eff
         + 1j * omegas[:, None, None] * C_eff
         + L.K[None])
    F = Fh @ S.T  # [Nw, nv]
    Dz = Z.T[None] @ D @ Z[None]
    Fz = F @ Z
    Xz = np.linalg.solve(Dz, Fz[..., None])[..., 0]
    X = Xz @ Z.T
    return FreqResponse(omegas=omegas, X=X, lin=L)
