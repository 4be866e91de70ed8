"""Direct frequency-domain solver vs the time-domain production path.

The reference has no frequency-domain solver — it validates RAOs by one
time-domain run per period (demos + regression RAO comparisons). Here the
FD solve (physics/freqdomain.py) is gated against this framework's own
time domain: same excitation construction (waves.build_regular_wave), same
radiation kernel (Ogilvie-transformed), autodiff-linearized forces — so FD
and TD must agree to time-stepping + Fourier-extraction error.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from rao import fourier_amplitude  # noqa: E402

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.physics import freqdomain as fd
from hydrochrono_tpu.physics import mooring as moor
from hydrochrono_tpu.physics.system import (
    Body, HydroAttachment, Joint, SystemSpec, TSDA,
)
from hydrochrono_tpu.physics.waves import RegularWave
from hydrochrono_tpu.stepper import Simulation


def _pto_sphere_spec(hydro, c_pto=2e5):
    """Heave-rail sphere + linear PTO damper (the flagship entry model)."""
    return SystemSpec(
        bodies=[
            Body("body1", 261.8e3, (0.0, 0.0, -2.0)),
            Body("ground", 999.0, (0.0, 0.0, -5.0), fixed=True),
        ],
        joints=[Joint("prismatic", 0, 1, location=(0.0, 0.0, -2.0),
                      axis=(0.0, 0.0, 1.0))],
        tsdas=[TSDA(0, 1, (0.0, 0.0, -2.0), (0.0, 0.0, -5.0),
                    damping_coeff=c_pto)],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )


def test_linearized_matrices(sphere_h5):
    """Structure of the autodiff linearization: hydrostatic heave stiffness
    equals rho*g*S33; PTO damping lands on the heave diagonal; the
    prismatic+rail constraint null space is 1-D (heave only)."""
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    sim = Simulation(_pto_sphere_spec(hydro, c_pto=2e5), dt=0.01)
    L = fd.linearize(sim)
    k33 = hydro.rho * 9.81 * hydro.lin_stiffness[0, 2, 2]
    assert abs(L.K[2, 2] - k33) / k33 < 1e-9
    assert abs(L.C_el[2, 2] - 2e5) < 1e-6
    assert abs(L.M[2, 2] - 261.8e3) < 1e-6
    # prismatic + rotation lock leaves exactly one free DOF, along heave
    assert L.Z.shape[1] == 1
    zh = L.Z[:, 0]
    assert abs(abs(zh[2]) - 1.0) < 1e-9


def test_radiation_coeffs_ogilvie(sphere_h5):
    """A(w) -> A_inf as w -> inf; B(w) >= 0 near the kernel's band."""
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    w = np.array([0.3, 0.8, 1.5, 3.0, 20.0])
    A, B = fd.radiation_coeffs(hydro, w)
    ainf33 = hydro.inf_added_mass[2, 2]
    # high-frequency limit (the sin transform of a smooth kernel decays)
    assert abs(A[-1, 2, 2] - ainf33) / ainf33 < 0.05
    # passive radiation: heave damping positive in the wave band
    assert (B[:4, 2, 2] > 0).all()


def test_fd_matches_td_constrained_sphere(sphere_h5):
    """FD RAO + mean PTO power vs the batched time-domain sweep on the
    heave-rail PTO sphere (the same configuration tools/rao.py's own test
    sweeps). Agreement limits: O(dt) stepping + trailing-window Fourier
    extraction + kernel truncation."""
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    c_pto = 2e5
    spec = _pto_sphere_spec(hydro, c_pto=c_pto)
    periods = np.array([4.0, 6.0, 10.0])
    omegas = 2 * np.pi / periods
    amp = 0.2

    sim = Simulation(spec, dt=0.01,
                     wave=RegularWave(amplitude=amp, omega=omegas))
    n = 12000  # 120 s
    _, traj = sim.run_batch(n, {k: sim.params[k] for k in
                                ("reg_mag", "reg_phase", "reg_amp",
                                 "reg_omega")})
    t = sim.times(n)
    z = np.asarray(traj["pos"][:, :, 0, 2])

    # the time domain applies the reference's body-1-phase quirk; with one
    # body it is a no-op, so FD's corrected default is directly comparable
    resp = fd.solve_response(sim, omegas)
    for i, w in enumerate(omegas):
        a_td, _ = fourier_amplitude(t, z[i], w)
        rao_td = a_td / amp
        rao_fd = resp.rao[i, 2]
        assert abs(rao_fd - rao_td) / rao_td < 0.03, (w, rao_fd, rao_td)

    # mean absorbed PTO power: FD closed form vs TD c*zdot^2 trailing mean
    p_fd = resp.mean_pto_power(amplitude=amp)
    zdot = np.gradient(z, t, axis=1)
    n0 = n // 2
    p_td = (c_pto * zdot[:, n0:] ** 2).mean(axis=1)
    assert np.all(np.abs(p_fd - p_td) / p_td < 0.08), (p_fd, p_td)


def test_fd_free_sphere_long_wave_limit(sphere_h5):
    """Unconstrained 6-DOF sphere: heave RAO -> 1 for long waves, and the
    heave response peaks near the natural frequency."""
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    spec = SystemSpec(
        bodies=[Body("body1", 261.8e3, (0.0, 0.0, -2.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    sim = Simulation(spec, dt=0.01)
    omegas = 2 * np.pi / np.linspace(3.0, 20.0, 30)
    resp = fd.solve_response(sim, omegas)
    rao_z = resp.rao[:, 2]
    assert abs(rao_z[-1] - 1.0) < 0.1  # T = 20 s
    assert rao_z.max() > 1.1  # resonant amplification exists
    # resonance where -w^2 (m + A33) + K33 ~ 0
    A, _ = fd.radiation_coeffs(hydro, omegas)
    k33 = hydro.rho * 9.81 * hydro.lin_stiffness[0, 2, 2]
    w_nat = np.sqrt(k33 / (261.8e3 + A[:, 2, 2].mean()))
    w_peak = omegas[np.argmax(rao_z)]
    assert abs(w_peak - w_nat) / w_nat < 0.2


def test_fd_mooring_stiffness(sphere_h5):
    """Mooring linearization flows through catenary_hv's custom_root
    implicit derivative: the autodiff K gains a positive surge stiffness
    vs the unmoored system, matching a central finite difference of the
    mooring force."""
    import jax.numpy as jnp

    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    moorings = moor.MooringSpec(lines=tuple(
        moor.MooringLine(
            body=0, anchor=(90.0 * sx, 0.0, -50.0),
            fairlead=(2.0 * sx, 0.0, -3.0),
            length=120.0, weight_per_m=300.0, ea=5e7,
        )
        for sx in (1.0, -1.0)
    ))
    spec = SystemSpec(
        bodies=[Body("body1", 261.8e3, (0.0, 0.0, -2.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        moorings=moorings,
        gravity=(0.0, 0.0, -9.81),
    )
    sim = Simulation(spec, dt=0.01)
    L = fd.linearize(sim)

    spec0 = dataclasses_replace_moorings(spec)
    sim0 = Simulation(spec0, dt=0.01)
    L0 = fd.linearize(sim0)
    dk = L.K - L0.K
    assert dk[0, 0] > 0  # surge stiffness from the catenary pair

    # finite-difference check of the mooring-only surge stiffness
    const = sim.params["_const"]
    st = sim.init_state()
    eps = 1e-4

    def fx(dx):
        pos = jnp.asarray(st.pos).at[0, 0].add(dx)
        return float(sim._mooring_forces(const, pos, jnp.asarray(st.quat))[0])

    k_fd_num = -(fx(eps) - fx(-eps)) / (2 * eps)
    assert abs(dk[0, 0] - k_fd_num) / abs(k_fd_num) < 1e-4


def dataclasses_replace_moorings(spec):
    import dataclasses

    return dataclasses.replace(spec, moorings=None)


def test_fd_constrained_farm(tmp_path):
    """N-body coupled farm on heave rails: the null-space projection scales
    (nv = 24, 20 constraint rows -> 4 free heave DOFs) and the coupled FD
    solve stays finite with reciprocal (symmetric) radiation blocks."""
    import numpy as np

    from hydrochrono_tpu.io.synth import write_bemio_h5
    from hydrochrono_tpu.models.builders import sphere_farm

    h5 = str(tmp_path / "farm4.h5")
    write_bemio_h5(h5, 4, seed=7, shared_modes=3,
                   cg_list=[np.array([0.0, 0.0, -2.0])] * 4,
                   cb_list=[np.array([0.0, 0.0, -1.7])] * 4,
                   disp_vol=[261.8] * 4, rirf_tmax=10.0, rirf_steps=501,
                   n_freq=40)
    sim = Simulation(sphere_farm(h5, nx=2, ny=2, heave_only=True), dt=0.02)
    L = fd.linearize(sim)
    assert L.Z.shape == (24, 4)  # one free heave DOF per device
    # every free direction is pure heave of some device combination
    assert np.abs(np.delete(L.Z, np.arange(2, 24, 6), axis=0)).max() < 1e-9

    omegas = 2 * np.pi / np.array([6.0, 9.0])
    resp = fd.solve_response(sim, omegas)
    assert np.isfinite(resp.X).all()
    heave = resp.rao[:, 2::6]
    assert (heave > 0).all() and (heave < 10).all()
    # absorbed power positive at every device damper
    assert (resp.mean_pto_power() > 0).all()
