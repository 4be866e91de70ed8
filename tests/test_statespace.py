"""State-space radiation: the YAML-declared-but-unimplemented reference
option (hydro_types.h:24), implemented here. Validated against the
convolution on the real sphere coefficients: the BEMIO file ships the fitted
A/B/C/D matrices, so the decay must track the convolution within the fit
quality (and comfortably within the reference regression gates)."""

import numpy as np

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.physics.statespace import load_state_space, radiation_force_ss
from hydrochrono_tpu.physics.system import Body, HydroAttachment, SystemSpec
from hydrochrono_tpu.stepper import Simulation

GOLDEN = (
    "/root/reference/tests/regression/reference_data/sphere/decay/hc_ref_sphere_decay.txt"
)


def test_ss_kernel_matches_rirf(sphere_h5):
    """The discrete state-space impulse response reproduces K(t)."""
    hd = load_bemio_h5(sphere_h5, 1)
    dt = float(hd.rirf_time[1] - hd.rirf_time[0])
    ss = load_state_space(sphere_h5, 1, hd.rho, dt)
    # discrete impulse (v = 1 for one dt): y_k = C Ad^{k-1} Bd ~ dt * K(t_k)
    x = ss.Bd[2, 2].copy()  # heave-heave pair
    resp = []
    for k in range(400):
        resp.append(ss.Cm[2, 2] @ x / dt)
        x = ss.Ad[2, 2] @ x
    resp = np.asarray(resp)
    k_ref = hd.rirf[2, 2, 1:401]  # K at t_1..t_400
    # the file's own fit quality is r2t ~ 0.979 for this channel, so compare
    # in an L2 (energy) sense rather than pointwise
    rel_l2 = np.linalg.norm(resp - k_ref) / np.linalg.norm(k_ref)
    assert rel_l2 < 0.25, f"impulse-response energy mismatch {rel_l2}"
    # and the kernels must agree in sign/phase structure (correlation)
    corr = np.dot(resp, k_ref) / (np.linalg.norm(resp) * np.linalg.norm(k_ref))
    assert corr > 0.97, f"kernel correlation {corr}"


def test_sphere_decay_state_space_within_gates(sphere_h5):
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    spec = SystemSpec(
        bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -1.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    ref = np.loadtxt(GOLDEN, skiprows=1)
    n = ref.shape[0]
    sim = Simulation(spec, dt=0.015, radiation="state_space")
    _, traj = sim.run(n)
    z = np.asarray(traj["pos"][:, 0, 2])
    diff = z - ref[:, 1]
    l2 = np.linalg.norm(diff) / n
    linf = np.abs(diff).max()
    # The state-space realization is a DIFFERENT radiation model whose
    # accuracy is bounded by the fit quality stored in the file (r2 ~ 0.98
    # for the heave channel): peak transient deviation ~5% of the 1 m decay
    # amplitude. Check it tracks the golden in an L2 sense and settles to
    # the same equilibrium.
    assert l2 <= 1e-3, f"L2 {l2}"
    assert linf <= 0.1, f"Linf {linf}"
    # same late-time mean level (the oscillation is phase-shifted by the fit)
    assert abs(z[-200:].mean() - ref[-200:, 1].mean()) < 5e-3


def test_sphere_decay_state_space_hht(sphere_h5):
    """State-space radiation under the HHT integrator (feature-matrix cell
    closed in round 2) tracks the Euler+state-space trajectory."""
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    spec = SystemSpec(
        bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -1.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    n = 1500
    sim_e = Simulation(spec, dt=0.015, radiation="state_space")
    sim_h = Simulation(spec, dt=0.015, radiation="state_space", integrator="hht")
    _, tr_e = sim_e.run(n)
    _, tr_h = sim_h.run(n)
    ze = np.asarray(tr_e["pos"][:, 0, 2])
    zh = np.asarray(tr_h["pos"][:, 0, 2])
    assert np.isfinite(zh).all()
    # different integrators, same model: trajectories agree to integrator
    # truncation error, far below the decay amplitude (1 m)
    assert np.abs(ze - zh).max() < 0.02


def test_state_space_blocked_rejected(sphere_h5):
    """block_size with state-space radiation is a user error (no history
    buffer to amortize), rejected with an explanation."""
    import pytest

    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    spec = SystemSpec(
        bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -1.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    with pytest.raises(ValueError, match="no history buffer"):
        Simulation(spec, dt=0.015, radiation="state_space", block_size=64)


def test_ss_step_fused_matches_separate_ops(sphere_h5):
    """ss_step_fused (single-pass, elementwise-phrased) == the two einsum
    ops it fuses, to float reassociation."""
    import jax.numpy as jnp

    from hydrochrono_tpu.io.bemio import load_bemio_h5
    from hydrochrono_tpu.physics.statespace import (
        advance_ss, radiation_force_ss, ss_step_fused)

    hd = load_bemio_h5(sphere_h5, 1)
    ss = load_state_space(sphere_h5, 1, hd.rho, 0.015)
    rng = np.random.RandomState(0)
    Ad, Bd = jnp.asarray(ss.Ad), jnp.asarray(ss.Bd)
    Cm, Dm = jnp.asarray(ss.Cm), jnp.asarray(ss.Dm)
    x = jnp.asarray(rng.normal(size=(3, 6, 6, ss.order)))  # batched
    v = jnp.asarray(rng.normal(size=(3, 6)))
    F_ref = radiation_force_ss(Cm, Dm, x, v)
    x_ref = advance_ss(Ad, Bd, x, v)
    F, x_new = ss_step_fused(Ad, Bd, Cm, Dm, x, v)
    np.testing.assert_allclose(np.asarray(F), np.asarray(F_ref),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(x_new), np.asarray(x_ref),
                               rtol=1e-12, atol=1e-12)
