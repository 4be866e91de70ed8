"""HHT-alpha integrator: exact reproduction of the reference YAML pipeline.

The expected results.still.h5 was produced by Chrono's ChTimestepperHHT
(simulation YAML: integrator type HHT, alpha default -0.2). Our HHT step
with the plain predictor and zero initial acceleration reproduces it to
float64 rounding.
"""

import numpy as np
import h5py
import pytest

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.physics.system import Body, HydroAttachment, Joint, SystemSpec, TSDA
from hydrochrono_tpu.stepper import Simulation

H5 = "/root/reference/tests/regression/run_hydrochrono/iea_sphere/assets/hydroData/iea_sphere.h5"
EXPECTED = "/root/reference/tests/regression/run_hydrochrono/iea_sphere/decay/expected/results.still.h5"


def build_spec():
    hydro = load_bemio_h5(H5, 1)
    return SystemSpec(
        bodies=[
            Body("body1", 261800.0, (0.0, 0.0, -1.0), inertia=np.diag([999.0] * 3)),
            Body("ground", 999.0, (0.0, 0.0, 0.0), fixed=True),
        ],
        joints=[Joint("prismatic", 1, 0, location=(0.0, 0.0, 0.0), axis=(0.0, 0.0, 1.0))],
        tsdas=[TSDA(1, 0, (0.0, 0.0, 0.0), (0.0, 0.0, 0.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.8),
    )


def test_hht_matches_chrono_exactly():
    with h5py.File(EXPECTED) as f:
        z_ref = f["results/model/bodies/body1/position"][:, 2]
        v_ref = f["results/model/bodies/body1/velocity"][:, 2]
    n = len(z_ref)
    sim = Simulation(build_spec(), dt=0.01, integrator="hht")
    _, traj = sim.run(n)
    z = np.asarray(traj["pos"][:, 0, 2])
    v = np.asarray(traj["lin_vel"][:, 0, 2])
    assert np.abs(z - z_ref).max() < 1e-9
    assert np.abs(v - v_ref).max() < 1e-8


def test_hht_unconstrained_runs(sphere_h5):
    hydro = load_bemio_h5(sphere_h5, 1)
    spec = SystemSpec(
        bodies=[Body("body1", 261.8e3, (0.0, 0.0, -1.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    sim = Simulation(spec, dt=0.015, integrator="hht")
    _, traj = sim.run(1000)
    z = np.asarray(traj["pos"][:, 0, 2])
    assert np.isfinite(z).all()
    # agrees with the Euler path within integrator truncation differences
    _, traj_e = Simulation(spec, dt=0.015).run(1000)
    z_e = np.asarray(traj_e["pos"][:, 0, 2])
    # large-transient decay: integrator truncation differences are visible
    # but bounded (the reference's own regression gate is 0.02 m)
    assert np.abs(z - z_e).max() < 0.05


def test_hht_blocked_matches_per_step():
    """Blocked far-field radiation under HHT reproduces the per-step HHT
    trajectory (which itself matches Chrono bit-for-bit)."""
    import h5py

    with h5py.File(EXPECTED) as f:
        z_ref = f["results/model/bodies/body1/position"][:, 2]
    n = 1000
    spec = build_spec()
    _, t_ps = Simulation(spec, dt=0.01, integrator="hht").run(n)
    _, t_blk = Simulation(spec, dt=0.01, integrator="hht", block_size=64).run(n)
    np.testing.assert_allclose(
        np.asarray(t_blk["pos"]), np.asarray(t_ps["pos"]), rtol=0, atol=1e-12
    )
    # and still matches the Chrono expected trajectory
    z = np.asarray(t_blk["pos"][:, 0, 2])
    assert np.abs(z - z_ref[:n]).max() < 1e-9
