"""Golden-trajectory regression: sphere heave decay.

Reproduces demos/sphere/demo_sphere_decay.cpp (1 free body, still water,
dt=0.015, T=40 s) and compares the heave trace against the frozen reference
output with the reference's own pass criteria: L2 = |diff|/n <= 1e-4,
Linf <= 0.02 m (tests/regression/sphere/compare.py:50).
"""

import numpy as np
import pytest

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.physics.system import Body, HydroAttachment, SystemSpec
from hydrochrono_tpu.stepper import Simulation

GOLDEN = (
    "/root/reference/tests/regression/reference_data/sphere/decay/hc_ref_sphere_decay.txt"
)


@pytest.fixture(scope="module")
def sphere_sim(sphere_h5):
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    spec = SystemSpec(
        bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -1.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    return Simulation(spec, dt=0.015)


def test_sphere_decay_matches_reference(sphere_sim):
    ref = np.loadtxt(GOLDEN, skiprows=1)
    n = ref.shape[0]
    _, traj = sphere_sim.run(n)
    heave = np.asarray(traj["pos"][:, 0, 2])
    t = sphere_sim.times(n)

    assert np.allclose(t, ref[:, 0], atol=1e-9)
    diff = heave - ref[:, 1]
    l2 = np.linalg.norm(diff) / n
    linf = np.abs(diff).max()
    assert l2 <= 1e-4, f"L2 {l2}"
    assert linf <= 0.02, f"Linf {linf}"
    # our scheme matches the reference integrator nearly exactly
    assert l2 < 1e-6 and linf < 1e-4


def test_sphere_decay_no_nans(sphere_sim):
    _, traj = sphere_sim.run(100)
    for k in ("pos", "quat", "lin_vel", "ang_vel"):
        assert np.isfinite(np.asarray(traj[k])).all()
