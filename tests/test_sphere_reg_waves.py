"""Golden-trajectory regression: sphere in regular waves (IEA Task 10).

Reproduces demos/sphere/demo_sphere_reg_waves.cpp: heave-constrained sphere
(prismatic joint to ground) with a linear PTO damper (TSDA), driven by 10
(amplitude, omega, damping) regular-wave cases. Pass criteria follow the
reference comparison tooling (L2 = |diff|/n, Linf) with the sphere
thresholds (tests/regression/sphere/compare.py:50).
"""

import numpy as np
import pytest

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.physics.system import Body, HydroAttachment, Joint, SystemSpec, TSDA
from hydrochrono_tpu.physics.waves import RegularWave
from hydrochrono_tpu.stepper import Simulation

# demo_sphere_reg_waves.cpp:23-30
WAVE_AMPS = [0.177, 0.314, 0.380, 0.491, 0.706, 0.961, 1.256, 1.589, 1.962, 2.374]
WAVE_OMEGAS = [2.094395102, 1.570796327, 1.427996661, 1.256637061, 1.047197551,
               0.897597901, 0.785398163, 0.698131701, 0.628318531, 0.571198664]
DAMPING = [398736.034, 118149.758, 90080.857, 161048.558, 322292.419,
           479668.979, 633979.761, 784083.286, 932117.647, 1077123.445]

GOLDEN = "/root/reference/tests/regression/reference_data/sphere/reg_waves/hc_ref_sphere_reg_waves_{}.txt"

# full runs are 40 000 steps; trim for test-time economy while still covering
# thousands of oscillation periods of transient + steady state
N_STEPS = 8000


def build_sim(sphere_h5, case):
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    spec = SystemSpec(
        bodies=[
            Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -2.0)),
            Body(name="ground", mass=999.0, pos0=(0.0, 0.0, -5.0), fixed=True),
        ],
        joints=[Joint("prismatic", 0, 1, location=(0.0, 0.0, -2.0), axis=(0.0, 0.0, 1.0))],
        tsdas=[TSDA(0, 1, (0.0, 0.0, -2.0), (0.0, 0.0, -5.0),
                    spring_coeff=0.0, damping_coeff=DAMPING[case])],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    return Simulation(spec, dt=0.015,
                      wave=RegularWave(amplitude=WAVE_AMPS[case], omega=WAVE_OMEGAS[case]))


@pytest.mark.parametrize("case", [0, 2, 5, 9])
def test_sphere_reg_waves_matches_reference(sphere_h5, case):
    ref = np.loadtxt(GOLDEN.format(case + 1), skiprows=5)
    n = min(N_STEPS, ref.shape[0])
    sim = build_sim(sphere_h5, case)
    _, traj = sim.run(n)
    heave = np.asarray(traj["pos"][:, 0, 2])
    diff = heave - ref[:n, 1]
    l2 = np.linalg.norm(diff) / n
    linf = np.abs(diff).max()
    assert l2 <= 1e-4, f"case {case}: L2 {l2}"
    assert linf <= 0.02, f"case {case}: Linf {linf}"
    assert l2 < 1e-6 and linf < 1e-4, f"case {case}: l2={l2} linf={linf}"
