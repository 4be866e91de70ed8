"""RAO tool: batched period sweep -> response amplitude operators."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from rao import fourier_amplitude, rao_from_batch  # noqa: E402

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.physics.system import Body, HydroAttachment, Joint, SystemSpec, TSDA
from hydrochrono_tpu.physics.waves import RegularWave
from hydrochrono_tpu.stepper import Simulation


def test_fourier_amplitude_pure_tone():
    t = np.linspace(0, 100, 5001)
    y = 0.37 * np.cos(1.3 * t + 0.4) + 0.05
    a, ph = fourier_amplitude(t, y, 1.3)
    # non-integer number of periods in the window -> small spectral leakage
    assert abs(a - 0.37) < 5e-3
    assert abs(((ph - 0.4 + np.pi) % (2 * np.pi)) - np.pi) < 2e-2


def test_sphere_heave_rao_sweep(sphere_h5):
    """Batched sweep -> RAO curve; long periods approach the hydrostatic
    limit RAO -> 1 (a heaving buoy follows the wave)."""
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    spec = SystemSpec(
        bodies=[
            Body("body1", 261.8e3, (0.0, 0.0, -2.0)),
            Body("ground", 999.0, (0.0, 0.0, -5.0), fixed=True),
        ],
        joints=[Joint("prismatic", 0, 1, location=(0.0, 0.0, -2.0), axis=(0.0, 0.0, 1.0))],
        tsdas=[TSDA(0, 1, (0.0, 0.0, -2.0), (0.0, 0.0, -5.0), damping_coeff=2e5)],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    periods = np.array([3.0, 5.0, 8.0, 12.0, 16.0])
    omegas = 2 * np.pi / periods
    amp = 0.25
    sim = Simulation(spec, dt=0.015, wave=RegularWave(amplitude=amp, omega=omegas))
    n = 8000  # 120 s: transients decay, steady state dominates the tail
    _, traj = sim.run_batch(n, {k: sim.params[k] for k in
                                ("reg_mag", "reg_phase", "reg_amp", "reg_omega")})
    z = np.asarray(traj["pos"][:, :, 0, 2])
    rao = rao_from_batch(sim.times(n), z, periods, amp)
    assert rao.shape == (5, 3)
    assert np.isfinite(rao).all()
    # long-wave limit: RAO -> 1
    assert abs(rao[-1, 1] - 1.0) < 0.15
    # short waves: the buoy can't follow
    assert rao[0, 1] < 0.7
