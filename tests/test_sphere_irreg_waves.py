"""Golden-trajectory regression: sphere in irregular (PM spectrum) waves.

Reproduces demos/sphere/demo_sphere_irreg_waves.cpp: heave-constrained sphere,
Hs=2 m, Tp=12 s, 1000 frequency bins, 60 s ramp, seed 1 (defaults of
IrregularWaveParams, wave_types.h:277-292). Requires bit-exact reproduction of
the reference's mt19937 phase stream, PM spectrum, Eigen spline IRF
resampling and eta-interpolated excitation convolution.
"""

import numpy as np
import pytest

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.physics.system import Body, HydroAttachment, Joint, SystemSpec, TSDA
from hydrochrono_tpu.physics.waves import IrregularWaveParams, read_eta_file
from hydrochrono_tpu.stepper import Simulation

GOLDEN = "/root/reference/tests/regression/reference_data/sphere/irreg_waves/hc_ref_sphere_irreg_waves.txt"
ETA_FILE = "/root/reference/tests/regression/reference_data/sphere/irreg_waves_eta/eta.txt"


def build_spec(sphere_h5):
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    return SystemSpec(
        bodies=[
            Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -2.0)),
            Body(name="ground", mass=999.0, pos0=(0.0, 0.0, -5.0), fixed=True),
        ],
        joints=[Joint("prismatic", 0, 1, location=(0.0, 0.0, -2.0), axis=(0.0, 0.0, 1.0))],
        tsdas=[TSDA(0, 1, (0.0, 0.0, -2.0), (0.0, 0.0, -5.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )


def test_sphere_irreg_waves_matches_reference(sphere_h5):
    wave = IrregularWaveParams(height=2.0, period=12.0, nfrequencies=1000,
                               ramp_duration=60.0)
    sim = Simulation(build_spec(sphere_h5), dt=0.015, wave=wave, duration=600.0)
    ref = np.loadtxt(GOLDEN, skiprows=2)
    # cover the ramp plus plenty of the developed sea state
    n = min(10000, ref.shape[0])
    _, traj = sim.run(n)
    heave = np.asarray(traj["pos"][:, 0, 2])
    diff = heave - ref[:n, 1]
    l2 = np.linalg.norm(diff) / n
    linf = np.abs(diff).max()
    assert l2 <= 1e-4 and linf <= 0.02, f"l2={l2} linf={linf}"
    assert l2 < 1e-6, f"l2={l2}"


def test_sphere_eta_import_runs(sphere_h5):
    wave = IrregularWaveParams(height=0.0, period=0.0, eta_file_path=ETA_FILE)
    sim = Simulation(build_spec(sphere_h5), dt=0.015, wave=wave, duration=60.0)
    times, eta = read_eta_file(ETA_FILE)
    assert times[0] == 0.0
    _, traj = sim.run(2000)
    heave = np.asarray(traj["pos"][:, 0, 2])
    assert np.isfinite(heave).all()
    # the sphere must respond to the imported sea state
    assert np.abs(heave + 2.0).max() > 1e-4
