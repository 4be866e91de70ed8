#!/usr/bin/env python3
"""Sphere in irregular seas with an IMPORTED free-surface elevation series
(reference: demos/sphere/demo_sphere_irreg_waves_eta_import.cpp — reads a
`time eta` text file via ReadEtaFromFile, wave_types.cpp:480-500).

Set HYDROCHRONO_DATA_DIR to a HydroChrono checkout to use the real
sphere.h5; defaults to /root/reference. An example eta file is synthesized
on the fly when none is given.
"""

import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.physics.system import Body, HydroAttachment, SystemSpec
from hydrochrono_tpu.physics.waves import IrregularWaveParams
from hydrochrono_tpu.stepper import Simulation

DATA = os.environ.get("HYDROCHRONO_DATA_DIR", "/root/reference")
H5 = os.path.join(DATA, "demos/sphere/hydroData/sphere.h5")


def main():
    eta_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/example_eta.txt"
    if not os.path.exists(eta_path):
        # synthesize a 2-component sea state as `time eta` rows
        t = np.arange(-30.0, 220.0, 0.015)
        eta = 0.6 * np.cos(0.7 * t) + 0.25 * np.cos(1.3 * t + 0.8)
        np.savetxt(eta_path, np.column_stack([t, eta]))
        print(f"synthesized eta file: {eta_path}")

    hydro = load_bemio_h5(H5, num_bodies=1)
    spec = SystemSpec(
        bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -2.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    wave = IrregularWaveParams(height=2.0, period=12.0,
                               eta_file_path=eta_path)
    sim = Simulation(spec, dt=0.015, wave=wave, duration=200.0,
                     dtype=jnp.float64)
    n = int(200.0 / 0.015)
    _, traj = sim.run(n)
    z = np.asarray(traj["pos"][:, 0, 2])
    print(f"steps: {n}, final heave: {z[-1]:.4f} m, "
          f"range: [{z.min():.3f}, {z.max():.3f}] m")


if __name__ == "__main__":
    main()
