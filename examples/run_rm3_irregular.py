#!/usr/bin/env python3
"""RM3 two-body point absorber with TSDA PTO in irregular waves —
the reference's demos/rm3 workload (and this framework's headline benchmark).

The reference rm3.h5 is a missing LFS blob in this checkout, so synthetic
RM3-class BEMIO coefficients are generated on first run; point
HYDROCHRONO_RM3_H5 at a real file to use actual BEM data.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from hydrochrono_tpu.io.synth import write_bemio_h5
from hydrochrono_tpu.models import rm3
from hydrochrono_tpu.physics.waves import IrregularWaveParams
from hydrochrono_tpu.stepper import Simulation

H5 = os.environ.get("HYDROCHRONO_RM3_H5", "/tmp/hydrochrono_tpu_rm3_example.h5")


def main():
    if not os.path.exists(H5):
        write_bemio_h5(H5, 2, seed=11,
                       cg_list=[np.array([0.0, 0.0, -0.72]),
                                np.array([0.0, 0.0, -21.29])],
                       rirf_tmax=15.0, rirf_steps=1501)

    wave = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=1000,
                               ramp_duration=20.0)
    sim = Simulation(rm3(H5, pto_damping=1.2e6), dt=0.01, wave=wave,
                     duration=200.0, dtype=jnp.float32, block_size=128,
                     outputs=("pos", "lin_vel", "tsda"))
    n = 10112

    t0 = time.time()
    _, traj = sim.run(n)
    wall = time.time() - t0

    z_float = np.asarray(traj["pos"][:, 0, 2])
    tsda = np.asarray(traj["tsda"])  # [T, 1, 4] = (len, speed, fs, fd)
    power = -(tsda[:, 0, 2] + tsda[:, 0, 3]) * tsda[:, 0, 1]
    print(f"{n} steps in {wall:.2f} s ({n * 0.01 / wall:.0f}x real time)")
    print(f"float heave range: [{z_float.min():.3f}, {z_float.max():.3f}] m")
    print(f"mean PTO power: {power[2000:].mean() / 1e3:.1f} kW")


if __name__ == "__main__":
    main()
