#!/usr/bin/env python3
"""OSWEC flap pitch decay — the reference's demos/oswec/demo_oswec_decay.cpp
(10 degree initial pitch, revolute hinge, anchored base).

oswec.h5 is a missing LFS blob; synthetic coefficients are used unless
HYDROCHRONO_OSWEC_H5 points at a real file.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hydrochrono_tpu.io.synth import write_bemio_h5
from hydrochrono_tpu.models import oswec
from hydrochrono_tpu.stepper import Simulation

H5 = os.environ.get("HYDROCHRONO_OSWEC_H5", "/tmp/hydrochrono_tpu_oswec_example.h5")


def main():
    if not os.path.exists(H5):
        write_bemio_h5(H5, 2, seed=12,
                       cg_list=[np.array([0.0, 0.0, -3.9]),
                                np.array([0.0, 0.0, -10.15])])

    sim = Simulation(oswec(H5, initial_pitch_deg=10.0), dt=0.03)
    n = int(400.0 / 0.03)
    _, traj = sim.run(n)
    quat = np.asarray(traj["quat"][:, 0])
    pitch = np.rad2deg(2 * np.arcsin(np.clip(quat[:, 2], -1, 1)))

    os.makedirs("results", exist_ok=True)
    with open("results/oswec_decay.txt", "w") as out:
        out.write(f"{'Time (s)':<12}{'Pitch (deg)':>14}\n")
        for t, p in zip(sim.times(n), pitch):
            out.write(f"{t:<12.4f}{p:>14.6f}\n")
    print(f"initial pitch {pitch[0]:.2f} deg -> final {pitch[-1]:.3f} deg "
          f"({n} steps)")


if __name__ == "__main__":
    main()
