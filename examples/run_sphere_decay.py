#!/usr/bin/env python3
"""Sphere heave decay — the reference's demos/sphere/demo_sphere_decay.cpp.

Writes time/heave to results/sphere_decay.txt in the reference's format and
prints the wall time, like the original demo does.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hydrochrono_tpu.models import sphere_decay
from hydrochrono_tpu.stepper import Simulation

# honors the reference's HYDROCHRONO_DATA_DIR convention (helper.cpp:28-49)
H5 = os.path.join(
    os.environ.get("HYDROCHRONO_DATA_DIR", "/root/reference/demos"),
    "sphere", "hydroData", "sphere.h5",
)


def main():
    sim = Simulation(sphere_decay(H5, z0=-1.0), dt=0.015)
    n = 2667  # 40 s

    t0 = time.time()
    _, traj = sim.run(n)
    heave = np.asarray(traj["pos"][:, 0, 2])
    wall_ms = (time.time() - t0) * 1000

    os.makedirs("results", exist_ok=True)
    with open("results/sphere_decay.txt", "w") as out:
        out.write(f"{'Time (s)':<10}{'Heave (m)':>12}\n")
        for t, z in zip(sim.times(n), heave):
            out.write(f"{t:<12.6f}{z:>12.6f}\n")
    with open("results/sphere_decay_duration.txt", "w") as out:
        out.write(f"{wall_ms:.0f} ms\n")
    print(f"done: {n} steps in {wall_ms:.0f} ms; final heave {heave[-1]:.4f} m")


if __name__ == "__main__":
    main()
