#!/usr/bin/env python3
"""Sphere in regular waves: all 10 IEA Task-10 cases as ONE batched program.

The reference (demos/sphere/demo_sphere_reg_waves.cpp) loops the ten
(amplitude, omega, PTO damping) cases serially, one full simulation each.
Here the sweep is a single vmapped device program — the TPU-native shape of
the same workload — and writes one sphere_reg_waves_<n>.txt per case.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.models import sphere_heave_constrained
from hydrochrono_tpu.physics.waves import RegularWave, build_regular_wave
from hydrochrono_tpu.stepper import Simulation

# honors the reference's HYDROCHRONO_DATA_DIR convention (helper.cpp:28-49)
H5 = os.path.join(
    os.environ.get("HYDROCHRONO_DATA_DIR", "/root/reference/demos"),
    "sphere", "hydroData", "sphere.h5",
)

AMPS = [0.177, 0.314, 0.380, 0.491, 0.706, 0.961, 1.256, 1.589, 1.962, 2.374]
OMEGAS = [2.094395102, 1.570796327, 1.427996661, 1.256637061, 1.047197551,
          0.897597901, 0.785398163, 0.698131701, 0.628318531, 0.571198664]
DAMPING = [398736.034, 118149.758, 90080.857, 161048.558, 322292.419,
           479668.979, 633979.761, 784083.286, 932117.647, 1077123.445]


def main():
    spec = sphere_heave_constrained(H5)
    hydro = load_bemio_h5(H5, 1)
    sim = Simulation(spec, dt=0.015,
                     wave=RegularWave(amplitude=np.asarray(AMPS),
                                      omega=np.asarray(OMEGAS)))
    n = 40000  # 600 s

    batched = {k: sim.params[k] for k in
               ("reg_mag", "reg_phase", "reg_amp", "reg_omega")}
    batched["tsda_c"] = jnp.asarray(DAMPING)[:, None]

    t0 = time.time()
    _, traj = sim.run_batch(n, batched)
    z = np.asarray(traj["pos"][:, :, 0, 2])
    wall = time.time() - t0

    os.makedirs("results", exist_ok=True)
    times = sim.times(n)
    for i in range(len(AMPS)):
        with open(f"results/sphere_reg_waves_{i + 1}.txt", "w") as out:
            out.write(f"   Wave #: \t{i + 1}\n")
            out.write(f"Wave amplitude (m): \t{AMPS[i]}\n")
            out.write(f"Wave omega (rad/s): \t{OMEGAS[i]}\n")
            out.write(f"{'Time (s)':<12} {'Heave (m)':>10}\n")
            out.write("-" * 10 + "  " + "-" * 10 + "\n")
            for t, zz in zip(times, z[i]):
                out.write(f"{t:<12.3f} {zz:>10.6f}\n")
    print(f"10 cases x {n} steps in {wall:.1f} s "
          f"({10 * n / wall:,.0f} instance-steps/s)")


if __name__ == "__main__":
    main()
