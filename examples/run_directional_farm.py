"""Heave-rail wave farm in directional spreading seas.

Everything beyond the reference in one run: a 2x2 farm of
hydrodynamically coupled point absorbers (the reference caps at 3
bodies), each locked to a vertical rail by a prismatic joint (solved at
farm scale by the constrained const-mass KKT path) with a heave PTO
damper, driven by a cos-2s directional sea (the reference is strictly
unidirectional). Reports per-device mean absorbed PTO power and the
heave statistics, and shows the sway forcing that only a spread sea can
produce.

Run:  python examples/run_directional_farm.py
"""

import os
import sys

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# honor JAX_PLATFORMS=cpu even when a site hook pre-selects another
# platform (the env var alone loses — DEVNOTES.md)
if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

from hydrochrono_tpu.io.synth import write_bemio_h5  # noqa: E402
from hydrochrono_tpu.models.builders import sphere_farm  # noqa: E402
from hydrochrono_tpu.physics.waves import IrregularWaveParams  # noqa: E402
from hydrochrono_tpu.stepper import Simulation  # noqa: E402

PTO_DAMPING = 5.0e4


def main():
    h5 = "/tmp/directional_farm4.h5"
    if not os.path.exists(h5):
        write_bemio_h5(
            h5, 4, seed=17, state_space=True,
            cg_list=[np.array([0.0, 0.0, -2.0])] * 4,
            cb_list=[np.array([0.0, 0.0, -1.7])] * 4,
            disp_vol=[261.8] * 4, rirf_tmax=10.0, rirf_steps=201, n_freq=40,
        )

    wave = IrregularWaveParams(
        height=2.5, period=8.0, nfrequencies=60, frequency_max=0.5,
        ramp_duration=10.0, seed=3,
        # cos-2s spreading: s=4 over +/-75 degrees, 7 headings
        spreading_exponent=4.0, n_directions=7, spreading_span=150.0,
        axisymmetric=True,
    )
    spec = sphere_farm(h5, nx=2, ny=2, heave_only=True,
                       pto_damping=PTO_DAMPING)
    sim = Simulation(spec, dt=0.02, wave=wave, duration=60.0,
                     radiation="state_space",
                     outputs=("pos", "lin_vel", "tsda"))
    assert sim.const_mass and sim.has_constraints and sim.wave_spread

    n = 3000
    _, traj = jax.jit(lambda: sim.run(n))()
    pos = np.asarray(traj["pos"])          # [T, 4, 3]
    vel = np.asarray(traj["lin_vel"])      # [T, 4, 3]

    t_dev = np.arange(n) * sim.dt
    developed = t_dev > 20.0  # past the ramp
    print("heave-rail farm, cos-2s directional sea (s=4, 7 headings)")
    print(f"{'device':>8} {'heave std [m]':>14} {'mean PTO power [kW]':>20}")
    for b in range(4):
        hs = pos[developed, b, 2].std()
        # rail: PTO damper force = -c * heave_vel; absorbed power = c v^2
        power = PTO_DAMPING * (vel[developed, b, 2] ** 2)
        print(f"{b + 1:>8} {hs:>14.3f} {power.mean() / 1e3:>20.1f}")
    drift = np.abs(pos[:, :, :2] - pos[:1, :, :2]).max()
    print(f"rail surge/sway drift: {drift:.2e} m (locked)")

    field = sim.wave_field()
    eta0 = float(field.eta(np.zeros(3), 30.0))
    print(f"free-surface elevation at the array center, t=30 s: {eta0:+.2f} m")


if __name__ == "__main__":
    main()
