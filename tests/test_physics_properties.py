"""Physics property tests: convergence order, energy behavior, YAML
state-space wiring."""

import os
import textwrap

import numpy as np
import pytest

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.physics.system import Body, HydroAttachment, Joint, SystemSpec, TSDA
from hydrochrono_tpu.stepper import Simulation


def test_dt_convergence_sphere(sphere_h5):
    """Refining dt converges the trajectory at ~first order (the scheme is
    a linearized implicit Euler)."""
    hydro = load_bemio_h5(sphere_h5, 1)
    spec = SystemSpec(
        bodies=[Body("body1", 261.8e3, (0.0, 0.0, -1.5))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    T = 6.0
    zs = {}
    for dt in (0.06, 0.03, 0.015):
        sim = Simulation(spec, dt=dt)
        n = int(round(T / dt))
        _, traj = sim.run(n)
        zs[dt] = float(np.asarray(traj["pos"][-1, 0, 2]))
    e1 = abs(zs[0.06] - zs[0.015])
    e2 = abs(zs[0.03] - zs[0.015])
    # halving dt must reduce the error vs the finest solution
    assert e2 < 0.7 * e1


def test_symplectic_energy_bounded():
    """Undamped pendulum: semi-implicit Euler keeps energy bounded (no
    secular drift) over many periods."""
    L, m, g = 1.0, 2.0, 9.81
    theta0 = 0.25
    spec = SystemSpec(
        bodies=[Body("bob", m, (L * np.sin(theta0), 0.0, -L * np.cos(theta0)),
                     inertia=np.eye(3) * 1e-9)],
        joints=[Joint("spherical", 0, -1, location=(0.0, 0.0, 0.0))],
        gravity=(0.0, 0.0, -g),
    )
    dt = 0.002
    sim = Simulation(spec, dt=dt)
    n = 20000  # ~20 periods
    _, traj = sim.run(n)
    pos = np.asarray(traj["pos"][:, 0])
    vel = np.asarray(traj["lin_vel"][:, 0])
    energy = 0.5 * m * (vel ** 2).sum(-1) + m * g * pos[:, 2]
    e0 = 0.5 * m * 0.0 + m * g * (-L * np.cos(theta0))
    # bounded oscillation of energy, no growth
    drift = np.abs(energy - e0).max()
    assert drift < 0.02 * m * g * L
    late = np.abs(energy[-2000:] - e0).max()
    early = np.abs(energy[:2000] - e0).max()
    assert late < 2.0 * max(early, 1e-6)


def test_yaml_state_space_radiation(tmp_path, sphere_h5):
    """hydro.yaml radiation_calculation: state_space selects the SS model."""
    d = tmp_path
    (d / "c.setup.yaml").write_text(
        "model_file: c.model.yaml\nsimulation_file: c.simulation.yaml\n"
        "hydro_file: c.hydro.yaml\noutput_directory: out\n"
    )
    (d / "c.model.yaml").write_text(textwrap.dedent("""\
        model:
          name: ss_case
          bodies:
            - name: body1
              location: [0, 0, -1.0]
              mass: 261800
    """))
    (d / "c.simulation.yaml").write_text(
        "simulation:\n  time_step: 0.015\n  end_time: 5.0\n  gravity: [0, 0, -9.81]\n"
    )
    (d / "c.hydro.yaml").write_text(textwrap.dedent(f"""\
        hydrodynamics:
          bodies:
            - name: body1
              h5_file: {sphere_h5}
              radiation_calculation: state_space
          waves:
            type: still
    """))
    from hydrochrono_tpu.scene.builder import build_case

    case = build_case(str(d / "c.setup.yaml"))
    sim = case.build_simulation()
    assert sim.radiation == "state_space"
    _, traj = sim.run(300)
    assert np.isfinite(np.asarray(traj["pos"])).all()
