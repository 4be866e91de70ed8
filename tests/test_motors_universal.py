"""Universal joints and rotation-speed motors (demos/yaml/slider_crank)."""

import os

import numpy as np
import pytest

from hydrochrono_tpu.physics.system import Body, Joint, Motor, SystemSpec
from hydrochrono_tpu.scene.builder import build_case
from hydrochrono_tpu.stepper import Simulation

SLIDER_CRANK = "/root/reference/demos/yaml/slider_crank/slider_crank.setup.yaml"


def test_motor_constant_speed():
    """A speed motor spins a free rotor at exactly the commanded rate."""
    spec = SystemSpec(
        bodies=[Body("rotor", 5.0, (0.0, 0.0, 0.0), inertia=np.eye(3) * 2.0)],
        motors=[Motor(-1, 0, location=(0.0, 0.0, 0.0), axis=(0.0, 1.0, 0.0),
                      speed=3.14)],
        gravity=(0.0, 0.0, 0.0),
    )
    sim = Simulation(spec, dt=0.01)
    _, traj = sim.run(500)
    w = np.asarray(traj["ang_vel"][:, 0, 1])
    np.testing.assert_allclose(w, 3.14, rtol=1e-9)
    # spindle constraints hold: no other rotation, no translation
    assert np.abs(np.asarray(traj["ang_vel"][:, 0, [0, 2]])).max() < 1e-9
    assert np.abs(np.asarray(traj["pos"][:, 0])).max() < 1e-9


def test_motor_drives_pendulum_against_gravity():
    """Motor forces constant rotation even under a gravity torque."""
    spec = SystemSpec(
        bodies=[Body("arm", 2.0, (1.0, 0.0, 0.0), inertia=np.eye(3) * 0.5)],
        motors=[Motor(-1, 0, location=(0.0, 0.0, 0.0), axis=(0.0, 1.0, 0.0),
                      speed=2.0)],
        gravity=(0.0, 0.0, -9.81),
    )
    dt = 0.002
    sim = Simulation(spec, dt=dt)
    n = 2000
    _, traj = sim.run(n)
    pos = np.asarray(traj["pos"][:, 0])
    # the arm tip follows the commanded circular motion: radius stays 1
    r = np.linalg.norm(pos[:, [0, 2]], axis=-1)
    np.testing.assert_allclose(r, 1.0, atol=5e-3)
    w = np.asarray(traj["ang_vel"][:, 0, 1])
    np.testing.assert_allclose(w, 2.0, atol=1e-6)


def test_universal_joint_transmits_rotation():
    """Universal joint: cross axes stay perpendicular while both bodies spin."""
    spec = SystemSpec(
        bodies=[
            Body("shaft1", 1.0, (-1.0, 0.0, 0.0), inertia=np.eye(3) * 0.2),
            Body("shaft2", 1.0, (1.0, 0.0, 0.0), inertia=np.eye(3) * 0.2),
        ],
        joints=[
            Joint("universal", 0, 1, location=(0.0, 0.0, 0.0),
                  axis=(0.0, 1.0, 0.0), axis2=(0.0, 0.0, 1.0)),
        ],
        motors=[Motor(-1, 0, location=(-1.0, 0.0, 0.0), axis=(1.0, 0.0, 0.0),
                      speed=1.0)],
        gravity=(0.0, 0.0, 0.0),
    )
    sim = Simulation(spec, dt=0.005)
    _, traj = sim.run(1000)
    pos = np.asarray(traj["pos"])
    quat = np.asarray(traj["quat"])
    assert np.isfinite(pos).all()
    # shared point stays shared (spherical part of the universal joint)
    from hydrochrono_tpu.physics.rotations import quat_rotate
    import jax.numpy as jnp

    c = sim._constraint_residual(
        sim.params["_const"], jnp.asarray(pos[-1]), jnp.asarray(quat[-1])
    )
    assert np.abs(np.asarray(c)[:-1]).max() < 1e-6  # joint rows (last row = motor)
    # driven shaft rotates
    assert np.abs(np.asarray(traj["ang_vel"][:, 0, 0]) - 1.0).max() < 1e-6


@pytest.mark.skipif(not os.path.exists(SLIDER_CRANK), reason="case unavailable")
def test_slider_crank_yaml_case():
    """The reference's no-hydro YAML demo: 4 moving bodies, prismatic +
    spherical + universal joints, a speed motor; runs stably."""
    case = build_case(SLIDER_CRANK)
    assert any("hydro file" in w for w in case.warnings)  # referenced file absent
    assert len(case.system.motors) == 1
    kinds = [j.kind for j in case.system.joints]
    assert "universal" in kinds and "spherical" in kinds and "prismatic" in kinds

    sim = case.build_simulation()
    n = 5000  # 0.5 s at dt=1e-4 — full case is 10 s
    _, traj = sim.run(n)
    pos = np.asarray(traj["pos"])
    assert np.isfinite(pos).all()
    # crank spins at 3.14 rad/s about y
    crank_slot = sim.slot_of[[b.name for b in case.system.bodies].index("crank")]
    w = np.asarray(traj["ang_vel"][:, crank_slot, 1])
    np.testing.assert_allclose(w, 3.14, atol=1e-6)
    # slider is confined to the x axis
    slider_slot = sim.slot_of[[b.name for b in case.system.bodies].index("slider")]
    sl = np.asarray(traj["pos"][:, slider_slot])
    assert np.abs(sl[:, 1]).max() < 1e-6 and np.abs(sl[:, 2]).max() < 1e-6
    # and actually reciprocates
    assert sl[:, 0].max() - sl[:, 0].min() > 0.05


def test_motor_constant_speed_hht():
    """The HHT path drives motor rows at the commanded speed too
    (feature-matrix cell closed in round 2: motors + HHT)."""
    spec = SystemSpec(
        bodies=[Body("rotor", 5.0, (0.0, 0.0, 0.0), inertia=np.eye(3) * 2.0)],
        motors=[Motor(-1, 0, location=(0.0, 0.0, 0.0), axis=(0.0, 1.0, 0.0),
                      speed=3.14)],
        gravity=(0.0, 0.0, 0.0),
    )
    sim = Simulation(spec, dt=0.01, integrator="hht")
    _, traj = sim.run(300)
    w = np.asarray(traj["ang_vel"][:, 0, 1])
    np.testing.assert_allclose(w[5:], 3.14, rtol=1e-6)
    assert np.abs(np.asarray(traj["ang_vel"][:, 0, [0, 2]])).max() < 1e-6


def test_motor_hht_under_gravity_torque():
    spec = SystemSpec(
        bodies=[Body("arm", 2.0, (1.0, 0.0, 0.0), inertia=np.eye(3) * 0.5)],
        motors=[Motor(-1, 0, location=(0.0, 0.0, 0.0), axis=(0.0, 1.0, 0.0),
                      speed=1.0)],
        gravity=(0.0, 0.0, -9.81),
    )
    sim = Simulation(spec, dt=0.005, integrator="hht")
    _, traj = sim.run(400)
    w = np.asarray(traj["ang_vel"][:, 0, 1])
    np.testing.assert_allclose(w[5:], 1.0, rtol=1e-4)
