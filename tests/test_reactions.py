"""Numeric validation of exported joint reaction wrenches and RSDA channels.

The round-1 exporter wrote raw KKT multiplier rows as if they were world
wrench components (zero for prismatic joints); these tests pin the physics:
static equilibrium reactions must equal the supported weight exactly, and
torques about the joint anchor must balance the gravity moment
(reference analogue: world-frame link reactions,
simulation_exporter.cpp:816-840).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hydrochrono_tpu.io.results import _joint_reaction_wrenches
from hydrochrono_tpu.physics.system import Body, Joint, RSDA, SystemSpec
from hydrochrono_tpu.stepper import Simulation

G = 9.81


def _run(sim, n=5):
    _, traj = jax.jit(lambda p: sim.run(n, params=p))(sim.params)
    pos = np.asarray(traj["pos"])
    quat = np.asarray(traj["quat"])
    lam = np.asarray(traj["lambda"])
    return pos, quat, lam, traj


def test_prismatic_static_reaction_carries_weight():
    """Body on a horizontal prismatic rail: the joint must carry m*g
    (the round-1 exporter reported identically zero for prismatic)."""
    m = 1234.0
    spec = SystemSpec(
        bodies=[
            Body("slider", m, (0.0, 0.0, 0.0), inertia=np.diag([10.0, 10.0, 10.0])),
            Body("ground", 1.0, (0.0, 0.0, -1.0), fixed=True),
        ],
        joints=[Joint("prismatic", 0, 1, location=(0.0, 0.0, 0.0),
                      axis=(1.0, 0.0, 0.0))],
        gravity=(0.0, 0.0, -G),
    )
    sim = Simulation(spec, dt=0.01, outputs=("pos", "quat", "lambda"))
    pos, quat, lam, _ = _run(sim)
    w = _joint_reaction_wrenches(sim, pos, quat, lam / sim.dt)
    F1, T1, F2, T2 = w[0]
    assert np.allclose(F1[-1], [0.0, 0.0, m * G], rtol=1e-9, atol=1e-6)
    assert np.allclose(T1[-1], 0.0, atol=1e-6)
    assert np.allclose(F2, -F1, atol=1e-9) and np.allclose(T2, -T1, atol=1e-9)


def test_fixed_joint_static_wrench_with_lever_arm():
    """Body cantilevered off a fixed joint: force = weight, torque about the
    anchor balances the gravity moment of the offset cg."""
    m = 500.0
    r = np.array([2.0, 0.5, 0.0])  # cg offset from the anchor
    anchor = np.array([0.0, 0.0, 0.0])
    spec = SystemSpec(
        bodies=[
            Body("beam", m, tuple(anchor + r), inertia=np.diag([50.0, 80.0, 90.0])),
            Body("wall", 1.0, (0.0, 0.0, -1.0), fixed=True),
        ],
        joints=[Joint("fixed", 0, 1, location=tuple(anchor),
                      axis=(0.0, 0.0, 1.0))],
        gravity=(0.0, 0.0, -G),
    )
    sim = Simulation(spec, dt=0.01, outputs=("pos", "quat", "lambda"))
    pos, quat, lam, _ = _run(sim)
    F1, T1, _, _ = _joint_reaction_wrenches(sim, pos, quat, lam / sim.dt)[0]
    assert np.allclose(F1[-1], [0.0, 0.0, m * G], rtol=1e-9, atol=1e-5)
    # torque ON the body about the anchor must cancel gravity's moment:
    # T = -(r x m g_vec)
    expected_T = -np.cross(r, m * np.array([0.0, 0.0, -G]))
    assert np.allclose(T1[-1], expected_T, rtol=1e-7, atol=1e-4)


def test_revolute_pendulum_newton_balance():
    """Dynamic case: per-step Newton balance m*acc = m*g + F_joint, using
    the pre-step state's multipliers (the Euler solve applies forces from
    the step's start state)."""
    m = 50.0
    spec = SystemSpec(
        bodies=[
            Body("bob", m, (1.0, 0.0, 0.0), inertia=np.diag([1.0, 1.0, 1.0])),
        ],
        joints=[Joint("revolute", 0, -1, location=(0.0, 0.0, 0.0),
                      axis=(0.0, 1.0, 0.0))],
        gravity=(0.0, 0.0, -G),
    )
    sim = Simulation(spec, dt=0.001,
                     outputs=("pos", "quat", "lin_vel", "ang_vel", "acc",
                              "lambda"))
    _, traj = jax.jit(lambda p: sim.run(50, params=p))(sim.params)
    pos = np.asarray(traj["pos"])
    quat = np.asarray(traj["quat"])
    lam = np.asarray(traj["lambda"])
    acc = np.asarray(traj["acc"])

    # J is evaluated at the pre-step state; shift by one sample and evaluate
    # the wrench at the start-of-step geometry
    pos_pre = np.concatenate([[[sim.spec.bodies[0].pos0]], pos[:-1]], axis=0)
    quat_pre = np.concatenate([[[sim.spec.bodies[0].quat0]], quat[:-1]], axis=0)
    w = _joint_reaction_wrenches(sim, pos_pre, quat_pre, lam / sim.dt)
    F1 = w[0][0]
    resid = m * acc[:, 0, :3] - (m * np.array([0, 0, -G]) + F1)
    assert np.abs(resid).max() < 1e-4 * m * G


def test_rsda_channels_match_trajectory():
    """Exported RSDA angle/speed/torques agree with independent kinematics."""
    from hydrochrono_tpu.io.results import _rsda_channels

    k_spring, c_damp = 300.0, 40.0
    spec = SystemSpec(
        bodies=[
            Body("flap", 20.0, (0.0, 0.0, 1.0), inertia=np.diag([5.0, 5.0, 5.0])),
            Body("base", 1.0, (0.0, 0.0, 0.0), fixed=True),
        ],
        joints=[Joint("revolute", 0, 1, location=(0.0, 0.0, 0.0),
                      axis=(0.0, 1.0, 0.0))],
        rsdas=[RSDA(0, 1, axis=(0.0, 1.0, 0.0), spring_coeff=k_spring,
                    damping_coeff=c_damp, rest_angle=0.0)],
        gravity=(1.0, 0.0, -G),  # x-gravity swings the flap
    )
    sim = Simulation(spec, dt=0.005,
                     outputs=("pos", "quat", "lin_vel", "ang_vel", "lambda"))
    _, traj = jax.jit(lambda p: sim.run(200, params=p))(sim.params)
    pos = np.asarray(traj["pos"])
    quat = np.asarray(traj["quat"])
    ang_vel = np.asarray(traj["ang_vel"])

    class FakeCase:
        system = spec

    case = FakeCase()
    slot_of = {0: 0}
    ch = _rsda_channels(case, sim, 0, pos, quat, ang_vel, slot_of, pos.shape[0])

    # angle convention: rotation of body2 relative to body1 projected on the
    # axis (the same theta the stepper's RSDA torque law uses); body2 is the
    # fixed base here, so angle == -pitch(body1)
    pitch = 2.0 * np.arcsin(np.clip(quat[:, 0, 2], -1, 1)) * np.sign(quat[:, 0, 0])
    # the stepper's RSDA law measures 2*sin(theta/2) (quaternion rotation
    # vector), the same quantity its restoring torque uses
    assert np.abs(ch["angle"] + 2.0 * np.sin(pitch / 2.0)).max() < 1e-9
    assert np.abs(ch["ang_speed"] + ang_vel[:, 0, 1]).max() < 1e-9
    assert np.allclose(ch["spring_torque"], k_spring * ch["angle"])
    assert np.allclose(ch["damping_torque"], c_damp * ch["ang_speed"])
    assert np.allclose(ch["torque_vec"][:, 1],
                       ch["spring_torque"] + ch["damping_torque"])
    assert np.allclose(ch["reaction_torque_body2"], -ch["torque_vec"])
    # the flap actually moved (the channels are not trivially zero)
    assert np.abs(ch["angle"]).max() > 1e-3
