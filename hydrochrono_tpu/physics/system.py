"""Multibody system specification and device-ready compiled model.

The spec layer (plain dataclasses, host-side numpy) describes what the
reference builds from Chrono objects + YAML: rigid bodies, joints, TSDA/RSDA
spring-dampers and the hydro attachment. `compile_system` lowers the spec to
static device arrays + index maps consumed by the lax.scan stepper.

Design notes vs the reference:
  * The reference delegates multibody dynamics to Project Chrono (external);
    here we implement a maximal-coordinate constrained rigid-body integrator
    directly (SURVEY.md §2.1 "Multibody dynamics" row).
  * State = world-frame (pos, quat wxyz, lin vel, ang vel) per *moving* body;
    fixed bodies (ground) never enter the solve and are folded into constant
    anchor data at compile time.
  * The velocity-level KKT system with position stabilization -c/h mirrors
    Chrono's EULER_IMPLICIT_LINEARIZED default timestepper, which we verified
    reproduces the reference golden trajectories to ~1e-7 m.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from hydrochrono_tpu.io.bemio import HydroData

DOF = 6


@dataclasses.dataclass(frozen=True)
class Body:
    name: str
    mass: float
    pos0: Sequence[float]
    quat0: Sequence[float] = (1.0, 0.0, 0.0, 0.0)
    inertia: Optional[np.ndarray] = None  # 3x3 about COM in body frame; default = identity
    fixed: bool = False
    # viscous (Morison-type) damping, beyond-reference: per-DOF world-
    # aligned coefficients [6] (surge sway heave roll pitch yaw).
    # F_k = -linear_k * v_k - quadratic_k * |v_k| * v_k. Linear BEM
    # underpredicts damping near resonance; WEC-Sim exposes the same
    # lumped per-DOF model. None = absent.
    linear_damping: Optional[Sequence[float]] = None
    quadratic_damping: Optional[Sequence[float]] = None

    def inertia_matrix(self) -> np.ndarray:
        if self.inertia is None:
            # Chrono's ChBody default inertia is diag(1,1,1); the reference demos
            # never override it (demo_sphere_decay.cpp:68-79), so neither do we.
            return np.eye(3)
        i = np.asarray(self.inertia, dtype=np.float64)
        if i.shape == (3,):
            return np.diag(i)
        return i


@dataclasses.dataclass(frozen=True)
class Joint:
    kind: str  # 'prismatic' | 'revolute' | 'spherical' | 'universal' | 'fixed'
    body1: int  # index into the body list, or -1 for the world/ground
    body2: int
    location: Sequence[float] = (0.0, 0.0, 0.0)  # world, at t0
    axis: Sequence[float] = (0.0, 0.0, 1.0)  # world, at t0
    axis2: Optional[Sequence[float]] = None  # universal joints: second axis
    locked: bool = False  # e.g. revolute->Lock(true) (demo_F3OF_DT1.cpp:125-138)


@dataclasses.dataclass(frozen=True)
class Motor:
    """Rotational speed motor (Chrono ChLinkMotorRotationSpeed analogue with
    a REVOLUTE spindle, as used by demos/yaml/slider_crank)."""

    body1: int
    body2: int
    location: Sequence[float] = (0.0, 0.0, 0.0)
    axis: Sequence[float] = (0.0, 1.0, 0.0)
    speed: float = 0.0  # rad/s; batchable via params["motor_speed"]


@dataclasses.dataclass(frozen=True)
class TSDA:
    """Translational spring-damper-actuator (PTO), Chrono ChLinkTSDA analogue."""

    body1: int
    body2: int
    point1: Sequence[float]  # world, at t0, attached to body1
    point2: Sequence[float]  # world, at t0, attached to body2
    spring_coeff: float = 0.0
    damping_coeff: float = 0.0
    free_length: Optional[float] = None  # None = initial distance
    # optional tabulated nonlinear curves: (x, f) pairs
    spring_curve: Optional[np.ndarray] = None  # [K, 2] deformation -> force
    damping_curve: Optional[np.ndarray] = None  # [K, 2] velocity -> force


@dataclasses.dataclass(frozen=True)
class RSDA:
    """Rotational spring-damper, Chrono ChLinkRSDA analogue."""

    body1: int
    body2: int
    axis: Sequence[float] = (0.0, 1.0, 0.0)  # world, at t0
    spring_coeff: float = 0.0
    damping_coeff: float = 0.0
    rest_angle: float = 0.0


@dataclasses.dataclass(frozen=True)
class HydroAttachment:
    """Binds the first `num_bodies` hydro bodies (by list order) to BEM data.

    The reference matches Chrono bodies to h5 bodies by the "bodyN" naming
    contract (setup_hydro_from_yaml.cpp:84-122); here the scene layer resolves
    names to indices before building the spec.
    """

    hydro: HydroData
    body_indices: Sequence[int]  # spec body index of h5 body b (b = 0..N-1)


@dataclasses.dataclass(frozen=True)
class SystemSpec:
    bodies: Sequence[Body]
    joints: Sequence[Joint] = ()
    tsdas: Sequence[TSDA] = ()
    rsdas: Sequence[RSDA] = ()
    motors: Sequence[Motor] = ()
    hydro: Optional[HydroAttachment] = None
    gravity: Sequence[float] = (0.0, 0.0, -9.81)
    # quasi-static catenary mooring (physics/mooring.py) — the capability the
    # reference's `moordyn:` hydro-YAML block declares but never implements
    moorings: Optional[object] = None  # MooringSpec

    @property
    def moving_indices(self):
        return [i for i, b in enumerate(self.bodies) if not b.fixed]
