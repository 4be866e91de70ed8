"""SystemSpec builders for the reference demo workloads.

Parameters are transcribed from the demo sources (cited per function) so the
resulting systems are drop-in reproductions of the reference scenes.
"""

from __future__ import annotations

import numpy as np

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.physics.system import (
    Body,
    HydroAttachment,
    Joint,
    RSDA,
    SystemSpec,
    TSDA,
)


def _quat_about_y(angle_rad: float):
    return (np.cos(angle_rad / 2), 0.0, np.sin(angle_rad / 2), 0.0)


def sphere_decay(h5_path: str, z0: float = -1.0) -> SystemSpec:
    """Free sphere heave decay (demos/sphere/demo_sphere_decay.cpp:43-101)."""
    hydro = load_bemio_h5(h5_path, num_bodies=1)
    return SystemSpec(
        bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, z0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )


def sphere_heave_constrained(h5_path: str, damping: float = 0.0) -> SystemSpec:
    """Heave-constrained sphere with PTO damper
    (demos/sphere/demo_sphere_reg_waves.cpp:72-126)."""
    hydro = load_bemio_h5(h5_path, num_bodies=1)
    return SystemSpec(
        bodies=[
            Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -2.0)),
            Body(name="ground", mass=999.0, pos0=(0.0, 0.0, -5.0), fixed=True),
        ],
        joints=[Joint("prismatic", 0, 1, location=(0.0, 0.0, -2.0), axis=(0.0, 0.0, 1.0))],
        tsdas=[TSDA(0, 1, (0.0, 0.0, -2.0), (0.0, 0.0, -5.0),
                    spring_coeff=0.0, damping_coeff=damping)],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )


def rm3(h5_path: str, pto_damping: float = 0.0) -> SystemSpec:
    """RM3 two-body point absorber: float + plate, vertical prismatic joint,
    TSDA PTO (demos/rm3/demo_rm3_reg_waves.cpp:95-137)."""
    hydro = load_bemio_h5(h5_path, num_bodies=2)
    return SystemSpec(
        bodies=[
            Body(name="body1", mass=725834.0, pos0=(0.0, 0.0, -0.72),
                 inertia=np.diag([20907301.0, 21306090.66, 37085481.11])),
            Body(name="body2", mass=886691.0, pos0=(0.0, 0.0, -21.29),
                 inertia=np.diag([94419614.57, 94407091.24, 28542224.82])),
        ],
        joints=[Joint("prismatic", 0, 1, location=(0.0, 0.0, -0.72),
                      axis=(0.0, 0.0, 1.0))],
        tsdas=[TSDA(0, 1, (0.0, 0.0, -0.72), (0.0, 0.0, -21.29),
                    spring_coeff=0.0, damping_coeff=pto_damping)],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0, 1]),
        gravity=(0.0, 0.0, -9.81),
    )


def oswec(h5_path: str, initial_pitch_deg: float = 10.0,
          pto_damping: float = 0.0) -> SystemSpec:
    """OSWEC: pitching flap hinged to an anchored base
    (demos/oswec/demo_oswec_decay.cpp:105-184). The initial pitch is applied
    by rotating the hinge->cg offset (:105-118)."""
    hydro = load_bemio_h5(h5_path, num_bodies=2)
    ang = np.deg2rad(initial_pitch_deg)
    hinge = np.array([0.0, 0.0, -8.9])
    hinge_to_cg = np.array([0.0, 0.0, 5.0])
    # rotate about +y by ang
    c, s = np.cos(ang), np.sin(ang)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    new_cg = hinge + rot @ hinge_to_cg

    rsdas = []
    if pto_damping != 0.0:
        rsdas.append(RSDA(0, 1, axis=(0.0, 1.0, 0.0), damping_coeff=pto_damping))

    return SystemSpec(
        bodies=[
            Body(name="body1", mass=127000.0, pos0=tuple(new_cg),
                 quat0=_quat_about_y(ang),
                 inertia=np.diag([1.85e6, 1.85e6, 1.85e6])),
            Body(name="body2", mass=999.0, pos0=(0.0, 0.0, -10.15),
                 inertia=np.diag([1.0, 1.0, 1.0])),
            Body(name="ground", mass=1.0, pos0=(0.0, 0.0, -10.15), fixed=True),
        ],
        joints=[
            Joint("revolute", 1, 0, location=(0.0, 0.0, -8.9), axis=(0.0, 1.0, 0.0)),
            Joint("fixed", 1, 2, location=(0.0, 0.0, -10.15)),
        ],
        rsdas=rsdas,
        hydro=HydroAttachment(hydro=hydro, body_indices=[0, 1]),
        gravity=(0.0, 0.0, -9.81),
    )


def f3of(h5_path: str, fore_pitch_deg: float = 0.0, aft_pitch_deg: float = 0.0,
         lock_flaps: bool = False, base_offset=(0.0, 0.0, 0.0),
         base_pitch_deg: float = 0.0) -> SystemSpec:
    """F3OF: base + fore/aft flaps on revolute hinges, anchored base
    (demos/f3of/demo_F3OF_DT3.cpp:82-153). DT1 locks the flap hinges
    (demo_F3OF_DT1.cpp:125-138)."""
    hydro = load_bemio_h5(h5_path, num_bodies=3)
    fore = np.deg2rad(fore_pitch_deg)
    aft = np.deg2rad(aft_pitch_deg)

    fore_pos = (-12.5 + 3.5 * np.cos(np.pi / 2 - fore),
                0.0, -9.0 + 3.5 * np.sin(np.pi / 2 - fore))
    aft_pos = (12.5 + 3.5 * np.cos(np.pi / 2 - aft),
               0.0, -9.0 + 3.5 * np.sin(np.pi / 2 - aft))

    return SystemSpec(
        bodies=[
            Body(name="body1", mass=1089825.0,
                 pos0=tuple(np.array([0.0, 0.0, -9.0]) + np.asarray(base_offset)),
                 quat0=_quat_about_y(np.deg2rad(base_pitch_deg)),
                 inertia=np.diag([1.0e8, 7.63e7, 1.0e8])),
            Body(name="body2", mass=179250.0, pos0=fore_pos,
                 quat0=_quat_about_y(fore),
                 inertia=np.diag([1.0e8, 1.3e6, 1.0e8])),
            Body(name="body3", mass=179250.0, pos0=aft_pos,
                 quat0=_quat_about_y(aft),
                 inertia=np.diag([1.0e8, 1.3e6, 1.0e8])),
            Body(name="ground", mass=1.0, pos0=(0.0, 0.0, -12.0), fixed=True),
        ],
        joints=[
            Joint("revolute", 0, 1, location=(-12.5, 0.0, -9.0),
                  axis=(0.0, 1.0, 0.0), locked=lock_flaps),
            Joint("revolute", 0, 2, location=(12.5, 0.0, -9.0),
                  axis=(0.0, 1.0, 0.0), locked=lock_flaps),
            Joint("fixed", 0, 3, location=(0.0, 0.0, -9.0)),
        ],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0, 1, 2]),
        gravity=(0.0, 0.0, -9.81),
    )


def deepcwind_decay(h5_path: str, pitch_deg: float = -3.95,
                    damper: float = 31e6) -> SystemSpec:
    """DeepCWind semisubmersible pitch decay with an RSDA damper to ground
    (demos/DeepCWind/demo_DeepCWind_decay.cpp:60-100)."""
    hydro = load_bemio_h5(h5_path, num_bodies=1)
    ang = np.deg2rad(pitch_deg)
    return SystemSpec(
        bodies=[
            Body(name="body1", mass=1.419625e7, pos0=(0.0, 0.0, -7.53),
                 quat0=_quat_about_y(ang),
                 inertia=np.diag([1.2898e10, 1.2851e10, 1.4189e10])),
            Body(name="ground", mass=1.0, pos0=(0.0, 0.0, -7.53), fixed=True),
        ],
        rsdas=[RSDA(0, 1, axis=(0.0, 1.0, 0.0), damping_coeff=damper)],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )


def sphere_farm(h5_path: str, *, nx: int = 2, ny: int = 2,
                spacing: float = 40.0, z0: float = -2.0,
                mass: float = 261.8e3, inertia_scalar: float = 2.1e6,
                pto_damping: float = 5.0e4,
                heave_only: bool = False) -> SystemSpec:
    """An nx*ny wave farm of identical floating spheres (point absorbers)
    with linear heave PTO dampers to seabed anchors.

    Beyond-reference scale-out (SURVEY.md §2.5 TP row): the reference tops
    out at 3 coupled bodies (F3OF); here the hydrodynamically coupled 6N
    system (the generalization of chloadaddedmass.cpp:27-53's single-system
    assembly) runs at arbitrary N through the constant-mass fast path
    (stepper.py const_mass: isotropic inertia + no joints => one
    precomputed [6N, 6N] inverse-apply per step) and, with a state-space
    radiation file, with no history convolution at all.

    `h5_path` must carry nx*ny coupled bodies (io/synth.py
    write_bemio_h5(num_bodies=nx*ny, state_space=True) for synthetic
    farms). Each device gets a TSDA heave damper to a fixed anchor
    directly below it — the farm PTO — with no joints, so the system
    stays constraint-free.

    heave_only=True adds a vertical prismatic joint to ground per device
    (the WEC-on-a-heave-rail point-absorber configuration, cf. the
    reference's heave-constrained sphere demo
    demo_sphere_reg_waves.cpp:100-123, which approximates the rail with
    stiff TSDAs): 5 constraint rows per device, solved at farm scale by
    the refined constrained const-mass KKT path (stepper.py).
    """
    n = nx * ny
    hydro = load_bemio_h5(h5_path, num_bodies=n)
    x0 = -0.5 * (nx - 1) * spacing
    y0 = -0.5 * (ny - 1) * spacing
    bodies, tsdas, joints = [], [], []
    anchor_z = z0 - 30.0
    for b in range(n):
        ix, iy = b % nx, b // nx
        px, py = x0 + ix * spacing, y0 + iy * spacing
        bodies.append(Body(
            name=f"body{b + 1}", mass=mass, pos0=(px, py, z0),
            inertia=inertia_scalar * np.eye(3)))
    ground = len(bodies)
    bodies.append(Body(name="ground", mass=1.0,
                       pos0=(0.0, 0.0, anchor_z), fixed=True))
    for b in range(n):
        px, py, _ = bodies[b].pos0
        tsdas.append(TSDA(
            b, ground, (px, py, z0), (px, py, anchor_z),
            spring_coeff=0.0, damping_coeff=pto_damping))
        if heave_only:
            joints.append(Joint(
                "prismatic", b, ground, location=(px, py, z0),
                axis=(0.0, 0.0, 1.0)))
    return SystemSpec(
        bodies=bodies,
        joints=joints,
        tsdas=tsdas,
        hydro=HydroAttachment(hydro=hydro, body_indices=list(range(n))),
        gravity=(0.0, 0.0, -9.81),
    )
