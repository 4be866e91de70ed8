"""Linear hydrostatic restoring + buoyancy forces.

Per hydro body (reference: hydro_forces.cpp:263-322):

    disp6 = [pos - cg_equilibrium, cardanXYZ(quat) - 0]
    F6   = -rho*|g| * K_lin @ disp6                      (linear restoring)
    F6[:3] += rho * (-g_vec) * V_disp                    (buoyancy)
    F6[3:] += (cb - cg) x F_buoy                         (buoyancy moment about CG)

Note rho comes from the h5 file while |g| is the *system* gravity magnitude
(hydro_forces.cpp:267-269) — they may disagree (e.g. YAML g=9.8, h5 g=9.81).
"""

from __future__ import annotations

import jax.numpy as jnp

from hydrochrono_tpu.ops.mxu import FULL
from hydrochrono_tpu.physics.rotations import cardan_xyz_from_quat


def hydrostatic_force(pos, quat, k_lin, cg_eq, cb_minus_cg, disp_vol, rho, gravity_vec):
    """Hydrostatic 6-force per body.

    pos: [..., N, 3]; quat: [..., N, 4]
    k_lin: [N, 6, 6] unscaled stiffness; cg_eq: [N, 3]; cb_minus_cg: [N, 3]
    disp_vol: [N]; rho: scalar; gravity_vec: [3]
    Returns [..., N, 6] world-frame force+torque about each body's origin.
    """
    g_mag = jnp.linalg.norm(gravity_vec)
    rot_disp = cardan_xyz_from_quat(quat)  # [..., N, 3]
    disp6 = jnp.concatenate([pos - cg_eq, rot_disp], axis=-1)  # [..., N, 6]
    # precision pinned: the TPU default (one bf16 pass) puts ~0.4% bias on
    # the stiffest force in the system (ops/mxu.py)
    restoring = -(rho * g_mag) * jnp.einsum(
        "nij,...nj->...ni", k_lin, disp6, precision=FULL)

    f_buoy = rho * (-gravity_vec) * disp_vol[:, None]  # [N, 3]
    t_buoy = jnp.cross(cb_minus_cg, f_buoy)  # [N, 3]
    buoy6 = jnp.concatenate([f_buoy, t_buoy], axis=-1)  # [N, 6]
    return restoring + buoy6
