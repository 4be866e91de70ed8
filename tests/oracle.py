"""Independent numpy oracle: direct transcription of the reference algorithm.

Implements the reference's per-step force pipeline exactly as the C++ does
it — per-lag trapezoid radiation convolution with linear velocity-history
interpolation (hydro_forces.cpp:537-691), Cardan hydrostatics (:263-322),
added-mass-augmented semi-implicit Euler — for UNCONSTRAINED multibody
systems. Used to cross-validate the JAX engine's resampled-kernel
formulation on coupled multibody cases where no golden data exists.

Rotations are integrated as a small-angle rotation vector (the JAX engine
uses exact quaternions); agreement is therefore O(theta^2) — ample to catch
assembly/indexing/scaling bugs, which show up at O(1).
"""

import numpy as np

from hydrochrono_tpu.io.bemio import HydroData, trapezoid_widths


def simulate_unconstrained(hd: HydroData, masses, pos0, nsteps, dt, gravity=-9.81):
    """Semi-implicit Euler on N free 6-DoF bodies (identity inertia).

    Returns (positions [nsteps, N, 3], rotations [nsteps, N, 3]).
    """
    nb = hd.num_bodies
    total = 6 * nb
    w = trapezoid_widths(hd.rirf_time)
    rirf = hd.rirf  # [6N, 6N, Tr], rho-scaled

    mass_mat = np.zeros((total, total))
    for b in range(nb):
        mass_mat[b * 6 : b * 6 + 3, b * 6 : b * 6 + 3] = masses[b] * np.eye(3)
        mass_mat[b * 6 + 3 : b * 6 + 6, b * 6 + 3 : b * 6 + 6] = np.eye(3)
    mass_mat = mass_mat + hd.inf_added_mass

    pos = np.array(pos0, dtype=np.float64)  # [N, 3]
    rot = np.zeros((nb, 3))
    vel = np.zeros(total)
    times_hist = []  # newest first
    vel_hist = []  # newest first, entries [6N]
    out_p = np.zeros((nsteps, nb, 3))
    out_r = np.zeros((nsteps, nb, 3))

    g_vec = np.array([0.0, 0.0, gravity])
    g_mag = abs(gravity)

    for n in range(nsteps):
        t = n * dt
        times_hist.insert(0, t)
        vel_hist.insert(0, vel.copy())
        tmin = t - hd.rirf_time[-1]
        while len(times_hist) > 1 and times_hist[-2] < tmin:
            times_hist.pop()
            vel_hist.pop()

        F = np.zeros(total)
        for b in range(nb):
            F[b * 6 + 2] += masses[b] * gravity

        for b in range(nb):
            disp = np.concatenate([pos[b] - hd.cg[b], rot[b]])
            F[b * 6 : b * 6 + 6] += -(hd.rho * g_mag) * hd.lin_stiffness[b] @ disp
            fb = hd.rho * (-g_vec) * hd.disp_vol[b]
            F[b * 6 : b * 6 + 3] += fb
            F[b * 6 + 3 : b * 6 + 6] += np.cross(hd.cb[b] - hd.cg[b], fb)

        if len(times_hist) > 1:
            th = np.array(times_hist)[::-1]  # ascending
            vh = np.array(vel_hist)[::-1]  # [K, 6N]
            f_rad = np.zeros(total)
            for s in range(hd.rirf_time.shape[0]):
                q = t - hd.rirf_time[s]
                if q < th[0] - 1e-12:
                    continue
                vq = np.array([np.interp(q, th, vh[:, j]) for j in range(total)])
                f_rad += rirf[:, :, s] @ vq * w[s]
            F -= f_rad

        acc = np.linalg.solve(mass_mat, F)
        vel = vel + dt * acc
        for b in range(nb):
            pos[b] = pos[b] + dt * vel[b * 6 : b * 6 + 3]
            rot[b] = rot[b] + dt * vel[b * 6 + 3 : b * 6 + 6]
        out_p[n] = pos
        out_r[n] = rot
    return out_p, out_r
