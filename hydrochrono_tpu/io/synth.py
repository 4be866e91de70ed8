"""Synthetic BEMIO HDF5 generation.

The reference repo ships only the sphere coefficient files; the rm3 / oswec /
f3of / deepcwind h5 files are missing LFS blobs. This module writes
physically plausible BEMIO-format files (correct dataset layout + scaling
conventions, SPD added mass, decaying radiation IRFs, smooth excitation
curves) so multibody models remain testable end-to-end, and so users can
prototype systems without running a BEM solver.
"""

from __future__ import annotations

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def write_bemio_h5(path: str, num_bodies: int, *, seed: int = 0,
                   rho: float = 1000.0, g: float = 9.81,
                   water_depth: float = float("inf"),
                   cg_list=None, cb_list=None, disp_vol=None,
                   rirf_tmax: float = 15.0, rirf_steps: int = 501,
                   n_freq: int = 120, coupling: float = 0.15,
                   state_space: bool = False,
                   shared_modes: int = 0) -> str:
    """Write a BEMIO file for `num_bodies` bodies; returns `path`.

    Coefficients are stored *unscaled* exactly as BEM post-processors write
    them (the loader applies rho / rho*g, matching h5fileinfo.cpp:61,73-75,90).

    With `state_space=True` the file additionally carries
    radiation_damping/state_space/{A,B,C,D} fits (BEMIO layout,
    physics/statespace.py). The synthetic RIRF entries are damped cosines
    amp*cos(w0 t)*exp(-zeta t), which an order-2 modal system represents
    EXACTLY (A = [[-zeta, w0], [-w0, -zeta]], B = [1, 0]^T, C = [amp, 0]),
    so the convolution and state-space paths integrate the same physics up
    to time-discretization error — the property the farm equivalence test
    checks (tests/test_farm.py)).

    `shared_modes > 0` switches the radiation kernel to a SHARED pole set
    with symmetric PSD rank-2 residues per mode — the physically realistic
    shape (real BEM kernels share the fluid resonances across the 6N x 6N
    matrix; per-entry-independent poles, the legacy default kept for the
    frozen case baselines, give an unphysically rank-rich Hankel that no
    low-order realization fits). Shared-mode kernels are what the ERA
    radiation mode (physics/era.py) is designed for: the true MIMO order is
    2 * shared_modes * rank = tens."""
    rng = np.random.RandomState(seed)
    nb = num_bodies
    total = 6 * nb
    o_ss = 2 * shared_modes if shared_modes else 2
    ss_A = np.zeros((total, total, o_ss, o_ss))
    ss_B = np.zeros((total, total, o_ss, 1))
    ss_C = np.zeros((total, total, 1, o_ss))
    ss_D = np.zeros((total, total))

    if cg_list is None:
        cg_list = [np.array([0.0, 0.0, -2.0 - b]) for b in range(nb)]
    if cb_list is None:
        cb_list = [cg + np.array([0.0, 0.0, 0.3]) for cg in cg_list]
    if disp_vol is None:
        disp_vol = [250.0 + 50.0 * b for b in range(nb)]

    omegas = np.linspace(0.1, 5.0, n_freq)
    rirf_t = np.linspace(0.0, rirf_tmax, rirf_steps)
    exc_t = np.linspace(-rirf_tmax / 2, rirf_tmax / 2, rirf_steps)

    Kglob = None
    if shared_modes:
        Kglob = np.zeros((total, total, rirf_steps))
        for m in range(shared_modes):
            w0 = 0.8 + 2.0 * rng.rand()
            zeta = 0.25 + 0.5 * rng.rand()
            u = rng.normal(size=(total, 2))
            # PSD symmetric rank-2 residue: dissipative at every frequency
            R = (10.0 / np.sqrt(total)) * (u @ u.T)
            env = np.cos(w0 * rirf_t) * np.exp(-zeta * rirf_t)
            Kglob += R[:, :, None] * env[None, None, :]
            sl2 = slice(2 * m, 2 * m + 2)
            ss_A[:, :, sl2, sl2] = np.array([[-zeta, w0], [-w0, -zeta]])
            ss_B[:, :, 2 * m, 0] = 1.0
            ss_C[:, :, 0, 2 * m] = R

    # system added mass (unscaled = A/rho): SPD via L L^T, dominated by diag
    L = 0.1 * coupling * rng.normal(size=(total, total))
    base = np.diag(80.0 + 40.0 * rng.rand(total))
    ainf_sys = base + L @ L.T
    ainf_sys = 0.5 * (ainf_sys + ainf_sys.T)

    with h5py.File(path, "w") as f:
        sp = f.require_group("simulation_parameters")
        sp.create_dataset("rho", data=np.array([[rho]]))
        sp.create_dataset("g", data=np.array([[g]]))
        if np.isinf(water_depth):
            sp.create_dataset("water_depth", data=np.bytes_("infinite"))
        else:
            sp.create_dataset("water_depth", data=np.array([[water_depth]]))
        sp.create_dataset("w", data=omegas[:, None])
        sp.create_dataset("T", data=(2 * np.pi / omegas)[:, None])

        for b in range(nb):
            grp = f.require_group(f"body{b + 1}")
            props = grp.require_group("properties")
            props.create_dataset("cg", data=np.asarray(cg_list[b], dtype=np.float64)[:, None])
            props.create_dataset("cb", data=np.asarray(cb_list[b], dtype=np.float64)[:, None])
            props.create_dataset("disp_vol", data=np.array([[disp_vol[b]]]))
            props.create_dataset("body_number", data=np.array([[float(b + 1)]]))

            hc = grp.require_group("hydro_coeffs")
            # linear restoring: heave + roll/pitch only, positive definite
            k = np.zeros((6, 6))
            k[2, 2] = 60.0 + 20.0 * rng.rand()
            k[3, 3] = 200.0 + 50.0 * rng.rand()
            k[4, 4] = 200.0 + 50.0 * rng.rand()
            hc.create_dataset("linear_restoring_stiffness", data=k)

            am = hc.require_group("added_mass")
            am.create_dataset("inf_freq", data=ainf_sys[b * 6 : b * 6 + 6, :])

            # radiation IRF: damped cosines, decaying cross-coupling
            rd = hc.require_group("radiation_damping")
            irf = rd.require_group("impulse_response_fun")
            if shared_modes:
                K = Kglob[b * 6:b * 6 + 6]
            else:
                K = np.zeros((6, total, rirf_steps))
                zeta = 0.5
                for i in range(6):
                    for j in range(total):
                        scale = (1.0 if (j == b * 6 + i)
                                 else coupling * rng.rand())
                        w0 = 0.8 + 2.0 * rng.rand()
                        amp = 20.0 * scale
                        K[i, j] = (amp * np.cos(w0 * rirf_t)
                                   * np.exp(-zeta * rirf_t))
                        # the exact modal realization of this damped cosine
                        r = b * 6 + i
                        ss_A[r, j] = [[-zeta, w0], [-w0, -zeta]]
                        ss_B[r, j] = [[1.0], [0.0]]
                        ss_C[r, j] = [[amp, 0.0]]
            irf.create_dataset("K", data=K)
            irf.create_dataset("t", data=rirf_t[:, None])
            irf.create_dataset("w", data=np.linspace(0, 5, rirf_steps)[:, None])

            # excitation coefficients vs frequency
            ex = hc.require_group("excitation")
            mag = np.zeros((6, 1, n_freq))
            phase = np.zeros((6, 1, n_freq))
            for i in range(6):
                peak = 0.8 + 1.5 * rng.rand()
                mag[i, 0] = (50.0 + 30.0 * rng.rand()) * np.exp(
                    -((omegas - peak) ** 2)
                )
                phase[i, 0] = 0.5 * np.sin(omegas) + 0.1 * i
            ex.create_dataset("mag", data=mag)
            ex.create_dataset("phase", data=phase)
            ex.create_dataset("re", data=mag * np.cos(phase))
            ex.create_dataset("im", data=mag * np.sin(phase))

            exirf = ex.require_group("impulse_response_fun")
            fmat = np.zeros((6, 1, rirf_steps))
            for i in range(6):
                w0 = 1.0 + 1.0 * rng.rand()
                fmat[i, 0] = (30.0 + 10.0 * rng.rand()) * np.cos(w0 * exc_t) * np.exp(
                    -0.8 * exc_t ** 2
                )
            exirf.create_dataset("f", data=fmat)
            exirf.create_dataset("t", data=exc_t[:, None])
            exirf.create_dataset("w", data=np.linspace(0, 5, rirf_steps)[:, None])

            if state_space:
                ssg = rd.require_group("state_space")
                sl = slice(b * 6, b * 6 + 6)
                ssg.create_dataset("A/all", data=ss_A[sl])
                ssg.create_dataset("B/all", data=ss_B[sl])
                ssg.create_dataset("C/all", data=ss_C[sl])
                ssg.create_dataset("D/all", data=ss_D[sl])

    return path
