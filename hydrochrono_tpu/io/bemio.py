"""BEMIO HDF5 hydrodynamic-coefficient loader.

Reads a BEMIO-format HDF5 file (the WEC-Sim / HydroChrono interchange format)
once, on the host, into a frozen bundle of float64 numpy arrays that the
simulation builder later converts to device arrays. Scaling conventions match
the reference implementation (reference: src/h5fileinfo.cpp):

  * infinite-frequency added mass  A_inf           x rho      (h5fileinfo.cpp:61)
  * radiation IRF kernel           K(t)            x rho      (h5fileinfo.cpp:321-323, scaled at use there; here at load)
  * excitation magnitude           |X(w)|          x rho*g    (h5fileinfo.cpp:73-75)
  * excitation IRF                 K_exc(t)        x rho*g    (h5fileinfo.cpp:90)
  * linear restoring stiffness     K_hs            UNSCALED   (scaled by rho*|g_system| at force
                                                              evaluation, hydro_forces.cpp:269,294)
  * water_depth string "infinite"  -> +inf         (h5fileinfo.cpp:207-220)

Dataset paths follow the BEMIO layout, e.g.
  body1/hydro_coeffs/added_mass/inf_freq                      (6, 6N)
  body1/hydro_coeffs/radiation_damping/impulse_response_fun/K (6, 6N, Tr)
  body1/hydro_coeffs/excitation/mag                           (6, Ndir, Nw)
  body1/hydro_coeffs/excitation/impulse_response_fun/f        (6, Ndir, Te)
  simulation_parameters/{rho,g,water_depth,w}

Bodies are named "body1".."bodyN" inside the file; this 1-indexed naming is a
hard API contract shared with the scene layer (reference: hydro_forces.cpp:106-107).
"""

from __future__ import annotations

import dataclasses

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover - h5py is expected in the image
    h5py = None

DOF = 6


@dataclasses.dataclass(frozen=True)
class HydroData:
    """Hydrodynamic coefficients for an N-body system, host-side float64.

    System DOF ordering: body-major, [body0(x,y,z,rx,ry,rz), body1(...), ...].
    """

    file_path: str
    num_bodies: int
    rho: float
    g: float
    water_depth: float  # +inf for infinite depth

    # per-body properties
    cg: np.ndarray  # [N, 3]
    cb: np.ndarray  # [N, 3]
    disp_vol: np.ndarray  # [N]
    lin_stiffness: np.ndarray  # [N, 6, 6] UNSCALED (x rho*g at use)

    # assembled system matrices (rho-scaled)
    inf_added_mass: np.ndarray  # [6N, 6N]
    rirf: np.ndarray  # [6N, 6N, Tr]
    rirf_time: np.ndarray  # [Tr]

    # regular-wave excitation (rho*g-scaled mag; phase raw)
    freq_list: np.ndarray  # [Nw] rad/s
    exc_mag: np.ndarray  # [N, 6, Ndir, Nw]
    exc_phase: np.ndarray  # [N, 6, Ndir, Nw]

    # irregular-wave excitation IRF (rho*g-scaled)
    exc_irf_time: np.ndarray  # [Te]
    exc_irf: np.ndarray  # [N, 6, Te] (at wave_directions[0])

    # tabulated wave headings (degrees) and the full direction-resolved
    # excitation IRF. The reference SQUEEZES this axis away and hard-codes
    # +x propagation (h5fileinfo.cpp:262-298 SqueezeMid,
    # wave_types.cpp:20,34); keeping it lets waves.resolve_wave_direction
    # honor the YAML `direction:` key (beyond-reference).
    wave_directions: np.ndarray | None = None  # [D] degrees
    exc_irf_dir: np.ndarray | None = None  # [N, 6, D, Te]

    # per-body force gating (hydro-YAML include_radiation flags; the
    # reference parses them but never applies them,
    # hydro_yaml_parser.cpp:377-380). None = all included. Kept on the
    # data so the state-space loader (which reads the h5 separately) can
    # honor the same mask.
    radiation_mask: np.ndarray | None = None  # [N] bool, False = excluded

    @property
    def total_dofs(self) -> int:
        return DOF * self.num_bodies

    @property
    def rirf_dt(self) -> float:
        return float(self.rirf_time[1] - self.rirf_time[0])


def _read_scalar(f, path: str) -> float:
    """Scalar read with the reference's "infinite" string convention."""
    ds = f[path]
    raw = ds[()]
    if isinstance(raw, bytes):
        return float("inf") if raw.decode().strip() == "infinite" else float(raw)
    arr = np.asarray(raw, dtype=np.float64)
    return float(arr.reshape(-1)[0])


def load_bemio_h5(path: str, num_bodies: int) -> HydroData:
    """Load a BEMIO HDF5 coefficient file for the first `num_bodies` bodies."""
    if h5py is None:
        raise RuntimeError("h5py is required to read BEMIO files")

    with h5py.File(path, "r") as f:
        rho = _read_scalar(f, "simulation_parameters/rho")
        g = _read_scalar(f, "simulation_parameters/g")
        water_depth = _read_scalar(f, "simulation_parameters/water_depth")
        freq_list = np.asarray(f["simulation_parameters/w"], dtype=np.float64).reshape(-1)
        if "wave_dir" in f["simulation_parameters"]:
            wave_directions = np.asarray(
                f["simulation_parameters/wave_dir"], dtype=np.float64
            ).reshape(-1)
        else:
            wave_directions = np.zeros(1)

        cg = np.zeros((num_bodies, 3))
        cb = np.zeros((num_bodies, 3))
        disp_vol = np.zeros(num_bodies)
        lin_stiffness = np.zeros((num_bodies, DOF, DOF))

        ainf_blocks = []
        rirf_blocks = []
        rirf_time = None
        exc_mag = []
        exc_phase = []
        exc_irf = []
        exc_irf_dir = []
        exc_irf_time = None

        for b in range(num_bodies):
            body = f[f"body{b + 1}"]
            cg[b] = np.asarray(body["properties/cg"], dtype=np.float64).reshape(-1)[:3]
            cb[b] = np.asarray(body["properties/cb"], dtype=np.float64).reshape(-1)[:3]
            disp_vol[b] = np.asarray(body["properties/disp_vol"]).reshape(-1)[0]
            lin_stiffness[b] = np.asarray(
                body["hydro_coeffs/linear_restoring_stiffness"], dtype=np.float64
            )

            ainf_blocks.append(
                np.asarray(body["hydro_coeffs/added_mass/inf_freq"], dtype=np.float64) * rho
            )

            k = np.asarray(
                body["hydro_coeffs/radiation_damping/impulse_response_fun/K"], dtype=np.float64
            )
            rirf_blocks.append(k * rho)
            t = np.asarray(
                body["hydro_coeffs/radiation_damping/impulse_response_fun/t"], dtype=np.float64
            ).reshape(-1)
            if rirf_time is None:
                rirf_time = t
            elif t.shape != rirf_time.shape or np.max(np.abs(t - rirf_time)) > 1e-10:
                # reference requires identical RIRF grids across bodies (h5fileinfo.cpp:329-343)
                raise ValueError("RIRF time vectors must be identical for all bodies")

            mag = np.asarray(body["hydro_coeffs/excitation/mag"], dtype=np.float64)
            phase = np.asarray(body["hydro_coeffs/excitation/phase"], dtype=np.float64)
            exc_mag.append(mag * (rho * g))
            exc_phase.append(phase)

            irf = np.asarray(
                body["hydro_coeffs/excitation/impulse_response_fun/f"], dtype=np.float64
            )
            # default slice = direction 0, matching SqueezeMid
            # (h5fileinfo.cpp:183-195); the full axis is kept in exc_irf_dir
            exc_irf.append(irf[:, 0, :] * (rho * g))
            exc_irf_dir.append(irf * (rho * g))
            te = np.asarray(
                body["hydro_coeffs/excitation/impulse_response_fun/t"], dtype=np.float64
            ).reshape(-1)
            if exc_irf_time is None:
                exc_irf_time = te

        total = DOF * num_bodies
        inf_added_mass = np.zeros((total, total))
        rirf = np.zeros((total, total, rirf_time.shape[0]))
        for b in range(num_bodies):
            # rows b*6..b*6+6 of the system matrix come from body b's [6, 6N] block
            # (assembly per reference chloadaddedmass.cpp:18-22)
            blk = ainf_blocks[b]
            inf_added_mass[b * DOF : (b + 1) * DOF, : blk.shape[1]] = blk
            rirf[b * DOF : (b + 1) * DOF, : rirf_blocks[b].shape[1], :] = rirf_blocks[b]

        return HydroData(
            file_path=path,
            num_bodies=num_bodies,
            rho=rho,
            g=g,
            water_depth=water_depth,
            cg=cg,
            cb=cb,
            disp_vol=disp_vol,
            lin_stiffness=lin_stiffness,
            inf_added_mass=inf_added_mass,
            rirf=rirf,
            rirf_time=rirf_time,
            freq_list=freq_list,
            exc_mag=np.stack(exc_mag),
            exc_phase=np.stack(exc_phase),
            exc_irf_time=exc_irf_time,
            exc_irf=np.stack(exc_irf),
            wave_directions=wave_directions,
            exc_irf_dir=np.stack(exc_irf_dir),
        )


def trapezoid_widths(t: np.ndarray) -> np.ndarray:
    """Trapezoidal quadrature widths of a (possibly non-uniform) grid.

    w[i] = (t[i+1]-t[i])/2 + (t[i]-t[i-1])/2 with one-sided ends
    (reference: hydro_forces.cpp:181-190 and wave_types.cpp:608-620).
    """
    t = np.asarray(t, dtype=np.float64)
    w = np.zeros_like(t)
    if t.size > 1:
        d = np.abs(np.diff(t))
        w[:-1] += 0.5 * d
        w[1:] += 0.5 * d
    return w


def mask_hydro_bodies(hd: HydroData, include_excitation, include_radiation) -> HydroData:
    """Apply per-body include_excitation / include_radiation flags by
    zeroing the corresponding coefficient slices (TPU-first: masked data
    makes every execution path — XLA scan, blocked, fused Pallas kernel —
    honor the flags at zero runtime cost).

    The reference parses these hydro-YAML flags but never applies them
    (hydro_yaml_parser.cpp:377-380, no consumer in src/); implementing them
    is strictly-better parity. Excluding radiation zeroes the body's rows
    of the RIRF force kernel (the A_inf added-mass load stays, matching the
    reference's separation of the added-mass machinery from the convolution
    force, chloadaddedmass.cpp vs hydro_forces.cpp:537-691); excluding
    excitation zeroes the body's regular-wave coefficients and excitation
    IRF.
    """
    exc = np.asarray(include_excitation, dtype=bool)
    rad = np.asarray(include_radiation, dtype=bool)
    if exc.shape != (hd.num_bodies,) or rad.shape != (hd.num_bodies,):
        raise ValueError(
            f"include flags must have shape [{hd.num_bodies}]; got "
            f"{exc.shape} / {rad.shape}")
    if exc.all() and rad.all():
        return hd
    rirf = hd.rirf
    if not rad.all():
        rirf = rirf.copy()
        for b in np.nonzero(~rad)[0]:
            rirf[DOF * b : DOF * (b + 1), :, :] = 0.0
    exc_mag, exc_irf = hd.exc_mag, hd.exc_irf
    exc_irf_dir = hd.exc_irf_dir
    if not exc.all():
        exc_mag = exc_mag.copy()
        exc_irf = exc_irf.copy()
        if exc_irf_dir is not None:
            # the direction-resolved kernel feeds resolve_wave_direction's
            # tabulated-heading path — an excluded body must stay excluded
            # at every heading
            exc_irf_dir = exc_irf_dir.copy()
        for b in np.nonzero(~exc)[0]:
            exc_mag[b] = 0.0
            exc_irf[b] = 0.0
            if exc_irf_dir is not None:
                exc_irf_dir[b] = 0.0
    return dataclasses.replace(
        hd, rirf=rirf, exc_mag=exc_mag, exc_irf=exc_irf,
        exc_irf_dir=exc_irf_dir,
        radiation_mask=rad if not rad.all() else None)
