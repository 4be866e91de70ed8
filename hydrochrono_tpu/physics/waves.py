"""Wave models: still water, regular (monochromatic) and irregular (JONSWAP) seas.

Host-side precomputation (spectra, phases, wavenumbers, free-surface elevation,
excitation-IRF resampling) happens once in float64 numpy; the per-step wave
force is a tiny closed form (regular) or a windowed dot against the
precomputed eta series (irregular), both jit-safe and batched.

Reference semantics reproduced (file:line into /root/reference):
  * Pierson-Moskowitz / JONSWAP spectra in Hz            wave_types.cpp:679-715
  * phase RNG: std::mt19937(seed) + uniform_real(0,2pi)  wave_types.cpp:664-669
    (bit-exact via the MT19937 stream + GCC generate_canonical pairing)
  * dispersion Newton solve w/ deep-water shortcut       wave_types.cpp:178-255
  * eta synthesis with start ramp                        wave_types.cpp:717-774
  * excitation IRF cubic-spline resample to sim dt       wave_types.cpp:572-606
  * regular-wave excitation interpolation (incl. the
    freq_index = w/dw - 1 convention and the phase
    lookup that always uses body 1's phases)             wave_types.cpp:289-352
  * per-step excitation convolution over eta             wave_types.cpp:776-844
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from hydrochrono_tpu.io.bemio import HydroData, trapezoid_widths

TWO_PI = 2.0 * np.pi


# ---------------------------------------------------------------------------
# dispersion
# ---------------------------------------------------------------------------

def compute_wavenumber(omega, water_depth: float, g: float,
                       tolerance: float = 1e-6, max_iterations: int = 100):
    """Newton solve of omega^2 = g k tanh(k h); vectorized over omega.

    Deep-water shortcut when h == 0, h > 1000 or h == inf
    (reference: wave_types.cpp:178-255).
    """
    omega = np.asarray(omega, dtype=np.float64)
    if water_depth == 0.0 or water_depth > 1000.0 or np.isinf(water_depth):
        return omega * omega / g
    k = omega * omega / g
    for _ in range(max_iterations):
        tanh_kh = np.tanh(k * water_depth)
        f = omega * omega - g * k * tanh_kh
        df = -2.0 * g * tanh_kh - g * k * water_depth * (1.0 - tanh_kh * tanh_kh)
        delta = f / df
        k = k - delta
        if np.max(np.abs(delta)) <= tolerance:
            break
    return k


# ---------------------------------------------------------------------------
# spectra
# ---------------------------------------------------------------------------

def pierson_moskowitz_spectrum_hz(f_hz: np.ndarray, hs: float, tp: float) -> np.ndarray:
    f_hz = np.asarray(f_hz, dtype=np.float64)
    return (
        1.25 * (1.0 / tp) ** 4 * (hs / 2.0) ** 2 * f_hz ** -5.0
        * np.exp(-1.25 * (1.0 / tp) ** 4 * f_hz ** -4.0)
    )


def jonswap_spectrum_hz(f_hz: np.ndarray, hs: float, tp: float,
                        gamma: float = 3.3, is_normalized: bool = True) -> np.ndarray:
    s = pierson_moskowitz_spectrum_hz(f_hz, hs, tp)
    sigma = np.where(f_hz <= 1.0 / tp, 0.07, 0.09)
    s = s * gamma ** np.exp(-((f_hz * tp - 1.0) ** 2) / (2.0 * sigma ** 2))
    if is_normalized:
        s = s * (1.0 - 0.287 * np.log(gamma))
    return s


def mt19937_uniform_phases(seed: int, n: int) -> np.ndarray:
    """Phases in [0, 2pi) bit-identical to GCC's
    std::uniform_real_distribution<double>(0, 2pi) over std::mt19937(seed):
    each double consumes two 32-bit draws x0, x1 -> (x0 + x1*2^32) / 2^64.
    numpy's RandomState shares MT19937 and the int-seed initialization.
    """
    rs = np.random.RandomState(seed)
    raw = rs.randint(0, 2 ** 32, size=2 * n, dtype=np.uint64)
    x0 = raw[0::2].astype(np.float64)
    x1 = raw[1::2].astype(np.float64)
    return (x0 + x1 * 2.0 ** 32) / 2.0 ** 64 * TWO_PI


# ---------------------------------------------------------------------------
# free-surface elevation + kinematics (host-side, numpy)
# ---------------------------------------------------------------------------

def eta_irregular_series(times: np.ndarray, freqs_hz: np.ndarray,
                         spectral_densities: np.ndarray, spectral_widths: np.ndarray,
                         phases: np.ndarray, wavenumbers: np.ndarray,
                         x_pos: float = 0.0) -> np.ndarray:
    """eta(t) = sum_i sqrt(2 S_i dw_i) cos(k_i x - w_i t + phi_i)
    (reference: wave_types.cpp:14-44)."""
    amp = np.sqrt(2.0 * spectral_densities * spectral_widths)
    omega = TWO_PI * freqs_hz
    # [T, F] phase matrix; sum over F
    arg = wavenumbers[None, :] * x_pos - omega[None, :] * times[:, None] + phases[None, :]
    return (np.cos(arg) * amp[None, :]).sum(axis=1)


# ---------------------------------------------------------------------------
# Eigen-compatible cubic B-spline resampling of the excitation IRF
# ---------------------------------------------------------------------------

def _eigen_knot_averaging(params: np.ndarray, degree: int = 3) -> np.ndarray:
    """Eigen::KnotAveraging — first/last degree+1 knots clamped to 0/1,
    interior knot j+degree = mean(params[j : j+degree])."""
    n = params.shape[0]
    knots = np.zeros(n + degree + 1)
    for j in range(1, n - degree):
        knots[j + degree] = params[j : j + degree].mean()
    knots[-(degree + 1):] = 1.0
    return knots


def eigen_spline_resample(values: np.ndarray, n_new: int) -> np.ndarray:
    """Resample rows of `values` [D, n] onto n_new uniformly spaced parameters
    using a degree-3 interpolating B-spline with Eigen's knot averaging —
    matching Eigen::SplineFitting used by the reference (wave_types.cpp:572-606,
    which maps both old and new time grids to uniform [0,1] parameters).
    """
    from scipy.interpolate import make_interp_spline, BSpline

    d, n = values.shape
    params = np.linspace(0.0, 1.0, n)
    knots = _eigen_knot_averaging(params, 3)
    u_new = np.linspace(0.0, 1.0, n_new)
    out = np.empty((d, n_new))
    spl = make_interp_spline(params, values.T, k=3, t=knots)
    out[:] = spl(u_new).T
    return out


# ---------------------------------------------------------------------------
# wave model specs
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NoWave:
    """Still water (reference: wave_types.cpp:257-264)."""


@dataclasses.dataclass(frozen=True)
class RegularWave:
    """Monochromatic wave. amplitude/omega may be scalars or [B] arrays for
    batched sweeps (reference: wave_types.cpp:266-352).

    direction: wave heading in degrees from +x toward +y. The reference
    parses the YAML key but hard-codes +x propagation (wave_types.cpp:20,34);
    here it selects/interpolates the BEMIO direction axis, or rotates the
    excitation for axisymmetric bodies (resolve_wave_direction)."""

    amplitude: object  # scalar or array [B]
    omega: object  # scalar or array [B]
    phase: float = 0.0
    direction: float = 0.0  # degrees
    axisymmetric: bool = False  # allow D=1 files via excitation rotation


@dataclasses.dataclass(frozen=True)
class IrregularWaveParams:
    """Mirrors the reference IrregularWaveParams (wave_types.h:277-292)."""

    height: float  # Hs
    period: float  # Tp
    frequency_min: float = 0.001
    frequency_max: float = 1.0
    nfrequencies: int = 0  # 0 = auto: ceil((fmax-fmin)*T_sim)
    peak_enhancement_factor: float = 1.0  # reference default (wave_types.h:288)
    is_normalized: bool = False  # reference default (wave_types.h:289)
    seed: int = 1  # may be an array [B] for batched seeds
    ramp_duration: float = 0.0
    eta_file_path: Optional[str] = None
    wave_stretching: bool = False
    direction: float = 0.0  # degrees (see RegularWave.direction)
    axisymmetric: bool = False
    # directional spreading (beyond-reference; the reference is strictly
    # unidirectional, wave_types.cpp:20,34): cos-2s model
    # D(theta) ~ cos^{2s}((theta - theta_m)/2) (Longuet-Higgins 1963),
    # discretized over `n_directions` headings spanning `spreading_span`
    # degrees about `direction`. None = unidirectional (reference behavior).
    spreading_exponent: Optional[float] = None
    n_directions: int = 7
    spreading_span: float = 180.0


def excitation_freq_from_irf(K: np.ndarray, freqs: np.ndarray,
                             times: np.ndarray) -> np.ndarray:
    """Forward transform of a (real, compact-support) excitation IRF onto
    the tabulated frequency grid: X(w) = int K(t) e^{-iwt} dt (trapezoid
    over the kernel's own time grid). Inverse of
    excitation_irf_from_frequency; the roundtrip preserves the kernel to
    band-truncation error (tested). K: [..., Te] -> [..., Nw] complex."""
    tw = trapezoid_widths(times)
    basis = np.exp(-1j * np.outer(freqs, times)) * tw[None, :]  # [Nw, Te]
    return K @ basis.T


def excitation_irf_from_frequency(Xc: np.ndarray, freqs: np.ndarray,
                                  times: np.ndarray) -> np.ndarray:
    """Rebuild the excitation IRF from the complex frequency response.

    K(t) = (1/pi) * int_0^inf Re{ X(w) e^{iwt} } dw, discretized with
    trapezoid weights over the tabulated frequency grid — the same
    construction BEMIO uses to produce `excitation_IRF` (validated against
    the shipped kernel in tests/test_spreading.py). Needed when the
    frequency response is modified per heading (array-phasing correction)
    and the time-domain kernel must follow.

    Xc: [..., Nw] complex; freqs: [Nw] rad/s; times: [Te]. Returns
    [..., Te] real.
    """
    w = trapezoid_widths(freqs)
    ph = np.exp(1j * np.outer(freqs, times))  # [Nw, Te]
    return (Xc[..., None] * (w[:, None] * ph)).real.sum(-2) / np.pi


def cos2s_headings(s: float, n_directions: int,
                   span_deg: float = 180.0):
    """Discretized cos-2s spreading: relative headings [D] (degrees,
    centered on 0) and energy weights [D] summing to 1.

    D(theta) ~ cos^{2s}(theta/2) on |theta| <= span/2; the normalization
    constant drops out because the trapezoid weights are renormalized to
    exactly conserve the spectrum's total energy (sum_d w_d = 1 means the
    multi-directional eta variance equals the unidirectional one)."""
    if n_directions < 1:
        raise ValueError("n_directions must be >= 1")
    if n_directions == 1:
        return np.zeros(1), np.ones(1)
    th = np.linspace(-0.5 * span_deg, 0.5 * span_deg, int(n_directions))
    dens = np.cos(np.deg2rad(th) / 2.0) ** (2.0 * float(s))
    w = dens * trapezoid_widths(th)
    return th, w / w.sum()


def _heading_transform(direction_deg: float) -> np.ndarray:
    """T(theta) = blockdiag(Rz, Rz) [6, 6]: how a 6-DOF wave-excitation
    wrench on an AXISYMMETRIC body transforms when the wave heading rotates
    by theta about +z (forces and moments rotate as vectors)."""
    th = np.deg2rad(direction_deg)
    c, s = np.cos(th), np.sin(th)
    rz = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    T = np.zeros((6, 6))
    T[:3, :3] = rz
    T[3:, 3:] = rz
    return T


def resolve_wave_direction(hydro: HydroData, direction_deg: float,
                           axisymmetric: bool = False,
                           body_xy: Optional[np.ndarray] = None) -> HydroData:
    """Return a HydroData with the excitation resolved at `direction_deg`.

    The reference parses the YAML `direction:` key but squeezes the BEMIO
    wave-direction axis away and hard-codes +x propagation
    (h5fileinfo.cpp:262-298 SqueezeMid; wave_types.cpp:20,34) — direction
    is silently ignored there. Here (beyond-reference):

      * if the file tabulates the requested heading, that slice is used;
      * between tabulated headings, mag/phase (and the excitation IRF) are
        linearly interpolated along the direction axis — the same
        treatment the reference applies along the frequency axis;
      * for single-heading files, `axisymmetric=True` rotates the
        excitation exactly: for an axisymmetric body the 6-DOF excitation
        at heading theta is T(theta) = blockdiag(Rz, Rz) applied to the
        heading-0 complex response (validated by the rotated-frame
        symmetry test, tests/test_direction.py).

    body_xy [N, 2]: horizontal body reference positions. When given, the
    axisymmetric rotation additionally applies the plane-wave ARRAY
    PHASING e^{-i k(w) (d_hat - d0_hat) . r_b} per body and frequency —
    the leading-order (wide-spacing) geometric correction for
    multi-device arrays whose coefficients were solved at d0 only — and
    rebuilds the excitation IRF from the corrected spectrum
    (excitation_irf_from_frequency). Without it a rotated heading keeps
    every device's phase as if it sat at the origin.
    """
    import dataclasses as _dc

    dirs = hydro.wave_directions
    if dirs is None:
        dirs = np.zeros(1)
    d = float(direction_deg)
    if dirs.size >= 1 and dirs.min() - 1e-9 <= d <= dirs.max() + 1e-9:
        # snap float roundoff just outside the tabulated range onto the
        # endpoints: d = -1e-10 used to pass the range check but miss the
        # exact-hit check, and searchsorted's j=0 then wrapped i=j-1 to
        # the LAST heading with a negative interpolation weight
        d = float(np.clip(d, dirs.min(), dirs.max()))
    # exact tabulated heading?
    hit = np.nonzero(np.abs(dirs - d) <= 1e-9)[0]
    if hit.size:
        i = int(hit[0])
        irf_dir = (hydro.exc_irf_dir[:, :, i, :]
                   if hydro.exc_irf_dir is not None else hydro.exc_irf)
        return _dc.replace(
            hydro,
            exc_mag=hydro.exc_mag[:, :, i : i + 1, :],
            exc_phase=hydro.exc_phase[:, :, i : i + 1, :],
            exc_irf=irf_dir,
        )
    if dirs.size >= 2 and dirs.min() - 1e-9 <= d <= dirs.max() + 1e-9:
        j = int(np.searchsorted(dirs, d))
        i = j - 1
        w = (d - dirs[i]) / (dirs[j] - dirs[i])
        # interpolate the complex response (re/im), not mag/phase — phase
        # wraps; re/im interpolation is what linear interpolation of the
        # underlying transfer function means
        c0 = hydro.exc_mag[:, :, i] * np.exp(1j * hydro.exc_phase[:, :, i])
        c1 = hydro.exc_mag[:, :, j] * np.exp(1j * hydro.exc_phase[:, :, j])
        c = (1.0 - w) * c0 + w * c1
        irf = hydro.exc_irf
        if hydro.exc_irf_dir is not None:
            irf = ((1.0 - w) * hydro.exc_irf_dir[:, :, i]
                   + w * hydro.exc_irf_dir[:, :, j])
        return _dc.replace(
            hydro,
            exc_mag=np.abs(c)[:, :, None, :],
            exc_phase=np.angle(c)[:, :, None, :],
            exc_irf=irf,
        )
    if axisymmetric:
        d0 = float(dirs[0])
        T = _heading_transform(d - d0)
        c = hydro.exc_mag[:, :, 0] * np.exp(1j * hydro.exc_phase[:, :, 0])
        c_rot = np.einsum("ij,njf->nif", T, c)
        proj = None
        if body_xy is not None and abs(d - d0) > 1e-12:
            # wide-spacing array phasing: the file's phases assume
            # propagation along d0; at heading d the plane wave reaches
            # body b earlier/later by (d_hat - d0_hat) . r_b
            th, th0 = np.deg2rad(d), np.deg2rad(d0)
            dvec = np.array([np.cos(th) - np.cos(th0),
                             np.sin(th) - np.sin(th0)])
            proj = np.asarray(body_xy, np.float64) @ dvec  # [N]
        irf_rot = np.einsum("ij,njt->nit", T, hydro.exc_irf)
        if proj is not None and np.abs(proj).max() > 1e-9:
            ks = compute_wavenumber(hydro.freq_list, hydro.water_depth,
                                    hydro.g)  # [Nw]
            phase = np.exp(-1j * ks[None, None, :] * proj[:, None, None])
            c_rot = c_rot * phase
            # dispersive shift of the TIME-DOMAIN kernel: roundtrip the
            # shipped (rotated) kernel through its own transform and apply
            # the phase RESIDUAL there — K' = K + invT(T(K) * (phase - 1)).
            # The unshifted content stays bit-exact (phase-1 vanishes at
            # proj = 0), the kernel stays authoritative even when a file's
            # mag/phase and IRF are not a Fourier pair (synthetic farm
            # files), and only the correction term carries the
            # band-truncation error of the frequency grid (tested).
            Xk = excitation_freq_from_irf(
                irf_rot, hydro.freq_list, hydro.exc_irf_time)
            irf_rot = irf_rot + excitation_irf_from_frequency(
                Xk * (phase - 1.0), hydro.freq_list, hydro.exc_irf_time)
        return _dc.replace(
            hydro,
            exc_mag=np.abs(c_rot)[:, :, None, :],
            exc_phase=np.angle(c_rot)[:, :, None, :],
            exc_irf=irf_rot,
        )
    raise ValueError(
        f"wave direction {d} deg is not tabulated in the BEMIO file "
        f"(available: {np.array2string(dirs, precision=1)}); for an "
        "axisymmetric body set `axisymmetric: true` to rotate the "
        "excitation exactly"
    )


@dataclasses.dataclass(frozen=True)
class RegularWaveData:
    """Device-ready arrays for the per-step regular-wave force."""

    force_mag: np.ndarray  # [..., 6N] (rho*g-scaled mag * per-dof interp)
    force_phase: np.ndarray  # [..., 6N] (the phase actually used per dof)
    amplitude: np.ndarray  # [...]
    omega: np.ndarray  # [...]


def build_regular_wave(hydro: HydroData, wave: RegularWave,
                       replicate_phase_bug: bool = True) -> RegularWaveData:
    """Interpolate per-DoF excitation magnitude/phase at the wave frequency.

    Follows the reference exactly: delta_w = w_max / Nw and
    freq_index = w/delta_w - 1 (wave_types.cpp:289-297, 329-333), linear
    interpolation between floor and floor+1 (wave_types.cpp:335-352).

    replicate_phase_bug: the reference evaluates the force with
    `phase[rowEx]` — i.e. body 1's phases for every body
    (wave_types.cpp:323). Kept by default for trajectory parity; set False
    for the corrected per-body phases.
    """
    amplitude = np.asarray(wave.amplitude, dtype=np.float64)
    omega = np.asarray(wave.omega, dtype=np.float64)
    batch_shape = np.broadcast(amplitude, omega).shape

    freqs = hydro.freq_list
    n_freq = freqs.shape[0]
    omega_delta = freqs[-1] / n_freq
    idx_des = omega / omega_delta - 1.0
    i0 = np.floor(idx_des).astype(np.int64)
    frac = idx_des - i0
    i1 = i0 + 1

    nb, dof = hydro.num_bodies, 6
    total = nb * dof
    mag = np.zeros(batch_shape + (total,))
    ph = np.zeros(batch_shape + (total,))
    for b in range(nb):
        for i in range(dof):
            m0 = hydro.exc_mag[b, i, 0, i0]
            m1 = hydro.exc_mag[b, i, 0, i1]
            p0 = hydro.exc_phase[b, i, 0, i0]
            p1 = hydro.exc_phase[b, i, 0, i1]
            mag[..., b * dof + i] = m0 + frac * (m1 - m0)
            ph[..., b * dof + i] = p0 + frac * (p1 - p0)
    if replicate_phase_bug and nb > 1:
        ph = np.tile(ph[..., :dof], (1,) * len(batch_shape) + (nb,))
    # the wave's own phase offset is added at force evaluation
    return RegularWaveData(
        force_mag=mag,
        force_phase=ph,
        amplitude=np.broadcast_to(amplitude, batch_shape).copy(),
        omega=np.broadcast_to(omega, batch_shape).copy(),
    )


@dataclasses.dataclass(frozen=True)
class IrregularWaveData:
    """Device-ready arrays for the per-step irregular excitation convolution.

    F_exc[dof](step n) = sum_m E[dof, m] * eta[n + m]   (see build notes)
    """

    eta: np.ndarray  # [..., Neta] free-surface elevation series
    exc_kernel: np.ndarray  # [6N, M] eta-index-space excitation kernel
    # spectra etc. retained for the exporter / kinematics queries
    freqs_hz: np.ndarray
    spectral_densities: np.ndarray
    spectral_widths: np.ndarray
    phases: np.ndarray  # [..., F]
    wavenumbers: np.ndarray
    eta_time: np.ndarray  # [Neta]
    irf_time_resampled: np.ndarray
    irf_resampled: np.ndarray  # [N, 6, Tr']
    # directional spreading (cos-2s): when set, eta is [D, Neta], phases
    # [D, F] and exc_kernel [D, 6N, M]; the total excitation is the sum
    # over headings of per-heading eta (*) per-heading kernel
    directions: Optional[np.ndarray] = None  # [D] absolute headings, deg
    dir_weights: Optional[np.ndarray] = None  # [D] energy fractions


def build_irregular_wave(hydro: HydroData, params: IrregularWaveParams,
                         dt: float, duration: float,
                         body_xy: Optional[np.ndarray] = None) -> IrregularWaveData:
    """Full reference pipeline (wave_types.cpp:432-844), vectorized.

    Batched seeds: if params.seed is an array, eta/phases get a leading batch
    axis; the excitation kernel is seed-independent.
    """
    nb = hydro.num_bodies
    spread = (params.spreading_exponent is not None
              and not params.eta_file_path)

    # 1) resample excitation IRF onto (approximately) the simulation dt
    t_old = hydro.exc_irf_time
    t0, t1 = float(t_old[0]), float(t_old[-1])
    n_new = int(np.ceil((t1 - t0) / dt))
    irf_time = np.linspace(t0, t1, n_new)

    def _resample(exc_irf):
        return np.stack(
            [eigen_spline_resample(exc_irf[b], n_new) for b in range(nb)]
        )  # [N, 6, n_new]

    if spread:
        # per-heading resolved excitation (beyond-reference; the headings
        # share hydro's IRF time grid, only the values differ)
        rel, dir_weights = cos2s_headings(
            params.spreading_exponent, params.n_directions,
            params.spreading_span)
        directions = params.direction + rel
        irf_res = np.stack([
            _resample(resolve_wave_direction(
                hydro, float(th), axisymmetric=params.axisymmetric,
                body_xy=body_xy).exc_irf)
            for th in directions
        ])  # [D, N, 6, n_new]
    else:
        # single heading: the caller passes hydro already resolved at the
        # mean direction (stepper._build_wave_arrays)
        directions = dir_weights = None
        irf_res = _resample(hydro.exc_irf)
    irf_width = trapezoid_widths(irf_time)

    # 2) spectrum / phases / wavenumbers
    if params.eta_file_path:
        times, eta = read_eta_file(params.eta_file_path)
        freqs_hz = np.zeros(0)
        dens = np.zeros(0)
        widths = np.zeros(0)
        phases = np.zeros(0)
        ks = np.zeros(0)
        eta_time = times
    else:
        if params.nfrequencies == 0:
            df = 1.0 / duration
            nf = int(np.ceil((params.frequency_max - params.frequency_min) / df))
        else:
            nf = params.nfrequencies
        freqs_hz = np.linspace(params.frequency_min, params.frequency_max, nf)
        dens = jonswap_spectrum_hz(
            freqs_hz, params.height, params.period,
            params.peak_enhancement_factor, params.is_normalized,
        )
        widths = trapezoid_widths(freqs_hz)
        seeds = np.atleast_1d(np.asarray(params.seed, dtype=np.int64))
        if spread:
            # independent phase sets per heading; heading 0's offset is 0
            # so n_directions=1 degenerates bit-exactly to unidirectional
            phases = np.stack([
                np.stack([
                    mt19937_uniform_phases(int(s) + d * 1000003, nf)
                    for d in range(len(directions))
                ])
                for s in seeds
            ])  # [B, D, F]
        else:
            phases = np.stack(
                [mt19937_uniform_phases(int(s), nf) for s in seeds])
        ks = compute_wavenumber(TWO_PI * freqs_hz, hydro.water_depth, hydro.g)

        # 3) eta series on [-t_irf_max, T + 2*(t_irf_max - t_irf_min) - t_irf_max]
        t_irf_min = min(0.0, float(irf_time[0]))
        t_irf_max = max(0.0, float(irf_time[-1]))
        span = duration + 2.0 * (t_irf_max - t_irf_min)
        num = int(np.ceil(span / dt))
        eta_time = np.linspace(0.0, num * dt, num + 1) - t_irf_max
        use_device_synth = seeds.shape[0] > 8
        if use_device_synth:
            # the device path synthesizes in f32 — keep the host f64 loop
            # when running CPU/x64 so every realization stays bit-identical
            # to a single-seed build (interpret-mode Pallas on CPU is also
            # far slower than the numpy loop)
            import jax

            use_device_synth = (jax.default_backend() == "tpu"
                                and not jax.config.jax_enable_x64)
        if use_device_synth:
            # large seed batches: synthesize on-device (Pallas on TPU) — the
            # host loop is O(B*T*F) cos terms and becomes the setup bottleneck
            import jax.numpy as jnp

            from hydrochrono_tpu.ops.pallas_eta import build_eta_batched

            if spread:
                # one device call per heading (the density scale differs)
                eta = np.stack([
                    np.asarray(build_eta_batched(
                        freqs_hz, dens * dir_weights[d], widths,
                        phases[:, d], ks, eta_time,
                        ramp_duration=params.ramp_duration,
                        dtype=jnp.float32), dtype=np.float64)
                    for d in range(len(directions))
                ], axis=1)  # [B, D, Neta]
            else:
                eta = np.asarray(build_eta_batched(
                    freqs_hz, dens, widths, phases, ks, eta_time,
                    ramp_duration=params.ramp_duration, dtype=jnp.float32,
                ), dtype=np.float64)
        elif spread:
            # per-heading realizations: energy fraction w_d scales the
            # density, so sum_d Var(eta_d) equals the unidirectional
            # variance (independent phases)
            eta = np.stack([
                np.stack([
                    eta_irregular_series(
                        eta_time, freqs_hz, dens * dir_weights[d], widths,
                        phases[i, d], ks)
                    for d in range(len(directions))
                ])
                for i in range(seeds.shape[0])
            ])  # [B, D, Neta]
            if params.ramp_duration > 0.0:
                ramp = np.clip(eta_time / params.ramp_duration, 0.0, 1.0)
                ramp = np.where(eta_time <= 0.0, 0.0, ramp)
                eta = eta * ramp[None, None, :]
        else:
            eta = np.stack([
                eta_irregular_series(eta_time, freqs_hz, dens, widths, phases[i], ks)
                for i in range(seeds.shape[0])
            ])
            if params.ramp_duration > 0.0:
                ramp = np.clip(eta_time / params.ramp_duration, 0.0, 1.0)
                ramp = np.where(eta_time <= 0.0, 0.0, ramp)
                eta = eta * ramp[None, :]
        if np.isscalar(params.seed) or np.asarray(params.seed).ndim == 0:
            eta = eta[0]    # spread: [D, Neta]; plain: [Neta]
            phases = phases[0]

    # 4) fold quadrature + eta interpolation into an eta-index-space kernel:
    #    query position of lag j at step n on the eta grid (origin eta_time[0],
    #    spacing dt): (n*dt - tau_j - t_eta0)/dt = n + c_j with static c_j.
    t_eta0 = float(eta_time[0])
    deta = float(eta_time[1] - eta_time[0])
    if abs(deta - dt) > 1e-9 * max(1.0, dt):
        raise ValueError(
            f"eta series spacing {deta} must equal the simulation dt {dt} "
            "(the reference precomputes eta on the simulation grid)"
        )
    c = (-irf_time - t_eta0) / dt
    m = np.floor(c + 1e-9).astype(np.int64)
    f = np.maximum(c - m, 0.0)
    m_min = int(m.min())
    m_max = int(m.max()) + 1
    total = nb * 6
    if m_min < 0:
        # queries reach before the start of the eta series (possible with
        # imported eta files that begin at t=0); zero-pad the front so the
        # missing contributions are dropped, and shift the kernel base.
        pad = -m_min
        eta = np.concatenate([np.zeros(eta.shape[:-1] + (pad,)), eta], axis=-1)
        eta_time = np.concatenate([eta_time[0] + dt * np.arange(-pad, 0), eta_time])
        m = m + pad
        m_max += pad
    def _fold(irf_one):  # [N, 6, n_new] -> [6N, m_max+1]
        Eo = np.zeros((total, m_max + 1))
        for b in range(nb):
            kw = irf_one[b] * irf_width[None, :]  # [6, n_new]
            acc = np.zeros((m_max + 1, 6))
            np.add.at(acc, m, (1.0 - f)[:, None] * kw.T)
            np.add.at(acc, m + 1, f[:, None] * kw.T)
            Eo[b * 6 : b * 6 + 6] = acc.T
        return Eo

    if spread:
        E = np.stack([_fold(irf_res[d]) for d in range(len(directions))])
    else:
        E = _fold(irf_res)

    return IrregularWaveData(
        eta=eta,
        exc_kernel=E,
        freqs_hz=freqs_hz,
        spectral_densities=dens,
        spectral_widths=widths,
        phases=phases,
        wavenumbers=ks,
        eta_time=eta_time,
        irf_time_resampled=irf_time,
        irf_resampled=irf_res,
        directions=directions,
        dir_weights=dir_weights,
    )


def read_eta_file(path: str):
    """Parse a free-surface elevation text file.

    Accepts the reference's `time : eta` format (wave_types.cpp:480-500)
    and plain two-column whitespace/comma-separated rows.
    """
    times, etas = [], []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if ":" in line:
                left, _, right = line.partition(":")
            else:
                parts = line.replace(",", " ").split()
                if len(parts) < 2:
                    raise ValueError(f"cannot parse eta row: {line!r}")
                left, right = parts[0], parts[1]
            times.append(float(left))
            etas.append(float(right))
    return np.asarray(times), np.asarray(etas)
