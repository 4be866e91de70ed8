#!/usr/bin/env python3
"""RAO (response amplitude operator) computation from period sweeps.

The reference validates OSWEC/sphere against WEC-Sim by sweeping regular-wave
periods and comparing response amplitudes (docs verification pages;
demo_oswec_reg_waves.cpp runs one simulation per period). Here a sweep is one
batched device program; this tool extracts steady-state response amplitudes
and phases per period from either

  * a directory of period_* sweep exports (the CLI's results layout), or
  * programmatically from a batched trajectory (`rao_from_batch`).

RAO = steady-state response amplitude / wave amplitude, with the response
amplitude estimated from the Fourier component at the forcing frequency over
the trailing window (robust against remaining transient).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def fourier_amplitude(t: np.ndarray, y: np.ndarray, omega: float,
                      window_frac: float = 0.5):
    """Amplitude & phase of the omega-component over the trailing window."""
    n0 = int(len(t) * (1.0 - window_frac))
    tt, yy = t[n0:], y[n0:]
    yy = yy - yy.mean()
    c = np.trapezoid(yy * np.cos(omega * tt), tt)
    s = np.trapezoid(yy * np.sin(omega * tt), tt)
    span = tt[-1] - tt[0]
    a = 2.0 / span * np.hypot(c, s)
    phase = np.arctan2(-s, c)
    return a, phase


def rao_from_batch(times: np.ndarray, responses: np.ndarray, periods: np.ndarray,
                   wave_amplitude: float, window_frac: float = 0.5):
    """RAO per period from a batched trajectory [B, T]."""
    out = []
    for i, T in enumerate(np.atleast_1d(periods)):
        omega = 2.0 * np.pi / T
        a, ph = fourier_amplitude(times, responses[i], omega, window_frac)
        out.append((float(T), a / wave_amplitude, ph))
    return np.asarray(out)


def rao_from_sweep_dir(sweep_dir: str, body: str = "body1", channel: str = "position",
                       component: int = 2, wave_amplitude: float | None = None):
    """RAO from the CLI's period_* (or direction_*) export directories.

    Heading sweeps (direction_* dirs, one wave period) return rows keyed
    by heading in degrees instead of period — the directional RAO."""
    import h5py

    period_dirs = sorted(glob.glob(os.path.join(sweep_dir, "period_*")))
    dir_dirs = sorted(glob.glob(os.path.join(sweep_dir, "direction_*")))
    by_heading = not period_dirs and bool(dir_dirs)

    rows = []
    for d in period_dirs or dir_dirs:
        key = float(os.path.basename(d).split("_", 1)[1])
        files = glob.glob(os.path.join(d, "results.*.h5"))
        if not files:
            continue
        with h5py.File(files[0]) as f:
            t = f["results/time/time"][:]
            y = f[f"results/model/bodies/{body}/{channel}"][:, component]
            if by_heading:
                om = float(np.asarray(
                    f["inputs/simulation/waves/regular/omega"]).reshape(-1)[0])
            else:
                om = 2.0 * np.pi / key
            amp = wave_amplitude
            if amp is None:
                amp = 1.0
        a, ph = fourier_amplitude(t, y, om)
        rows.append((key, a / amp, ph))
    return np.asarray(rows), by_heading


def rao_freq_domain(case_dir: str, periods: np.ndarray, component: int = 2,
                    body_slot: int = 0, direction: float = 0.0):
    """Direct frequency-domain RAO for a YAML case (no time stepping).

    Solves the linear seakeeping problem at each period via
    physics/freqdomain.py (autodiff-linearized forces + Ogilvie-transformed
    radiation kernel) — milliseconds for a full curve where the reference
    needs one simulation per period. Returns rows (T, rao, phase) for the
    requested DOF of `body_slot`, plus the mean-PTO-power curve (W per m^2
    of wave amplitude)."""
    import jax

    jax.config.update("jax_platforms", "cpu")  # host analysis tool
    jax.config.update("jax_enable_x64", True)

    from hydrochrono_tpu.physics import freqdomain as fd
    from hydrochrono_tpu.scene.builder import build_case

    case = build_case(case_dir)
    sim = case.build_simulation()
    omegas = 2.0 * np.pi / np.asarray(periods, np.float64)
    resp = fd.solve_response(sim, omegas, direction=direction)
    k = body_slot * 6 + component
    rows = np.stack([np.asarray(periods, np.float64),
                     resp.rao[:, k], resp.phase[:, k]], axis=-1)
    return rows, resp.mean_pto_power()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sweep_dir", help="directory containing period_* exports, "
                                     "or a YAML case dir with --freq-domain")
    p.add_argument("--body", default="body1")
    p.add_argument("--channel", default="position")
    p.add_argument("--component", type=int, default=2)
    p.add_argument("--amplitude", type=float, default=1.0, help="wave amplitude")
    p.add_argument("--plot", help="write a PNG RAO curve here")
    p.add_argument("--freq-domain", action="store_true",
                   help="treat sweep_dir as a YAML case and solve the RAO "
                        "directly in the frequency domain "
                        "(physics/freqdomain.py) — no time stepping")
    p.add_argument("--periods", default="3:20:35",
                   help="min:max:n period grid for --freq-domain")
    p.add_argument("--direction", type=float, default=0.0,
                   help="wave heading (deg) for --freq-domain")
    args = p.parse_args(argv)

    if args.freq_domain:
        lo, hi, np_ = args.periods.split(":")
        periods = np.linspace(float(lo), float(hi), int(np_))
        try:
            rao, power = rao_freq_domain(args.sweep_dir, periods,
                                         component=args.component,
                                         direction=args.direction)
        except (FileNotFoundError, ValueError) as exc:
            print(f"freq-domain solve failed: {exc}", file=sys.stderr)
            return 2
        by_heading = False
        for (T, r, ph), pw in zip(rao, power):
            print(json.dumps({"period_s": round(T, 4), "rao": r,
                              "phase_rad": ph, "mean_pto_power_w": pw}))
    else:
        rao, by_heading = rao_from_sweep_dir(
            args.sweep_dir, args.body, args.channel, args.component,
            args.amplitude)
        if rao.size == 0:
            print("no sweep results found")
            return 2
        key = "direction_deg" if by_heading else "period_s"
        for T, r, ph in rao:
            print(json.dumps({key: T, "rao": r, "phase_rad": ph}))

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 5))
        ax.plot(rao[:, 0], rao[:, 1], "o-")
        ax.set_xlabel("wave heading (deg)" if by_heading
                      else "wave period (s)")
        ax.set_ylabel("RAO (m/m)")
        ax.grid(alpha=0.3)
        fig.savefig(args.plot, dpi=110)
    return 0


if __name__ == "__main__":
    sys.exit(main())
