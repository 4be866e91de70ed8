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


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sweep_dir", help="directory containing period_* exports")
    p.add_argument("--body", default="body1")
    p.add_argument("--channel", default="position")
    p.add_argument("--component", type=int, default=2)
    p.add_argument("--amplitude", type=float, default=1.0, help="wave amplitude")
    p.add_argument("--plot", help="write a PNG RAO curve here")
    args = p.parse_args(argv)

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
