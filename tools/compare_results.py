#!/usr/bin/env python3
"""Golden-trajectory comparison tool.

Port of the reference comparison tooling
(tests/regression/utilities/compare_template.py:365-366 and
tests/regression/run_hydrochrono/compare_results.py): resample both series
onto a common grid with np.interp, compute L2 = |diff|/n and Linf, apply
pass/fail thresholds, optionally render a PNG report.

Series sources: results .h5 (schema v0.3 — heave of a named body by
default, or a custom signal adapter), 2-column .txt/.csv, or .npy.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
from pathlib import Path

import numpy as np


def load_series(path: str, body: str = "body1", channel: str = "position",
                component: int = 2, adapter: str | None = None):
    """Return (time, signal) from any supported file type."""
    p = Path(path)
    if adapter:
        spec = importlib.util.spec_from_file_location("signal_adapter", adapter)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        t, sig, _ = mod.select_signal(p)
        return np.asarray(t, dtype=float), np.asarray(sig, dtype=float)
    if p.suffix == ".h5":
        import h5py

        with h5py.File(p, "r") as f:
            t = np.asarray(f["results/time/time"][:], dtype=float)
            arr = np.asarray(f[f"results/model/bodies/{body}/{channel}"][:])
            sig = arr[:, component] if arr.ndim == 2 else arr
        return t, sig
    if p.suffix == ".npy":
        data = np.load(p)
        return data[:, 0], data[:, 1]
    # txt/csv with optional headers (reference goldens have 1-5 header lines)
    for skip in range(6):
        try:
            data = np.loadtxt(p, skiprows=skip, delimiter="," if p.suffix == ".csv" else None)
            if data.ndim == 2 and data.shape[1] >= 2:
                return data[:, 0], data[:, 1]
        except ValueError:
            continue
    raise ValueError(f"cannot parse series from {path}")


def compare(t_ref, y_ref, t_test, y_test):
    """Reference metric (compare_template.py:362-369): resample onto the
    test grid, L2 = ||diff||/n, Linf = max|diff|."""
    n = len(t_test)
    x = np.linspace(t_test[0], t_test[-1], n)
    y1 = np.interp(x, t_ref, y_ref)
    y2 = np.interp(x, t_test, y_test)
    diff = y1 - y2
    return np.linalg.norm(diff) / n, np.abs(diff).max()


def render_plot(path, t_ref, y_ref, t_test, y_test, l2, linf, passed, title,
                y_label="Value", thresholds=(1e-4, 0.02)):
    """Per-case comparison panel in the reference's report style
    (compare_template.py:36-110, run_comparison:490-584): signal overlay,
    error trace, and test-info / system-info / error-metrics text sections.
    """
    import platform
    import socket
    import time as _time

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(11, 8.5))
    gs = fig.add_gridspec(3, 3, height_ratios=[3, 1.2, 1.0], hspace=0.45)
    ax = fig.add_subplot(gs[0, :])
    axe = fig.add_subplot(gs[1, :], sharex=ax)

    ax.plot(t_ref, y_ref, label="reference", lw=1.2)
    ax.plot(t_test, y_test, label="test", lw=1.0, ls="--")
    ax.set_ylabel(y_label)
    ax.legend()
    verdict = "PASS" if passed else "FAIL"
    color = "#1a7f37" if passed else "#c62828"
    ax.set_title(f"{title} — {verdict}", color=color, fontweight="bold")

    x = np.linspace(t_test[0], t_test[-1], len(t_test))
    err = np.interp(x, t_ref, y_ref) - np.interp(x, t_test, y_test)
    axe.plot(x, err, lw=0.8, color="tab:red")
    axe.set_ylabel("error")
    axe.set_xlabel("time (s)")

    def text_panel(cell, heading, lines):
        axt = fig.add_subplot(gs[2, cell])
        axt.axis("off")
        axt.text(0.0, 1.0, heading, fontweight="bold", va="top", fontsize=10)
        axt.text(0.0, 0.78, "\n".join(lines), va="top", fontsize=8.5,
                 family="monospace")

    text_panel(0, "Test info", [
        f"case      : {title}",
        f"date      : {_time.strftime('%Y-%m-%d %H:%M:%S')}",
        f"samples   : ref {len(t_ref)} / test {len(t_test)}",
        f"time span : [{t_test[0]:.3f}, {t_test[-1]:.3f}] s",
    ])
    text_panel(1, "System info", [
        f"host      : {socket.gethostname()[:24]}",
        f"platform  : {platform.platform(terse=True)[:24]}",
        f"python    : {platform.python_version()}",
    ])
    text_panel(2, "Error metrics", [
        f"L2        : {l2:.4e}  (<= {thresholds[0]:g})",
        f"Linf      : {linf:.4e}  (<= {thresholds[1]:g})",
        f"max |err| : {np.abs(err).max():.4e}",
        f"verdict   : {verdict}",
    ])

    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("reference")
    p.add_argument("test")
    p.add_argument("--l2", type=float, default=1e-4, help="L2 threshold")
    p.add_argument("--linf", type=float, default=0.02, help="Linf threshold")
    p.add_argument("--body", default="body1")
    p.add_argument("--channel", default="position")
    p.add_argument("--component", type=int, default=2)
    p.add_argument("--adapter", help="signal_adapter.py path for h5 extraction")
    p.add_argument("--plot", help="write a PNG comparison report here")
    p.add_argument("--title", default="comparison")
    p.add_argument("--json", action="store_true", help="print a JSON result line")
    args = p.parse_args(argv)

    t_ref, y_ref = load_series(args.reference, args.body, args.channel,
                               args.component, args.adapter)
    t_test, y_test = load_series(args.test, args.body, args.channel,
                                 args.component, args.adapter)
    l2, linf = compare(t_ref, y_ref, t_test, y_test)
    passed = l2 <= args.l2 and linf <= args.linf

    if args.plot:
        render_plot(args.plot, t_ref, y_ref, t_test, y_test, l2, linf, passed,
                    args.title)
    if args.json:
        print(json.dumps({"l2": l2, "linf": linf, "passed": bool(passed)}))
    else:
        print(f"L2={l2:.6e}  Linf={linf:.6e}  -> {'PASS' if passed else 'FAIL'}")
    return 0 if passed else 1


if __name__ == "__main__":
    sys.exit(main())
