#!/usr/bin/env python3
"""Offline visualization of a results.h5 trajectory.

The reference ships an interactive Irrlicht GUI (src/gui/guihelper.cpp:41-120)
whose observability role — watching the bodies move on the free surface —
this tool replaces for the headless TPU workflow: it renders an x-z side-view
animation of every body (position + pitch attitude + trail) together with
the free-surface elevation (from the exporter's irregular-wave inputs when
present), written as a self-contained HTML file (no GUI/toolkit needed to
view) and/or PNG frames, plus a static summary panel of the body channels.

Usage:
    python tools/animate.py results.irregular.h5 --out anim.html
    python tools/animate.py results.still.h5 --frames outdir --stride 20
    python tools/animate.py results.still.h5 --panel summary.png
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# offline rendering is a CPU job: force CPU even though the axon site hook
# pre-selects the TPU platform (env var alone loses — DEVNOTES.md)
try:
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover
    pass

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib import animation  # noqa: E402


def load_results(path):
    import h5py

    out = {"bodies": {}, "eta": None}
    with h5py.File(path, "r") as f:
        out["time"] = np.asarray(f["results/time/time"][:])
        for name, g in f["results/model/bodies"].items():
            out["bodies"][name] = {
                "pos": np.asarray(g["position"][:]),
                "xyz": np.asarray(g["orientation_xyz"][:]),
            }
        irr = "inputs/simulation/waves/irregular"
        if irr in f:
            e = np.asarray(f[irr + "/free_surface_eta"][:])
            if e.ndim == 2:
                # directional seas: per-heading series [D, Neta]; the
                # physical elevation at the origin is the superposition
                e = e.sum(axis=0)
            out["eta"] = (np.asarray(f[irr + "/free_surface_time"][:]), e)
    return out


def _setup_axes(data, names):
    xs = np.concatenate([data["bodies"][n]["pos"][:, 0] for n in names])
    zs = np.concatenate([data["bodies"][n]["pos"][:, 2] for n in names])
    span_x = max(np.ptp(xs), 2.0)
    span_z = max(np.ptp(zs), 2.0)
    x0, x1 = xs.min() - 0.6 * span_x, xs.max() + 0.6 * span_x
    z0, z1 = zs.min() - 0.6 * span_z, max(zs.max() + 0.6 * span_z, 1.0)
    return (x0, x1), (z0, z1)


def make_animation(data, names, stride=5, fps=20, trail=200, field=None,
                   particles=False):
    """field: a physics.wavefield.WaveField — draws the actual SPATIAL
    free-surface profile eta(x, t) (instead of the flat at-origin value)
    and, with particles=True, a quiver of water particle velocities
    (reference kinematics: wave_types.cpp:61-160)."""
    t = data["time"]
    idx = np.arange(0, len(t), stride)
    (x0, x1), (z0, z1) = _setup_axes(data, names)

    fig, ax = plt.subplots(figsize=(9, 6))
    ax.set_xlim(x0, x1)
    ax.set_ylim(z0, z1)
    ax.set_xlabel("x (m)")
    ax.set_ylabel("z (m)")
    ax.set_title(os.path.basename("trajectory"))

    wave_x = np.linspace(x0, x1, 80)
    wave_line, = ax.plot(wave_x, np.zeros_like(wave_x), color="tab:cyan",
                         lw=1.2, label="free surface")
    artists = {"wave": wave_line}
    quiv = None
    if field is not None and particles and field.kind != "still":
        qx, qz = np.meshgrid(np.linspace(x0, x1, 14),
                             np.linspace(z0, min(z1, 0.0), 8))
        qpts = np.stack([qx.ravel(), np.zeros(qx.size), qz.ravel()], axis=-1)
        quiv = ax.quiver(qx.ravel(), qz.ravel(), np.zeros(qx.size),
                         np.zeros(qx.size), color="tab:blue", alpha=0.4,
                         scale=None, width=0.0025)
    # precompute every frame's field in ONE jitted batched call — per-frame
    # eager evaluation pays a device dispatch per op (35 ms over the axon
    # tunnel, DEVNOTES.md), which made the overlay minutes-slow
    field_eta = field_vel = None
    if field is not None and field.kind != "still":
        import jax

        wave_pts = np.stack([wave_x, np.zeros_like(wave_x),
                             np.zeros_like(wave_x)], axis=-1)
        ts = np.asarray(t)[idx]
        field_eta = np.asarray(jax.jit(jax.vmap(
            lambda ti: field.eta(wave_pts, ti)))(ts))
        if quiv is not None:
            field_vel = np.asarray(jax.jit(jax.vmap(
                lambda ti: field.velocity(qpts, ti)))(ts))
    colors = plt.rcParams["axes.prop_cycle"].by_key()["color"]
    for i, n in enumerate(names):
        c = colors[i % len(colors)]
        dot, = ax.plot([], [], "o", ms=9, color=c, label=n)
        att, = ax.plot([], [], "-", lw=2.0, color=c)
        tr, = ax.plot([], [], "-", lw=0.6, color=c, alpha=0.5)
        artists[n] = (dot, att, tr)
    ax.legend(loc="upper right", fontsize=8)
    label = ax.text(0.02, 0.97, "", transform=ax.transAxes, va="top")

    eta = data["eta"]
    arm = 0.08 * (x1 - x0)

    def frame(k):
        i = idx[k]
        if field_eta is not None:
            wave_line.set_ydata(field_eta[k])
            if field_vel is not None:
                quiv.set_UVC(field_vel[k][:, 0], field_vel[k][:, 2])
        elif eta is not None:
            e = np.interp(t[i], eta[0], eta[1])
            wave_line.set_ydata(np.full_like(wave_x, e))
        for n in names:
            b = data["bodies"][n]
            x, z = b["pos"][i, 0], b["pos"][i, 2]
            pitch = b["xyz"][i, 1]
            dot, att, tr = artists[n]
            dot.set_data([x], [z])
            att.set_data([x - arm * np.cos(pitch), x + arm * np.cos(pitch)],
                         [z + arm * np.sin(pitch), z - arm * np.sin(pitch)])
            j0 = max(0, i - trail)
            tr.set_data(b["pos"][j0:i + 1, 0], b["pos"][j0:i + 1, 2])
        label.set_text(f"t = {t[i]:.2f} s")
        return []

    anim = animation.FuncAnimation(fig, frame, frames=len(idx),
                                   interval=1000.0 / fps, blit=False)
    return fig, anim, idx


def write_panel(data, names, path):
    """Static summary: heave + pitch of every body, plus eta if present."""
    n_rows = 2 + (1 if data["eta"] is not None else 0)
    fig, axes = plt.subplots(n_rows, 1, figsize=(10, 2.8 * n_rows), sharex=True)
    axes = np.atleast_1d(axes)
    t = data["time"]
    for n in names:
        b = data["bodies"][n]
        axes[0].plot(t, b["pos"][:, 2], label=n, lw=1.0)
        axes[1].plot(t, np.rad2deg(b["xyz"][:, 1]), label=n, lw=1.0)
    axes[0].set_ylabel("heave (m)")
    axes[1].set_ylabel("pitch (deg)")
    axes[0].legend(fontsize=8)
    if data["eta"] is not None:
        te, e = data["eta"]
        axes[2].plot(te, e, color="tab:cyan", lw=0.8)
        axes[2].set_ylabel("eta (m)")
    axes[-1].set_xlabel("time (s)")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("results", help="results.*.h5 file")
    p.add_argument("--out", help="write a self-contained HTML animation here")
    p.add_argument("--frames", help="write PNG frames into this directory")
    p.add_argument("--panel", help="write a static summary panel PNG here")
    p.add_argument("--stride", type=int, default=5, help="steps per frame")
    p.add_argument("--fps", type=int, default=20)
    p.add_argument("--bodies", default=None,
                   help="comma-separated subset of body names")
    p.add_argument("--particles", action="store_true",
                   help="overlay water-particle velocity arrows (Airy "
                        "kinematics via physics/wavefield.py)")
    p.add_argument("--no-field", action="store_true",
                   help="disable the spatial free-surface reconstruction "
                        "(fall back to the flat at-origin eta line)")
    args = p.parse_args(argv)

    data = load_results(args.results)
    names = (args.bodies.split(",") if args.bodies
             else sorted(data["bodies"].keys()))
    missing = [n for n in names if n not in data["bodies"]]
    if missing:
        print(f"unknown bodies: {missing}; available: "
              f"{sorted(data['bodies'])}", file=sys.stderr)
        return 2

    if not (args.out or args.frames or args.panel):
        args.panel = os.path.splitext(args.results)[0] + "_panel.png"

    if args.panel:
        print(f"panel: {write_panel(data, names, args.panel)}")

    if args.out or args.frames:
        field = None
        if not args.no_field:
            try:
                from hydrochrono_tpu.physics.wavefield import WaveField

                field = WaveField.from_results_h5(args.results)
                if field.kind == "still":
                    field = None
            except Exception as exc:  # noqa: BLE001 - overlay is best-effort
                print(f"wave-field overlay unavailable ({exc})",
                      file=sys.stderr)
        fig, anim, idx = make_animation(data, names, stride=args.stride,
                                        fps=args.fps, field=field,
                                        particles=args.particles)
        if args.out:
            html = anim.to_jshtml(fps=args.fps, embed_frames=True)
            with open(args.out, "w") as fh:
                fh.write(html)
            print(f"animation: {args.out} ({len(idx)} frames)")
        if args.frames:
            os.makedirs(args.frames, exist_ok=True)
            for k in range(len(idx)):
                anim._func(k)  # render frame k
                fig.savefig(os.path.join(args.frames, f"frame_{k:05d}.png"),
                            dpi=90)
            print(f"frames: {args.frames} ({len(idx)} PNGs)")
        plt.close(fig)
    return 0


if __name__ == "__main__":
    sys.exit(main())
