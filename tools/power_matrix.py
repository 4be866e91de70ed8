#!/usr/bin/env python3
"""Power matrix: mean absorbed PTO power over an (Hs, Tp) sea-state grid.

The standard WEC yield deliverable (power matrix x site scatter diagram =
annual energy production). The reference has no equivalent — it runs one
sea state per process; here the WHOLE grid (x optional seed realizations
per cell) rides the batch axis of ONE device program via
`Simulation.irregular_eta_grid` + the batched-eta fused runner.

Usage:
  python tools/power_matrix.py <case_dir_or_inputs> \
      --hs 0.75,1.25,1.75,2.25 --tp 6,7,8,9,10,11,12 [--seeds 2] \
      [--duration 600] [--era] [--dtype float32] [--warmup SECONDS] \
      [--out power_matrix/]

Outputs: power_matrix.csv (W), power_matrix.md, power_matrix.png
(heatmap, if matplotlib is available), per-TSDA and total. Power
convention matches io/results.py: absorbed = -f_damp * Ldot, averaged
after the warmup window (default: ramp + 15% of the duration).
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def compute_power_matrix(sim, base_wave, hs_list, tp_list, seeds=1,
                         warmup=None, use_fused=None):
    """Returns (P [nHs, nTp] mean W per cell summed over TSDAs,
    P_std [nHs, nTp] across seeds, P_per_tsda [nHs, nTp, n_tsda])."""
    import jax
    import jax.numpy as jnp

    from hydrochrono_tpu.parallel.sharding import make_batched_states

    base_seed = int(np.atleast_1d(np.asarray(base_wave.seed))[0])
    waves = []
    for hs in hs_list:
        for tp in tp_list:
            waves.append(dataclasses.replace(
                base_wave, height=float(hs), period=float(tp),
                seed=base_seed + np.arange(seeds)))
    eta = sim.irregular_eta_grid(waves)  # [B, Neta]
    B = eta.shape[0]
    n = sim.num_steps if hasattr(sim, "num_steps") else int(
        round(sim.duration / sim.dt))
    if sim.block_size:
        n = -(-n // sim.block_size) * sim.block_size

    if use_fused is None:
        use_fused = bool(sim.block_size) and sim.fused_supported()
    if use_fused:
        states = make_batched_states(sim, B)
        params = dict(sim.params)
        params["irr_eta"] = eta
        run = jax.jit(
            lambda s, p: sim.run_blocked_fused(n, s, params=p)[1]["tsda"])
        tsda = np.asarray(run(states, params), dtype=np.float64)
    else:
        run = jax.jit(lambda b: sim.run_batch(n, b)[1]["tsda"])
        tsda = np.asarray(run({"irr_eta": eta}), dtype=np.float64)
    # [B, T, n_tsda, 4] channels: L, Ldot, f_spring, f_damp
    if warmup is None:
        warmup = float(getattr(base_wave, "ramp_duration", 0.0) or 0.0) \
            + 0.15 * sim.duration
    k0 = min(int(warmup / sim.dt), tsda.shape[1] - 1)
    ldot, f_damp = tsda[:, k0:, :, 1], tsda[:, k0:, :, 3]
    p_inst = -f_damp * ldot  # absorbed power per TSDA (W)
    p_mean = p_inst.mean(axis=1)  # [B, n_tsda]
    nhs, ntp = len(hs_list), len(tp_list)
    p_cell = p_mean.reshape(nhs, ntp, seeds, -1)
    per_tsda = p_cell.mean(axis=2)  # [nHs, nTp, n_tsda]
    total = per_tsda.sum(axis=-1)
    std = p_cell.sum(axis=-1).std(axis=2)
    return total, std, per_tsda


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("case", help="case directory / setup.yaml / inputs dir")
    ap.add_argument("--hs", default="0.75,1.25,1.75,2.25",
                    help="comma list of significant wave heights (m)")
    ap.add_argument("--tp", default="6,7,8,9,10,11,12",
                    help="comma list of peak periods (s)")
    ap.add_argument("--seeds", type=int, default=1,
                    help="realizations per cell (phase seeds)")
    ap.add_argument("--duration", type=float, default=None,
                    help="override simulation duration (s)")
    ap.add_argument("--warmup", type=float, default=None,
                    help="seconds to discard before averaging "
                         "(default ramp + 15%% of duration)")
    ap.add_argument("--era", action="store_true",
                    help="shared-pole ERA radiation (physics/era.py)")
    ap.add_argument("--scatter", default=None,
                    help="site scatter diagram CSV (same Hs/Tp grid, cell "
                         "values = occurrence probability or hours/yr) -> "
                         "annual energy production")
    ap.add_argument("--dtype", choices=["float32", "float64"], default=None)
    ap.add_argument("--out", default="power_matrix")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from hydrochrono_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from hydrochrono_tpu.physics.waves import IrregularWaveParams
    from hydrochrono_tpu.scene.builder import build_case

    case = build_case(args.case)
    for w in case.warnings:
        print(f"warning: {w}", file=sys.stderr)
    if not isinstance(case.wave, IrregularWaveParams):
        print("error: power matrices need an irregular-wave case "
              "(waves: type: irregular)", file=sys.stderr)
        return 2
    if not case.system.tsdas:
        print("error: no TSDA PTO in the model — nothing absorbs power",
              file=sys.stderr)
        return 2
    if args.duration:
        case.end_time = float(args.duration)

    dtype = None
    if args.dtype:
        dtype = jnp.float32 if args.dtype == "float32" else jnp.float64
        if args.dtype == "float64":
            jax.config.update("jax_enable_x64", True)
    on_tpu = jax.default_backend() == "tpu"
    sim = case.build_simulation(
        dtype=dtype, outputs=("pos", "tsda"),
        block_size=128 if on_tpu else None,
        radiation="era" if args.era else None)

    hs_list = [float(x) for x in args.hs.split(",") if x]
    tp_list = [float(x) for x in args.tp.split(",") if x]
    t0 = time.time()
    total, std, per_tsda = compute_power_matrix(
        sim, case.wave, hs_list, tp_list, seeds=args.seeds,
        warmup=args.warmup)
    wall = time.time() - t0
    ncell = len(hs_list) * len(tp_list)
    print(f"{ncell} sea states x {args.seeds} seed(s) "
          f"({ncell * args.seeds} simulations of {sim.duration:.0f} s) "
          f"in {wall:.1f} s")

    os.makedirs(args.out, exist_ok=True)
    hdr = "Hs\\Tp," + ",".join(f"{tp:g}" for tp in tp_list)
    rows = [hdr] + [
        f"{hs:g}," + ",".join(f"{total[i, j]:.1f}"
                              for j in range(len(tp_list)))
        for i, hs in enumerate(hs_list)
    ]
    csv_path = os.path.join(args.out, "power_matrix.csv")
    with open(csv_path, "w") as f:
        f.write("\n".join(rows) + "\n")

    md = ["# Power matrix (mean absorbed PTO power, W)", "",
          f"case: `{args.case}` | duration {sim.duration:g} s | "
          f"seeds/cell {args.seeds} | radiation "
          f"{'era' if args.era else sim.radiation}", "",
          "| Hs \\ Tp | " + " | ".join(f"{tp:g} s" for tp in tp_list)
          + " |",
          "|" + "---|" * (len(tp_list) + 1)]
    for i, hs in enumerate(hs_list):
        md.append(f"| **{hs:g} m** | " + " | ".join(
            f"{total[i, j]:.1f}" for j in range(len(tp_list))) + " |")
    if args.seeds > 1:
        md += ["", f"cross-seed std (max over cells): {std.max():.1f} W"]
    with open(os.path.join(args.out, "power_matrix.md"), "w") as f:
        f.write("\n".join(md) + "\n")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(1.2 * len(tp_list),
                                        0.9 * len(hs_list) + 1.5))
        im = ax.imshow(total, aspect="auto", origin="lower", cmap="viridis")
        ax.set_xticks(range(len(tp_list)),
                      [f"{tp:g}" for tp in tp_list])
        ax.set_yticks(range(len(hs_list)),
                      [f"{hs:g}" for hs in hs_list])
        ax.set_xlabel("Tp (s)")
        ax.set_ylabel("Hs (m)")
        ax.set_title("Mean absorbed PTO power (W)")
        for i in range(len(hs_list)):
            for j in range(len(tp_list)):
                ax.text(j, i, f"{total[i, j]:.0f}", ha="center",
                        va="center", color="w", fontsize=8)
        fig.colorbar(im, ax=ax, label="W")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "power_matrix.png"), dpi=120)
        plt.close(fig)
    except Exception as exc:  # noqa: BLE001 - plot is optional
        print(f"(png skipped: {exc})", file=sys.stderr)

    if args.scatter:
        # scatter CSV: same layout as power_matrix.csv (header row = Tp,
        # first column = Hs); cells are occurrence probabilities (sum ~1)
        # or hours per year (sum ~8766) — auto-detected by the total.
        occ = np.loadtxt(args.scatter, delimiter=",", skiprows=1,
                         usecols=range(1, len(tp_list) + 1))
        occ = np.atleast_2d(occ)
        if occ.shape != total.shape:
            print(f"error: scatter grid {occ.shape} does not match the "
                  f"power grid {total.shape}", file=sys.stderr)
            return 2
        hours = occ * 8766.0 if occ.sum() <= 1.5 else occ
        aep_mwh = float((total * hours).sum() / 1e6)
        mean_kw = float((total * hours).sum() / hours.sum() / 1e3) \
            if hours.sum() else 0.0
        print(f"AEP: {aep_mwh:.1f} MWh/yr (weighted mean {mean_kw:.2f} kW "
              f"over {hours.sum():.0f} h)")
        with open(os.path.join(args.out, "power_matrix.md"), "a") as f:
            f.write(f"\n**AEP** (scatter `{args.scatter}`): "
                    f"{aep_mwh:.1f} MWh/yr "
                    f"(weighted mean {mean_kw:.2f} kW)\n")

    print(f"wrote {csv_path} (+ .md/.png)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
