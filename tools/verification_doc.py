#!/usr/bin/env python3
"""Generate docs/verification.md from live golden-gate runs.

The reference publishes verification pages comparing its sphere/OSWEC
models against IEA OES Task 10 participants
(docs/_main_pages/verification/sphere.md, oswec.md). This tool renders the
same story for hydrochrono_tpu from the ACTUAL frozen-reference
comparisons the test suite gates on: every case below is simulated now,
compared against the reference-generated trajectory, and reported with
its gate margins and a comparison panel (tools/compare_results.render_plot,
the reference report style).

Cases (mirroring SURVEY.md section 4's golden tiers):
  * sphere heave decay          (demo_sphere_decay.cpp workload)
  * sphere regular waves x4     (IEA Task 10 cases 1/3/6/10, PTO damping)
  * sphere irregular waves      (Hs=2 Tp=12 JONSWAP, bit-exact phases)
  * sphere decay, ERA radiation (shared-pole realization, physics/era.py)
  * iea_sphere YAML decay CLI   (full user surface vs Chrono-expected h5)

Usage:
    JAX_PLATFORMS=cpu python tools/verification_doc.py [--out docs/verification.md]

Also invoked by tools/run_tests.py --full-report when the reference data
tree is present (VERDICT r4 item 9).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

from compare_results import render_plot  # noqa: E402

REF = "/root/reference/tests/regression/reference_data/sphere"
IEA_CASE = "/root/reference/tests/regression/run_hydrochrono/iea_sphere"
SPHERE_H5 = "/root/reference/demos/sphere/hydroData/sphere.h5"
L2_GATE, LINF_GATE = 1e-4, 0.02

# IEA Task 10 regular-wave cases (amplitudes/periods + PTO damping),
# demo_sphere_reg_waves.cpp
WAVE_AMPS = [0.177, 0.314, 0.380, 0.491, 0.706, 0.961, 1.256, 1.589, 1.962,
             2.374]
WAVE_OMEGAS = [2.094395102, 1.570796327, 1.427996661, 1.256637061,
               1.047197551, 0.897597901, 0.785398163, 0.698131701,
               0.628318531, 0.571198664]
DAMPING = [398736.034, 118149.758, 90080.857, 161048.558, 322292.419,
           479668.979, 633979.761, 784083.286, 932117.647, 1077123.445]


def _sphere_spec(pto_damping=None, pos0=(0.0, 0.0, -1.0)):
    from hydrochrono_tpu.io.bemio import load_bemio_h5
    from hydrochrono_tpu.physics.system import (Body, HydroAttachment, Joint,
                                                SystemSpec, TSDA)

    hydro = load_bemio_h5(SPHERE_H5, num_bodies=1)
    if pto_damping is None:
        return SystemSpec(
            bodies=[Body(name="body1", mass=261.8e3, pos0=pos0)],
            hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
            gravity=(0.0, 0.0, -9.81),
        )
    return SystemSpec(
        bodies=[
            Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -2.0)),
            Body(name="ground", mass=999.0, pos0=(0.0, 0.0, -5.0),
                 fixed=True),
        ],
        joints=[Joint("prismatic", 0, 1, location=(0.0, 0.0, -2.0),
                      axis=(0.0, 0.0, 1.0))],
        tsdas=[TSDA(0, 1, (0.0, 0.0, -2.0), (0.0, 0.0, -5.0),
                    spring_coeff=0.0, damping_coeff=pto_damping)],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )


def _run_cases(assets_dir):
    """Simulate every verification case; return report rows."""
    from hydrochrono_tpu.physics.waves import IrregularWaveParams, RegularWave
    from hydrochrono_tpu.stepper import Simulation

    rows = []

    def add(name, ref_t, ref_y, t, y, note=""):
        n = min(len(ref_y), len(y))
        diff = y[:n] - ref_y[:n]
        l2 = float(np.linalg.norm(diff) / n)
        linf = float(np.abs(diff).max())
        ok = l2 <= L2_GATE and linf <= LINF_GATE
        png = os.path.join(assets_dir, name.replace(" ", "_") + ".png")
        render_plot(png, ref_t[:n], ref_y[:n], t[:n], y[:n], l2, linf, ok,
                    f"sphere verification: {name}", y_label="heave [m]")
        rows.append({"name": name, "l2": l2, "linf": linf, "ok": ok,
                     "png": os.path.basename(png), "note": note})
        print(f"  {name}: L2={l2:.2e} Linf={linf:.2e} "
              f"{'PASS' if ok else 'FAIL'}", flush=True)

    # 1) decay
    ref = np.loadtxt(f"{REF}/decay/hc_ref_sphere_decay.txt", skiprows=1)
    sim = Simulation(_sphere_spec(), dt=0.015)
    n = ref.shape[0]
    _, traj = sim.run(n)
    add("decay", ref[:, 0], ref[:, 1], sim.times(n),
        np.asarray(traj["pos"][:, 0, 2]), "1 m heave release, still water")

    # 2) decay with ERA radiation (shared-pole realization)
    sim_e = Simulation(_sphere_spec(), dt=0.015, radiation="era")
    _, traj_e = sim_e.run(n)
    add("decay ERA radiation", ref[:, 0], ref[:, 1], sim_e.times(n),
        np.asarray(traj_e["pos"][:, 0, 2]),
        f"shared-pole order {sim_e.params['_const']['era_C'].shape[-1]}")

    # 3) regular waves, IEA cases 1/3/6/10
    for case in (0, 2, 5, 9):
        ref = np.loadtxt(f"{REF}/reg_waves/hc_ref_sphere_reg_waves_"
                         f"{case + 1}.txt", skiprows=5)
        n = min(8000, ref.shape[0])
        sim = Simulation(
            _sphere_spec(pto_damping=DAMPING[case]), dt=0.015,
            wave=RegularWave(amplitude=WAVE_AMPS[case],
                             omega=WAVE_OMEGAS[case]))
        _, traj = sim.run(n)
        T = 2 * np.pi / WAVE_OMEGAS[case]
        add(f"regular waves case {case + 1}", ref[:n, 0], ref[:n, 1],
            sim.times(n), np.asarray(traj["pos"][:, 0, 2]),
            f"A={WAVE_AMPS[case]} m, T={T:.1f} s, PTO "
            f"{DAMPING[case] / 1e3:.0f} kN s/m")

    # 4) irregular waves (bit-exact mt19937 phase stream)
    ref = np.loadtxt(f"{REF}/irreg_waves/hc_ref_sphere_irreg_waves.txt",
                     skiprows=2)
    n = min(10000, ref.shape[0])
    sim = Simulation(
        _sphere_spec(pto_damping=0.0), dt=0.015,
        wave=IrregularWaveParams(height=2.0, period=12.0,
                                 nfrequencies=1000, ramp_duration=60.0),
        duration=600.0)
    _, traj = sim.run(n)
    add("irregular waves", ref[:n, 0], ref[:n, 1], sim.times(n),
        np.asarray(traj["pos"][:, 0, 2]), "Hs=2 m, Tp=12 s, JONSWAP")

    # 5) iea_sphere YAML decay through the full CLI surface (HHT-capable
    # multibody path: ground + joint + TSDA from the model YAML)
    exp = os.path.join(IEA_CASE, "decay", "expected", "results.still.h5")
    if os.path.exists(exp):
        import shutil
        import tempfile

        import h5py

        from hydrochrono_tpu import cli

        with tempfile.TemporaryDirectory() as td:
            shutil.copytree(IEA_CASE, os.path.join(td, "iea_sphere"))
            rc = cli.main([os.path.join(td, "iea_sphere", "decay", "inputs"),
                           "--quiet", "--output-h5", os.path.join(td, "out")])
            assert rc == 0
            with h5py.File(os.path.join(td, "out", "results.still.h5")) as f:
                z = f["results/model/bodies/body1/position"][:, 2]
                t = f["results/time/time"][:]
            with h5py.File(exp) as f:
                ze = f["results/model/bodies/body1/position"][:, 2]
        add("iea_sphere CLI decay", t[:len(ze)], ze, t, z,
            "full YAML surface vs Chrono-generated expected h5")
    return rows


def write_doc(out_path, rows, assets_rel):
    import platform

    import jax

    with open(out_path, "w") as fh:
        fh.write("""# Verification

The reference verifies its sphere model against the IEA OES Task 10
participants (docs/_main_pages/verification/sphere.md; Wendt et al. 2017,
https://www.osti.gov/biblio/1401957) and freezes the resulting
trajectories under tests/regression/reference_data. hydrochrono_tpu
gates on those SAME frozen trajectories: every case on this page was
simulated by this framework and compared against the reference output
with the reference's own pass criteria

    L2 = ||diff|| / n <= 1e-4        Linf = max|diff| <= 0.02 m
    (tests/regression/sphere/compare.py:50)

so a pass here chains to the reference's own published verification.
This page is generated by `python tools/verification_doc.py` (also via
`tools/run_tests.py --full-report`); the TPU-production configuration
(f32, fused Pallas kernels, blocked/ERA radiation) is additionally gated
on hardware by `tools/tpu_golden_gates.py`, with margins recorded in
VALIDATION.md.

## Model

The IEA Task 10 sphere: r = 5 m, m = 261.8e3 kg, cg = (0, 0, -2) m,
rho = 1000 kg/m3, infinite depth; BEM coefficients from the reference's
sphere.h5 (demos/sphere/hydroData). Regular-wave cases ride a heave
prismatic rail with the per-case IEA PTO damping; the irregular case is
a Hs = 2 m, Tp = 12 s JONSWAP sea with the reference's bit-exact
mt19937 phase stream.

## Results

""")
        n_pass = sum(r["ok"] for r in rows)
        fh.write(f"**{n_pass}/{len(rows)} cases inside the gates** "
                 f"(generated {time.strftime('%Y-%m-%d')}, "
                 f"{platform.machine()}, JAX {jax.__version__}, "
                 f"{jax.devices()[0].platform} f64)\n\n")
        fh.write("| case | L2 (gate 1e-4) | Linf (gate 0.02) | margin | "
                 "notes |\n|---|---|---|---|---|\n")
        for r in rows:
            margin = max(r["l2"] / L2_GATE, r["linf"] / LINF_GATE)
            fh.write(f"| {r['name']} | {r['l2']:.2e} | {r['linf']:.2e} | "
                     f"{1.0 / margin:,.0f}x inside | {r['note']} |\n")
        fh.write("\n")
        for r in rows:
            fh.write(f"### {r['name']}\n\n"
                     f"![{r['name']}]({assets_rel}/{r['png']})\n\n")
        fh.write("""## References

- Wendt, F. F., et al. (2017). IEA OES Task 10 WEC Modeling Verification
  and Validation. https://www.osti.gov/biblio/1401957
- Reference verification pages: docs/_main_pages/verification/sphere.md,
  oswec.md (plots against Task 10 participants).
- VALIDATION.md — TPU f32 production-path margins vs the same goldens.
""")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/verification.md")
    ap.add_argument("--assets", default=None,
                    help="panel directory (default: <out_dir>/verification_assets)")
    args = ap.parse_args(argv)

    if not os.path.isdir(REF):
        print(f"reference data tree missing ({REF}); nothing to verify",
              file=sys.stderr)
        return 2
    out_dir = os.path.dirname(os.path.abspath(args.out)) or "."
    assets = args.assets or os.path.join(out_dir, "verification_assets")
    os.makedirs(assets, exist_ok=True)
    print("running verification cases (CPU f64)...", flush=True)
    rows = _run_cases(assets)
    write_doc(args.out, rows, os.path.relpath(assets, out_dir))
    print(f"wrote {args.out} ({sum(r['ok'] for r in rows)}/{len(rows)} PASS)")
    return 0 if all(r["ok"] for r in rows) else 1


if __name__ == "__main__":
    sys.exit(main())
