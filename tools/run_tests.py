#!/usr/bin/env python3
"""End-to-end YAML regression driver.

Port of the reference harness (tests/regression/run_hydrochrono/run_tests.py):
discovers case directories shaped like

    <model>/<case>/inputs/*.setup.yaml
    <model>/<case>/expected/results.<wave>.h5   (or baseline.h5 / legacy txt)

runs each case through the CLI pipeline, compares the produced results
against the expected baseline (per-model signal_adapter.py when present),
and renders a markdown report. `--update-baseline` refreshes the expected
files from the current outputs.

Usage:
    python tools/run_tests.py --root <cases_dir> [--case NAME] [--update-baseline]
                              [--l2 1e-4] [--linf 0.02] [--report report.md]
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# honor JAX_PLATFORMS=cpu even when a site hook pre-imports jax with another
# platform (the env var alone is ignored once a backend wins selection)
if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

from compare_results import compare, load_series, render_plot  # noqa: E402


def discover_cases(root: str):
    cases = []
    for setup in sorted(glob.glob(os.path.join(root, "**", "inputs", "*.setup.yaml"),
                                  recursive=True)):
        case_dir = os.path.dirname(os.path.dirname(setup))
        expected = sorted(
            glob.glob(os.path.join(case_dir, "expected", "*.h5"))
            + glob.glob(os.path.join(case_dir, "expected", "*.txt"))
        )
        adapter = None
        probe = case_dir
        for _ in range(3):
            cand = os.path.join(probe, "signal_adapter.py")
            if os.path.exists(cand):
                adapter = cand
                break
            probe = os.path.dirname(probe)
        cases.append({
            "name": os.path.relpath(case_dir, root),
            "setup": setup,
            "case_dir": case_dir,
            "expected": expected[0] if expected else None,
            "adapter": adapter,
        })
    return cases


def run_case(case, out_root: str) -> str:
    from hydrochrono_tpu import cli

    out_dir = os.path.join(out_root, case["name"].replace(os.sep, "_"))
    rc = cli.main([case["setup"], "--quiet", "--output-h5", out_dir])
    if rc != 0:
        raise RuntimeError(f"case {case['name']} failed with rc={rc}")
    produced = sorted(glob.glob(os.path.join(out_dir, "results.*.h5")))
    if not produced:
        raise RuntimeError(f"case {case['name']} produced no results h5")
    return produced[0]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True, help="cases root directory")
    p.add_argument("--case", help="run only cases whose name contains this")
    p.add_argument("--out", default="test_outputs")
    p.add_argument("--l2", type=float, default=1e-4)
    p.add_argument("--linf", type=float, default=0.02)
    p.add_argument("--update-baseline", action="store_true")
    p.add_argument("--report", help="markdown report path")
    p.add_argument("--plots", help="directory for PNG comparison plots")
    p.add_argument("--full-report", metavar="DIR",
                   help="one-flag report bundle: writes report.md + PNG "
                        "panels (+ report.pdf when pandoc is available) "
                        "under DIR — the role of the reference's "
                        "generate_report.py (tests/regression/utilities/"
                        "generate_report.py:226-555)")
    p.add_argument("--fail-fast", action="store_true")
    args = p.parse_args(argv)
    if args.full_report:
        os.makedirs(args.full_report, exist_ok=True)
        args.report = args.report or os.path.join(args.full_report, "report.md")
        args.plots = args.plots or os.path.join(args.full_report, "panels")

    cases = discover_cases(args.root)
    if args.case:
        cases = [c for c in cases if args.case in c["name"]]
    if not cases:
        print("no cases found")
        return 2

    rows = []
    any_fail = False
    for case in cases:
        t0 = time.time()
        try:
            produced = run_case(case, args.out)
        except Exception as exc:  # noqa: BLE001 - report and continue
            rows.append((case["name"], "ERROR", None, None, str(exc)))
            any_fail = True
            if args.fail_fast:
                break
            continue

        if args.update_baseline:
            os.makedirs(os.path.join(case["case_dir"], "expected"), exist_ok=True)
            dst = os.path.join(case["case_dir"], "expected", os.path.basename(produced))
            shutil.copyfile(produced, dst)
            rows.append((case["name"], "BASELINED", None, None, dst))
            continue

        if case["expected"] is None:
            rows.append((case["name"], "NO-BASELINE", None, None, produced))
            continue

        t_ref, y_ref = load_series(case["expected"], adapter=case["adapter"])
        t_test, y_test = load_series(produced, adapter=case["adapter"])
        l2, linf = compare(t_ref, y_ref, t_test, y_test)
        passed = l2 <= args.l2 and linf <= args.linf
        any_fail = any_fail or not passed
        if args.plots:
            render_plot(
                os.path.join(args.plots, case["name"].replace(os.sep, "_") + ".png"),
                t_ref, y_ref, t_test, y_test, l2, linf, passed, case["name"],
                thresholds=(args.l2, args.linf),
            )
        rows.append((case["name"], "PASS" if passed else "FAIL", l2, linf,
                     f"{time.time() - t0:.1f}s"))
        if args.fail_fast and not passed:
            break

    width = max(len(r[0]) for r in rows) + 2
    print(f"{'case':<{width}} {'status':<12} {'L2':<12} {'Linf':<12} note")
    for name, status, l2, linf, note in rows:
        l2s = f"{l2:.3e}" if l2 is not None else "-"
        ls = f"{linf:.3e}" if linf is not None else "-"
        print(f"{name:<{width}} {status:<12} {l2s:<12} {ls:<12} {note or ''}")

    if args.report:
        write_report(args, rows)

    if args.full_report:
        # verification page (VERDICT r4 item 9): live golden-gate runs
        # against the reference's frozen sphere trajectories, rendered in
        # the style of docs/_main_pages/verification/sphere.md
        import verification_doc

        if os.path.isdir(verification_doc.REF):
            rc = verification_doc.main(
                ["--out", os.path.join(args.full_report, "verification.md")])
            any_fail = any_fail or rc != 0
        else:
            print("# reference data tree absent; skipping verification page")

    return 1 if any_fail else 0


def write_report(args, rows):
    """Aggregated markdown (+ optional PDF) regression report: summary
    rollup, system/run info, per-case sections with gate margins and the
    comparison panels — the role of the reference's
    tests/regression/utilities/generate_report.py:226-555 (which renders
    the same structure through pandoc)."""
    import platform
    import socket

    n_pass = sum(1 for r in rows if r[1] == "PASS")
    n_fail = sum(1 for r in rows if r[1] in ("FAIL", "ERROR"))
    with open(args.report, "w") as fh:
        fh.write("# HydroChrono-TPU regression report\n\n")
        fh.write(f"**{n_pass} passed, {n_fail} failed, "
                 f"{len(rows) - n_pass - n_fail} other** "
                 f"(gates: L2 <= {args.l2:g}, Linf <= {args.linf:g})\n\n")

        fh.write("## Run environment\n\n")
        try:
            import jax

            dev = ", ".join(str(d) for d in jax.devices())
            jaxv = jax.__version__
        except Exception:
            dev, jaxv = "unavailable", "unavailable"
        cpu = platform.processor() or platform.machine()
        try:
            with open("/proc/cpuinfo") as ci:
                for line in ci:
                    if line.startswith("model name"):
                        cpu = line.split(":", 1)[1].strip()
                        break
        except OSError:
            pass
        try:
            from hydrochrono_tpu import __version__ as hv
        except Exception:
            hv = "unknown"
        for k, v in [
            ("Generated", time.strftime("%Y-%m-%d %H:%M:%S")),
            ("Host", f"{socket.gethostname()} ({platform.platform(terse=True)})"),
            ("CPU", cpu),
            ("Python / JAX", f"{platform.python_version()} / {jaxv}"),
            ("JAX devices", dev),
            ("hydrochrono_tpu", hv),
            ("Cases root", os.path.abspath(args.root)),
        ]:
            fh.write(f"- **{k}**: {v}\n")

        fh.write("\n## Summary\n\n")
        fh.write("| case | status | L2 | Linf | margin | note |\n"
                 "|---|---|---|---|---|---|\n")
        for name, status, l2, linf, note in rows:
            if l2 is not None:
                # how far inside (or outside) the gates the worst metric sits
                margin = max(l2 / args.l2, linf / args.linf)
                ms = f"{margin:.2e}x"
                l2s, ls = f"{l2:.3e}", f"{linf:.3e}"
            else:
                ms = l2s = ls = "-"
            fh.write(f"| {name} | {status} | {l2s} | {ls} | {ms} | {note or ''} |\n")

        if args.plots:
            fh.write("\n## Per-case panels\n\n")
            for name, status, l2, linf, note in rows:
                png = os.path.join(
                    os.path.relpath(args.plots,
                                    os.path.dirname(os.path.abspath(args.report))),
                    name.replace(os.sep, "_") + ".png",
                )
                fh.write(f"### {name} — {status}\n\n")
                if l2 is not None:
                    fh.write(f"L2 = {l2:.3e} (gate {args.l2:g}), "
                             f"Linf = {linf:.3e} (gate {args.linf:g}), "
                             f"runtime {note}\n\n")
                if os.path.exists(os.path.join(
                        os.path.dirname(os.path.abspath(args.report)), png)):
                    fh.write(f"![{name}]({png})\n\n")

    # optional PDF, matching generate_report.py's pandoc step; best-effort
    pdf = os.path.splitext(args.report)[0] + ".pdf"
    import shutil as _sh
    import subprocess

    if _sh.which("pandoc"):
        try:
            subprocess.run(
                ["pandoc", args.report, "-o", pdf,
                 "--resource-path", os.path.dirname(os.path.abspath(args.report))],
                check=True, capture_output=True, timeout=120,
            )
            print(f"PDF report: {pdf}")
        except Exception as exc:  # noqa: BLE001
            print(f"pandoc PDF generation skipped ({exc})")
    print(f"report: {args.report}")


if __name__ == "__main__":
    sys.exit(main())
