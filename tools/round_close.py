"""Round-end ritual (VERDICT r4 item 3): one command that proves the repo
is green and leaves the driver a warm compile cache.

    python tools/round_close.py [--skip-tests] [--budget SECONDS]

Runs, in order, refusing to continue past a red stage:

  1. quick test tier   — `pytest tests/ -m "not slow" -q` on the virtual
                         8-device CPU mesh (tests/conftest.py pins it)
  2. TPU golden gates  — tools/tpu_golden_gates.py on the real chip
                         (every production path vs the frozen reference
                         trajectories; FAIL lines are fatal)
  3. bench.py          — the driver's benchmark, so its compiled programs
                         land in the persistent cache and the driver's own
                         run starts WARM (rounds 3 and 4 both lost their
                         BENCH artifact to a cold/stale cache)

Exit code 0 only when every stage passed. Rule of thumb this encodes
(DEVNOTES round-3/4): ALWAYS leave the last gates+bench run AFTER the
last change to stepper/ops code — never commit a snapshot with untested
stepper changes.
"""

import argparse
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(name, cmd, env=None, timeout=None):
    print(f"\n=== round_close: {name} ===\n    {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, env=env, timeout=timeout,
                          capture_output=True, text=True)
    wall = time.time() - t0
    tail = "\n".join((proc.stdout + proc.stderr).strip().splitlines()[-25:])
    print(tail)
    print(f"--- {name}: rc={proc.returncode}, {wall:.0f}s", flush=True)
    return proc, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-tests", action="store_true",
                    help="skip the quick tier (when it already ran green "
                         "this session on the same code)")
    ap.add_argument("--budget", type=float, default=1200.0,
                    help="BENCH_BUDGET_S for the bench stage")
    args = ap.parse_args()

    results = {}

    if not args.skip_tests:
        env = dict(os.environ)
        env.setdefault("JAX_PLATFORMS", "cpu")
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        proc, wall = _run("quick tier",
                          [sys.executable, "-m", "pytest", "tests/",
                           "-m", "not slow", "-q", "--no-header"], env=env)
        results["quick_tier_s"] = round(wall)
        if proc.returncode != 0:
            print("round_close: QUICK TIER RED — fix before closing", flush=True)
            return 1
        if wall > 660:
            print(f"round_close: WARNING quick tier took {wall:.0f}s "
                  "(budget 600s, VERDICT r4 item 7)", flush=True)

    # gates + bench run on whatever backend is live (TPU under the driver)
    proc, wall = _run("golden gates",
                      [sys.executable, "tools/tpu_golden_gates.py"])
    results["gates_s"] = round(wall)
    fails = re.findall(r"^.*FAIL.*$", proc.stdout, re.M)
    if proc.returncode != 0 or fails:
        print("round_close: GOLDEN GATES RED:\n" + "\n".join(fails), flush=True)
        return 1

    env = dict(os.environ)
    env["BENCH_BUDGET_S"] = str(args.budget)
    proc, wall = _run("bench", [sys.executable, "bench.py"], env=env)
    results["bench_s"] = round(wall)
    if proc.returncode != 0:
        print("round_close: BENCH RED", flush=True)
        return 1
    # surface the final bench line for the log
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if lines:
        print(f"round_close: bench result {lines[-1]}", flush=True)

    print(f"\nround_close: ALL GREEN {results} — cache is warm; commit now.",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
