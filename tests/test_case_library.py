"""The in-repo YAML regression case library (cases/) runs end-to-end.

Every non-sphere model family (RM3, OSWEC, F3OF, DeepCWind) is driven
through the CLI + exporter pipeline by tools/run_tests.py and compared
bit-exactly against its frozen expected results h5 — the analogue of the
reference's tests/regression/run_hydrochrono tree (run_tests.py:98-120).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CASES = os.path.join(REPO, "cases")


def test_case_library_end_to_end(tmp_path):
    gen = subprocess.run(
        [sys.executable, os.path.join(CASES, "gen_assets.py")],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"}, cwd=REPO,
    )
    assert gen.returncode == 0, gen.stdout + gen.stderr

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_tests.py"),
         "--root", CASES, "--out", str(tmp_path / "outputs"),
         "--report", str(tmp_path / "report.md")],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"}, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    # all topologies discovered and green (incl. the nonlinear-PTO + HHT
    # variant mirroring the reference's rm3_nonlinearPTO.model.yaml, and the
    # moored variant activating the reference's declared moordyn block)
    for case in ("rm3/decay", "rm3/irregular", "rm3/nonlinear", "rm3/moored",
                 "rm3/viscous", "oswec/decay", "f3of/decay",
                 "deepcwind/decay", "deepcwind/moored_irregular",
                 "farm/decay", "farm/rail", "farm/spread"):
        assert case in out.stdout, f"case {case} not discovered"
    assert out.stdout.count("PASS") >= 12, out.stdout
    assert "FAIL" not in out.stdout and "ERROR" not in out.stdout, out.stdout
