"""The regression harness tools run end-to-end on the reference iea_sphere case."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

CASES_SRC = "/root/reference/tests/regression/run_hydrochrono/iea_sphere"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def cases_root(tmp_path):
    if not os.path.isdir(CASES_SRC):
        pytest.skip("iea_sphere case unavailable")
    root = tmp_path / "cases"
    shutil.copytree(CASES_SRC, root / "iea_sphere")
    return str(root)


def test_run_tests_harness(cases_root, tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_tests.py"),
         "--root", cases_root, "--out", str(tmp_path / "outputs"),
         "--report", str(tmp_path / "report.md"),
         "--plots", str(tmp_path / "plots")],
        capture_output=True, text=True, env={**os.environ, "JAX_PLATFORMS": "cpu"},
        cwd=REPO,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "PASS" in out.stdout
    assert os.path.exists(tmp_path / "report.md")
    pngs = list((tmp_path / "plots").glob("*.png"))
    assert pngs, "comparison plot not rendered"


def test_compare_results_cli(cases_root, tmp_path):
    expected = os.path.join(cases_root, "iea_sphere", "decay", "expected",
                            "results.still.h5")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "compare_results.py"),
         expected, expected, "--json"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    import json

    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["passed"] and res["l2"] == 0.0


def test_animate_tool(cases_root, tmp_path):
    """Offline visualization: panel + HTML animation from a results h5."""
    expected = os.path.join(cases_root, "iea_sphere", "decay", "expected",
                            "results.still.h5")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "animate.py"), expected,
         "--panel", str(tmp_path / "panel.png"),
         "--out", str(tmp_path / "anim.html"), "--stride", "200"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert (tmp_path / "panel.png").stat().st_size > 10000
    html = (tmp_path / "anim.html").read_text()
    assert "animation" in html.lower() and len(html) > 50000


def test_mesh_export_tool(tmp_path):
    """OBJ-sequence 3D visualization (guihelper.cpp role + the free-surface
    mesh of wave_types.cpp:846-856): frames written, the moored DeepCWind
    platform carries synthesized geometry, and the free surface ANIMATES
    (eta differs between frames) using the exact wave field stored in the
    H5."""
    results = os.path.join(REPO, "cases", "deepcwind", "moored_irregular",
                           "expected", "results.irregular.h5")
    if not os.path.exists(results):
        pytest.skip("frozen moored_irregular baseline unavailable")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "mesh_export.py"),
         results, "--out", str(tmp_path / "frames"), "--stride", "100",
         "--extent", "20", "--grid", "12"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    frames = sorted((tmp_path / "frames").glob("frame_*.obj"))
    assert len(frames) >= 3

    def surface_z(path):
        zs, in_surf = [], False
        for line in path.read_text().splitlines():
            if line.startswith("o "):
                in_surf = "free_surface" in line
            elif in_surf and line.startswith("v "):
                zs.append(float(line.split()[3]))
        return np.asarray(zs)

    z0, z1 = surface_z(frames[0]), surface_z(frames[2])
    assert len(z0) == 12 * 12
    assert np.abs(z0 - z1).max() > 0.05  # the sea is actually moving
    # body geometry present (an object block besides the surface)
    assert "o body1" in frames[0].read_text()
