"""OBJ mesh utilities: mass properties (native C++ + numpy fallback parity)
and free-surface mesh export."""

import os

import numpy as np
import pytest

from hydrochrono_tpu.io import mesh as M

SPHERE_OBJ = "/root/reference/tests/regression/run_hydrochrono/iea_sphere/assets/geometry/sphere.obj"


def unit_cube():
    # 8 vertices, 12 triangles, CCW outward
    v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)], dtype=float)
    f = np.array([
        [0, 1, 3], [0, 3, 2],  # x=0 (inward normal -> fix winding below)
        [4, 7, 5], [4, 6, 7],  # x=1
        [0, 4, 5], [0, 5, 1],  # y=0
        [2, 3, 7], [2, 7, 6],  # y=1
        [0, 2, 6], [0, 6, 4],  # z=0
        [1, 5, 7], [1, 7, 3],  # z=1
    ])
    return v, f


def test_cube_mass_properties():
    v, f = unit_cube()
    vol, mass, com, inertia = M.mesh_mass_properties(v, f, density=2.0)
    assert vol == pytest.approx(1.0, rel=1e-12)
    assert mass == pytest.approx(2.0, rel=1e-12)
    np.testing.assert_allclose(com, [0.5, 0.5, 0.5], atol=1e-12)
    # unit cube about COM: I = m/6 for each axis? cube side 1: I = m*(1/6)...
    # I_xx = m (b^2 + c^2)/12 = 2*(1+1)/12 = 1/3
    np.testing.assert_allclose(np.diag(inertia), [1 / 3] * 3, rtol=1e-12)
    np.testing.assert_allclose(inertia - np.diag(np.diag(inertia)), 0, atol=1e-12)


def test_native_matches_numpy():
    v, f = unit_cube()
    lib = M._native_lib()
    if lib is None:
        pytest.skip("native library not built")
    native = M.mesh_mass_properties(v, f, density=1.0)
    # force numpy fallback
    saved = M._NATIVE
    M._NATIVE = False
    try:
        fallback = M.mesh_mass_properties(v, f, density=1.0)
    finally:
        M._NATIVE = saved
    assert native[0] == pytest.approx(fallback[0], rel=1e-12)
    np.testing.assert_allclose(native[2], fallback[2], atol=1e-12)
    np.testing.assert_allclose(native[3], fallback[3], atol=1e-10)


@pytest.mark.skipif(not os.path.exists(SPHERE_OBJ), reason="sphere.obj unavailable")
def test_reference_sphere_obj():
    v, f = M.read_obj(SPHERE_OBJ)
    vol, mass, com, inertia = M.mesh_mass_properties(v, f, density=1000.0)
    r = np.abs(v).max()
    expected_vol = 4 / 3 * np.pi * r ** 3
    # faceted sphere: volume within a few percent of the analytic ball
    assert abs(abs(vol) - expected_vol) / expected_vol < 0.05
    np.testing.assert_allclose(com, 0.0, atol=0.05 * r)


def test_free_surface_obj_roundtrip(tmp_path):
    eta = np.sin(np.linspace(0, 4 * np.pi, 101))
    path = str(tmp_path / "fs.obj")
    M.write_free_surface_obj(path, eta, dt=0.1, duration=10.0)
    v, f = M.read_obj(path)
    assert len(v) == 2 * 101
    assert len(f) == 2 * (101 - 1)
    np.testing.assert_allclose(v[0::2, 2], eta, atol=1e-5)
    np.testing.assert_allclose(v[0::2, 1], -10.0)
    np.testing.assert_allclose(v[1::2, 1], 10.0)
