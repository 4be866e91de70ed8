"""BEMIO loader unit tests against direct h5py reads."""

import h5py
import numpy as np

from hydrochrono_tpu.io.bemio import load_bemio_h5, trapezoid_widths


def test_sphere_load_scaling(sphere_h5):
    hd = load_bemio_h5(sphere_h5, num_bodies=1)
    with h5py.File(sphere_h5, "r") as f:
        rho = f["simulation_parameters/rho"][0, 0]
        g = f["simulation_parameters/g"][0, 0]
        ainf_raw = f["body1/hydro_coeffs/added_mass/inf_freq"][:]
        k_raw = f["body1/hydro_coeffs/radiation_damping/impulse_response_fun/K"][:]
        mag_raw = f["body1/hydro_coeffs/excitation/mag"][:]
        irf_raw = f["body1/hydro_coeffs/excitation/impulse_response_fun/f"][:]

    assert hd.rho == rho and hd.g == g
    np.testing.assert_allclose(hd.inf_added_mass, ainf_raw * rho)
    np.testing.assert_allclose(hd.rirf, k_raw * rho)
    np.testing.assert_allclose(hd.exc_mag[0], mag_raw * rho * g)
    np.testing.assert_allclose(hd.exc_irf[0], irf_raw[:, 0, :] * rho * g)
    assert hd.cg.shape == (1, 3) and hd.cb.shape == (1, 3)
    assert hd.water_depth > 0


def test_trapezoid_widths_uniform():
    t = np.linspace(0, 10, 11)
    w = trapezoid_widths(t)
    assert w[0] == 0.5 and w[-1] == 0.5
    np.testing.assert_allclose(w[1:-1], 1.0)
    # widths integrate a constant exactly
    np.testing.assert_allclose(w.sum(), 10.0)
