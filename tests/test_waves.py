"""Wave-model unit tests: spectra, phases, dispersion, eta synthesis."""

import numpy as np
import pytest

from hydrochrono_tpu.physics import waves as wv


def test_mt19937_phases_match_gcc():
    # values dumped from g++ std::mt19937(1) + uniform_real_distribution(0, 2pi)
    expected = [
        6.265496935615098, 5.8594307110506207, 0.80502964773345131,
        6.2771566880485272, 1.4833907870637264, 2.4917901917355176,
        2.437315063702314, 4.2081384808785911,
    ]
    got = wv.mt19937_uniform_phases(1, 8)
    np.testing.assert_allclose(got, expected, rtol=0, atol=0)


def test_pm_spectrum_peak_near_tp():
    f = np.linspace(0.01, 0.5, 2000)
    s = wv.pierson_moskowitz_spectrum_hz(f, hs=2.0, tp=12.0)
    f_peak = f[np.argmax(s)]
    # PM peak frequency is (4/5)^(1/4) / Tp ~= 0.946/Tp
    assert abs(f_peak - 0.946 / 12.0) < 0.005


def test_pm_spectrum_integrates_to_hs():
    # m0 = integral S df = (Hs/4)^2
    f = np.linspace(0.005, 2.0, 20000)
    s = wv.pierson_moskowitz_spectrum_hz(f, hs=2.0, tp=12.0)
    m0 = np.trapezoid(s, f)
    hs_back = 4.0 * np.sqrt(m0)
    assert abs(hs_back - 2.0) < 0.02


def test_jonswap_gamma_one_equals_pm():
    f = np.linspace(0.01, 1.0, 100)
    pm = wv.pierson_moskowitz_spectrum_hz(f, 2.0, 12.0)
    js = wv.jonswap_spectrum_hz(f, 2.0, 12.0, gamma=1.0, is_normalized=False)
    np.testing.assert_allclose(js, pm)


def test_jonswap_peak_enhancement():
    f = np.linspace(0.01, 1.0, 1000)
    js = wv.jonswap_spectrum_hz(f, 2.0, 12.0, gamma=3.3, is_normalized=False)
    pm = wv.pierson_moskowitz_spectrum_hz(f, 2.0, 12.0)
    ipk = np.argmin(np.abs(f - 1.0 / 12.0))
    assert js[ipk] / pm[ipk] == pytest.approx(3.3, rel=1e-6)


def test_dispersion_deep_water():
    k = wv.compute_wavenumber(1.0, np.inf, 9.81)
    assert k == pytest.approx(1.0 / 9.81)
    # depth > 1000 uses the shortcut too (wave_types.cpp:209)
    assert wv.compute_wavenumber(1.0, 2000.0, 9.81) == k


def test_dispersion_finite_depth_satisfies_relation():
    g, h = 9.81, 50.0
    omegas = np.linspace(0.3, 3.0, 20)
    k = wv.compute_wavenumber(omegas, h, g)
    # the reference converges on |delta_k| <= 1e-6 (wave_types.cpp:178-180),
    # which bounds the relation residual to ~|df|*1e-6 ~ 2e-5
    np.testing.assert_allclose(omegas ** 2, g * k * np.tanh(k * h), atol=1e-4, rtol=1e-3)


def test_eta_series_single_component():
    # one frequency bin -> pure cosine with amplitude sqrt(2 S dw)
    t = np.linspace(0, 10, 101)
    f = np.array([0.1])
    s = np.array([2.0])
    w = np.array([0.5])
    ph = np.array([0.3])
    k = np.array([0.0])
    eta = wv.eta_irregular_series(t, f, s, w, ph, k)
    amp = np.sqrt(2 * 2.0 * 0.5)
    np.testing.assert_allclose(eta, amp * np.cos(-2 * np.pi * 0.1 * t + 0.3), atol=1e-12)


def test_eigen_spline_resample_interpolates():
    x = np.linspace(0, 1, 21)
    y = np.sin(2 * np.pi * x)[None, :]
    out = wv.eigen_spline_resample(y, 21)
    # same parameter count -> reproduces the data
    np.testing.assert_allclose(out, y, atol=1e-9)
    dense = wv.eigen_spline_resample(y, 201)
    xd = np.linspace(0, 1, 201)
    np.testing.assert_allclose(dense[0], np.sin(2 * np.pi * xd), atol=2e-3)


def test_regular_wave_interp_matches_reference_convention(sphere_h5):
    from hydrochrono_tpu.io.bemio import load_bemio_h5

    hd = load_bemio_h5(sphere_h5, 1)
    omega = 2.094395102
    data = wv.build_regular_wave(hd, wv.RegularWave(amplitude=1.0, omega=omega))
    # manual: freq_index = w / (w_max/N) - 1 (wave_types.cpp:289-297)
    dw = hd.freq_list[-1] / hd.freq_list.shape[0]
    idx = omega / dw - 1.0
    i0 = int(np.floor(idx))
    frac = idx - i0
    m = hd.exc_mag[0, 2, 0, i0] + frac * (hd.exc_mag[0, 2, 0, i0 + 1] - hd.exc_mag[0, 2, 0, i0])
    assert data.force_mag[2] == pytest.approx(m, rel=1e-12)
