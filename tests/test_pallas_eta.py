"""Device-side eta synthesis matches the host reference implementation."""

import numpy as np
import jax.numpy as jnp

from hydrochrono_tpu.ops.pallas_eta import build_eta_batched, eta_series_device
from hydrochrono_tpu.physics import waves as wv


def make_components(nf=130, seed=1):
    f = np.linspace(0.01, 1.0, nf)
    s = wv.jonswap_spectrum_hz(f, 2.0, 10.0, gamma=1.0, is_normalized=False)
    w = wv.trapezoid_widths(f) if hasattr(wv, "trapezoid_widths") else None
    from hydrochrono_tpu.io.bemio import trapezoid_widths

    w = trapezoid_widths(f)
    ph = wv.mt19937_uniform_phases(seed, nf)
    k = wv.compute_wavenumber(2 * np.pi * f, np.inf, 9.81)
    return f, s, w, ph, k


def test_eta_device_matches_host_single():
    f, s, w, ph, k = make_components()
    t = np.linspace(-10.0, 60.0, 777)
    host = wv.eta_irregular_series(t, f, s, w, ph, k)
    amp = np.sqrt(2 * s * w)
    dev = np.asarray(eta_series_device(
        jnp.asarray(t, jnp.float64), jnp.asarray(amp, jnp.float64),
        jnp.asarray(2 * np.pi * f, jnp.float64), jnp.asarray(k, jnp.float64),
        jnp.asarray(ph, jnp.float64), use_pallas=False,
    ))
    np.testing.assert_allclose(dev, host, rtol=1e-12, atol=1e-12)


def test_eta_device_batched_with_ramp():
    f, s, w, _, k = make_components()
    phases = np.stack([wv.mt19937_uniform_phases(sd, len(f)) for sd in (1, 2, 3)])
    t = np.linspace(-5.0, 30.0, 600)
    dev = np.asarray(build_eta_batched(
        f, s, w, phases, k, t, ramp_duration=10.0, dtype=jnp.float64,
        use_pallas=False,
    ))
    assert dev.shape == (3, 600)
    for i, sd in enumerate((1, 2, 3)):
        host = wv.eta_irregular_series(t, f, s, w, phases[i], k)
        ramp = np.clip(t / 10.0, 0, 1)
        ramp[t <= 0] = 0.0
        np.testing.assert_allclose(dev[i], host * ramp, rtol=1e-10, atol=1e-12)


def test_eta_pallas_interpret_mode():
    """Run the actual Pallas kernel in interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    f, s, w, ph, k = make_components(nf=64)
    t = np.linspace(0.0, 20.0, 300)
    amp = np.sqrt(2 * s * w)
    host = wv.eta_irregular_series(t, f, s, w, ph, k)
    with pltpu.force_tpu_interpret_mode():
        dev = np.asarray(eta_series_device(
            jnp.asarray(t, jnp.float32), jnp.asarray(amp, jnp.float32),
            jnp.asarray(2 * np.pi * f, jnp.float32), jnp.asarray(k, jnp.float32),
            jnp.asarray(ph, jnp.float32), use_pallas=True,
        ))
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-4)
