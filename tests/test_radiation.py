"""Radiation kernel resampling + ring-buffer convolution tests.

The key invariant: the resampled history kernel W applied to a zero-padded
uniform-dt velocity history must equal the reference's per-lag trapezoid
convolution with linear velocity interpolation (hydro_forces.cpp:537-691),
for zero initial velocity.
"""

import numpy as np
import jax.numpy as jnp

from hydrochrono_tpu.io.bemio import trapezoid_widths
from hydrochrono_tpu.physics.radiation import (
    TaperedDirectOptions,
    preprocess_rirf_tapered,
    radiation_force,
    resample_kernel_to_history,
)


def reference_convolution(rirf, rirf_time, vel_series, dt, n):
    """Direct transcription of the reference algorithm for one step n.

    vel_series[k] = 6N velocity at step k (k=0..n). History includes the
    current sample; lags without bracketing history are skipped.
    """
    w = trapezoid_widths(rirf_time)
    t = n * dt
    total = rirf.shape[0]
    out = np.zeros(total)
    times = np.arange(n + 1) * dt
    for s, tau in enumerate(rirf_time):
        q = t - tau
        if q < -1e-12:
            continue
        v = np.empty(total)
        for j in range(total):
            v[j] = np.interp(q, times, vel_series[: n + 1, j])
        out += rirf[:, :, s] @ v * w[s]
    return out


def test_resampled_kernel_matches_reference_nonaligned_grid():
    rng = np.random.RandomState(0)
    nd, Tr = 6, 40
    rirf_time = np.linspace(0.0, 3.3, Tr)  # dt_r = 0.0846... not a dt multiple
    rirf = rng.normal(size=(nd, nd, Tr))
    dt = 0.05
    W = resample_kernel_to_history(rirf, rirf_time, dt)

    nsteps = 90
    vel = rng.normal(size=(nsteps, nd))
    vel[0] = 0.0  # reference workloads start from rest

    H = W.shape[0]
    Wrev = jnp.asarray(W[::-1].copy())
    vhist = np.zeros((H, nd))
    for n in range(nsteps):
        vhist[n % H] = vel[n]
        got = np.asarray(radiation_force(Wrev, jnp.asarray(vhist), jnp.int32(n)))
        want = reference_convolution(rirf, rirf_time, vel, dt, n)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_ring_buffer_wraparound():
    rng = np.random.RandomState(1)
    nd, Tr = 2, 10
    rirf_time = np.linspace(0.0, 0.9, Tr)
    rirf = rng.normal(size=(nd, nd, Tr))
    dt = 0.1
    W = resample_kernel_to_history(rirf, rirf_time, dt)
    H = W.shape[0]
    nsteps = 4 * H  # force several wraps
    vel = rng.normal(size=(nsteps, nd))
    vel[0] = 0.0
    Wrev = jnp.asarray(W[::-1].copy())
    vhist = np.zeros((H, nd))
    for n in range(nsteps):
        vhist[n % H] = vel[n]
        got = np.asarray(radiation_force(Wrev, jnp.asarray(vhist), jnp.int32(n)))
        want = reference_convolution(rirf, rirf_time, vel, dt, n)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_tapered_direct_truncation_and_taper():
    rng = np.random.RandomState(2)
    rirf = rng.normal(size=(6, 6, 100))
    t = np.linspace(0, 9.9, 100)
    opts = TaperedDirectOptions(taper_start_percent=0.5, taper_end_percent=0.8,
                                taper_final_amplitude=0.0, smoothing="sg")
    out = preprocess_rirf_tapered(rirf, t, opts)
    assert out.shape == rirf.shape
    # beyond taper end -> exactly zero
    assert np.all(out[..., 80:] == 0.0)
    # before taper start -> smoothed but nonzero
    assert np.any(out[..., :50] != 0.0)
    # edges copied verbatim by SG smoothing
    np.testing.assert_allclose(out[..., 0], rirf[..., 0])
    np.testing.assert_allclose(out[..., 1], rirf[..., 1])

    opts2 = TaperedDirectOptions(rirf_end_time=5.0)
    out2 = preprocess_rirf_tapered(rirf, t, opts2)
    dt_r = t[1] - t[0]
    eff = int(np.floor(5.0 / dt_r))
    assert np.all(out2[..., eff:] == 0.0)
