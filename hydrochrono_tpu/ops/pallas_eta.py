"""Device-side free-surface elevation synthesis (Pallas TPU kernel).

eta[b, t] = sum_f amp[f] * cos(k[f] x - w[f] t_vals[t] + phase[b, f])

The host-side numpy synthesis (physics/waves.py::eta_irregular_series) is
fine for one seed but becomes the setup bottleneck for batched sea states:
B=4096 seeds x 40k timesteps x 1000 frequency bins is ~1.6e11 cos terms.
This kernel streams frequency chunks through VMEM and accumulates per
(batch, time) tile on the VPU without ever materializing the [T, F] phase
matrix. Falls back to a chunked jnp implementation off-TPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

TILE_T = 512
CHUNK_F = 512


def _pad_to(x, n, axis=-1):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


TILE_B = 8  # sublane-aligned batch tile


def _eta_kernel(tvals_ref, amp_ref, omega_ref, kx_ref, phase_ref, out_ref):
    t = tvals_ref[0]  # [TILE_T]
    n_chunks = amp_ref.shape[-1] // CHUNK_F
    rows = []
    for b in range(TILE_B):
        acc_b = jnp.zeros((t.shape[0],), t.dtype)
        for c in range(n_chunks):
            sl = slice(c * CHUNK_F, (c + 1) * CHUNK_F)
            amp = amp_ref[0, sl]  # [CHUNK_F]
            omega = omega_ref[0, sl]
            kx = kx_ref[0, sl]
            phase = phase_ref[b, sl]
            # [CHUNK_F, TILE_T] chunk, VMEM-resident, never written back
            arg = kx[:, None] - omega[:, None] * t[None, :] + phase[:, None]
            acc_b = acc_b + jnp.sum(amp[:, None] * jnp.cos(arg), axis=0)
        rows.append(acc_b)
    out_ref[:] = jnp.stack(rows)


def eta_series_device(t_vals, amp, omega_rad, wavenumbers, phases, x_pos=0.0,
                      use_pallas: bool | None = None):
    """eta for all (batch, time): phases [B, F] (or [F]), returns [B, T] (or [T]).

    All inputs are device arrays; dtype follows `amp`.
    """
    single = phases.ndim == 1
    if single:
        phases = phases[None]
    B, F = phases.shape
    T = t_vals.shape[0]
    dtype = amp.dtype

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    Fp = -(-F // CHUNK_F) * CHUNK_F
    Tp = -(-T // TILE_T) * TILE_T
    ampp = _pad_to(amp.astype(dtype), Fp)
    omgp = _pad_to(omega_rad.astype(dtype), Fp)
    kxp = _pad_to((wavenumbers * x_pos).astype(dtype), Fp)
    php = _pad_to(phases.astype(dtype), Fp, axis=-1)
    tp = _pad_to(t_vals.astype(dtype), Tp)

    if use_pallas:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        Bp = -(-B // TILE_B) * TILE_B
        php_b = _pad_to(php, Bp, axis=0)
        grid = (Bp // TILE_B, Tp // TILE_T)
        out = pl.pallas_call(
            _eta_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, TILE_T), lambda b, i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Fp), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Fp), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Fp), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_B, Fp), lambda b, i: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_B, TILE_T), lambda b, i: (b, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, Tp), dtype),
        )(tp[None, :], ampp[None, :], omgp[None, :], kxp[None, :], php_b)
        eta = out[:B, :T]
    else:
        # chunked jnp fallback: never materialize [T, F] for the full T
        def tile(carry, tchunk):
            arg = (kxp[None, :] - omgp[None, :] * tchunk[:, None])[None] + php[:, None, :]
            return carry, jnp.sum(ampp * jnp.cos(arg), axis=-1)  # [B, tile]

        tiles = tp.reshape(Tp // TILE_T, TILE_T)
        _, chunks = jax.lax.scan(tile, None, tiles)
        eta = jnp.moveaxis(chunks, 0, 1).reshape(B, Tp)[:, :T]

    return eta[0] if single else eta


def build_eta_batched(freqs_hz, spectral_densities, spectral_widths, phases,
                      wavenumbers, eta_time, ramp_duration=0.0, x_pos=0.0,
                      dtype=jnp.float32, use_pallas=None):
    """Device-side equivalent of the host eta pipeline (waves.py:717-774):
    component amplitudes from the spectrum, superposition, start ramp."""
    amp = jnp.sqrt(2.0 * jnp.asarray(spectral_densities, dtype)
                   * jnp.asarray(spectral_widths, dtype))
    omega = 2.0 * jnp.pi * jnp.asarray(freqs_hz, dtype)
    t = jnp.asarray(eta_time, dtype)
    eta = eta_series_device(t, amp, omega, jnp.asarray(wavenumbers, dtype),
                            jnp.asarray(phases, dtype), x_pos, use_pallas)
    if ramp_duration > 0.0:
        ramp = jnp.clip(t / ramp_duration, 0.0, 1.0)
        ramp = jnp.where(t <= 0.0, 0.0, ramp)
        eta = eta * ramp
    return eta
