"""Wave-field kinematics queries: elevation, water velocity/acceleration.

Airy (linear) wave kinematics with deep/shallow-water branches and optional
Wheeler stretching for irregular seas — mirroring the reference's
GetEta/GetWaterVelocity/GetWaterAcceleration family
(wave_types.cpp:14-160) and the Wheeler-stretched irregular queries
(wave_types.cpp:515-545). All functions are jit-safe; positions may carry
arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def eta_regular(position, t, omega, amplitude, phase, wavenumber):
    """eta = A cos(k x - w t + phi), wave along +x (wave_types.cpp:14-25)."""
    x = position[..., 0]
    return amplitude * jnp.cos(wavenumber * x - omega * t + phase)


def _deep(wavenumber, water_depth):
    # deep-water branch predicate (wave_types.cpp:76)
    return jnp.logical_or(
        TWO_PI / wavenumber > water_depth, wavenumber * water_depth > 500.0
    )


def water_velocity_regular(position, t, omega, amplitude, phase, wavenumber,
                           water_depth, mwl=0.0):
    """Airy particle velocity (wave_types.cpp:61-91). Returns [..., 3]."""
    x = position[..., 0]
    z = position[..., 2] - mwl
    arg = wavenumber * x - omega * t + phase
    deep = _deep(wavenumber, water_depth)

    decay_deep = jnp.exp(wavenumber * z)
    kd = jnp.minimum(wavenumber * water_depth, 500.0)
    sinh_kd = jnp.sinh(kd)
    cosh_prof = jnp.cosh(jnp.minimum(wavenumber * (z + water_depth), 500.0)) / sinh_kd
    sinh_prof = jnp.sinh(jnp.minimum(wavenumber * (z + water_depth), 500.0)) / sinh_kd

    u = omega * amplitude * jnp.where(deep, decay_deep, cosh_prof) * jnp.cos(arg)
    w = omega * amplitude * jnp.where(deep, decay_deep, sinh_prof) * jnp.sin(arg)
    return jnp.stack([u, jnp.zeros_like(u), w], axis=-1)


def water_acceleration_regular(position, t, omega, amplitude, phase, wavenumber,
                               water_depth, mwl=0.0):
    """Airy particle acceleration (wave_types.cpp:93-122). Returns [..., 3]."""
    x = position[..., 0]
    z = position[..., 2] - mwl
    arg = wavenumber * x - omega * t + phase
    deep = _deep(wavenumber, water_depth)

    decay_deep = jnp.exp(wavenumber * z)
    kd = jnp.minimum(wavenumber * water_depth, 500.0)
    sinh_kd = jnp.sinh(kd)
    cosh_prof = jnp.cosh(jnp.minimum(wavenumber * (z + water_depth), 500.0)) / sinh_kd
    sinh_prof = jnp.sinh(jnp.minimum(wavenumber * (z + water_depth), 500.0)) / sinh_kd

    ax = omega ** 2 * amplitude * jnp.where(deep, decay_deep, cosh_prof) * jnp.sin(arg)
    az = -(omega ** 2) * amplitude * jnp.where(deep, decay_deep, sinh_prof) * jnp.cos(arg)
    return jnp.stack([ax, jnp.zeros_like(ax), az], axis=-1)


def _component_amplitudes(spectral_densities, spectral_widths):
    return jnp.sqrt(2.0 * spectral_densities * spectral_widths)


def eta_irregular(position, t, freqs_hz, spectral_densities, spectral_widths,
                  phases, wavenumbers):
    """Superposed elevation (wave_types.cpp:27-44)."""
    amp = _component_amplitudes(spectral_densities, spectral_widths)
    omega = TWO_PI * freqs_hz
    x = position[..., 0:1]
    arg = wavenumbers * x - omega * t + phases
    return (amp * jnp.cos(arg)).sum(axis=-1)


def wheeler_stretch(position, eta, water_depth, mwl=0.0):
    """Wheeler stretching: remap z so the profile evaluated at the stretched
    coordinate spans [-d, eta] (wave_types.cpp:515-545)."""
    z = position[..., 2] - mwl
    z_s = water_depth * (z - eta) / (water_depth + eta)
    return position.at[..., 2].set(z_s + mwl)


def water_velocity_irregular(position, t, freqs_hz, spectral_densities,
                             spectral_widths, phases, wavenumbers, water_depth,
                             mwl=0.0, stretching=False):
    """Superposed particle velocity, optional Wheeler stretching
    (wave_types.cpp:124-141, 515-529)."""
    if stretching:
        eta = eta_irregular(position, t, freqs_hz, spectral_densities,
                            spectral_widths, phases, wavenumbers)
        position = wheeler_stretch(position, eta[..., None][..., 0], water_depth, mwl)
    amp = _component_amplitudes(spectral_densities, spectral_widths)
    omega = TWO_PI * freqs_hz
    out = 0.0
    # vectorized over components
    import jax

    def one(a, om, ph, k):
        return water_velocity_regular(position, t, om, a, ph, k, water_depth, mwl)

    vels = jax.vmap(one, in_axes=(0, 0, 0, 0))(amp, omega, phases, wavenumbers)
    return vels.sum(axis=0)


def water_acceleration_irregular(position, t, freqs_hz, spectral_densities,
                                 spectral_widths, phases, wavenumbers, water_depth,
                                 mwl=0.0, stretching=False):
    if stretching:
        eta = eta_irregular(position, t, freqs_hz, spectral_densities,
                            spectral_widths, phases, wavenumbers)
        position = wheeler_stretch(position, eta[..., None][..., 0], water_depth, mwl)
    amp = _component_amplitudes(spectral_densities, spectral_widths)
    omega = TWO_PI * freqs_hz
    import jax

    def one(a, om, ph, k):
        return water_acceleration_regular(position, t, om, a, ph, k, water_depth, mwl)

    accs = jax.vmap(one, in_axes=(0, 0, 0, 0))(amp, omega, phases, wavenumbers)
    return accs.sum(axis=0)
