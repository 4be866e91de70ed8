"""Public wave-field query API: elevation / particle velocity / acceleration
at arbitrary points and times.

The reference exposes GetEta / GetVelocity / GetAcceleration as public
WaveBase API (wave_types.h:64-76, wave_types.cpp:61-160) and Wheeler
stretching for irregular seas (wave_types.cpp:515-545); in round 2 the
formulas lived in physics/kinematics.py with no user-facing consumer.
WaveField is that consumer surface: build one from a Simulation (or a wave
spec) and query fields batched/jit-safe — used by tools/animate.py's
free-surface + particle overlay and available to users directly.

Beyond-reference: queries honor the wave heading (`direction`), rotating
query positions into the wave frame and particle vectors back out; the
reference hard-codes +x propagation (wave_types.cpp:20,34).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from hydrochrono_tpu.physics import kinematics as kin
from hydrochrono_tpu.physics import waves as wv


@dataclasses.dataclass(frozen=True)
class WaveField:
    """Queryable wave field. kind in {'still', 'regular', 'irregular'}."""

    kind: str
    water_depth: float
    g: float
    direction_deg: float = 0.0
    mwl: float = 0.0
    stretching: bool = False
    # regular
    omega: float = 0.0
    amplitude: float = 0.0
    phase: float = 0.0
    wavenumber: float = 0.0
    # irregular (host float64 arrays)
    freqs_hz: Optional[np.ndarray] = None
    spectral_densities: Optional[np.ndarray] = None
    spectral_widths: Optional[np.ndarray] = None
    phases: Optional[np.ndarray] = None  # [F]
    wavenumbers: Optional[np.ndarray] = None
    # directional seas (cos-2s spreading): the field is the superposition
    # of independent per-heading components; queries sum over them
    components: Optional[tuple] = None  # tuple[WaveField]

    # ------------------------------------------------------------------
    @classmethod
    def from_simulation(cls, sim, seed_index: int = 0) -> "WaveField":
        """Build from a Simulation. For batched-seed sims, `seed_index`
        picks the realization whose phases the queries use."""
        wave = sim.wave
        depth = (float(sim.hydro.hydro.water_depth)
                 if sim.hydro is not None else float("inf"))
        g = float(sim.hydro.hydro.g) if sim.hydro is not None else 9.81
        if isinstance(wave, wv.NoWave) or sim.wave_kind == "NoWave":
            return cls(kind="still", water_depth=depth, g=g)
        if isinstance(wave, wv.RegularWave):
            om = float(np.atleast_1d(np.asarray(wave.omega))[0])
            amp = float(np.atleast_1d(np.asarray(wave.amplitude))[0])
            k = float(wv.compute_wavenumber(om, depth, g))
            return cls(kind="regular", water_depth=depth, g=g,
                       direction_deg=float(np.atleast_1d(np.asarray(
                           getattr(wave, "direction", 0.0)))[0]),
                       omega=om, amplitude=amp, phase=float(wave.phase),
                       wavenumber=k)
        data = getattr(sim, "irr", None)
        if data is None:
            raise ValueError("simulation carries no irregular wave data")
        stretch = bool(getattr(wave, "wave_stretching", False))
        if data.directions is not None:
            ph = np.asarray(data.phases)
            if ph.ndim == 3:  # batched seeds: [B, D, F]
                ph = ph[seed_index]
            return cls._directional(
                depth, g, stretch, np.asarray(data.freqs_hz),
                np.asarray(data.spectral_densities),
                np.asarray(data.spectral_widths),
                ph, np.asarray(data.wavenumbers),
                np.asarray(data.directions), np.asarray(data.dir_weights))
        phases = np.asarray(data.phases)
        if phases.ndim == 2:
            phases = phases[seed_index]
        return cls(
            kind="irregular", water_depth=depth, g=g,
            direction_deg=float(np.atleast_1d(np.asarray(
                           getattr(wave, "direction", 0.0)))[0]),
            stretching=stretch,
            freqs_hz=np.asarray(data.freqs_hz),
            spectral_densities=np.asarray(data.spectral_densities),
            spectral_widths=np.asarray(data.spectral_widths),
            phases=phases,
            wavenumbers=np.asarray(data.wavenumbers),
        )

    @classmethod
    def _directional(cls, depth, g, stretch, freqs, dens, widths,
                     phases, ks, directions, weights) -> "WaveField":
        comps = tuple(
            cls(kind="irregular", water_depth=depth, g=g,
                direction_deg=float(directions[d]), stretching=stretch,
                freqs_hz=freqs, spectral_densities=dens * weights[d],
                spectral_widths=widths, phases=phases[d], wavenumbers=ks)
            for d in range(len(directions))
        )
        return cls(kind="irregular", water_depth=depth, g=g,
                   stretching=stretch, components=comps)

    # ------------------------------------------------------------------
    @classmethod
    def from_results_h5(cls, path: str) -> "WaveField":
        """Rebuild the wave field from an exported results.*.h5 (the
        exporter writes the spectrum/phases/wavenumbers under
        inputs/simulation/waves — beyond-reference; the reference's GUI
        needed the live process for this)."""
        import h5py

        with h5py.File(path, "r") as f:
            gw = f["inputs/simulation/waves"]
            if "irregular" in gw and "directions_deg" in gw["irregular"]:
                gi = gw["irregular"]
                stretch = ("wave_stretching" in gi
                           and bool(np.asarray(gi["wave_stretching"])))
                return cls._directional(
                    float(np.asarray(gi["water_depth"])), 9.81, stretch,
                    np.asarray(gi["frequencies_hz"]),
                    np.asarray(gi["spectral_densities"]),
                    np.asarray(gi["spectral_widths"]),
                    np.asarray(gi["phases"]),
                    np.asarray(gi["wavenumbers"]),
                    np.asarray(gi["directions_deg"]),
                    np.asarray(gi["direction_weights"]))
            if "irregular" in gw and "phases" in gw["irregular"]:
                gi = gw["irregular"]
                return cls(
                    kind="irregular",
                    water_depth=float(np.asarray(gi["water_depth"])),
                    g=9.81,
                    stretching=("wave_stretching" in gi
                                and bool(np.asarray(gi["wave_stretching"]))),
                    direction_deg=float(np.asarray(gi["direction_deg"])),
                    freqs_hz=np.asarray(gi["frequencies_hz"]),
                    spectral_densities=np.asarray(gi["spectral_densities"]),
                    spectral_widths=np.asarray(gi["spectral_widths"]),
                    phases=np.asarray(gi["phases"]),
                    wavenumbers=np.asarray(gi["wavenumbers"]),
                )
            if "regular" in gw:
                gr = gw["regular"]
                return cls(
                    kind="regular",
                    water_depth=float(np.asarray(gr["water_depth"])),
                    g=9.81,
                    direction_deg=float(
                        np.asarray(gr["direction_deg"]).reshape(-1)[0]),
                    omega=float(np.asarray(gr["omega"]).reshape(-1)[0]),
                    amplitude=float(np.asarray(gr["amplitude"]).reshape(-1)[0]),
                    phase=float(np.asarray(gr["phase"])),
                    wavenumber=float(np.asarray(gr["wavenumber"]).reshape(-1)[0]),
                )
        return cls(kind="still", water_depth=float("inf"), g=9.81)

    # ------------------------------------------------------------------
    def _to_wave_frame(self, position):
        """Rotate query points into the +x-propagation wave frame."""
        import jax.numpy as jnp

        if self.direction_deg == 0.0:
            return position
        th = np.deg2rad(self.direction_deg)
        c, s = np.cos(th), np.sin(th)
        x = c * position[..., 0] + s * position[..., 1]
        y = -s * position[..., 0] + c * position[..., 1]
        return jnp.stack([x, y, position[..., 2]], axis=-1)

    def _vec_from_wave_frame(self, vec):
        import jax.numpy as jnp

        if self.direction_deg == 0.0:
            return vec
        th = np.deg2rad(self.direction_deg)
        c, s = np.cos(th), np.sin(th)
        u = c * vec[..., 0] - s * vec[..., 1]
        v = s * vec[..., 0] + c * vec[..., 1]
        return jnp.stack([u, v, vec[..., 2]], axis=-1)

    # ------------------------------------------------------------------
    def eta(self, position, t):
        """Free-surface elevation at [..., 3] points (z ignored), time t."""
        import jax.numpy as jnp

        if self.components:
            out = self.components[0].eta(position, t)
            for c in self.components[1:]:
                out = out + c.eta(position, t)
            return out
        position = jnp.asarray(position, jnp.float64 if _x64() else jnp.float32)
        p = self._to_wave_frame(position)
        if self.kind == "still":
            return jnp.zeros(p.shape[:-1], p.dtype)
        if self.kind == "regular":
            return kin.eta_regular(p, t, self.omega, self.amplitude,
                                   self.phase, self.wavenumber)
        return kin.eta_irregular(
            p, t, _j(self.freqs_hz), _j(self.spectral_densities),
            _j(self.spectral_widths), _j(self.phases), _j(self.wavenumbers))

    def velocity(self, position, t, stretching: Optional[bool] = None):
        """Water particle velocity [..., 3] (GetWaterVelocity parity)."""
        import jax.numpy as jnp

        if self.components:
            out = self.components[0].velocity(position, t, stretching)
            for c in self.components[1:]:
                out = out + c.velocity(position, t, stretching)
            return out
        position = jnp.asarray(position, jnp.float64 if _x64() else jnp.float32)
        p = self._to_wave_frame(position)
        if self.kind == "still":
            return jnp.zeros(p.shape, p.dtype)
        if self.kind == "regular":
            v = kin.water_velocity_regular(
                p, t, self.omega, self.amplitude, self.phase,
                self.wavenumber, self.water_depth, self.mwl)
        else:
            v = kin.water_velocity_irregular(
                p, t, _j(self.freqs_hz), _j(self.spectral_densities),
                _j(self.spectral_widths), _j(self.phases),
                _j(self.wavenumbers), self.water_depth, self.mwl,
                stretching=(self.stretching if stretching is None
                            else stretching))
        return self._vec_from_wave_frame(v)

    def acceleration(self, position, t, stretching: Optional[bool] = None):
        """Water particle acceleration [..., 3] (GetWaterAcceleration)."""
        import jax.numpy as jnp

        if self.components:
            out = self.components[0].acceleration(position, t, stretching)
            for c in self.components[1:]:
                out = out + c.acceleration(position, t, stretching)
            return out
        position = jnp.asarray(position, jnp.float64 if _x64() else jnp.float32)
        p = self._to_wave_frame(position)
        if self.kind == "still":
            return jnp.zeros(p.shape, p.dtype)
        if self.kind == "regular":
            a = kin.water_acceleration_regular(
                p, t, self.omega, self.amplitude, self.phase,
                self.wavenumber, self.water_depth, self.mwl)
        else:
            a = kin.water_acceleration_irregular(
                p, t, _j(self.freqs_hz), _j(self.spectral_densities),
                _j(self.spectral_widths), _j(self.phases),
                _j(self.wavenumbers), self.water_depth, self.mwl,
                stretching=(self.stretching if stretching is None
                            else stretching))
        return self._vec_from_wave_frame(a)


def _x64() -> bool:
    import jax

    return bool(jax.config.jax_enable_x64)


def _j(a):
    import jax.numpy as jnp

    return jnp.asarray(a)
