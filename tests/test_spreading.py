"""Directional spreading seas (cos-2s), beyond-reference physics.

The reference is strictly unidirectional: wave_types.cpp:20,34 hard-codes
+x propagation and the YAML `direction:` key is parsed and ignored. Here
irregular seas optionally spread energy over headings with the cos-2s
model (Longuet-Higgins 1963): per-heading eta realizations with
independent phases, per-heading resolved excitation kernels, summed at
force level. Energy is conserved exactly (heading weights sum to 1), the
single-direction discretization degenerates bit-exactly to the
unidirectional pipeline, and every execution path (plain scan, blocked,
fused blocked, farm fused) integrates the same forcing.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.physics.system import Body, HydroAttachment, SystemSpec
from hydrochrono_tpu.physics.waves import (
    IrregularWaveParams,
    build_irregular_wave,
    cos2s_headings,
)
from hydrochrono_tpu.stepper import Simulation


def _free_sphere_spec(sphere_h5):
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    return SystemSpec(
        bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -2.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )


def _wave(**kw):
    base = dict(height=2.0, period=8.0, nfrequencies=50, ramp_duration=5.0,
                frequency_max=0.5)
    base.update(kw)
    return IrregularWaveParams(**base)


def test_cos2s_weights_normalize():
    th, w = cos2s_headings(10.0, 9, span_deg=120.0)
    assert th.shape == w.shape == (9,)
    assert abs(w.sum() - 1.0) < 1e-12
    # symmetric and peaked at the mean direction
    assert np.allclose(w, w[::-1])
    assert w[4] == w.max()
    th1, w1 = cos2s_headings(5.0, 1)
    assert th1[0] == 0.0 and w1[0] == 1.0


def test_single_direction_degenerates_exactly(sphere_h5):
    """n_directions=1 must reproduce the unidirectional pipeline
    bit-exactly (same phases, same resolved kernel)."""
    spec = _free_sphere_spec(sphere_h5)
    sim_u = Simulation(spec, dt=0.02, wave=_wave(), duration=20.0)
    sim_d = Simulation(spec, dt=0.02, duration=20.0,
                       wave=_wave(spreading_exponent=4.0, n_directions=1))
    assert sim_d.wave_spread and not sim_u.wave_spread
    n = 300
    _, tu = jax.jit(lambda: sim_u.run(n))()
    _, td = jax.jit(lambda: sim_d.run(n))()
    assert np.array_equal(np.asarray(tu["pos"]), np.asarray(td["pos"]))


def test_energy_conservation(sphere_h5):
    """sum_d Var(eta_d) equals the unidirectional variance: the spreading
    redistributes energy over headings without creating or losing any."""
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    pu = _wave(ramp_duration=0.0)
    pd = _wave(ramp_duration=0.0, spreading_exponent=2.0, n_directions=7,
               spreading_span=150.0, axisymmetric=True)
    du = build_irregular_wave(hydro, pu, 0.02, 400.0)
    dd = build_irregular_wave(hydro, pd, 0.02, 400.0)
    assert dd.eta.shape[0] == 7
    # theoretical variance sum_f S df is identical by construction; compare
    # the realized series energies (different phase sets -> statistical tol)
    vu = np.var(du.eta)
    vd = np.var(dd.eta, axis=-1).sum()
    assert abs(vd - vu) / vu < 0.15
    # exact identity: per-heading amplitude-squared sums match the
    # unidirectional one (a^2/2 summed over f and d)
    au2 = (2.0 * du.spectral_densities * du.spectral_widths).sum()
    ad2 = sum(
        (2.0 * du.spectral_densities * dd.dir_weights[d]
         * du.spectral_widths).sum()
        for d in range(7))
    assert abs(ad2 - au2) < 1e-12 * au2


def test_spreading_excites_sway(sphere_h5):
    """Off-axis headings force sway; the unidirectional sea cannot.
    Heave stays in the same regime (the energy split is heading-only)."""
    spec = _free_sphere_spec(sphere_h5)
    sim_u = Simulation(spec, dt=0.02, wave=_wave(), duration=30.0)
    sim_d = Simulation(
        spec, dt=0.02, duration=30.0,
        wave=_wave(spreading_exponent=2.0, n_directions=5,
                   spreading_span=120.0, axisymmetric=True))
    n = 1200
    _, tu = jax.jit(lambda: sim_u.run(n))()
    _, td = jax.jit(lambda: sim_d.run(n))()
    pu, pdr = np.asarray(tu["pos"]), np.asarray(td["pos"])
    sway_u = np.abs(pu[:, 0, 1]).max()
    sway_d = np.abs(pdr[:, 0, 1]).max()
    assert sway_u < 1e-10  # +x waves never push an axisymmetric body in y
    assert sway_d > 1e-3   # spread seas do
    # heave response magnitude in the same regime
    hu = np.abs(pu[:, 0, 2] + 2.0).max()
    hd = np.abs(pdr[:, 0, 2] + 2.0).max()
    assert 0.2 < hd / hu < 5.0


def test_blocked_matches_plain(sphere_h5):
    """The blocked Hankel excitation path sums headings identically to
    the per-step windowed dot."""
    spec = _free_sphere_spec(sphere_h5)
    wave = _wave(spreading_exponent=3.0, n_directions=5,
                 spreading_span=120.0, axisymmetric=True)
    sim_p = Simulation(spec, dt=0.02, wave=wave, duration=20.0)
    sim_b = Simulation(spec, dt=0.02, wave=wave, duration=20.0,
                       block_size=64)
    n = 320
    _, tp = jax.jit(lambda: sim_p.run(n))()
    _, tb = jax.jit(lambda: sim_b.run(n))()
    assert np.abs(np.asarray(tp["pos"]) - np.asarray(tb["pos"])).max() < 1e-10


def test_farm_fused_spread_matches_xla(tmp_path):
    """Directional seas through the fused farm kernel: the forcing series
    is precomputed upstream, so the kernel path must agree with the XLA
    const-mass path under spreading too."""
    from hydrochrono_tpu.io.synth import write_bemio_h5
    from hydrochrono_tpu.models.builders import sphere_farm
    from hydrochrono_tpu.parallel.sharding import make_batched_states

    path = str(tmp_path / "farm4s.h5")
    write_bemio_h5(path, 4, seed=11, state_space=True,
                   cg_list=[np.array([0.0, 0.0, -2.0])] * 4,
                   cb_list=[np.array([0.0, 0.0, -1.7])] * 4,
                   disp_vol=[261.8] * 4, rirf_tmax=10.0, rirf_steps=201,
                   n_freq=40)
    wave = _wave(spreading_exponent=2.0, n_directions=3,
                 spreading_span=90.0, axisymmetric=True)
    sim = Simulation(sphere_farm(path, nx=2, ny=2), dt=0.02, wave=wave,
                     duration=20.0, radiation="state_space",
                     dtype=jnp.float32, outputs=("pos",))
    assert sim.wave_spread and sim.farm_fused_supported()
    B, n = 2, 24
    states = make_batched_states(sim, B)
    _, tx = jax.vmap(lambda s: sim.run(n, state=s))(states)
    _, tf = sim.run_farm_fused(n, states, interpret=True, subblock=8)
    assert np.abs(np.asarray(tf["pos"]) - np.asarray(tx["pos"])).max() < 1e-4


def test_batched_seeds_spread(sphere_h5):
    """Seed-batched directional seas ([B, D, Neta]): each realization in
    the batch matches its own scalar-seed run exactly (run_batch detects
    the heading axis as unbatched rank)."""
    spec = _free_sphere_spec(sphere_h5)
    kw = dict(spreading_exponent=2.0, n_directions=3, spreading_span=90.0,
              axisymmetric=True)
    sim_b = Simulation(spec, dt=0.02, duration=10.0,
                       wave=_wave(seed=np.array([1, 5]), **kw))
    assert sim_b.params["irr_eta"].ndim == 3
    n = 150
    _, tb = sim_b.run_batch(n, {"irr_eta": sim_b.params["irr_eta"]})
    pb = np.asarray(tb["pos"])
    assert pb.shape[0] == 2
    for i, seed in enumerate((1, 5)):
        sim_s = Simulation(spec, dt=0.02, duration=10.0,
                           wave=_wave(seed=seed, **kw))
        _, ts = jax.jit(lambda s=sim_s: s.run(n))()
        assert np.abs(np.asarray(ts["pos"]) - pb[i]).max() < 1e-12


def test_wavefield_directional(sphere_h5):
    """WaveField composes per-heading components; the elevation at the
    origin equals the sum of the per-heading eta series (past the ramp
    the series and the field use the same phases)."""
    from hydrochrono_tpu.physics.wavefield import WaveField

    spec = _free_sphere_spec(sphere_h5)
    wave = _wave(ramp_duration=0.0, spreading_exponent=2.0,
                 n_directions=5, spreading_span=120.0, axisymmetric=True)
    sim = Simulation(spec, dt=0.02, wave=wave, duration=20.0)
    field = WaveField.from_simulation(sim)
    assert field.components is not None and len(field.components) == 5
    data = sim.irr
    j = 400
    t = float(data.eta_time[j])
    eta_series = float(np.asarray(data.eta)[:, j].sum())
    eta_field = float(np.asarray(field.eta(np.zeros(3), t)))
    assert abs(eta_field - eta_series) < 1e-9 * max(1.0, abs(eta_series))
    # velocity query runs and returns a 3-vector
    v = np.asarray(field.velocity(np.array([0.0, 0.0, -1.0]), t))
    assert v.shape == (3,) and np.isfinite(v).all()


def test_yaml_spreading_block(tmp_path, sphere_h5):
    """The hydro-YAML `spreading:` block reaches IrregularWaveParams."""
    from hydrochrono_tpu.scene.yaml import parse_hydro_file

    hy = tmp_path / "x.hydro.yaml"
    hy.write_text(
        """
hydrodynamics:
  bodies:
    - name: body1
      h5_file: sphere.h5
  waves:
    type: irregular
    height: 2.0
    period: 8.0
    direction: 20.0
    axisymmetric: true
    spreading:
      exponent: 6
      n_directions: 9
      span: 150.0
"""
    )
    hs = parse_hydro_file(str(hy))
    ws = hs.waves
    assert ws.spreading_exponent == 6.0
    assert ws.n_directions == 9 and ws.spreading_span == 150.0
    assert ws.direction == 20.0 and ws.axisymmetric
