"""WaveField public query API (reference: GetEta/GetWaterVelocity/
GetWaterAcceleration, wave_types.h:64-76, formulas wave_types.cpp:61-160,
Wheeler stretching :515-545)."""

import numpy as np
import pytest

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.physics.system import Body, HydroAttachment, SystemSpec
from hydrochrono_tpu.physics.waves import IrregularWaveParams, RegularWave
from hydrochrono_tpu.stepper import Simulation


def _sim(sphere_h5, wave, **kw):
    hd = load_bemio_h5(sphere_h5, num_bodies=1)
    spec = SystemSpec(
        bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -1.0))],
        hydro=HydroAttachment(hydro=hd, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    return Simulation(spec, dt=0.02, wave=wave, **kw)


def test_eta_matches_precomputed_series(sphere_h5):
    """WaveField.eta at the origin reproduces the eta series the excitation
    convolution was built from (the wave model's own synthesis,
    wave_types.cpp:717-774)."""
    wave = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=30)
    sim = _sim(sphere_h5, wave, duration=10.0)
    wf = sim.wave_field()
    data = sim.irr
    ts = np.asarray(data.eta_time[::37])
    got = np.stack([np.asarray(wf.eta(np.zeros(3), t)) for t in ts])
    want = np.asarray(data.eta)[::37]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_regular_acceleration_is_velocity_rate(sphere_h5):
    """a = du/dt for Airy kinematics (wave_types.cpp:93-122)."""
    wave = RegularWave(amplitude=1.2, omega=0.7)
    wf = _sim(sphere_h5, wave).wave_field()
    p = np.array([3.0, -2.0, -4.0])
    t, h = 5.0, 1e-5
    v0 = np.asarray(wf.velocity(p, t - h))
    v1 = np.asarray(wf.velocity(p, t + h))
    a = np.asarray(wf.acceleration(p, t))
    np.testing.assert_allclose((v1 - v0) / (2 * h), a, rtol=1e-5, atol=1e-8)


def test_velocity_decays_with_depth(sphere_h5):
    wave = RegularWave(amplitude=1.0, omega=0.9)
    wf = _sim(sphere_h5, wave).wave_field()
    ps = np.array([[0.0, 0.0, -1.0], [0.0, 0.0, -10.0], [0.0, 0.0, -40.0]])
    v = np.abs(np.asarray(wf.velocity(ps, 2.0)))
    speed = np.linalg.norm(v, axis=-1)
    assert speed[0] > speed[1] > speed[2]


def test_direction_rotates_particle_velocity(sphere_h5):
    """At heading 90 deg the horizontal particle velocity points along +y
    (beyond-reference: the reference hard-codes +x, wave_types.cpp:20,34)."""
    w0 = RegularWave(amplitude=1.0, omega=0.8)
    w90 = RegularWave(amplitude=1.0, omega=0.8, direction=90.0,
                      axisymmetric=True)
    wf0 = _sim(sphere_h5, w0).wave_field()
    wf90 = _sim(sphere_h5, w90).wave_field()
    p0 = np.array([2.0, 0.0, -3.0])
    p90 = np.array([0.0, 2.0, -3.0])  # the rotated query point
    v0 = np.asarray(wf0.velocity(p0, 3.0))
    v90 = np.asarray(wf90.velocity(p90, 3.0))
    np.testing.assert_allclose(v90[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(v90[1], v0[0], rtol=1e-12)
    np.testing.assert_allclose(v90[2], v0[2], rtol=1e-12)


def test_wheeler_stretching_remaps_profile(sphere_h5):
    """With stretching the velocity at z equals the unstretched velocity
    evaluated at z_s = d (z - eta) / (d + eta) (wave_types.cpp:515-545).
    Needs finite depth — use a shallow synthetic file."""
    from hydrochrono_tpu.io.synth import write_bemio_h5
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        h5 = os.path.join(td, "shallow.h5")
        write_bemio_h5(h5, 1, water_depth=50.0, rirf_tmax=2.0, rirf_steps=81)
        wave = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=15,
                                   wave_stretching=True)
        sim = _sim(h5, wave, duration=6.0)
        wf = sim.wave_field()
        p = np.array([1.0, 0.0, -2.0])
        t = 4.0
        eta = float(np.asarray(wf.eta(p, t)))
        d = wf.water_depth
        z_s = d * (p[2] - eta) / (d + eta)
        v_str = np.asarray(wf.velocity(p, t))
        v_ref = np.asarray(wf.velocity(np.array([1.0, 0.0, z_s]), t,
                                       stretching=False))
        np.testing.assert_allclose(v_str, v_ref, rtol=1e-9, atol=1e-12)


def test_still_water_zeroes(sphere_h5):
    sim = _sim(sphere_h5, None)
    wf = sim.wave_field()
    assert float(np.asarray(wf.eta(np.zeros(3), 1.0))) == 0.0
    assert np.all(np.asarray(wf.velocity(np.zeros(3), 1.0)) == 0.0)


def test_from_results_h5_roundtrip(sphere_h5, tmp_path):
    """WaveField rebuilt from an exported results file matches the live
    simulation's field (the exporter now writes phases/wavenumbers/widths
    — beyond-reference; the reference GUI needed the live process)."""
    import textwrap

    from hydrochrono_tpu import cli
    from hydrochrono_tpu.physics.wavefield import WaveField

    d = tmp_path / "inputs"
    d.mkdir()
    (d / "c.setup.yaml").write_text(
        "model_file: c.model.yaml\nsimulation_file: c.simulation.yaml\n"
        "hydro_file: c.hydro.yaml\noutput_directory: ../outputs\n")
    (d / "c.model.yaml").write_text(textwrap.dedent("""
        model:
          name: wf_case
          bodies:
            - name: body1
              location: [0, 0, -1.0]
              mass: 261.8e3
              inertia: {moments: [1e6, 1e6, 1e6], products: [0, 0, 0]}
    """))
    (d / "c.simulation.yaml").write_text(
        "simulation:\n  time_step: 0.02\n  end_time: 2.0\n"
        "  gravity: [0, 0, -9.81]\n")
    (d / "c.hydro.yaml").write_text(textwrap.dedent(f"""
        hydrodynamics:
          bodies:
            - {{name: body1, h5_file: {sphere_h5}}}
          waves:
            type: irregular
            height: 2.0
            period: 8.0
            nfrequencies: 25
            seed: 4
            wave_stretching: true
    """))
    rc = cli.main([str(d), "--quiet", "--output-h5", str(tmp_path / "out")])
    assert rc == 0
    from hydrochrono_tpu.scene.builder import build_case

    case = build_case(str(d))
    sim = case.build_simulation()
    wf_live = sim.wave_field()
    wf_file = WaveField.from_results_h5(
        str(tmp_path / "out" / "results.irregular.h5"))
    pts = np.array([[0.0, 0.0, 0.0], [5.0, -3.0, -2.0]])
    for t in (1.0, 7.5):
        np.testing.assert_allclose(np.asarray(wf_file.eta(pts, t)),
                                   np.asarray(wf_live.eta(pts, t)),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(wf_file.velocity(pts, t)),
                                   np.asarray(wf_live.velocity(pts, t)),
                                   rtol=1e-9)
    # the stretching flag itself must survive the roundtrip: near-surface
    # kinematics differ when Wheeler stretching is dropped (review finding)
    assert wf_live.stretching and wf_file.stretching


def test_pto_power_peaks_at_rao_optimum(sphere_h5):
    """dP/dc > 0 below the RAO-predicted optimal damping and < 0 above it:
    the gradient (through the full simulation) brackets the closed-form
    c_opt = |B + i(w (m + A) - K/w)| — the optimization target
    examples/optimize_pto.py recovers end-to-end."""
    import importlib.util
    import os

    import jax
    import jax.numpy as jnp

    from hydrochrono_tpu.models.builders import sphere_heave_constrained

    spec_mod = importlib.util.spec_from_file_location(
        "optimize_pto",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "optimize_pto.py"))
    mod = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(mod)

    hd = load_bemio_h5(sphere_h5, num_bodies=1)
    omega = 0.8
    c_opt, A, B, K_hs = mod.theoretical_optimum(hd, 261.8e3, omega)
    assert c_opt > 0 and B > 0

    spec = sphere_heave_constrained(sphere_h5, damping=1.0)
    sim = Simulation(spec, dt=0.02, wave=RegularWave(amplitude=1.0, omega=omega),
                     outputs=("lin_vel",))
    n, settle = 900, 300

    def power(c):
        params = dict(sim.params)
        params["tsda_c"] = jnp.asarray([c])
        _, traj = sim.run(n, params=params)
        return c * jnp.mean(traj["lin_vel"][settle:, 0, 2] ** 2)

    g = jax.grad(power)
    assert float(g(0.5 * c_opt)) > 0
    assert float(g(2.0 * c_opt)) < 0
