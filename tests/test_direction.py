"""Direction-resolved wave excitation (beyond-reference).

The reference squeezes the BEMIO wave-direction axis away and hard-codes
+x propagation (h5fileinfo.cpp:262-298, wave_types.cpp:20,34); the YAML
`direction:` key is parsed and silently ignored there. Here it selects /
interpolates the tabulated headings, or rotates the excitation exactly
for axisymmetric bodies — validated by a rotated-frame symmetry oracle.
"""

import dataclasses

import jax
import numpy as np
import pytest

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.physics.system import Body, HydroAttachment, SystemSpec
from hydrochrono_tpu.physics.waves import (
    IrregularWaveParams,
    RegularWave,
    _heading_transform,
    resolve_wave_direction,
)
from hydrochrono_tpu.stepper import Simulation


def _c4_symmetrize(hd):
    """Project the system matrices onto C4 (90-degree) rotational symmetry
    so the dynamics is exactly equivariant under Rz(90): A -> mean_k
    T(90k) A T(90k)^T. The sphere's BEM data satisfies this only to solver
    tolerance; the projection makes the rotation oracle exact."""
    Ts = [_heading_transform(90.0 * k) for k in range(4)]

    def sym(mat):
        return sum(T @ mat @ T.T for T in Ts) / 4.0

    ainf = sym(hd.inf_added_mass)
    rirf = np.stack([sym(hd.rirf[:, :, t]) for t in range(hd.rirf.shape[2])],
                    axis=2)
    klin = np.stack([sym(hd.lin_stiffness[b]) for b in range(hd.num_bodies)])
    return dataclasses.replace(hd, inf_added_mass=ainf, rirf=rirf,
                               lin_stiffness=klin)


@pytest.fixture(scope="module")
def sym_hydro(sphere_h5):
    return _c4_symmetrize(load_bemio_h5(sphere_h5, num_bodies=1))


def _spec(hd, inertia_zsym=True):
    inertia = np.diag([2.1e6, 2.1e6, 1.9e6])  # Rz-equivariant (Ixx = Iyy)
    return SystemSpec(
        bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -1.0),
                     inertia=inertia)],
        hydro=HydroAttachment(hydro=hd, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )


def test_rotated_frame_symmetry_regular(sym_hydro):
    """Simulating heading theta equals rotating the heading-0 solution by
    Rz(theta), for an exactly Rz-equivariant system — the defining
    property of correct direction handling."""
    theta = 90.0
    w0 = RegularWave(amplitude=1.0, omega=0.8)
    wt = RegularWave(amplitude=1.0, omega=0.8, direction=theta,
                     axisymmetric=True)
    n = 400
    sim0 = Simulation(_spec(sym_hydro), dt=0.02, wave=w0,
                      outputs=("pos", "lin_vel", "ang_vel"))
    simt = Simulation(_spec(sym_hydro), dt=0.02, wave=wt,
                      outputs=("pos", "lin_vel", "ang_vel"))
    _, t0 = jax.jit(lambda: sim0.run(n))()
    _, tt = jax.jit(lambda: simt.run(n))()

    T = _heading_transform(theta)[:3, :3]
    for key in ("pos", "lin_vel", "ang_vel"):
        a = np.asarray(t0[key])[:, 0, :]  # [n, 3]
        b = np.asarray(tt[key])[:, 0, :]
        rotated = a @ T.T
        scale = max(1.0, np.abs(a).max())
        assert np.abs(b - rotated).max() / scale < 1e-8, key


def test_rotated_frame_symmetry_irregular(sym_hydro):
    theta = 90.0
    w0 = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=25,
                             ramp_duration=2.0)
    wt = dataclasses.replace(w0, direction=theta, axisymmetric=True)
    n = 300
    sim0 = Simulation(_spec(sym_hydro), dt=0.02, wave=w0, duration=10.0)
    simt = Simulation(_spec(sym_hydro), dt=0.02, wave=wt, duration=10.0)
    _, t0 = jax.jit(lambda: sim0.run(n))()
    _, tt = jax.jit(lambda: simt.run(n))()
    T = _heading_transform(theta)[:3, :3]
    a = np.asarray(t0["pos"])[:, 0, :]
    b = np.asarray(tt["pos"])[:, 0, :]
    assert np.abs(b - a @ T.T).max() / max(1.0, np.abs(a).max()) < 1e-8


def test_direction_30deg_force_ratio(sphere_h5):
    """At heading theta the surge/sway excitation split follows
    (cos, sin) theta for an axisymmetric body."""
    hd = load_bemio_h5(sphere_h5, num_bodies=1)
    hd30 = resolve_wave_direction(hd, 30.0, axisymmetric=True)
    c0 = hd.exc_mag[0, :, 0] * np.exp(1j * hd.exc_phase[0, :, 0])  # [6, F]
    c30 = hd30.exc_mag[0, :, 0] * np.exp(1j * hd30.exc_phase[0, :, 0])
    th = np.deg2rad(30.0)
    np.testing.assert_allclose(c30[0], np.cos(th) * c0[0] - np.sin(th) * c0[1],
                               rtol=0, atol=1e-9 * np.abs(c0[0]).max())
    np.testing.assert_allclose(c30[1], np.sin(th) * c0[0] + np.cos(th) * c0[1],
                               rtol=0, atol=1e-9 * np.abs(c0[0]).max())
    np.testing.assert_allclose(c30[2], c0[2], rtol=1e-12)


def test_direction_interpolation_between_tabulated(sphere_h5):
    """A file tabulating headings {0, 60} resolves 30 deg by complex
    interpolation; endpoints reproduce the tabulated slices exactly."""
    hd = load_bemio_h5(sphere_h5, num_bodies=1)
    rot = _heading_transform(60.0)
    c0 = hd.exc_mag[:, :, 0] * np.exp(1j * hd.exc_phase[:, :, 0])
    c60 = np.einsum("ij,njf->nif", rot, c0)
    mag2 = np.concatenate([hd.exc_mag, np.abs(c60)[:, :, None, :]], axis=2)
    ph2 = np.concatenate([hd.exc_phase, np.angle(c60)[:, :, None, :]], axis=2)
    irf2 = np.concatenate(
        [hd.exc_irf_dir,
         np.einsum("ij,njt->nit", rot, hd.exc_irf)[:, :, None, :]], axis=2)
    hd2 = dataclasses.replace(hd, exc_mag=mag2, exc_phase=ph2,
                              exc_irf_dir=irf2,
                              wave_directions=np.array([0.0, 60.0]))

    r60 = resolve_wave_direction(hd2, 60.0)
    np.testing.assert_allclose(
        r60.exc_mag[:, :, 0], np.abs(c60), rtol=0, atol=1e-12)
    r30 = resolve_wave_direction(hd2, 30.0)
    cmid = 0.5 * c0 + 0.5 * c60
    np.testing.assert_allclose(
        r30.exc_mag[:, :, 0], np.abs(cmid), rtol=1e-9, atol=1e-9)

    with pytest.raises(ValueError, match="not tabulated"):
        resolve_wave_direction(hd2, 120.0)


def test_yaml_direction_plumbs_through(tmp_path, sphere_h5):
    """The YAML `direction:` key reaches the wave model (the reference
    ignores it) and the builder records the divergence warning."""
    import os
    import shutil

    from hydrochrono_tpu.scene.builder import build_case

    src = "/root/reference/tests/regression/run_hydrochrono/iea_sphere/decay/inputs"
    if not os.path.isdir(src):
        pytest.skip("reference case unavailable")
    d = tmp_path / "case"
    shutil.copytree(src, d)
    hy = next(p for p in d.iterdir() if p.name.endswith("hydro.yaml"))
    txt = hy.read_text()
    txt = txt.replace("../../assets/hydroData/iea_sphere.h5", sphere_h5)
    txt = txt.replace(
        "type: still",
        "type: regular\n    height: 1.0\n    period: 8.0\n"
        "    direction: 25.0\n    axisymmetric: true")
    hy.write_text(txt)
    case = build_case(str(d))
    assert float(case.wave.direction) == 25.0
    assert any("direction" in w for w in case.warnings)


def test_excitation_irf_reconstruction(sphere_h5):
    """The frequency->time rebuild reproduces BEMIO's shipped excitation
    IRF (needed because array phasing modifies the spectrum per heading
    and the time-domain kernel must follow)."""
    from hydrochrono_tpu.physics.waves import excitation_irf_from_frequency

    hd = load_bemio_h5(sphere_h5, num_bodies=1)
    Xc = hd.exc_mag[:, :, 0, :] * np.exp(1j * hd.exc_phase[:, :, 0, :])
    K = excitation_irf_from_frequency(Xc, hd.freq_list, hd.exc_irf_time)
    rel = np.linalg.norm(K - hd.exc_irf) / np.linalg.norm(hd.exc_irf)
    assert rel < 0.03
    i = np.unravel_index(np.abs(hd.exc_irf).argmax(), hd.exc_irf.shape)
    assert abs(K[i] - hd.exc_irf[i]) < 5e-3 * abs(hd.exc_irf[i])
    # the roundtrip (time -> frequency -> time) behind the array-phasing
    # residual correction preserves the kernel to band-truncation error
    from hydrochrono_tpu.physics.waves import excitation_freq_from_irf

    Xk = excitation_freq_from_irf(hd.exc_irf, hd.freq_list, hd.exc_irf_time)
    K2 = excitation_irf_from_frequency(Xk, hd.freq_list, hd.exc_irf_time)
    rel2 = np.linalg.norm(K2 - hd.exc_irf) / np.linalg.norm(hd.exc_irf)
    assert rel2 < 0.05


def test_array_phasing_under_rotation(tmp_path):
    """Wide-spacing array phasing: rotating the heading by 90 degrees on a
    2-device array shifts each device's excitation phase by exactly
    -k (d_hat - x_hat) . r_b relative to the rotation-only result."""
    from hydrochrono_tpu.io.synth import write_bemio_h5
    from hydrochrono_tpu.physics.waves import compute_wavenumber

    path = str(tmp_path / "pair.h5")
    write_bemio_h5(path, 2, seed=5,
                   cg_list=[np.array([0.0, 0.0, -2.0])] * 2,
                   cb_list=[np.array([0.0, 0.0, -1.7])] * 2,
                   disp_vol=[261.8] * 2, rirf_tmax=10.0, rirf_steps=201,
                   n_freq=40)
    hd = load_bemio_h5(path, num_bodies=2)
    body_xy = np.array([[0.0, 0.0], [40.0, 0.0]])
    r_norot = resolve_wave_direction(hd, 90.0, axisymmetric=True)
    r_phase = resolve_wave_direction(hd, 90.0, axisymmetric=True,
                                     body_xy=body_xy)
    # magnitudes are untouched by the pure phase factor
    np.testing.assert_allclose(r_phase.exc_mag, r_norot.exc_mag,
                               rtol=1e-12, atol=1e-12)
    # body at the origin: no phase change at all
    dph = r_phase.exc_phase[0] - r_norot.exc_phase[0]
    assert np.abs(np.angle(np.exp(1j * dph))).max() < 1e-12
    # body at (40, 0): d_hat - x_hat = (-1, 1) -> proj = -40
    ks = compute_wavenumber(hd.freq_list, hd.water_depth, hd.g)
    expected = np.angle(np.exp(-1j * ks * (-40.0)))
    dph1 = np.angle(np.exp(1j * (r_phase.exc_phase[1] - r_norot.exc_phase[1])))
    mag1 = r_phase.exc_mag[1]
    big = mag1 > 1e-6 * mag1.max()  # phase is meaningless on ~zero entries
    err = np.abs(np.angle(np.exp(1j * (dph1 - expected[None, None, :]))))
    assert err[big].max() < 1e-9
    # residual formulation: the origin body (proj = 0 -> phase == 1) keeps
    # the rotation-only kernel BIT-exactly; the shifted body's kernel
    # actually moved
    np.testing.assert_array_equal(r_phase.exc_irf[0], r_norot.exc_irf[0])
    assert (np.linalg.norm(r_phase.exc_irf[1] - r_norot.exc_irf[1])
            / np.linalg.norm(r_norot.exc_irf[1])) > 0.1


def test_array_phasing_plumbs_from_simulation(tmp_path):
    """A 2x2 farm at heading 45 integrates with per-device phasing: the
    devices' excitation series are no longer identical up to the rotation
    (they are time-shifted), while heading 0 keeps the origin-referenced
    kernels bit-identical to the body_xy=None build."""
    import jax.numpy as jnp
    from hydrochrono_tpu.io.synth import write_bemio_h5
    from hydrochrono_tpu.models.builders import sphere_farm

    path = str(tmp_path / "farm4p.h5")
    write_bemio_h5(path, 4, seed=9, state_space=True,
                   cg_list=[np.array([0.0, 0.0, -2.0])] * 4,
                   cb_list=[np.array([0.0, 0.0, -1.7])] * 4,
                   disp_vol=[261.8] * 4, rirf_tmax=10.0, rirf_steps=201,
                   n_freq=40)
    wave0 = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=30,
                                ramp_duration=4.0, axisymmetric=True)
    wave45 = dataclasses.replace(wave0, direction=45.0)
    kw = dict(dt=0.02, duration=20.0, radiation="state_space")
    sim0 = Simulation(sphere_farm(path, nx=2, ny=2), wave=wave0, **kw)
    sim45 = Simulation(sphere_farm(path, nx=2, ny=2), wave=wave45, **kw)
    n = 300
    _, t0 = jax.jit(lambda: sim0.run(n))()
    _, t45 = jax.jit(lambda: sim45.run(n))()
    z0 = np.asarray(t0["pos"][..., 2])
    z45 = np.asarray(t45["pos"][..., 2])
    assert np.isfinite(z45).all()
    # heading 45 breaks the heading-0 response pattern (phasing active)
    assert np.abs(z45 - z0).max() > 1e-3


def test_regular_heading_disables_phase_tile(tmp_path):
    """The reference-parity phase quirk (body 1's phases tiled over all
    bodies, wave_types.cpp:323) is kept at the file's own heading but
    disabled for resolved headings — the array phasing IS the per-body
    phase difference."""
    from hydrochrono_tpu.io.synth import write_bemio_h5
    from hydrochrono_tpu.models.builders import sphere_farm

    path = str(tmp_path / "pair2.h5")
    write_bemio_h5(path, 4, seed=3, state_space=True,
                   cg_list=[np.array([0.0, 0.0, -2.0])] * 4,
                   cb_list=[np.array([0.0, 0.0, -1.7])] * 4,
                   disp_vol=[261.8] * 4, rirf_tmax=10.0, rirf_steps=201,
                   n_freq=40)
    kw = dict(dt=0.02, radiation="state_space")
    w0 = RegularWave(amplitude=0.5, omega=0.8)
    w90 = RegularWave(amplitude=0.5, omega=0.8, direction=90.0,
                      axisymmetric=True)
    sim0 = Simulation(sphere_farm(path, nx=2, ny=2), wave=w0, **kw)
    sim90 = Simulation(sphere_farm(path, nx=2, ny=2), wave=w90, **kw)
    p0 = np.asarray(sim0.params["reg_phase"]).reshape(4, 6)
    p90 = np.asarray(sim90.params["reg_phase"]).reshape(4, 6)
    # heading 0: parity tile (all bodies share body 1's phases)
    assert np.array_equal(p0[0], p0[1])
    # heading 90: devices at different y see different plane-wave phases
    assert not np.allclose(p90[0], p90[1])


def test_direction_sweep_batched(sym_hydro):
    """A heading sweep batches per-heading resolved excitations over one
    device program (like period sweeps); on an exactly Rz-equivariant
    system the 90-degree entry is the 0-degree entry rotated."""
    w = RegularWave(amplitude=1.0, omega=0.8,
                    direction=np.array([0.0, 90.0]), axisymmetric=True)
    sim = Simulation(_spec(sym_hydro), dt=0.02, wave=w,
                     outputs=("pos", "lin_vel"))
    assert sim.params["reg_mag"].shape[0] == 2
    n = 300
    batched = {k: sim.params[k] for k in
               ("reg_mag", "reg_phase", "reg_amp", "reg_omega")}
    _, tr = sim.run_batch(n, batched)
    pos = np.asarray(tr["pos"])  # [2, n, 1, 3]
    T = _heading_transform(90.0)[:3, :3]
    a, b = pos[0, :, 0, :], pos[1, :, 0, :]
    assert np.abs(b - a @ T.T).max() / max(1.0, np.abs(a).max()) < 1e-8


def test_yaml_direction_sweep(tmp_path):
    from hydrochrono_tpu.scene.yaml import parse_hydro_file

    hy = tmp_path / "d.hydro.yaml"
    hy.write_text(
        """
hydrodynamics:
  bodies:
    - name: body1
      h5_file: sphere.h5
  waves:
    type: regular
    height: 1.0
    period: 8.0
    axisymmetric: true
    direction:
      linspace: {start: 0.0, stop: 90.0, num: 4}
"""
    )
    ws = parse_hydro_file(str(hy)).waves
    assert ws.is_direction_sweep and not ws.is_sweep
    np.testing.assert_allclose(np.asarray(ws.direction), [0.0, 30.0, 60.0, 90.0])


def test_direction_sweep_true_phases_at_base_heading(tmp_path):
    """Heading sweeps keep TRUE per-body phases at EVERY heading,
    including the file's own: tiling body-1 phases (the reference parity
    quirk) only at d0 would put a spurious jump in the directional RAO
    exactly at the base heading. Found by review; single-heading
    non-sweep runs still keep the quirk for reference parity
    (test_regular_heading_disables_phase_tile)."""
    from hydrochrono_tpu.io.synth import write_bemio_h5
    from hydrochrono_tpu.physics.waves import build_regular_wave

    path = str(tmp_path / "pair3.h5")
    write_bemio_h5(path, 2, seed=3,
                   cg_list=[np.array([0.0, 0.0, -2.0])] * 2,
                   cb_list=[np.array([0.0, 0.0, -1.7])] * 2,
                   disp_vol=[261.8] * 2, rirf_tmax=10.0, rirf_steps=201,
                   n_freq=40)
    hd = load_bemio_h5(path, num_bodies=2)
    # the synthetic file gives every body identical phases; offset body 2
    # so the tile would actually change something
    ph = np.asarray(hd.exc_phase).copy()
    ph[1] += 0.3
    hd = dataclasses.replace(hd, exc_phase=ph)
    spec = SystemSpec(
        bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -2.0)),
                Body(name="body2", mass=261.8e3, pos0=(40.0, 0.0, -2.0))],
        hydro=HydroAttachment(hydro=hd, body_indices=[0, 1]),
        gravity=(0.0, 0.0, -9.81),
    )
    w = RegularWave(amplitude=0.5, omega=0.8,
                    direction=np.array([0.0, 10.0]), axisymmetric=True)
    sim = Simulation(spec, dt=0.02, wave=w)
    p = np.asarray(sim.params["reg_phase"])  # [2, 12]
    p0 = p[0].reshape(2, 6)
    # no tile at the base heading: bodies keep their own file phases
    assert not np.array_equal(p0[0], p0[1])
    # and the d0 entry equals the untiled single-heading build exactly
    w0 = RegularWave(amplitude=0.5, omega=0.8)
    data0 = build_regular_wave(hd, w0, replicate_phase_bug=False)
    np.testing.assert_allclose(p[0], np.asarray(data0.force_phase).reshape(-1),
                               rtol=0, atol=1e-12)


def test_irregular_direction_array_raises(sphere_h5):
    """A direction ARRAY on IrregularWaveParams used to be silently
    ignored (the run proceeded at the file's base heading); it now
    raises. Irregular multi-heading seas use spreading instead."""
    hd = load_bemio_h5(sphere_h5, num_bodies=1)
    w = dataclasses.replace(
        IrregularWaveParams(height=1.0, period=8.0, nfrequencies=10),
        direction=np.array([0.0, 30.0]))
    with pytest.raises(ValueError, match="regular-wave only"):
        Simulation(_spec(hd), dt=0.02, wave=w, duration=10.0)


def test_eta_file_with_spreading_raises(tmp_path, sphere_h5):
    """eta_file + spreading used to silently run unidirectional; the
    contradiction now raises (an imported elevation record cannot carry
    cos-2s heading structure)."""
    hd = load_bemio_h5(sphere_h5, num_bodies=1)
    eta = tmp_path / "eta.txt"
    eta.write_text("".join(f"{0.02 * i:.3f} {0.01 * (i % 5):.3f}\n"
                           for i in range(100)))
    w = dataclasses.replace(
        IrregularWaveParams(height=1.0, period=8.0, nfrequencies=10,
                            spreading_exponent=2.0),
        eta_file_path=str(eta))
    with pytest.raises(ValueError, match="spreading"):
        Simulation(_spec(hd), dt=0.02, wave=w, duration=10.0)


def test_resolve_direction_roundoff_at_table_edges(sphere_h5):
    """A heading a float-roundoff OUTSIDE the tabulated range snaps onto
    the endpoint (review finding: d = -1e-10 passed the range check but
    missed the exact-hit check, and searchsorted's j=0 wrapped i=-1 to
    the LAST heading with a negative interpolation weight)."""
    hd = load_bemio_h5(sphere_h5, num_bodies=1)
    rot = _heading_transform(60.0)
    c0 = hd.exc_mag[:, :, 0] * np.exp(1j * hd.exc_phase[:, :, 0])
    c60 = np.einsum("ij,njf->nif", rot, c0)
    mag2 = np.concatenate([hd.exc_mag, np.abs(c60)[:, :, None, :]], axis=2)
    ph2 = np.concatenate([hd.exc_phase, np.angle(c60)[:, :, None, :]], axis=2)
    irf2 = np.concatenate(
        [hd.exc_irf_dir,
         np.einsum("ij,njt->nit", rot, hd.exc_irf)[:, :, None, :]], axis=2)
    hd2 = dataclasses.replace(hd, exc_mag=mag2, exc_phase=ph2,
                              exc_irf_dir=irf2,
                              wave_directions=np.array([0.0, 60.0]))

    r_lo = resolve_wave_direction(hd2, -1e-10)
    r0 = resolve_wave_direction(hd2, 0.0)
    np.testing.assert_array_equal(r_lo.exc_mag, r0.exc_mag)
    np.testing.assert_array_equal(r_lo.exc_phase, r0.exc_phase)
    r_hi = resolve_wave_direction(hd2, 60.0 + 1e-10)
    r60 = resolve_wave_direction(hd2, 60.0)
    np.testing.assert_array_equal(r_hi.exc_mag, r60.exc_mag)
