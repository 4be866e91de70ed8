"""End-to-end YAML regression: the run_hydrochrono workflow.

Drives the full CLI pipeline (setup.yaml -> model/simulation/hydro parsing ->
scene build -> scan -> results HDF5 export) on the reference's iea_sphere
decay case and compares against the frozen expected results.still.h5 using
the same signal the reference's signal_adapter.py extracts.
"""

import os
import shutil

import h5py
import numpy as np
import pytest

from hydrochrono_tpu import cli
from hydrochrono_tpu.scene.builder import build_case

REFERENCE = "/root/reference"

CASE_DIR = "/root/reference/tests/regression/run_hydrochrono/iea_sphere/decay/inputs"
EXPECTED = "/root/reference/tests/regression/run_hydrochrono/iea_sphere/decay/expected/results.still.h5"


@pytest.fixture()
def case_copy(tmp_path):
    """Copy the case (inputs + assets) so outputs don't touch /root/reference."""
    if not os.path.isdir(CASE_DIR):
        pytest.skip("iea_sphere case not available")
    root = tmp_path / "iea_sphere"
    shutil.copytree(os.path.dirname(os.path.dirname(CASE_DIR)), root)
    return str(root / "decay" / "inputs")


def test_build_case_parses_everything(case_copy):
    case = build_case(case_copy)
    assert case.dt == 0.01 and case.end_time == 40.0
    assert [b.name for b in case.model.bodies] == ["body1", "ground"]
    assert case.system.bodies[1].fixed
    assert case.model.joints[0].kind == "prismatic"
    assert len(case.model.tsdas) == 1
    assert case.hydro_spec.waves.kind == "still"
    assert tuple(case.simulation.gravity) == (0.0, 0.0, -9.8)


def test_cli_end_to_end_matches_expected(case_copy, tmp_path):
    out_dir = str(tmp_path / "outputs")
    rc = cli.main([case_copy, "--nogui", "--quiet", "--output-h5", out_dir])
    assert rc == 0
    out = os.path.join(out_dir, "results.still.h5")
    assert os.path.exists(out)

    with h5py.File(out) as f, h5py.File(EXPECTED) as ref:
        t = f["results/time/time"][:]
        t_ref = ref["results/time/time"][:]
        n = min(len(t), len(t_ref))
        np.testing.assert_allclose(t[:n], t_ref[:n], atol=1e-9)

        z = f["results/model/bodies/body1/position"][:n, 2]
        z_ref = ref["results/model/bodies/body1/position"][:n, 2]
        diff = z - z_ref
        l2 = np.linalg.norm(diff) / n
        linf = np.abs(diff).max()
        # reference sphere pass criteria (tests/regression/sphere/compare.py:50);
        # the expected data was generated with HHT while we run the linearized
        # implicit Euler — agreement is within the gates, not bit-exact
        assert l2 <= 1e-4, f"L2 {l2}"
        assert linf <= 0.02, f"Linf {linf}"

        # schema v0.3 structure present
        assert f["meta"].attrs["schema_version"] == "0.3"
        for key in (
            "inputs/model/bodies/body1/location",
            "inputs/model/joints/names",
            "inputs/model/tsdas/heave_spring_damper/point1",
            "results/model/bodies/body1/orientation",
            "results/model/bodies/body1/orientation_xyz",
            "results/model/bodies/body1/angular_velocity",
            "results/model/bodies/body1/acceleration",
            "results/model/tsdas/heave_spring_damper/extension",
            "results/model/joints/motion_constraint_heave/reaction1_force",
            "meta/config/simulation_yaml",
        ):
            assert key in f, f"missing {key}"

        # TSDA channels behave: extension tracks |heave - initial|
        ext = f["results/model/tsdas/heave_spring_damper/extension"][:n]
        np.testing.assert_allclose(ext, np.abs(z + 1.0) + 1.0 - 1.0, atol=2e-2)


def test_signal_adapter_compatible(case_copy, tmp_path):
    """The reference's own signal_adapter.py must read our output unchanged."""
    import importlib.util

    out_dir = str(tmp_path / "outputs")
    rc = cli.main([case_copy, "--quiet", "--output-h5", out_dir])
    assert rc == 0
    adapter_path = (
        "/root/reference/tests/regression/run_hydrochrono/iea_sphere/signal_adapter.py"
    )
    spec = importlib.util.spec_from_file_location("signal_adapter", adapter_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from pathlib import Path

    t, sig, label = mod.select_signal(Path(out_dir) / "results.still.h5")
    assert label == "Heave (m)"
    assert len(t) == len(sig) == 4000


def test_schema_structure_matches_reference_oracle(tmp_path):
    """Our results file's group/dataset tree is a superset of the reference's
    own expected results.still.h5 (the one expected file whose source h5
    exists), used as a schema/channel oracle (VERDICT round-1 item 4d)."""
    import h5py

    expected = os.path.join(
        REFERENCE, "tests/regression/run_hydrochrono/iea_sphere/decay/expected",
        "results.still.h5",
    )
    if not os.path.exists(expected):
        pytest.skip("reference expected h5 unavailable")

    case_src = os.path.join(REFERENCE, "tests/regression/run_hydrochrono/iea_sphere")
    root = tmp_path / "iea_sphere"
    shutil.copytree(case_src, root)
    from hydrochrono_tpu import cli

    rc = cli.main([str(root / "decay" / "inputs"), "--quiet",
                   "--output-h5", str(tmp_path / "out")])
    assert rc == 0

    def tree(f):
        out = set()
        f.visititems(lambda name, obj: out.add(
            ("G" if isinstance(obj, h5py.Group) else "D", name)))
        return out

    with h5py.File(expected) as fr, \
            h5py.File(tmp_path / "out" / "results.still.h5") as fg:
        missing = tree(fr) - tree(fg)
    assert not missing, f"schema items in the reference oracle we lack: {missing}"


def test_yaml_eta_file_import(tmp_path):
    """`eta_file` in the hydro YAML (extension; the reference keeps eta
    import C++-API-only, demo_sphere_irreg_waves_eta_import.cpp)."""
    import textwrap

    d = tmp_path / "inputs"
    d.mkdir()
    t = np.arange(-10.0, 30.0, 0.02)
    np.savetxt(d / "eta.txt", np.column_stack([t, 0.5 * np.cos(0.8 * t)]))

    (d / "c.setup.yaml").write_text(textwrap.dedent("""
        model_file: c.model.yaml
        simulation_file: c.simulation.yaml
        hydro_file: c.hydro.yaml
        output_directory: ../outputs
    """))
    (d / "c.model.yaml").write_text(textwrap.dedent("""
        model:
          name: eta_import_case
          bodies:
            - name: body1
              location: [0, 0, -0.7]
              mass: 250000.0
              inertia: {moments: [7.2e6, 7.3e6, 1.2e7], products: [0,0,0]}
    """))
    (d / "c.simulation.yaml").write_text(textwrap.dedent("""
        simulation:
          time_step: 0.02
          end_time: 2.0
          gravity: [0, 0, -9.81]
          integrator: {type: EULER_IMPLICIT_LINEARIZED}
    """))
    h5 = str(tmp_path / "one.h5")
    from hydrochrono_tpu.io.synth import write_bemio_h5

    write_bemio_h5(h5, 1, seed=3, cg_list=[np.array([0.0, 0.0, -0.7])],
                   rirf_tmax=1.0, rirf_steps=51)
    (d / "c.hydro.yaml").write_text(textwrap.dedent(f"""
        hydrodynamics:
          bodies:
            - {{name: body1, h5_file: {h5}}}
          waves:
            type: irregular
            height: 1.0
            period: 8.0
            eta_file: eta.txt
    """))
    rc = cli.main([str(d), "--quiet", "--output-h5", str(tmp_path / "out")])
    assert rc == 0
    with h5py.File(tmp_path / "out" / "results.irregular.h5") as f:
        eta = np.asarray(f["inputs/simulation/waves/irregular/free_surface_eta"])
        z = np.asarray(f["results/model/bodies/body1/position"][:, 2])
    assert abs(eta.max() - 0.5) < 1e-9  # the imported series, not a spectrum
    assert np.isfinite(z).all() and np.ptp(z) > 1e-4  # waves actually force it


def test_cli_seed_sweep(tmp_path):
    """--seeds N runs N irregular realizations batched in one program and
    exports per-seed dirs (beyond-reference: the reference runs one seed
    per process)."""
    import textwrap

    from hydrochrono_tpu.io.synth import write_bemio_h5

    d = tmp_path / "inputs"
    d.mkdir()
    h5 = str(tmp_path / "one.h5")
    write_bemio_h5(h5, 1, seed=3, cg_list=[np.array([0.0, 0.0, -0.7])],
                   rirf_tmax=1.0, rirf_steps=51)
    (d / "c.setup.yaml").write_text(textwrap.dedent("""
        model_file: c.model.yaml
        simulation_file: c.simulation.yaml
        hydro_file: c.hydro.yaml
        output_directory: ../outputs
    """))
    (d / "c.model.yaml").write_text(textwrap.dedent("""
        model:
          name: seed_sweep_case
          bodies:
            - name: body1
              location: [0, 0, -0.7]
              mass: 2.5e5
              inertia: {moments: [1e6, 1e6, 1e6], products: [0, 0, 0]}
    """))
    (d / "c.simulation.yaml").write_text(textwrap.dedent("""
        simulation:
          time_step: 0.02
          end_time: 5.0
          gravity: [0, 0, -9.81]
    """))
    (d / "c.hydro.yaml").write_text(textwrap.dedent(f"""
        hydrodynamics:
          bodies:
            - {{name: body1, h5_file: {h5}}}
          waves:
            type: irregular
            height: 1.5
            period: 7.0
            seed: 10
    """))
    rc = cli.main([str(d), "--quiet", "--seeds", "3",
                   "--output-h5", str(tmp_path / "out")])
    assert rc == 0
    zs, etas = [], []
    for s in (10, 11, 12):  # base seed from the YAML, then +1, +2
        with h5py.File(tmp_path / "out" / f"seed_{s}" / "results.irregular.h5") as f:
            zs.append(np.asarray(f["results/model/bodies/body1/position"][:, 2]))
            etas.append(np.asarray(
                f["inputs/simulation/waves/irregular/free_surface_eta"]))
    zs = np.stack(zs)
    # each per-seed file carries ITS OWN 1-D eta series, not the batch
    assert all(e.ndim == 1 for e in etas)
    assert np.abs(etas[0] - etas[1]).max() > 1e-3
    assert np.isfinite(zs).all()
    # distinct realizations, identical wave statistics family
    assert np.abs(zs[0] - zs[1]).max() > 1e-3
    assert np.abs(zs[1] - zs[2]).max() > 1e-3
    # each realization matches a single-seed run of the same case
    (d / "c.hydro.yaml").write_text(textwrap.dedent(f"""
        hydrodynamics:
          bodies:
            - {{name: body1, h5_file: {h5}}}
          waves:
            type: irregular
            height: 1.5
            period: 7.0
            seed: 11
    """))
    rc = cli.main([str(d), "--quiet", "--output-h5", str(tmp_path / "out1")])
    assert rc == 0
    with h5py.File(tmp_path / "out1" / "results.irregular.h5") as f:
        z1 = np.asarray(f["results/model/bodies/body1/position"][:, 2])
    assert np.abs(z1 - zs[1]).max() < 1e-12


def test_include_flags_applied(case_copy, tmp_path):
    """Per-body include_excitation/include_radiation are APPLIED (the
    reference only parses them, hydro_yaml_parser.cpp:377-380): with
    include_radiation false a decay keeps far more energy (no radiation
    damping), and mask_hydro_bodies zeroes exactly the flagged slices."""
    import jax

    from hydrochrono_tpu.io.bemio import load_bemio_h5, mask_hydro_bodies
    from hydrochrono_tpu.stepper import Simulation

    hydro_yaml = os.path.join(case_copy, "iea_sphere_decay.hydro.yaml")
    with open(hydro_yaml) as f:
        txt = f.read()
    # inject the flag on body1 (the localized case yaml omits it)
    needle = "- name: body1"
    assert needle in txt
    txt = txt.replace(needle, needle + "\n      include_radiation: false")
    with open(hydro_yaml, "w") as f:
        f.write(txt)

    case = build_case(case_copy)
    assert np.all(case.system.hydro.hydro.rirf == 0.0)
    assert case.system.hydro.hydro.radiation_mask is not None

    # direct-API check on the sphere data: no-radiation decay rings on
    h5 = "/root/reference/demos/sphere/hydroData/sphere.h5"
    if os.path.exists(h5):
        from hydrochrono_tpu.physics.system import Body, HydroAttachment, SystemSpec

        hd = load_bemio_h5(h5, 1)
        hd_norad = mask_hydro_bodies(hd, [True], [False])
        assert np.all(hd_norad.rirf == 0.0)
        assert np.all(hd_norad.exc_irf == hd.exc_irf)
        hd_noexc = mask_hydro_bodies(hd, [False], [True])
        assert np.all(hd_noexc.exc_mag == 0.0)
        assert np.all(hd_noexc.exc_irf == 0.0)
        assert np.all(hd_noexc.rirf == hd.rirf)
        # the direction-resolved kernel stays excluded at every heading
        if hd_noexc.exc_irf_dir is not None:
            assert np.all(hd_noexc.exc_irf_dir == 0.0)

        def late_amplitude(h):
            spec = SystemSpec(
                bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -1.0))],
                hydro=HydroAttachment(hydro=h, body_indices=[0]),
                gravity=(0.0, 0.0, -9.81),
            )
            sim = Simulation(spec, dt=0.015, outputs=("pos",))
            _, traj = jax.jit(lambda p: sim.run(2000, params=p))(sim.params)
            z = np.asarray(traj["pos"][:, 0, 2])
            return np.abs(z[1000:] - np.mean(z[1000:])).max()

        a_damped = late_amplitude(hd)
        a_undamped = late_amplitude(hd_norad)
        assert a_undamped > 3.0 * a_damped


def test_include_radiation_honored_on_state_space_path(tmp_path):
    """include_radiation: false must also silence STATE-SPACE radiation:
    the loader re-reads A/B/C/D from the h5, so the stepper re-applies
    the mask's force-row zeroing (review finding — radiation_mask
    previously had no consumer on this path)."""
    import jax
    import numpy as np
    from hydrochrono_tpu.io.bemio import load_bemio_h5, mask_hydro_bodies
    from hydrochrono_tpu.io.synth import write_bemio_h5
    from hydrochrono_tpu.physics.system import Body, HydroAttachment, SystemSpec
    from hydrochrono_tpu.stepper import Simulation

    h5 = str(tmp_path / "ssmask.h5")
    write_bemio_h5(h5, 2, seed=4, state_space=True,
                   cg_list=[np.array([0.0, 0.0, -2.0])] * 2,
                   cb_list=[np.array([0.0, 0.0, -1.7])] * 2,
                   disp_vol=[261.8] * 2, rirf_tmax=10.0, rirf_steps=201,
                   n_freq=40)
    hd = load_bemio_h5(h5, 2)
    hd_m = mask_hydro_bodies(hd, [True, True], [False, True])

    def spec(h):
        return SystemSpec(
            bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -1.5)),
                    Body(name="body2", mass=261.8e3, pos0=(40.0, 0.0, -2.0))],
            hydro=HydroAttachment(hydro=h, body_indices=[0, 1]),
            gravity=(0.0, 0.0, -9.81))

    sim_m = Simulation(spec(hd_m), dt=0.02, radiation="state_space")
    sim_f = Simulation(spec(hd), dt=0.02, radiation="state_space")
    # body-1 force rows of C and D are zeroed; body-2 rows untouched
    C_m = np.asarray(sim_m.params["_const"]["ss_C"])
    D_m = np.asarray(sim_m.params["_const"]["ss_D"])
    assert np.all(C_m[:6] == 0.0) and np.all(D_m[:6] == 0.0)
    assert np.any(C_m[6:] != 0.0)
    # and the body-1 decay keeps more energy than with radiation on
    n = 400
    _, tm = jax.jit(lambda: sim_m.run(n))()
    _, tf = jax.jit(lambda: sim_f.run(n))()
    zm = np.asarray(tm["pos"][:, 0, 2])
    zf = np.asarray(tf["pos"][:, 0, 2])
    assert np.abs(zm - zm.mean())[-100:].max() > np.abs(zf - zf.mean())[-100:].max()



def test_seed_statistics_h5(tmp_path):
    """--seeds writes cross-realization statistics.h5 (per-seed + aggregate
    response std / significant range / PTO power)."""
    import textwrap

    from hydrochrono_tpu.io.synth import write_bemio_h5

    d = tmp_path / "inputs"
    d.mkdir()
    h5 = str(tmp_path / "one.h5")
    write_bemio_h5(h5, 1, seed=3, cg_list=[np.array([0.0, 0.0, -0.7])],
                   rirf_tmax=1.0, rirf_steps=51)
    (d / "c.setup.yaml").write_text(textwrap.dedent("""
        model_file: c.model.yaml
        simulation_file: c.simulation.yaml
        hydro_file: c.hydro.yaml
        output_directory: ../outputs
    """))
    (d / "c.model.yaml").write_text(textwrap.dedent("""
        model:
          name: seed_stats_case
          bodies:
            - name: body1
              location: [0, 0, -0.7]
              mass: 2.5e5
              inertia: {moments: [1e6, 1e6, 1e6], products: [0, 0, 0]}
            - name: ground
              location: [0, 0, -30.0]
              mass: 1.0
              fixed: true
          tsdas:
            - name: pto
              type: TSDA
              body1: body1
              body2: ground
              point1: [0, 0, -0.7]
              point2: [0, 0, -30.0]
              spring_coefficient: 0.0
              damping_coefficient: 1.0e4
    """))
    (d / "c.simulation.yaml").write_text(textwrap.dedent("""
        simulation:
          time_step: 0.02
          end_time: 5.0
          gravity: [0, 0, -9.81]
    """))
    (d / "c.hydro.yaml").write_text(textwrap.dedent(f"""
        hydrodynamics:
          bodies:
            - {{name: body1, h5_file: {h5}}}
          waves:
            type: irregular
            height: 1.5
            period: 7.0
            seed: 10
    """))
    rc = cli.main([str(d), "--quiet", "--seeds", "3",
                   "--output-h5", str(tmp_path / "out")])
    assert rc == 0
    with h5py.File(tmp_path / "out" / "statistics.h5") as f:
        assert list(np.asarray(f["seeds"])) == [10, 11, 12]
        std = np.asarray(f["bodies/body1/position_std"])
        assert std.shape == (3, 3)
        assert (std[:, 2] > 0).all()  # heave responds to the sea
        np.testing.assert_allclose(
            np.asarray(f["bodies/body1/significant_range"]), 4.0 * std)
        power = np.asarray(f["tsda/tsda1/mean_pto_power"])
        assert power.shape == (3,)
        assert (power > 0).all()  # a linear damper only absorbs
        agg = np.asarray(f["aggregate/bodies/body1/position_std/mean"])
        np.testing.assert_allclose(agg, std.mean(axis=0))
