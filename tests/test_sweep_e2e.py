"""YAML period sweep end-to-end: linspace sweep -> one batched device program
-> per-period results exports -> RAO extraction."""

import os
import sys
import textwrap

import numpy as np
import pytest

from hydrochrono_tpu import cli

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture()
def sweep_case(tmp_path, sphere_h5):
    d = tmp_path / "case"
    d.mkdir()
    (d / "sweep.setup.yaml").write_text(textwrap.dedent("""\
        model_file: sweep.model.yaml
        simulation_file: sweep.simulation.yaml
        hydro_file: sweep.hydro.yaml
        output_directory: outputs
    """))
    (d / "sweep.model.yaml").write_text(textwrap.dedent("""\
        model:
          name: sphere_sweep
          bodies:
            - name: body1
              location: [0, 0, -2.0]
              mass: 261800
            - name: ground
              location: [0, 0, -5.0]
              fixed: true
          joints:
            - name: heave_rail
              type: PRISMATIC
              body1: ground
              body2: body1
              location: [0, 0, -2.0]
              axis: [0, 0, 1]
          tsdas:
            - name: pto
              type: TSDA
              body1: ground
              body2: body1
              point1: [0, 0, -5.0]
              point2: [0, 0, -2.0]
              spring_coefficient: 0
              damping_coefficient: 200000
    """))
    (d / "sweep.simulation.yaml").write_text(textwrap.dedent("""\
        simulation:
          time_step: 0.015
          end_time: 30.0
          gravity: [0, 0, -9.81]
    """))
    (d / "sweep.hydro.yaml").write_text(textwrap.dedent(f"""\
        hydrodynamics:
          bodies:
            - name: body1
              h5_file: {sphere_h5}
          waves:
            type: regular
            height: 0.5
            period:
              linspace:
                start: 4.0
                stop: 12.0
                num: 3
    """))
    return str(d)


def test_sweep_cli_end_to_end(sweep_case, tmp_path):
    out_dir = str(tmp_path / "out")
    rc = cli.main([sweep_case, "--quiet", "--output-h5", out_dir])
    assert rc == 0

    import h5py

    dirs = sorted(os.listdir(out_dir))
    assert [x for x in dirs if x.startswith("period_")] == [
        "period_4", "period_8", "period_12"
    ] or len([x for x in dirs if x.startswith("period_")]) == 3

    # each export is a valid schema-v0.3 file with a distinct response
    finals = []
    for p in dirs:
        if not p.startswith("period_"):
            continue
        f = h5py.File(os.path.join(out_dir, p, "results.regular.h5"))
        z = f["results/model/bodies/body1/position"][:, 2]
        assert np.isfinite(z).all()
        finals.append(z[-200:])
    assert len(finals) == 3
    # different periods -> different steady-state oscillations
    assert np.abs(finals[0] - finals[1]).max() > 1e-4

    # the RAO tool consumes the sweep layout directly
    from rao import rao_from_sweep_dir

    rao, by_heading = rao_from_sweep_dir(out_dir, wave_amplitude=0.25)
    assert rao.shape[0] == 3 and not by_heading
    assert np.isfinite(rao).all()


def test_unknown_wave_type_rejected(tmp_path, sphere_h5):
    """The reference throws on unknown wave types
    (setup_hydro_from_yaml.cpp:77-79); so do we — found by a verification
    probe where 'tsunami' silently ran as still water."""
    import textwrap

    from hydrochrono_tpu.scene.yaml import parse_hydro_file

    p = tmp_path / "bad.hydro.yaml"
    p.write_text(textwrap.dedent(f"""\
        hydrodynamics:
          bodies:
            - name: body1
              h5_file: {sphere_h5}
          waves:
            type: tsunami
    """))
    with pytest.raises(ValueError, match="Unsupported wave type"):
        parse_hydro_file(str(p))


def test_sweep_export_carries_per_case_scalars(sweep_case, tmp_path):
    """Each period_* export holds ITS case's omega (not the whole sweep
    axis): WaveField.from_results_h5 and tools/rao.py read element [0],
    which used to silently give every case the first period's value."""
    import h5py

    out_dir = str(tmp_path / "out")
    rc = cli.main([sweep_case, "--quiet", "--output-h5", out_dir])
    assert rc == 0
    for p in sorted(os.listdir(out_dir)):
        if not p.startswith("period_"):
            continue
        T = float(p.split("_", 1)[1])
        with h5py.File(os.path.join(out_dir, p, "results.regular.h5")) as f:
            om = np.asarray(f["inputs/simulation/waves/regular/omega"])
            assert om.size == 1
            np.testing.assert_allclose(om.reshape(-1)[0], 2.0 * np.pi / T,
                                       rtol=1e-12)


@pytest.fixture()
def heading_sweep_case(tmp_path, sphere_h5):
    d = tmp_path / "hcase"
    d.mkdir()
    (d / "h.setup.yaml").write_text(textwrap.dedent("""\
        model_file: h.model.yaml
        simulation_file: h.simulation.yaml
        hydro_file: h.hydro.yaml
        output_directory: outputs
    """))
    (d / "h.model.yaml").write_text(textwrap.dedent("""\
        model:
          name: sphere_heading
          bodies:
            - name: body1
              location: [0, 0, -2.0]
              mass: 261800
    """))
    (d / "h.simulation.yaml").write_text(textwrap.dedent("""\
        simulation:
          time_step: 0.015
          end_time: 10.0
          gravity: [0, 0, -9.81]
    """))
    (d / "h.hydro.yaml").write_text(textwrap.dedent(f"""\
        hydrodynamics:
          bodies:
            - name: body1
              h5_file: {sphere_h5}
          waves:
            type: regular
            height: 0.5
            period: 8.0
            axisymmetric: true
            direction:
              values: [0.0, 45.0, 90.0]
    """))
    return str(d)


def test_heading_sweep_cli_end_to_end(heading_sweep_case, tmp_path):
    """Heading-sweep CLI run: three direction_* exports, each carrying
    its own scalar direction_deg (review finding: per-case files used to
    hold the FULL sweep axis, so WaveField rebuilt every case at heading
    0). Also pins the fused-path batch-size helper to the direction
    count — on TPU it sized the batch from ws.periods (=1) and crashed
    the export loop."""
    import h5py

    from hydrochrono_tpu.cli import _sweep_batch_size
    from hydrochrono_tpu.scene.yaml import parse_hydro_file

    ws = parse_hydro_file(
        os.path.join(heading_sweep_case, "h.hydro.yaml")).waves
    assert ws.is_direction_sweep and not ws.is_sweep
    assert _sweep_batch_size(ws, None) == 3

    out_dir = str(tmp_path / "out")
    rc = cli.main([heading_sweep_case, "--quiet", "--output-h5", out_dir])
    assert rc == 0
    ddirs = sorted(x for x in os.listdir(out_dir)
                   if x.startswith("direction_"))
    assert len(ddirs) == 3
    for p in ddirs:
        want = float(p.split("_", 1)[1])
        with h5py.File(os.path.join(out_dir, p, "results.regular.h5")) as f:
            dd = np.asarray(f["inputs/simulation/waves/regular/direction_deg"])
            assert dd.size == 1
            np.testing.assert_allclose(dd.reshape(-1)[0], want, atol=1e-12)
            om = np.asarray(f["inputs/simulation/waves/regular/omega"])
            assert om.size == 1
