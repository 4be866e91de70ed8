"""Checkpoint/resume, guarded execution, profiling breakdown."""

import numpy as np
import pytest

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.physics.system import Body, HydroAttachment, SystemSpec
from hydrochrono_tpu.stepper import Simulation
from hydrochrono_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from hydrochrono_tpu.utils.guards import run_guarded
from hydrochrono_tpu.utils.profiling import component_breakdown


@pytest.fixture(scope="module")
def sphere_sim(sphere_h5):
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    spec = SystemSpec(
        bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -1.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    return Simulation(spec, dt=0.015)


def test_checkpoint_resume_bit_exact(sphere_sim, tmp_path):
    sim = sphere_sim
    n1, n2 = 300, 200
    st_mid, _ = sim.run(n1)
    path = save_checkpoint(str(tmp_path / "ckpt"), st_mid, n1, meta={"case": "sphere"})
    st_loaded, step = load_checkpoint(path)
    assert step == n1
    _, traj_resumed = sim.run(n2, state=st_loaded, start_step=step)
    _, traj_full = sim.run(n1 + n2)
    np.testing.assert_array_equal(
        np.asarray(traj_resumed["pos"]), np.asarray(traj_full["pos"][n1:])
    )


def test_run_guarded_completes(sphere_sim):
    final, traj, report = run_guarded(sphere_sim, 700, chunk=250)
    assert not report.diverged
    assert report.completed_steps == 700
    assert traj["pos"].shape[0] == 700
    # identical to a straight run
    _, ref = sphere_sim.run(700)
    np.testing.assert_array_equal(traj["pos"], np.asarray(ref["pos"]))


def test_run_guarded_detects_divergence(sphere_h5):
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    # negative mass -> guaranteed blow-up
    spec = SystemSpec(
        bodies=[Body(name="body1", mass=-5.0, pos0=(0.0, 0.0, -1.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    sim = Simulation(spec, dt=0.15)
    final, traj, report = run_guarded(sim, 2000, chunk=100)
    assert report.diverged
    assert report.completed_steps < 2000
    assert report.state_dump is not None
    assert "body1" in report.state_dump


def test_checkpointing_during_guarded_run(sphere_sim, tmp_path):
    path = str(tmp_path / "auto")
    final, traj, report = run_guarded(
        sphere_sim, 400, chunk=100, checkpoint_path=path, checkpoint_every=200
    )
    st, step = load_checkpoint(path)
    assert step in (200, 400)


def test_component_breakdown(sphere_sim):
    bd = component_breakdown(sphere_sim, reps=3)
    assert {"hydrostatics", "radiation", "full_step"} <= set(bd)
    assert all(v > 0 for v in bd.values())


def test_log_rotation_and_stats(tmp_path):
    """Size-based log rotation + per-level stats (reference FileBackend's
    max_file_size/max_files + stats, logger_backend.h:39-160)."""
    import os

    from hydrochrono_tpu.utils.logging import Logger, LoggingConfig

    logf = str(tmp_path / "run.log")
    log = Logger(LoggingConfig(log_file=logf, max_bytes=600, backup_count=2),
                 stream=open(os.devnull, "w"))
    for i in range(60):
        log.info(f"message number {i:04d} with some padding text")
    log.warning("one warning")
    st = log.stats()
    assert st["counts"]["info"] == 60 and st["counts"]["warning"] == 1
    log.close()
    import glob

    files = sorted(glob.glob(logf + "*"))
    assert logf in files and len(files) >= 2  # rotated at least once
    for f in files:
        assert os.path.getsize(f) <= 600 + 200  # one line of slack
    # stats footer lands in the final file
    assert "STATS" in open(logf).read()


def test_capture_third_party_channels(tmp_path):
    """Third-party diagnostics land in the unified warnings block
    (reference stream interception, src/utils/logging.cpp:406-541):
    Python warnings, stdlib-logging records, and raw fd-2 writes."""
    import logging as pylog
    import os
    import warnings

    from hydrochrono_tpu.utils.logging import (
        Logger, LoggingConfig, capture_third_party)

    log = Logger(LoggingConfig(), stream=open(os.devnull, "w"))
    prev_filters = warnings.filters[:]
    with capture_third_party(log, stderr_fd=True):
        warnings.warn("era fit went sideways", RuntimeWarning)
        pylog.getLogger("jax._src.xla_bridge").warning("libtpu skew")
        os.write(2, b"E0000 absl-style spew from C++\n")
    joined = "\n".join(log.warnings)
    assert "era fit went sideways" in joined
    assert "libtpu skew" in joined
    assert "[stderr] E0000 absl-style spew" in joined
    # the interpreter's warning filters are restored, not reset
    assert warnings.filters == prev_filters
    # and raw stderr works again after the context
    os.write(2, b"")
