"""Blocked far-field convolution path: must match the per-step path exactly
(up to float64 reassociation noise)."""

import numpy as np
import pytest

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.io.synth import write_bemio_h5
from hydrochrono_tpu.physics.system import Body, HydroAttachment, Joint, SystemSpec, TSDA
from hydrochrono_tpu.physics.waves import IrregularWaveParams, RegularWave
from hydrochrono_tpu.stepper import Simulation


def sphere_spec(sphere_h5):
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    return SystemSpec(
        bodies=[Body("body1", 261.8e3, (0.0, 0.0, -1.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )


@pytest.mark.parametrize("block", [16, 128])
def test_blocked_matches_per_step_decay(sphere_h5, block):
    spec = sphere_spec(sphere_h5)
    n = 500
    _, t_ref = Simulation(spec, dt=0.015).run(n)
    _, t_blk = Simulation(spec, dt=0.015, block_size=block,
                          refined_solver=False).run(n)
    np.testing.assert_allclose(
        np.asarray(t_blk["pos"]), np.asarray(t_ref["pos"]), rtol=0, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(t_blk["lin_vel"]), np.asarray(t_ref["lin_vel"]), rtol=0, atol=1e-10
    )


def test_blocked_matches_per_step_many_wraps(tmp_path):
    """Short kernel + many blocks: exercises ring wraparound in blocked mode."""
    path = str(tmp_path / "s.h5")
    write_bemio_h5(path, 1, seed=5, rirf_tmax=1.2, rirf_steps=41)
    hydro = load_bemio_h5(path, 1)
    spec = SystemSpec(
        bodies=[Body("body1", 3e5, tuple(hydro.cg[0] + [0, 0, 0.3]))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    n = 700
    _, t_ref = Simulation(spec, dt=0.05).run(n)
    _, t_blk = Simulation(spec, dt=0.05, block_size=32,
                          refined_solver=False).run(n)
    np.testing.assert_allclose(
        np.asarray(t_blk["pos"]), np.asarray(t_ref["pos"]), rtol=0, atol=1e-9
    )


def test_blocked_irregular_matches(sphere_h5):
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    spec = SystemSpec(
        bodies=[
            Body("body1", 261.8e3, (0.0, 0.0, -2.0)),
            Body("ground", 999.0, (0.0, 0.0, -5.0), fixed=True),
        ],
        joints=[Joint("prismatic", 0, 1, location=(0.0, 0.0, -2.0), axis=(0.0, 0.0, 1.0))],
        tsdas=[TSDA(0, 1, (0.0, 0.0, -2.0), (0.0, 0.0, -5.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    wave = IrregularWaveParams(height=2.0, period=12.0, nfrequencies=300,
                               ramp_duration=20.0)
    n = 600
    _, t_ref = Simulation(spec, dt=0.015, wave=wave, duration=60.0).run(n)
    _, t_blk = Simulation(spec, dt=0.015, wave=wave, duration=60.0,
                          block_size=64, refined_solver=False).run(n)
    np.testing.assert_allclose(
        np.asarray(t_blk["pos"]), np.asarray(t_ref["pos"]), rtol=0, atol=1e-9
    )


def test_blocked_regular_wave_matches(sphere_h5):
    spec = sphere_spec(sphere_h5)
    wave = RegularWave(amplitude=0.5, omega=1.2)
    n = 300
    _, t_ref = Simulation(spec, dt=0.015, wave=wave).run(n)
    _, t_blk = Simulation(spec, dt=0.015, wave=wave, block_size=50,
                          refined_solver=False).run(n)
    np.testing.assert_allclose(
        np.asarray(t_blk["pos"]), np.asarray(t_ref["pos"]), rtol=0, atol=1e-10
    )


def test_refined_solver_converged(sphere_h5):
    """The cached-inverse + refinement solver (default in blocked mode) must
    agree with the exact factorization to well below physical tolerances,
    including under rotation (free body, waves exciting all DoFs)."""
    spec = sphere_spec(sphere_h5)
    wave = RegularWave(amplitude=1.5, omega=1.0)
    n = 600
    _, t_exact = Simulation(spec, dt=0.015, wave=wave, block_size=64,
                            refined_solver=False).run(n)
    _, t_ref = Simulation(spec, dt=0.015, wave=wave, block_size=64,
                          refined_solver=True).run(n)
    np.testing.assert_allclose(
        np.asarray(t_ref["pos"]), np.asarray(t_exact["pos"]), rtol=0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(t_ref["quat"]), np.asarray(t_exact["quat"]), rtol=0, atol=1e-5
    )


def test_blocked_bf16_far_kernel(sphere_h5):
    """bfloat16 far-field kernel: trajectory within mixed-precision tolerance."""
    import jax.numpy as jnp

    spec = sphere_spec(sphere_h5)
    n = 400
    _, t_ref = Simulation(spec, dt=0.015, block_size=64,
                          refined_solver=False, dtype=jnp.float32).run(n)
    _, t_bf = Simulation(spec, dt=0.015, block_size=64, refined_solver=False,
                         dtype=jnp.float32, far_dtype=jnp.bfloat16).run(n)
    np.testing.assert_allclose(
        np.asarray(t_bf["pos"], dtype=np.float64),
        np.asarray(t_ref["pos"], dtype=np.float64),
        rtol=0, atol=5e-3,
    )


def test_blocked_resume_bit_exact(sphere_h5):
    """A blocked run interrupted at a block boundary resumes bit-exactly
    (round-2 fix: blocked mode previously raised for start_step != 0,
    making checkpointing incompatible with the production TPU config)."""
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    spec = SystemSpec(
        bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -1.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    tb = 32
    sim = Simulation(spec, dt=0.015, block_size=tb)
    n = 4 * tb

    _, traj_full = sim.run(n)

    mid = 2 * tb
    st_mid, traj_a = sim.run(mid)
    st_end, traj_b = sim.run(n - mid, state=st_mid, start_step=mid)

    za = np.asarray(traj_a["pos"][:, 0, 2])
    zb = np.asarray(traj_b["pos"][:, 0, 2])
    zf = np.asarray(traj_full["pos"][:, 0, 2])
    np.testing.assert_array_equal(np.concatenate([za, zb]), zf)

    # and through the checkpoint file round-trip
    from hydrochrono_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    p = save_checkpoint("/tmp/hc_tpu_blocked_ck", st_mid, mid)
    st_loaded, step = load_checkpoint(p)
    _, traj_c = sim.run(n - step, state=st_loaded, start_step=step)
    np.testing.assert_array_equal(np.asarray(traj_c["pos"][:, 0, 2]), zb)


def test_blocked_resume_rejects_misaligned(sphere_h5):
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    spec = SystemSpec(
        bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -1.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    sim = Simulation(spec, dt=0.015, block_size=32)
    with pytest.raises(ValueError, match="block boundaries"):
        sim.run(32, state=sim.init_state(), start_step=17)


def test_blocked_hht_resume_bit_exact(sphere_h5):
    """Blocked-HHT resume is bit-exact now that the HHT carry (a_prev,
    f_prev) lives in State.hht (round 3; previously raised
    NotImplementedError). Also checks the checkpoint file round-trip
    preserves the carry."""
    sim = Simulation(sphere_spec(sphere_h5), dt=0.015, block_size=32,
                     integrator="hht")
    n, mid = 4 * 32, 2 * 32

    _, traj_full = sim.run(n)
    st_mid, traj_a = sim.run(mid)
    assert st_mid.hht.shape == (2, sim.nv)
    _, traj_b = sim.run(n - mid, state=st_mid, start_step=mid)

    za = np.asarray(traj_a["pos"][:, 0, 2])
    zb = np.asarray(traj_b["pos"][:, 0, 2])
    zf = np.asarray(traj_full["pos"][:, 0, 2])
    np.testing.assert_array_equal(np.concatenate([za, zb]), zf)

    from hydrochrono_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    p = save_checkpoint("/tmp/hc_tpu_hht_ck", st_mid, mid)
    st_loaded, step = load_checkpoint(p)
    _, traj_c = sim.run(n - step, state=st_loaded, start_step=step)
    np.testing.assert_array_equal(np.asarray(traj_c["pos"][:, 0, 2]), zb)


def test_hht_guarded_chunks_match_unchunked(sphere_h5):
    """run_guarded chunks an HHT run through start_step continuation; with
    the carry in State the chunked trajectory equals the single-shot one
    bit-for-bit (previously each chunk re-initialized a_prev = 0)."""
    from hydrochrono_tpu.utils.guards import run_guarded

    sim = Simulation(sphere_spec(sphere_h5), dt=0.015, block_size=32,
                     integrator="hht")
    n = 4 * 32
    _, traj_full = sim.run(n)
    _, traj_g, report = run_guarded(sim, n, chunk=32)
    assert not report.diverged
    np.testing.assert_array_equal(
        np.asarray(traj_g["pos"][:, 0, 2]),
        np.asarray(traj_full["pos"][:, 0, 2]))
