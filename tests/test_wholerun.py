"""Whole-run fused ERA kernel (pallas_step.make_fused_wholerun /
stepper.run_fused_era) vs the XLA per-step ERA path.

The whole-run kernel evaluates radiation IN-KERNEL each step from the
shared-pole state (frad = D v + C z, z <- Ad z + Bd v), exactly the model
`Simulation(radiation="era", block_size=None)` integrates through
stepper._step -> era.era_step_fused — so vmap(run) is a bitwise-class
oracle in interpret mode (CPU float64, tol 1e-9). The TPU f32 path is
gated by tools/tpu_golden_gates.py and measured by bench.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hydrochrono_tpu.io.synth import write_bemio_h5
from hydrochrono_tpu.parallel.sharding import make_batched_states
from hydrochrono_tpu.physics.system import (
    Body, HydroAttachment, Joint, SystemSpec, TSDA,
)
from hydrochrono_tpu.physics.waves import IrregularWaveParams
from hydrochrono_tpu.stepper import Simulation


@pytest.fixture(scope="module")
def modal_h5(tmp_path_factory):
    """ERA-fittable (shared-pole) 2-body synthetic BEMIO file."""
    path = str(tmp_path_factory.mktemp("wholerun") / "modal2.h5")
    write_bemio_h5(path, 2, seed=7, shared_modes=2,
                   cg_list=[np.array([0.0, 0.0, -0.7]),
                            np.array([0.0, 0.0, -21.3])],
                   rirf_tmax=1.0, rirf_steps=101)
    return path


def _spec(h5):
    from hydrochrono_tpu.io.bemio import load_bemio_h5

    hydro = load_bemio_h5(h5, num_bodies=2)
    return SystemSpec(
        bodies=[
            Body(name="body1", mass=7.2e5, pos0=(0.0, 0.0, -0.7),
                 inertia=np.diag([2.0e7, 2.1e7, 3.7e7])),
            Body(name="body2", mass=8.8e5, pos0=(0.0, 0.0, -21.3),
                 inertia=np.diag([9.4e7, 9.4e7, 2.8e7])),
        ],
        joints=[Joint("prismatic", 0, 1, location=(0.0, 0.0, -0.7),
                      axis=(0.0, 0.0, 1.0))],
        tsdas=[TSDA(0, 1, (0.0, 0.0, -0.7), (0.0, 0.0, -21.3),
                    spring_coeff=1e4, damping_coeff=1.2e6)],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0, 1]),
        gravity=(0.0, 0.0, -9.81),
    )


def _states(sim, B=2):
    rng = np.random.RandomState(3)
    offs = np.zeros((B, 2, 3))
    offs[:, 0, 2] = rng.uniform(-0.3, 0.3, size=B)
    return make_batched_states(sim, B, pos_offsets=offs)


def _compare(sim, n, B=2, tol=1e-9):
    # sub=2 keeps interpret-mode trace time down (DEVNOTES: unrolled
    # interpret kernels are minutes-slow; tiny configs only)
    states = _states(sim, B)
    _, ref = jax.jit(jax.vmap(lambda s: sim.run(n, state=s)))(states)
    fin, got = sim.run_fused_era(n, states, interpret=True, subblock=2)
    for k in got:
        if k in ref:
            err = float(np.abs(np.asarray(ref[k])
                               - np.asarray(got[k])).max())
            assert err < tol, (k, err)
    # final state consistency (pos/vel/ss all carried through the kernel)
    assert np.abs(np.asarray(fin.pos)
                  - np.asarray(got["pos"][:, -1])).max() < tol
    return fin


def test_wholerun_era_irregular_matches_xla(modal_h5):
    wave = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=60,
                               ramp_duration=2.0)
    sim = Simulation(_spec(modal_h5), dt=0.02, wave=wave, duration=3.0,
                     radiation="era", era_tol=1e-8,
                     outputs=("pos", "quat", "lin_vel", "ang_vel"))
    assert sim.fused_wholerun_supported()
    _compare(sim, 11)       # 5 full chunks + remainder-chunk call


def test_wholerun_era_decay_nowave(modal_h5):
    sim = Simulation(_spec(modal_h5), dt=0.02, radiation="era",
                     era_tol=1e-8, outputs=("pos", "lin_vel"))
    fin = _compare(sim, 8)
    # the ERA state must actually be advancing (nonzero radiation memory)
    assert float(np.abs(np.asarray(fin.ss)).max()) > 0.0


def test_wholerun_era_inner_chunks(modal_h5, monkeypatch):
    # the in-kernel fori_loop over time chunks (inner > 1): dynamic
    # fexc-window loads + traj-window stores — a measured perf dead end
    # at default shapes (kernel docstring) but kept as a knob, so keep
    # the dynamic-indexing path equivalence-gated
    monkeypatch.setenv("HYDROCHRONO_WHOLERUN_INNER", "4")
    sim = Simulation(_spec(modal_h5), dt=0.02, radiation="era",
                     era_tol=1e-8, outputs=("pos", "lin_vel"))
    _compare(sim, 8)        # nchunks=4 -> inner=4 (one grid step)


def test_wholerun_era_hht(modal_h5):
    wave = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=60,
                               ramp_duration=2.0)
    sim = Simulation(_spec(modal_h5), dt=0.02, wave=wave, duration=3.0,
                     radiation="era", era_tol=1e-8, integrator="hht",
                     outputs=("pos", "quat", "lin_vel", "ang_vel"))
    assert sim.fused_wholerun_supported()
    fin = _compare(sim, 8, tol=1e-8)
    assert np.isfinite(np.asarray(fin.hht)).all()


def test_wholerun_era_moored(modal_h5, tmp_path):
    from hydrochrono_tpu.io.bemio import load_bemio_h5
    from hydrochrono_tpu.physics import mooring as moor

    h5 = str(tmp_path / "m1.h5")
    write_bemio_h5(h5, 1, seed=5, shared_modes=2,
                   cg_list=[np.array([0.0, 0.0, -1.0])],
                   rirf_tmax=1.0, rirf_steps=101)
    hydro = load_bemio_h5(h5, num_bodies=1)
    lines = tuple(
        moor.MooringLine(body=0,
                         anchor=(50.0 * np.cos(th), 50.0 * np.sin(th), -30.0),
                         fairlead=(np.cos(th), np.sin(th), -1.5), length=60.0,
                         weight_per_m=300.0, ea=1e8)
        for th in np.linspace(0.0, 2 * np.pi, 2, endpoint=False)
    )
    spec = SystemSpec(
        bodies=[Body("body1", 2.6e5, (0.0, 0.0, -1.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        moorings=moor.MooringSpec(lines=lines),
    )
    sim = Simulation(spec, dt=0.015, radiation="era", era_tol=1e-8,
                     outputs=("pos", "quat"))
    assert sim.fused_wholerun_supported()

    B, n = 2, 8
    rng = np.random.RandomState(1)
    offs = np.zeros((B, 1, 3))
    offs[:, 0, 0] = rng.uniform(-0.5, 0.5, size=B)
    states = make_batched_states(sim, B, pos_offsets=offs)
    _, ref = jax.jit(jax.vmap(lambda s: sim.run(n, state=s)))(states)
    _, got = sim.run_fused_era(n, states, interpret=True, subblock=2)
    for k in got:
        if k in ref:
            err = float(np.abs(np.asarray(ref[k])
                               - np.asarray(got[k])).max())
            assert err < 1e-9, (k, err)


def test_wholerun_gating(modal_h5):
    # convolution radiation -> unsupported
    sim_conv = Simulation(_spec(modal_h5), dt=0.02, block_size=8)
    assert not sim_conv.fused_wholerun_supported()
    # per-instance (batched) eta -> unsupported (falls back to the
    # per-dispatch blocked runner, which streams per-instance forcing)
    wave = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=40,
                               ramp_duration=2.0, seed=(1, 2))
    sim_b = Simulation(_spec(modal_h5), dt=0.02, wave=wave, duration=2.0,
                       radiation="era", era_tol=1e-8)
    if sim_b.params["irr_eta"].ndim > 1:
        assert not sim_b.fused_wholerun_supported()
