"""Fused Pallas step kernel (ops/pallas_step.py) vs the XLA reference path.

Everything runs on CPU in float64 via pallas interpret mode, so the fused
math can be compared essentially exactly (1e-9) against the vmapped blocked
stepper — much stronger than tolerance-level f32 checks. The TPU f32 path
itself is exercised by bench.py and tools/tpu_golden_gates.py on hardware.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hydrochrono_tpu.io.synth import write_bemio_h5
from hydrochrono_tpu.ops.pallas_math import asin_tpu, atan2_tpu, atan_tpu
from hydrochrono_tpu.ops.pallas_step import FusedStepBuilder
from hydrochrono_tpu.parallel.sharding import make_batched_states
from hydrochrono_tpu.physics.system import (
    Body, HydroAttachment, Joint, RSDA, SystemSpec, TSDA,
)
from hydrochrono_tpu.physics.waves import IrregularWaveParams, RegularWave
from hydrochrono_tpu.stepper import Simulation


@pytest.fixture(scope="module")
def small_h5(tmp_path_factory):
    """Tiny 2-body synthetic BEMIO file (short kernel keeps compiles fast)."""
    path = str(tmp_path_factory.mktemp("fused") / "small2.h5")
    write_bemio_h5(path, 2, seed=7,
                   cg_list=[np.array([0.0, 0.0, -0.7]), np.array([0.0, 0.0, -21.3])],
                   rirf_tmax=1.0, rirf_steps=101)
    return path


@pytest.fixture(scope="module")
def small_h5_1body(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fused1") / "small1.h5")
    write_bemio_h5(path, 1, seed=9, cg_list=[np.array([0.0, 0.0, -3.9])],
                   rirf_tmax=1.0, rirf_steps=101)
    return path


def _spec_rm3ish(h5):
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


def _spec_revolute_fixed(h5):
    """OSWEC-like: flap on a revolute hinge to a fixed anchored base + RSDA."""
    from hydrochrono_tpu.io.bemio import load_bemio_h5

    hydro = load_bemio_h5(h5, num_bodies=1)
    return SystemSpec(
        bodies=[
            Body(name="body1", mass=1.27e5, pos0=(0.0, 0.0, -3.9),
                 inertia=np.diag([1.85e6, 1.85e6, 1.06e6])),
            Body(name="body2", mass=9.99e5, pos0=(0.0, 0.0, -10.9),
                 inertia=np.diag([1e6, 1e6, 1e6]), fixed=True),
            Body(name="extra", mass=5e4, pos0=(2.0, 0.0, -5.0),
                 inertia=np.diag([1e5, 1e5, 1e5])),
        ],
        joints=[
            Joint("revolute", 0, 1, location=(0.0, 0.0, -8.9),
                  axis=(0.0, 1.0, 0.0)),
            Joint("spherical", 2, 0, location=(1.0, 0.0, -4.5)),
        ],
        rsdas=[RSDA(0, 1, axis=(0.0, 1.0, 0.0), spring_coeff=1e5,
                    damping_coeff=3e5)],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )


def _compare_runs(sim, B=2, n=32, tol=1e-9):
    rng = np.random.RandomState(0)
    offs = np.zeros((B, sim.n_moving, 3))
    offs[:, 0, 2] = rng.uniform(-0.1, 0.1, size=B)
    states = make_batched_states(sim, B, pos_offsets=offs)

    ref_final, ref_traj = jax.jit(jax.vmap(lambda s: sim.run(n, state=s)))(states)
    got_final, got_traj = jax.jit(lambda s: sim.run_blocked_fused(n, s))(states)

    def err(a, b):
        return float(np.abs(np.asarray(a) - np.asarray(b)).max())

    assert err(ref_final.pos, got_final.pos) < tol
    assert err(ref_final.quat, got_final.quat) < tol
    assert err(ref_final.lin_vel, got_final.lin_vel) < tol
    assert err(ref_final.ang_vel, got_final.ang_vel) < tol
    assert err(ref_final.vhist, got_final.vhist) < tol
    for k in ref_traj:
        if k in got_traj:
            scale = max(1.0, float(np.abs(np.asarray(ref_traj[k])).max()))
            assert err(ref_traj[k], got_traj[k]) / scale < tol, k
    return ref_traj, got_traj


def test_fused_rm3ish_irregular(small_h5):
    wave = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=30,
                               ramp_duration=2.0)
    sim = Simulation(_spec_rm3ish(small_h5), dt=0.01, wave=wave, duration=5.0,
                     block_size=8,
                     outputs=("pos", "quat", "lin_vel", "ang_vel", "acc",
                              "lambda", "tsda"))
    _compare_runs(sim)


def test_fused_subblock_kernel_matches(small_h5):
    """The multi-step (sub-block) kernel == the per-step kernel == the
    vmapped XLA path (in-kernel static intra + XLA mid-field split)."""
    wave = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=30,
                               ramp_duration=2.0)
    sim = Simulation(_spec_rm3ish(small_h5), dt=0.01, wave=wave, duration=5.0,
                     block_size=16, outputs=("pos", "lambda", "tsda"))
    B, n = 2, 32
    states = make_batched_states(sim, B)
    ref_final, ref_traj = jax.jit(jax.vmap(lambda s: sim.run(n, state=s)))(states)
    got_final, got_traj = jax.jit(
        lambda s: sim.run_blocked_fused(n, s, subblock=8))(states)
    for k in got_traj:
        if k in ref_traj:
            scale = max(1.0, float(np.abs(np.asarray(ref_traj[k])).max()))
            err = float(np.abs(np.asarray(ref_traj[k])
                               - np.asarray(got_traj[k])).max())
            assert err / scale < 1e-9, k
    assert float(np.abs(np.asarray(ref_final.vhist)
                        - np.asarray(got_final.vhist)).max()) < 1e-9


def test_fused_revolute_fixed_rsda_regular(small_h5_1body):
    wave = RegularWave(amplitude=0.5, omega=1.2)
    sim = Simulation(_spec_revolute_fixed(small_h5_1body), dt=0.01, wave=wave,
                     block_size=8,
                     outputs=("pos", "quat", "lin_vel", "ang_vel", "lambda"))
    _compare_runs(sim)


def test_fused_batched_eta(small_h5):
    """Per-instance sea states: batched params["irr_eta"]."""
    wave = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=30,
                               ramp_duration=2.0)
    sim = Simulation(_spec_rm3ish(small_h5), dt=0.01, wave=wave, duration=5.0,
                     block_size=8, outputs=("pos",))
    B, n = 3, 16
    rng = np.random.RandomState(5)
    eta = sim.params["irr_eta"]
    eta_b = jnp.asarray(
        np.asarray(eta)[None] * rng.uniform(0.5, 1.5, (B, 1)), eta.dtype
    )
    states = make_batched_states(sim, B)

    params_b = dict(sim.params)
    params_b["irr_eta"] = eta_b
    axes = {k: None for k in sim.params}
    axes["irr_eta"] = 0
    ref_final, ref_traj = jax.jit(
        jax.vmap(lambda s, p: sim.run(n, state=s, params=p), in_axes=(0, (axes,)[0]))
    )(states, params_b)
    got_final, got_traj = jax.jit(
        lambda s, p: sim.run_blocked_fused(n, s, params=p)
    )(states, params_b)
    assert float(np.abs(np.asarray(ref_traj["pos"]) -
                        np.asarray(got_traj["pos"])).max()) < 1e-9


def test_fused_analytic_jacobian_matches_jvp(small_h5, small_h5_1body):
    """The kernel's hand-derived constraint Jacobian == the jvp-based one."""
    for spec_fn, h5 in ((_spec_rm3ish, small_h5),
                        (_spec_revolute_fixed, small_h5_1body)):
        sim = Simulation(spec_fn(h5), dt=0.01, block_size=8)
        b = FusedStepBuilder(sim)
        cvec = b.cvec(sim.params)

        rng = np.random.RandomState(3)
        pos = jnp.asarray(
            np.stack([sim.spec.bodies[i].pos0 for i in sim.moving])
            + rng.uniform(-0.05, 0.05, (sim.n_moving, 3)))
        q = np.stack([sim.spec.bodies[i].quat0 for i in sim.moving]) \
            + rng.uniform(-0.05, 0.05, (sim.n_moving, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        quat = jnp.asarray(q)

        const = sim.params["_const"]
        c_ref = np.asarray(sim._constraint_residual(const, pos, quat))
        J_ref = np.asarray(sim._constraint_jacobian(const, pos, quat))

        posl = [[pos[s, k] for k in range(3)] for s in range(sim.n_moving)]
        quatl = [[quat[s, k] for k in range(4)] for s in range(sim.n_moving)]

        def C(i):
            return cvec[i]

        def pose_of(i):
            if i < 0:
                return [0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]
            if sim.spec.bodies[i].fixed:
                o = b._off
                return ([C(o[f"fix{i}_pos"] + k) for k in range(3)],
                        [C(o[f"fix{i}_quat"] + k) for k in range(4)])
            s = sim.slot_of[i]
            return posl[s], quatl[s]

        def slot(i):
            if i < 0 or sim.spec.bodies[i].fixed:
                return None
            return sim.slot_of[i]

        crows, Jrows = b._constraints(C, pose_of, slot)
        c_got = np.array([float(x) for x in crows])
        J_got = np.array([[0.0 if e is None else float(e) for e in row]
                          for row in Jrows])
        assert np.abs(c_got - c_ref).max() < 1e-12
        assert np.abs(J_got - J_ref).max() < 1e-11


def test_fused_gating(small_h5):
    """Unsupported configurations refuse cleanly; supported ones don't."""
    spec = _spec_rm3ish(small_h5)
    sim_unblocked = Simulation(spec, dt=0.01)
    assert not sim_unblocked.fused_supported()

    # round-3: HHT and tabulated TSDA curves run in-kernel now
    sim_hht = Simulation(spec, dt=0.01, block_size=8, integrator="hht")
    assert sim_hht.fused_supported()
    curve = np.array([[-1.0, -100.0], [1.0, 100.0]])
    spec_curve = dataclass_replace_tsda(spec, curve)
    sim_curve = Simulation(spec_curve, dt=0.01, block_size=8)
    assert sim_curve.fused_supported()

    sim_ok = Simulation(spec, dt=0.01, block_size=8)
    assert sim_ok.fused_supported()


def dataclass_replace_tsda(spec, curve):
    import dataclasses

    t = spec.tsdas[0]
    t2 = dataclasses.replace(t, spring_curve=curve)
    return dataclasses.replace(spec, tsdas=[t2])


def test_fused_hht_irregular(small_h5):
    """Fused HHT kernel == the blocked XLA HHT path (the reference's YAML
    integrator, run_hydrochrono_from_yaml.cpp:185-214) incl. acc/lambda/tsda
    channels and the frozen-hydro t+h excitation convention."""
    wave = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=30,
                               ramp_duration=2.0)
    sim = Simulation(_spec_rm3ish(small_h5), dt=0.01, wave=wave, duration=5.0,
                     block_size=8, integrator="hht",
                     outputs=("pos", "quat", "lin_vel", "ang_vel", "acc",
                              "lambda", "tsda"))
    _compare_runs(sim)


def test_fused_hht_subblock_regular(small_h5_1body):
    """HHT through the multi-step sub-block kernel (regular waves, RSDA).

    subblock=4 keeps the interpret-mode trace tractable (the sub-block
    kernel unrolls sub x hht_iterations step bodies); the sub-block
    machinery is sub-generic and the production sub=8 shape is exercised on
    hardware by bench.py / tools/tpu_golden_gates.py."""
    wave = RegularWave(amplitude=0.5, omega=1.2)
    sim = Simulation(_spec_revolute_fixed(small_h5_1body), dt=0.01, wave=wave,
                     block_size=8, integrator="hht",
                     outputs=("pos", "quat", "lambda"))
    B, n = 2, 16
    states = make_batched_states(sim, B)
    ref_final, ref_traj = jax.jit(jax.vmap(lambda s: sim.run(n, state=s)))(states)
    got_final, got_traj = jax.jit(
        lambda s: sim.run_blocked_fused(n, s, subblock=4))(states)
    for k in got_traj:
        if k in ref_traj:
            scale = max(1.0, float(np.abs(np.asarray(ref_traj[k])).max()))
            err = float(np.abs(np.asarray(ref_traj[k])
                               - np.asarray(got_traj[k])).max())
            assert err / scale < 1e-9, k
    assert float(np.abs(np.asarray(ref_final.vhist)
                        - np.asarray(got_final.vhist)).max()) < 1e-9


def test_fused_hht_batched_sweep(small_h5_1body):
    """HHT + per-instance regular-wave sweep params: the initial-carry vmap
    must map batched leaves that live in sim.params (period sweeps are
    stored batched by the builder) — regression for a crash found in review."""
    from hydrochrono_tpu.io.bemio import load_bemio_h5

    hydro = load_bemio_h5(small_h5_1body, num_bodies=1)
    spec = SystemSpec(
        bodies=[Body("body1", 2.5e5, (0.0, 0.0, -3.9)),
                Body("ground", 9.0, (0.0, 0.0, -9.0), fixed=True)],
        joints=[Joint("prismatic", 0, 1, location=(0.0, 0.0, -3.9),
                      axis=(0.0, 0.0, 1.0))],
        tsdas=[TSDA(0, 1, (0.0, 0.0, -3.9), (0.0, 0.0, -9.0),
                    spring_coeff=0.0, damping_coeff=2e5)],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    B = 3
    sim = Simulation(spec, dt=0.015, block_size=8, integrator="hht",
                     wave=RegularWave(amplitude=np.array([0.2, 0.4, 0.6]),
                                      omega=np.array([1.0, 1.5, 2.0])),
                     outputs=("pos",))
    batched = {k: sim.params[k] for k in
               ("reg_mag", "reg_phase", "reg_amp", "reg_omega")}
    n = 16
    _, tr_u = sim.run_batch(n, batched)
    states = make_batched_states(sim, B)
    _, tr_f = jax.jit(lambda s: sim.run_blocked_fused(n, s))(states)
    assert np.abs(np.asarray(tr_u["pos"]) - np.asarray(tr_f["pos"])).max() < 1e-9


def test_fused_curve_gating_duplicate_breakpoints(small_h5):
    """Curves with non-increasing abscissae fall back to the XLA path (the
    unrolled segment interp would divide by zero)."""
    curve = np.array([[0.0, 0.0], [0.0, 1e4], [1.0, 2e4]])
    spec = dataclass_replace_tsda(_spec_rm3ish(small_h5), curve)
    sim = Simulation(spec, dt=0.01, block_size=8)
    assert not sim.fused_supported()


def test_fused_tsda_curves(small_h5):
    """Tabulated nonlinear TSDA curves (rm3_nonlinearPTO.model.yaml) evaluated
    in-kernel from SMEM tables == jnp.interp in the XLA path, including
    out-of-range end clamping."""
    import dataclasses

    spec = _spec_rm3ish(small_h5)
    t = spec.tsdas[0]
    spring = np.array([[-2.0, -4e4], [-1.0, -1.5e4], [0.0, 0.0],
                       [1.0, 1.5e4], [2.0, 4e4]])
    damp = np.array([[-3.0, 3e4], [-1.5, 2e4], [-0.5, 5e3], [0.0, 0.0],
                     [0.5, -5e3], [1.5, -2e4], [3.0, -3e4]])
    t2 = dataclasses.replace(t, spring_curve=spring, damping_curve=damp)
    spec = dataclasses.replace(spec, tsdas=[t2])
    wave = RegularWave(amplitude=1.5, omega=1.0)
    sim = Simulation(spec, dt=0.01, wave=wave, block_size=8,
                     outputs=("pos", "tsda"))
    _compare_runs(sim)


def test_pallas_math_accuracy():
    rng = np.random.RandomState(0)
    x = np.concatenate([rng.uniform(-10, 10, 5000),
                        rng.uniform(-1e-3, 1e-3, 500),
                        [0.0, 1.0, -1.0, 1e9, -1e9]]).astype(np.float32)
    assert np.abs(np.asarray(atan_tpu(jnp.asarray(x)), np.float64)
                  - np.arctan(x.astype(np.float64))).max() < 5e-7
    y = np.concatenate([rng.uniform(-5, 5, 5000), [0, 0, 1, -1, 0]]).astype(np.float32)
    x2 = np.concatenate([rng.uniform(-5, 5, 5000), [1, -1, 0, 0, 0]]).astype(np.float32)
    assert np.abs(np.asarray(atan2_tpu(jnp.asarray(y), jnp.asarray(x2)), np.float64)
                  - np.arctan2(y.astype(np.float64), x2.astype(np.float64))).max() < 7e-7
    s = np.concatenate([rng.uniform(-1, 1, 5000), [-1.0, 1.0, 0.0]]).astype(np.float32)
    assert np.abs(np.asarray(asin_tpu(jnp.asarray(s)), np.float64)
                  - np.arcsin(s.astype(np.float64))).max() < 5e-7


def test_fused_batched_coefficients_and_wave_params(small_h5_1body):
    """Per-instance PTO damping + regular-wave params ride the kernel's
    bvec operand; matches the vmapped XLA sweep path."""
    from hydrochrono_tpu.io.bemio import load_bemio_h5

    hydro = load_bemio_h5(small_h5_1body, num_bodies=1)
    spec = SystemSpec(
        bodies=[Body("body1", 2.5e5, (0.0, 0.0, -3.9)),
                Body("ground", 9.0, (0.0, 0.0, -9.0), fixed=True)],
        joints=[Joint("prismatic", 0, 1, location=(0.0, 0.0, -3.9),
                      axis=(0.0, 0.0, 1.0))],
        tsdas=[TSDA(0, 1, (0.0, 0.0, -3.9), (0.0, 0.0, -9.0),
                    spring_coeff=0.0, damping_coeff=1.0)],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    B = 3
    amps = np.array([0.2, 0.4, 0.6])
    oms = np.array([1.0, 1.5, 2.0])
    damp = np.array([1e5, 2e5, 3e5])
    sim = Simulation(spec, dt=0.015, block_size=8,
                     wave=RegularWave(amplitude=amps, omega=oms),
                     outputs=("pos", "tsda"))
    batched = {k: sim.params[k] for k in
               ("reg_mag", "reg_phase", "reg_amp", "reg_omega")}
    batched["tsda_c"] = jnp.asarray(damp)[:, None]
    n = 24
    _, tr_u = sim.run_batch(n, batched)
    params_b = dict(sim.params)
    params_b.update(batched)
    states = make_batched_states(sim, B)
    _, tr_f = jax.jit(lambda s, p: sim.run_blocked_fused(n, s, params=p))(
        states, params_b)
    assert np.abs(np.asarray(tr_u["pos"]) - np.asarray(tr_f["pos"])).max() < 1e-9
    sc = max(1.0, float(np.abs(np.asarray(tr_u["tsda"])).max()))
    assert np.abs(np.asarray(tr_u["tsda"]) - np.asarray(tr_f["tsda"])).max() / sc < 1e-9


def test_fused_hht_resume(small_h5):
    """run_blocked_fused resumes the HHT integrator from a saved State
    bit-exactly (round 3: the carry rides State.hht through the kernel's
    hc rows; previously raised NotImplementedError)."""
    wave = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=30,
                               ramp_duration=2.0)
    sim = Simulation(_spec_rm3ish(small_h5), dt=0.01, wave=wave, duration=5.0,
                     block_size=8, integrator="hht",
                     outputs=("pos", "quat", "lin_vel", "ang_vel"))
    B, n, mid = 2, 32, 16
    states = make_batched_states(sim, B)
    _, traj_full = jax.jit(lambda s: sim.run_blocked_fused(n, s))(states)
    st_mid, traj_a = jax.jit(lambda s: sim.run_blocked_fused(mid, s))(states)
    assert st_mid.hht.shape == (B, 2, sim.nv)
    _, traj_b = jax.jit(
        lambda s: sim.run_blocked_fused(n - mid, s, start_step=mid))(st_mid)
    za = np.asarray(traj_a["pos"])
    zb = np.asarray(traj_b["pos"])
    zf = np.asarray(traj_full["pos"])
    np.testing.assert_array_equal(np.concatenate([za, zb], axis=1), zf)
