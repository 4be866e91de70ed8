"""Farm-scale N-body support (SURVEY.md §2.5 TP row): the constant-mass
fast path and state-space radiation at 6N DOFs.

The reference tops out at 3 coupled bodies (F3OF); its 6N added-mass
system assembly (chloadaddedmass.cpp:27-53) is generalized here to
arbitrary N, with the per-step factorization replaced by a precomputed
inverse-apply when M^ is time-invariant (stepper.py const_mass).
"""

import os

import jax
import numpy as np
import pytest

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.io.synth import write_bemio_h5
from hydrochrono_tpu.models.builders import sphere_farm
from hydrochrono_tpu.physics.waves import IrregularWaveParams
from hydrochrono_tpu.stepper import Simulation


@pytest.fixture(scope="module")
def farm4_h5(tmp_path_factory):
    """4 coupled bodies with identical device properties + exact order-2
    state-space radiation fits (the synthetic RIRF is a damped cosine,
    which the modal fit represents exactly — io/synth.py)."""
    path = str(tmp_path_factory.mktemp("farm") / "farm4.h5")
    n = 4
    write_bemio_h5(
        path, n, seed=7, state_space=True,
        cg_list=[np.array([0.0, 0.0, -2.0])] * n,
        cb_list=[np.array([0.0, 0.0, -1.7])] * n,
        disp_vol=[261.8] * n,  # neutral buoyancy at rho=1000, m=261.8e3
        rirf_tmax=10.0, rirf_steps=201, n_freq=40,
    )
    return path


def _farm_sim(h5, *, radiation="convolution", const_mass=None, dt=0.02,
              wave=None, **kw):
    spec = sphere_farm(h5, nx=2, ny=2, spacing=40.0)
    dur = 20.0 if wave is not None else None
    return Simulation(spec, dt=dt, wave=wave, duration=dur,
                      radiation=radiation, const_mass=const_mass, **kw)


def test_const_mass_auto_enables_and_matches_general(farm4_h5):
    """const_mass auto-enables at nv >= 24 for eligible (isotropic, no
    joints) systems, and its trajectory matches the general per-step
    Cholesky path to float64 reassociation noise."""
    wave = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=20,
                               ramp_duration=4.0)
    sim_fast = _farm_sim(farm4_h5, wave=wave)
    assert sim_fast.const_mass  # auto (nv = 24)
    sim_gen = _farm_sim(farm4_h5, wave=wave, const_mass=False)
    assert not sim_gen.const_mass

    n = 200
    _, tf = jax.jit(lambda: sim_fast.run(n))()
    _, tg = jax.jit(lambda: sim_gen.run(n))()
    zf = np.asarray(tf["pos"])
    zg = np.asarray(tg["pos"])
    assert np.isfinite(zf).all()
    assert np.abs(zf - zg).max() < 1e-8


def test_const_mass_hht_matches_general(farm4_h5):
    sim_fast = _farm_sim(farm4_h5, integrator="hht", const_mass=True)
    sim_gen = _farm_sim(farm4_h5, integrator="hht", const_mass=False)
    n = 100
    _, tf = jax.jit(lambda: sim_fast.run(n))()
    _, tg = jax.jit(lambda: sim_gen.run(n))()
    assert np.abs(np.asarray(tf["pos"]) - np.asarray(tg["pos"])).max() < 1e-8


def test_const_mass_rejects_ineligible(farm4_h5):
    # a non-isotropic inertia tensor makes M^ time-varying (R I R^T != I)
    # -> ineligible
    import dataclasses as dc

    spec = sphere_farm(farm4_h5, nx=2, ny=2)
    bodies = [dc.replace(b, inertia=np.diag([1.0e6, 2.0e6, 3.0e6]))
              if not b.fixed else b for b in spec.bodies]
    spec_aniso = dc.replace(spec, bodies=bodies)
    with pytest.raises(ValueError, match="const_mass"):
        Simulation(spec_aniso, dt=0.02, const_mass=True)


def test_const_mass_constrained_matches_general(farm4_h5):
    """Constrained farm (heave-rail prismatic joints, 20 KKT rows at
    nv=24): the host-precomputed-inverse + refined-KKT const-mass path
    matches the general unrolled-Cholesky KKT path. J is configuration-
    independent here, so the refinement is exact."""
    wave = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=20,
                               ramp_duration=4.0)
    spec = sphere_farm(farm4_h5, nx=2, ny=2, heave_only=True)
    kw = dict(dt=0.02, wave=wave, duration=20.0, radiation="convolution")
    sim_fast = Simulation(spec, const_mass=None, **kw)
    assert sim_fast.const_mass and sim_fast.has_constraints
    sim_gen = Simulation(spec, const_mass=False, **kw)

    n = 200
    _, tf = jax.jit(lambda: sim_fast.run(n))()
    _, tg = jax.jit(lambda: sim_gen.run(n))()
    zf, zg = np.asarray(tf["pos"]), np.asarray(tg["pos"])
    assert np.isfinite(zf).all()
    assert np.abs(zf - zg).max() < 1e-8
    # the rail really constrains: no surge/sway drift
    assert np.abs(zf[..., :2] - zf[0, :, :2]).max() < 1e-10


def test_const_mass_constrained_hht_matches_general(farm4_h5):
    spec = sphere_farm(farm4_h5, nx=2, ny=2, heave_only=True)
    sim_fast = Simulation(spec, dt=0.02, integrator="hht", const_mass=True)
    sim_gen = Simulation(spec, dt=0.02, integrator="hht", const_mass=False)
    n = 100
    _, tf = jax.jit(lambda: sim_fast.run(n))()
    _, tg = jax.jit(lambda: sim_gen.run(n))()
    assert np.abs(np.asarray(tf["pos"]) - np.asarray(tg["pos"])).max() < 1e-8


def test_const_mass_constrained_rotating_jacobian(farm4_h5):
    """Spherical-joint farm (pendulum moorings): J depends on the body
    quaternions, so the frozen-at-t0 block inverses are only a
    preconditioner — the refinement must absorb the drift. Swings of
    ~0.7 m; measured convergence: iters 2/4/8 -> 5e-3/1e-4/4e-8 max
    trajectory deviation (each iteration is matvec-only, far cheaper
    than a farm-scale factorization)."""
    from hydrochrono_tpu.physics.system import Joint
    import dataclasses as dc

    spec = sphere_farm(farm4_h5, nx=2, ny=2)
    joints = [Joint("spherical", b, len(spec.bodies) - 1,
                    location=np.asarray(spec.bodies[b].pos0)
                    + np.array([0.0, 0.0, -4.0]))
              for b in range(4)]
    spec = dc.replace(spec, joints=joints)
    kw = dict(dt=0.02, radiation="convolution")
    sim_fast = Simulation(spec, const_mass=True, kkt_refine_iters=8, **kw)
    sim_gen = Simulation(spec, const_mass=False, **kw)

    # kick the farm sideways so the pendulums swing (J drifts from J0)
    st = sim_fast.init_state()
    st = dc.replace(st, lin_vel=st.lin_vel + np.array([0.5, 0.0, 0.0]))
    n = 150
    _, tf = jax.jit(lambda: sim_fast.run(n, state=st))()
    _, tg = jax.jit(lambda: sim_gen.run(n, state=st))()
    zf, zg = np.asarray(tf["pos"]), np.asarray(tg["pos"])
    assert np.isfinite(zf).all()
    swing = np.abs(zf[..., 0] - zf[0, :, 0]).max()
    assert swing > 0.05  # the kick actually rotated the pendulums
    assert np.abs(zf - zg).max() < 1e-6 * max(1.0, swing)


def test_constraint_drift_monitor(farm4_h5):
    """VERDICT r3 weak #5: rotating-J const-mass farms silently carried
    ~5e-3 constraint error at the default kkt_refine_iters=2. The drift
    channel must (a) measure that error, (b) warn through run_guarded,
    (c) shrink with more refinement iterations, and (d) stay at
    stabilization level on the exact (const_mass=False) path."""
    import dataclasses as dc
    import warnings

    from hydrochrono_tpu.physics.system import Joint
    from hydrochrono_tpu.utils.guards import run_guarded

    spec = sphere_farm(farm4_h5, nx=2, ny=2)
    joints = [Joint("spherical", b, len(spec.bodies) - 1,
                    location=np.asarray(spec.bodies[b].pos0)
                    + np.array([0.0, 0.0, -4.0]))
              for b in range(4)]
    spec = dc.replace(spec, joints=joints)
    kw = dict(dt=0.02, radiation="convolution")

    def kicked(sim):
        st = sim.init_state()
        return dc.replace(st, lin_vel=st.lin_vel + np.array([1.0, 0.0, 0.0]))

    # measured levels (kick 1.0 m/s, 1.5 m swings): iters2 2.6e-4,
    # iters4/8 and exact 2.7e-5 — the monitor must resolve that decade
    n = 200
    sim2 = Simulation(spec, const_mass=True, kkt_refine_iters=2, **kw)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        _, traj2, rep2 = run_guarded(sim2, n, state=kicked(sim2), chunk=50,
                                     drift_tol=1e-4)
    assert rep2.max_constraint_drift is not None
    assert rep2.max_constraint_drift > 1e-4  # the silent error, now seen
    assert any("constraint drift" in str(w.message) for w in rec)

    sim8 = Simulation(spec, const_mass=True, kkt_refine_iters=8, **kw)
    _, traj8, rep8 = run_guarded(sim8, n, state=kicked(sim8), chunk=50)
    assert rep8.max_constraint_drift < rep2.max_constraint_drift / 5

    # exact path: drift stays at -c/h stabilization level, not monitored
    sim_gen = Simulation(spec, const_mass=False, **kw)
    _, traj_g = jax.jit(lambda s: sim_gen.run(n, state=s))(kicked(sim_gen))
    dg = sim_gen.constraint_drift(traj_g)
    assert float(np.max(dg)) < 1e-4


def test_farm_state_space_matches_convolution(farm4_h5):
    """With the exact modal fits the state-space path integrates the same
    radiation physics as the convolution; trajectories agree to time-
    discretization error (ZOH vs resampled-kernel quadrature)."""
    wave = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=20,
                               ramp_duration=4.0)
    sim_ss = _farm_sim(farm4_h5, radiation="state_space", wave=wave, dt=0.01)
    sim_cv = _farm_sim(farm4_h5, radiation="convolution", wave=wave, dt=0.01)
    n = 400
    _, ts = jax.jit(lambda: sim_ss.run(n))()
    _, tc = jax.jit(lambda: sim_cv.run(n))()
    zs = np.asarray(ts["pos"][:, :, 2])
    zc = np.asarray(tc["pos"][:, :, 2])
    scale = max(np.abs(zc - zc[0]).max(), 1e-9)
    assert np.abs(zs - zc).max() / scale < 0.05


def test_farm_batched_vmap_runs(farm4_h5):
    """Batched farm instances (sea-state realizations) vmap over the
    const-mass path — the farm production shape."""
    wave = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=20,
                               ramp_duration=4.0)
    sim = _farm_sim(farm4_h5, radiation="state_space", wave=wave)
    assert sim.const_mass
    from hydrochrono_tpu.parallel.sharding import make_batched_states

    B, n = 4, 100
    states = make_batched_states(sim, B)
    _, traj = jax.jit(jax.vmap(lambda s: sim.run(n, state=s)))(states)
    z = np.asarray(traj["pos"])
    assert z.shape[:2] == (B, n)
    assert np.isfinite(z).all()
    # PTO damper extracts energy: late heave motion is bounded
    assert np.abs(z[:, :, :, 2] + 2.0).max() < 5.0


def test_farm_fused_matches_xla(farm4_h5):
    """The fused Pallas farm kernel (ops/pallas_farm.py) reproduces the
    XLA const-mass + state-space path: same forces (hydrostatics via
    Cardan angles, TSDA wrenches, ZOH state-space radiation, streamed
    excitation), one dispatch per sub-block. Interpret mode; float32
    both sides; batch of 3 exercises lane padding and the 42 = 5*8 + 2
    split exercises the remainder kernel."""
    import jax.numpy as jnp
    from hydrochrono_tpu.parallel.sharding import make_batched_states

    wave = IrregularWaveParams(height=1.5, period=7.0, nfrequencies=30,
                               ramp_duration=5.0)
    sim = _farm_sim(farm4_h5, radiation="state_space", wave=wave,
                    dtype=jnp.float32, outputs=("pos",))
    assert sim.farm_fused_supported()

    B, n = 3, 42
    off = np.zeros((B, sim.n_moving, 3))
    off[:, :, 2] = 0.05 * np.arange(B)[:, None]
    states = make_batched_states(sim, B, pos_offsets=off)

    fx, tx = jax.vmap(lambda s: sim.run(n, state=s))(states)
    ff, tf = sim.run_farm_fused(n, states, interpret=True, subblock=8)

    px, pf = np.asarray(tx["pos"]), np.asarray(tf["pos"])
    assert pf.shape == px.shape == (B, n, sim.n_moving, 3)
    assert np.abs(pf - px).max() < 1e-4
    # final carried state (incl. the radiation state tensor) agrees too
    assert np.abs(np.asarray(ff.ss) - np.asarray(fx.ss)).max() < 1e-5
    assert np.abs(np.asarray(ff.quat) - np.asarray(fx.quat)).max() < 1e-5


def test_farm_fused_constrained_matches_xla(farm4_h5):
    """Heave-rail farm through the fused kernel: the constant-J KKT
    (direct cached-inverse solve, linearized Baumgarte residual) matches
    the XLA refined const-mass path."""
    import jax.numpy as jnp
    from hydrochrono_tpu.parallel.sharding import make_batched_states

    wave = IrregularWaveParams(height=1.5, period=7.0, nfrequencies=30,
                               ramp_duration=5.0)
    spec = sphere_farm(farm4_h5, nx=2, ny=2, heave_only=True)
    sim = Simulation(spec, dt=0.02, wave=wave, duration=20.0,
                     radiation="state_space", dtype=jnp.float32,
                     outputs=("pos",))
    assert sim.const_mass and sim.has_constraints
    assert sim.farm_fused_supported()

    B, n = 3, 42
    off = np.zeros((B, sim.n_moving, 3))
    off[:, :, 2] = 0.05 * np.arange(B)[:, None]
    states = make_batched_states(sim, B, pos_offsets=off)

    _, tx = jax.vmap(lambda s: sim.run(n, state=s))(states)
    ff, tf = sim.run_farm_fused(n, states, interpret=True, subblock=8)

    px, pf = np.asarray(tx["pos"]), np.asarray(tf["pos"])
    assert np.abs(pf - px).max() < 1e-4
    # the rail holds in the kernel too: no surge/sway drift
    assert np.abs(pf[..., :2] - pf[:, :1, :, :2]).max() < 1e-4


def test_farm_fused_rejects_unsupported(farm4_h5):
    """Configs outside the farm kernel's contract fall back cleanly."""
    sim = _farm_sim(farm4_h5, radiation="convolution")
    assert not sim.farm_fused_supported()
    sim2 = _farm_sim(farm4_h5, radiation="state_space",
                     integrator="hht")
    assert not sim2.farm_fused_supported()
    # rotating constrained farms (config-dependent J) fall back too
    import dataclasses as dc
    from hydrochrono_tpu.physics.system import Joint

    spec = sphere_farm(farm4_h5, nx=2, ny=2)
    joints = [Joint("spherical", b, len(spec.bodies) - 1,
                    location=np.asarray(spec.bodies[b].pos0)
                    + np.array([0.0, 0.0, -4.0]))
              for b in range(4)]
    import jax.numpy as jnp
    sim3 = Simulation(dc.replace(spec, joints=joints), dt=0.02,
                      radiation="state_space", dtype=jnp.float32,
                      const_mass=True)
    assert not sim3.farm_fused_supported()


@pytest.mark.slow
def test_farm_pto_gradient_matches_fd(farm4_h5):
    """Mean absorbed PTO power differentiates through the farm production
    path (const-mass + state-space, stepper.run) w.r.t. per-device
    damping, matching central finite differences. This is the gradient
    guarantee behind examples/optimize_farm_pto.py — a design loop the
    non-differentiable reference cannot run (PARITY.md)."""
    import jax.numpy as jnp

    wave = IrregularWaveParams(height=1.5, period=7.0, nfrequencies=20,
                               ramp_duration=4.0)
    sim = _farm_sim(farm4_h5, radiation="state_space", const_mass=True,
                    wave=wave, outputs=("lin_vel",))
    assert sim.const_mass
    n, settle = 300, 100

    def neg_power(log_c):
        c = jnp.exp(log_c)
        p = dict(sim.params)
        p["tsda_c"] = c
        _, traj = sim.run(n, params=p)
        vz = traj["lin_vel"][settle:, :, 2]
        return -jnp.mean(jnp.sum(c * vz ** 2, axis=1))

    log_c0 = jnp.log(jnp.full((4,), 5.0e4))
    val, grad = jax.value_and_grad(neg_power)(log_c0)
    assert np.isfinite(val) and np.isfinite(np.asarray(grad)).all()
    assert float(val) < 0.0  # absorbing power

    eps = 1e-5
    for k in (0, 3):
        e = jnp.zeros((4,)).at[k].set(eps)
        fd = (neg_power(log_c0 + e) - neg_power(log_c0 - e)) / (2 * eps)
        np.testing.assert_allclose(float(grad[k]), float(fd), rtol=1e-6)


def test_const_mass_auto_excludes_rotating_joints(farm4_h5):
    """const_mass auto-enables only when the per-step solve stays exact:
    heave rails yes (constant J, covered above), rotating joints NO —
    those would silently swap the exact KKT for the refined solve frozen
    at t=0 (percent-level error at large swings). Rotating-J farms stay
    opt-in via const_mass=True (test_const_mass_constrained_rotating_
    jacobian measures the refinement convergence)."""
    import dataclasses as dc

    from hydrochrono_tpu.physics.system import Joint

    spec = sphere_farm(farm4_h5, nx=2, ny=2)
    joints = [Joint("spherical", b, len(spec.bodies) - 1,
                    location=np.asarray(spec.bodies[b].pos0)
                    + np.array([0.0, 0.0, -4.0]))
              for b in range(4)]
    spec_rot = dc.replace(spec, joints=joints)
    sim = Simulation(spec_rot, dt=0.02)
    assert not sim.const_mass
    # explicit opt-in still allowed (with the iters knob)
    sim2 = Simulation(spec_rot, dt=0.02, const_mass=True)
    assert sim2.const_mass


def test_farm_fused_rejects_modified_baked_params(farm4_h5):
    """run_farm_fused bakes TSDA coefficients/masses into the kernel at
    construction; a params override of a baked key must raise instead of
    silently running with the stale value (review finding — the
    optimize-pto pattern overrides params['tsda_c'])."""
    import jax.numpy as jnp

    from hydrochrono_tpu.parallel.sharding import make_batched_states

    wave = IrregularWaveParams(height=1.5, period=7.0, nfrequencies=10,
                               ramp_duration=4.0)
    sim = _farm_sim(farm4_h5, radiation="state_space", wave=wave,
                    dtype=jnp.float32, outputs=("pos",))
    assert sim.farm_fused_supported()
    states = make_batched_states(sim, 2)
    p = dict(sim.params)
    p["tsda_c"] = sim.params["tsda_c"] * 2.0
    with pytest.raises(ValueError, match="bakes"):
        sim.run_farm_fused(4, states, params=p, interpret=True)
    # an untouched params dict still runs (wave forcing is re-read)
    sim.run_farm_fused(4, states, params=dict(sim.params), interpret=True)
