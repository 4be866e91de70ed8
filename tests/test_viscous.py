"""Viscous (Morison-type) per-DOF damping — beyond-reference extension.

Linear BEM radiation underpredicts damping near resonance; WEC-Sim
exposes the same lumped per-DOF model (linear + quadratic drag). The
reference has no equivalent. F_k = -cl_k v_k - cq_k |v_k| v_k in world-
aligned DOFs, on every execution path (XLA scan, fused step kernel,
farm kernel), differentiable, and exposed per hydro body in the YAML
`viscous_damping:` block.
"""

import dataclasses

import jax
import numpy as np
import pytest

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.physics.system import Body, HydroAttachment, SystemSpec
from hydrochrono_tpu.physics.waves import IrregularWaveParams, RegularWave
from hydrochrono_tpu.stepper import Simulation


def test_quadratic_decay_matches_numpy_oracle():
    """Free 1-body fall with quadratic + linear heave drag: the scan
    reproduces an independent numpy mirror of the semi-implicit scheme
    exactly (no hydro, gravity on, terminal-velocity approach)."""
    cq, cl, m, g = 5.0e3, 2.0e2, 261.8e3, 9.81
    spec = SystemSpec(
        bodies=[Body(name="b", mass=m, pos0=(0.0, 0.0, 0.0),
                     quadratic_damping=[0, 0, cq, 0, 0, 0],
                     linear_damping=[0, 0, cl, 0, 0, 0])],
        gravity=(0.0, 0.0, -g),
    )
    dt = 0.01
    sim = Simulation(spec, dt=dt, outputs=("pos", "lin_vel"))
    assert sim.has_viscous
    n = 800
    _, traj = jax.jit(lambda: sim.run(n))()
    vz = np.asarray(traj["lin_vel"][:, 0, 2])

    # numpy mirror: v' = v + h/m (-mg - cl v - cq|v|v), same linearized
    # implicit form reduces to explicit force evaluation at step start
    v = 0.0
    vs = []
    for _ in range(n):
        f = -m * g - cl * v - cq * abs(v) * v
        v = v + dt * f / m
        vs.append(v)
    np.testing.assert_allclose(vz, np.asarray(vs), rtol=1e-9, atol=1e-12)
    # terminal velocity reached: |v_T| = solve cq v^2 + cl v = m g
    vt = (-cl + np.sqrt(cl * cl + 4 * cq * m * g)) / (2 * cq)
    np.testing.assert_allclose(abs(vz[-1]), vt, rtol=5e-3)


def test_viscous_damps_sphere_decay(sphere_h5):
    """Adding heave drag to the reference sphere decay removes energy:
    late-time oscillation amplitude strictly decreases with cq."""
    hd = load_bemio_h5(sphere_h5, num_bodies=1)

    def late_amp(cq):
        b = Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -1.0),
                 quadratic_damping=(
                     [0, 0, cq, 0, 0, 0] if cq else None))
        spec = SystemSpec(bodies=[b],
                          hydro=HydroAttachment(hydro=hd, body_indices=[0]),
                          gravity=(0.0, 0.0, -9.81))
        sim = Simulation(spec, dt=0.015, outputs=("pos",))
        _, tr = jax.jit(lambda: sim.run(1200))()
        z = np.asarray(tr["pos"][:, 0, 2])
        return np.abs(z[600:] - z[600:].mean()).max()

    a0, a1, a2 = late_amp(0.0), late_amp(2.0e4), late_amp(2.0e5)
    assert a0 > a1 > a2


def test_viscous_fused_step_matches_xla(sphere_h5):
    """The fused Pallas step kernel's in-kernel viscous rows match the
    XLA path (interpret mode, f64)."""
    import jax.numpy as jnp

    from hydrochrono_tpu.parallel.sharding import make_batched_states

    hd = load_bemio_h5(sphere_h5, num_bodies=1)
    spec = SystemSpec(
        bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -1.5),
                     linear_damping=[50.0, 0, 1.0e3, 0, 0, 0],
                     quadratic_damping=[0, 0, 5.0e4, 0, 2.0e5, 0])],
        hydro=HydroAttachment(hydro=hd, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    wave = RegularWave(amplitude=0.5, omega=0.8)
    sim = Simulation(spec, dt=0.02, wave=wave, block_size=16,
                     outputs=("pos",))
    assert sim.fused_supported()
    B, n = 2, 32
    states = make_batched_states(sim, B)
    _, tx = jax.vmap(lambda s: sim.run(n, state=s))(states)
    _, tf = sim.run_blocked_fused(n, states, interpret=True)
    np.testing.assert_allclose(np.asarray(tf["pos"]), np.asarray(tx["pos"]),
                               rtol=0, atol=1e-9)


def test_viscous_farm_kernel_matches_xla(tmp_path):
    """The farm kernel's viscous rows match the XLA const-mass path."""
    import jax.numpy as jnp

    from hydrochrono_tpu.io.synth import write_bemio_h5
    from hydrochrono_tpu.models.builders import sphere_farm
    from hydrochrono_tpu.parallel.sharding import make_batched_states

    h5 = str(tmp_path / "farmv.h5")
    write_bemio_h5(h5, 4, seed=7, state_space=True,
                   cg_list=[np.array([0.0, 0.0, -2.0])] * 4,
                   cb_list=[np.array([0.0, 0.0, -1.7])] * 4,
                   disp_vol=[261.8] * 4, rirf_tmax=10.0, rirf_steps=201,
                   n_freq=40)
    wave = IrregularWaveParams(height=1.5, period=7.0, nfrequencies=20,
                               ramp_duration=4.0)
    spec = sphere_farm(h5, nx=2, ny=2)
    bodies = [dataclasses.replace(
        b,
        quadratic_damping=None if b.fixed else [0, 0, 8.0e4, 0, 0, 0],
        linear_damping=None if b.fixed else [0, 0, 2.0e5, 0, 0, 0])
        for b in spec.bodies]
    spec = dataclasses.replace(spec, bodies=bodies)
    sim = Simulation(spec, dt=0.02, wave=wave, duration=10.0,
                     radiation="state_space", dtype=jnp.float32,
                     outputs=("pos",))
    assert sim.has_viscous and sim.farm_fused_supported()
    B, n = 2, 24
    states = make_batched_states(sim, B)
    _, tx = jax.vmap(lambda s: sim.run(n, state=s))(states)
    _, tf = sim.run_farm_fused(n, states, interpret=True, subblock=8)
    np.testing.assert_allclose(np.asarray(tf["pos"]), np.asarray(tx["pos"]),
                               rtol=0, atol=1e-4)
    # drag actually engaged: the undamped farm responds more
    spec0 = sphere_farm(h5, nx=2, ny=2)
    sim0 = Simulation(spec0, dt=0.02, wave=wave, duration=10.0,
                      radiation="state_space", dtype=jnp.float32,
                      outputs=("pos",))
    _, t0 = jax.vmap(lambda s: sim0.run(n, state=s))(
        make_batched_states(sim0, B))
    assert not np.allclose(np.asarray(t0["pos"]), np.asarray(tx["pos"]))


def test_viscous_yaml_surface(tmp_path, sphere_h5):
    """The hydro-YAML viscous_damping block reaches the Body spec and the
    divergence warning is recorded."""
    import textwrap

    from hydrochrono_tpu.scene.builder import build_case

    d = tmp_path / "case"
    d.mkdir()
    (d / "v.setup.yaml").write_text(
        "model_file: v.model.yaml\nsimulation_file: v.simulation.yaml\n"
        "hydro_file: v.hydro.yaml\n")
    (d / "v.model.yaml").write_text(textwrap.dedent("""
        model:
          name: visc
          bodies:
            - name: body1
              location: [0, 0, -1.0]
              mass: 261800
    """))
    (d / "v.simulation.yaml").write_text(
        "simulation:\n  time_step: 0.02\n  end_time: 2.0\n"
        "  gravity: [0, 0, -9.81]\n")
    (d / "v.hydro.yaml").write_text(textwrap.dedent(f"""
        hydrodynamics:
          bodies:
            - name: body1
              h5_file: {sphere_h5}
              viscous_damping:
                linear: [0, 0, 100.0, 0, 0, 0]
                quadratic: [0, 0, 5.0e4, 0, 0, 0]
          waves:
            type: still
    """))
    case = build_case(str(d))
    b = case.system.bodies[0]
    np.testing.assert_allclose(np.asarray(b.quadratic_damping)[2], 5.0e4)
    np.testing.assert_allclose(np.asarray(b.linear_damping)[2], 100.0)
    assert any("viscous" in w for w in case.warnings)
    sim = case.build_simulation()
    assert sim.has_viscous


def test_viscous_gradient_flows(sphere_h5):
    """d(response)/d(cq) through the scan: drag coefficients are tunable
    design parameters (e.g. calibrating cq against decay experiments)."""
    import jax.numpy as jnp

    hd = load_bemio_h5(sphere_h5, num_bodies=1)
    spec = SystemSpec(
        bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -1.0),
                     quadratic_damping=[0, 0, 1.0e4, 0, 0, 0])],
        hydro=HydroAttachment(hydro=hd, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    sim = Simulation(spec, dt=0.015, outputs=("pos",))
    n = 300

    def late_energy(log_cq):
        p = dict(sim.params)
        p["visc_quad"] = jnp.zeros((1, 6)).at[0, 2].set(jnp.exp(log_cq))
        _, tr = sim.run(n, params=p)
        z = tr["pos"][150:, 0, 2]
        return jnp.mean((z - jnp.mean(z)) ** 2)

    val, g = jax.value_and_grad(late_energy)(jnp.log(1.0e4))
    assert np.isfinite(val) and np.isfinite(g)
    assert g < 0.0  # more drag -> less late oscillation energy
    eps = 1e-4
    fd = (late_energy(np.log(1e4) + eps) - late_energy(np.log(1e4) - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)


def test_viscous_bad_shape_raises():
    with pytest.raises(ValueError, match="length-6"):
        Simulation(SystemSpec(
            bodies=[Body(name="b", mass=1.0, pos0=(0, 0, 0),
                         quadratic_damping=[1.0, 2.0])],
            gravity=(0.0, 0.0, -9.81)), dt=0.01)


def test_viscous_fused_hht_matches_xla(sphere_h5):
    """HHT evaluates forces inside each modified-Newton iteration; the
    in-kernel viscous rows must track the iterate velocities exactly as
    the XLA path's _forces_mech does (interpret mode, f64)."""
    from hydrochrono_tpu.parallel.sharding import make_batched_states

    hd = load_bemio_h5(sphere_h5, num_bodies=1)
    spec = SystemSpec(
        bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -1.5),
                     linear_damping=[0, 0, 2.0e3, 0, 0, 0],
                     quadratic_damping=[0, 0, 8.0e4, 0, 0, 0])],
        hydro=HydroAttachment(hydro=hd, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    wave = RegularWave(amplitude=0.5, omega=0.8)
    sim = Simulation(spec, dt=0.02, wave=wave, block_size=16,
                     integrator="hht", outputs=("pos",))
    assert sim.fused_supported()
    B, n = 2, 32
    states = make_batched_states(sim, B)
    _, tx = jax.vmap(lambda s: sim.run(n, state=s))(states)
    _, tf = sim.run_blocked_fused(n, states, interpret=True)
    np.testing.assert_allclose(np.asarray(tf["pos"]), np.asarray(tx["pos"]),
                               rtol=0, atol=1e-9)
