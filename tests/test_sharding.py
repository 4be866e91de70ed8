"""Batch-axis sharding over a device mesh (8 virtual CPU devices)."""

import numpy as np
import jax
import pytest

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.parallel.sharding import (
    batch_mesh,
    make_batched_states,
    shard_batch,
    sharded_run,
)
from hydrochrono_tpu.physics.system import Body, HydroAttachment, SystemSpec
from hydrochrono_tpu.physics.waves import RegularWave
from hydrochrono_tpu.stepper import Simulation


@pytest.fixture(scope="module")
def sim(sphere_h5):
    hydro = load_bemio_h5(sphere_h5, num_bodies=1)
    spec = SystemSpec(
        bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -1.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    return Simulation(spec, dt=0.015)


def test_mesh_has_8_devices():
    mesh = batch_mesh()
    assert mesh.devices.size == 8


def test_sharded_batch_matches_single(sim):
    """16 instances sharded over 8 devices == 16 independent runs."""
    batch = 16
    rng = np.random.RandomState(0)
    offsets = np.zeros((batch, 1, 3))
    offsets[:, 0, 2] = rng.uniform(-0.3, 0.3, batch)
    states = make_batched_states(sim, batch, pos_offsets=offsets)

    final, traj = sharded_run(sim, 200, batched_state=states)
    z = np.asarray(traj["pos"][:, :, 0, 2])  # [B, T]

    # compare instance 5 against an unbatched run from the same start
    st = sim.init_state()
    st.pos = st.pos + offsets[5]
    _, ref = sim.run(200, state=st)
    np.testing.assert_allclose(z[5], np.asarray(ref["pos"][:, 0, 2]), atol=1e-12)


def test_sharded_wave_sweep(sim, sphere_h5):
    """Batched regular-wave parameters shard with the states."""
    from hydrochrono_tpu.physics.waves import build_regular_wave

    hydro = load_bemio_h5(sphere_h5, 1)
    omegas = np.linspace(0.6, 2.0, 8)
    data = build_regular_wave(hydro, RegularWave(amplitude=0.5, omega=omegas))

    spec = sim.spec
    wave_sim = Simulation(spec, dt=0.015, wave=RegularWave(amplitude=0.5, omega=omegas))
    batched = {
        "reg_mag": wave_sim.params["reg_mag"],
        "reg_phase": wave_sim.params["reg_phase"],
        "reg_amp": wave_sim.params["reg_amp"],
        "reg_omega": wave_sim.params["reg_omega"],
    }
    states = make_batched_states(wave_sim, 8)
    final, traj = sharded_run(wave_sim, 300, batched_state=states,
                              batched_params=batched)
    z = np.asarray(traj["pos"][:, :, 0, 2])
    assert np.isfinite(z).all()
    # different frequencies produce different responses
    assert np.std(z[:, -1]) > 1e-6


def test_fused_runner_sharded_matches_unsharded(tmp_path):
    """The fused Pallas blocked runner under an 8-device batch mesh produces
    the same trajectories as unsharded execution."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from hydrochrono_tpu.io.synth import write_bemio_h5
    from hydrochrono_tpu.models import rm3
    from hydrochrono_tpu.parallel.sharding import make_batched_states
    from hydrochrono_tpu.stepper import Simulation

    h5 = str(tmp_path / "rm3s.h5")
    write_bemio_h5(h5, 2, seed=11, rirf_tmax=1.0, rirf_steps=51)
    sim = Simulation(rm3(h5, pto_damping=1.2e6), dt=0.01,
                     dtype=jnp.float32, block_size=8, outputs=("pos",))

    B = 8 * 128
    rng = np.random.RandomState(0)
    offs = np.zeros((B, 2, 3), dtype=np.float32)
    offs[:, 0, 2] = rng.uniform(-0.1, 0.1, size=B)
    states = make_batched_states(sim, B, pos_offsets=offs)

    final_u, traj_u = jax.jit(
        lambda s, p: sim.run_blocked_fused(16, s, params=p)
    )(states, sim.params)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("batch",))
    sharding = NamedSharding(mesh, P("batch"))
    states_s = jax.tree.map(
        lambda x: jax.device_put(x, sharding) if x.ndim > 0 else x, states
    )
    final_s, traj_s = jax.jit(
        lambda s, p: sim.run_blocked_fused(16, s, params=p)
    )(states_s, sim.params)

    np.testing.assert_allclose(np.asarray(final_s.pos), np.asarray(final_u.pos),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(traj_s["pos"]), np.asarray(traj_u["pos"]),
                               rtol=0, atol=1e-6)


def test_farm_fused_sharded_matches_unsharded(tmp_path):
    """The fused farm kernel under an 8-device batch mesh (interpret on
    the virtual CPU mesh) produces the same trajectories as unsharded
    execution — the multi-chip farm production shape."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from hydrochrono_tpu.io.synth import write_bemio_h5
    from hydrochrono_tpu.models.builders import sphere_farm
    from hydrochrono_tpu.parallel.sharding import make_batched_states
    from hydrochrono_tpu.physics.waves import IrregularWaveParams
    from hydrochrono_tpu.stepper import Simulation

    h5 = str(tmp_path / "farm4sh.h5")
    write_bemio_h5(h5, 4, seed=13, state_space=True,
                   cg_list=[np.array([0.0, 0.0, -2.0])] * 4,
                   cb_list=[np.array([0.0, 0.0, -1.7])] * 4,
                   disp_vol=[261.8] * 4, rirf_tmax=10.0, rirf_steps=201,
                   n_freq=40)
    wave = IrregularWaveParams(height=1.5, period=7.0, nfrequencies=20,
                               ramp_duration=4.0)
    sim = Simulation(sphere_farm(h5, nx=2, ny=2), dt=0.02, wave=wave,
                     duration=10.0, radiation="state_space",
                     dtype=jnp.float32, outputs=("pos",))
    assert sim.farm_fused_supported()

    B = 8 * 128  # one lane tile per device
    rng = np.random.RandomState(3)
    offs = np.zeros((B, 4, 3), dtype=np.float32)
    offs[:, :, 2] = rng.uniform(-0.1, 0.1, size=(B, 4))
    states = make_batched_states(sim, B, pos_offsets=offs)

    n = 16
    _, traj_u = jax.jit(
        lambda s: sim.run_farm_fused(n, s, interpret=True, subblock=8))(states)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("batch",))
    sharding = NamedSharding(mesh, P("batch"))
    states_s = jax.tree.map(
        lambda x: jax.device_put(x, sharding) if x.ndim > 0 else x, states)
    _, traj_s = jax.jit(
        lambda s: sim.run_farm_fused(n, s, interpret=True, subblock=8))(states_s)

    np.testing.assert_allclose(np.asarray(traj_s["pos"]),
                               np.asarray(traj_u["pos"]), rtol=0, atol=1e-6)
