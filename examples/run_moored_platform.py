"""Moored platform in irregular seas — the `moordyn:` capability.

A floating platform held by a 4-line catenary spread rides PM seas; the
quasi-static mooring (physics/mooring.py) supplies station-keeping forces
and per-line tensions. The reference declares this in its demo YAML
(demos/yaml/rm3/rm3_decay.hydro.yaml `moordyn:` block) but has no mooring
implementation; here it is a first-class, TPU-fused capability.

Run:  python examples/run_moored_platform.py
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from hydrochrono_tpu.io.synth import write_bemio_h5  # noqa: E402
from hydrochrono_tpu.io.bemio import load_bemio_h5  # noqa: E402
from hydrochrono_tpu.physics import mooring as moor  # noqa: E402
from hydrochrono_tpu.physics.system import Body, HydroAttachment, SystemSpec  # noqa: E402
from hydrochrono_tpu.physics.waves import IrregularWaveParams  # noqa: E402
from hydrochrono_tpu.stepper import Simulation  # noqa: E402


def main():
    h5 = "/tmp/moored_platform.h5"
    if not os.path.exists(h5):
        # synthetic platform-scale BEM coefficients (the reference's
        # deepcwind.h5 is a missing LFS blob)
        write_bemio_h5(h5, 1, seed=41, cg_list=[np.array([0.0, 0.0, -13.46])],
                       disp_vol=[13917.0], rirf_tmax=15.0, rirf_steps=1501)
    hydro = load_bemio_h5(h5, num_bodies=1)

    lines = tuple(
        moor.MooringLine(
            body=0,
            anchor=(420.0 * np.cos(th), 420.0 * np.sin(th), -200.0),
            fairlead=(20.0 * np.cos(th), 20.0 * np.sin(th), -14.0),
            length=570.0, weight_per_m=1065.0, ea=7.5e8,
        )
        for th in np.linspace(0.0, 2.0 * np.pi, 4, endpoint=False)
    )
    # balance the platform at its reference draft: weight = buoyancy minus
    # the mooring vertical pretension (pre-solved from the catenary)
    v_pre = 0.0
    for ln in lines:
        d = np.asarray(ln.fairlead) - np.asarray(ln.anchor)
        _, V = moor.catenary_hv(float(np.hypot(d[0], d[1])), float(d[2]),
                                ln.length, ln.weight_per_m, ln.ea)
        v_pre += float(V)
    g = 9.81
    mass = float(hydro.rho) * 13917.0 - v_pre / g
    spec = SystemSpec(
        bodies=[Body("body1", mass=mass, pos0=(0.0, 0.0, -13.46),
                     inertia=np.diag([1.1e10, 1.1e10, 1.2e10]))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        moorings=moor.MooringSpec(lines=lines),
    )

    wave = IrregularWaveParams(height=2.5, period=9.0, nfrequencies=1000,
                               seed=3, ramp_duration=20.0)
    on_tpu = jax.default_backend() == "tpu"
    dt, T = 0.02, (120.0 if on_tpu else 20.0)
    sim = Simulation(spec, dt=dt, wave=wave, duration=2 * T,
                     block_size=(128 if jax.default_backend() == "tpu" else None),
                     dtype=(jnp.float32 if jax.default_backend() == "tpu"
                            else None),
                     outputs=("pos", "quat"))
    n = int(T / dt)

    if sim.fused_supported() and jax.default_backend() == "tpu":
        from hydrochrono_tpu.parallel.sharding import make_batched_states

        states = make_batched_states(sim, 1)
        final, traj = jax.jit(
            lambda s, p: sim.run_blocked_fused(n, s, params=p)
        )(states, sim.params)
        pos = np.asarray(traj["pos"])[0]
        quat = np.asarray(traj["quat"])[0]
    else:
        final, traj = jax.jit(lambda: sim.run(n))()
        pos = np.asarray(traj["pos"])
        quat = np.asarray(traj["quat"])

    # per-line tensions reconstructed from the trajectory
    from hydrochrono_tpu.physics.rotations import quat_rotate

    mc = sim.params["_const"]["moor"]
    t = np.arange(1, n + 1) * dt
    print(f"surge range  [{pos[:, 0, 0].min():8.3f}, {pos[:, 0, 0].max():8.3f}] m")
    print(f"heave range  [{pos[:, 0, 2].min():8.3f}, {pos[:, 0, 2].max():8.3f}] m")
    for i in range(len(lines)):
        s = sim.moor_slots[i]
        pf = jnp.asarray(pos[:, s]) + quat_rotate(
            jnp.asarray(quat[:, s]), mc["local"][i][None, :])
        d = pf - mc["anchor"][i]
        dx = jnp.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2 + 1e-30)
        H, V = moor.catenary_hv(dx, d[:, 2], mc["L0"][i], mc["w"][i],
                                mc["ea"][i], mc["seabed"][i])
        T_line = np.sqrt(np.asarray(H) ** 2 + np.asarray(V) ** 2)
        print(f"line {i + 1} tension  mean {T_line.mean() / 1e3:8.1f} kN   "
              f"max {T_line.max() / 1e3:8.1f} kN")
    assert np.isfinite(pos).all()
    print("OK")


if __name__ == "__main__":
    main()
