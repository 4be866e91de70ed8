"""Headline benchmark: batched sphere-decay throughput on TPU.

Runs B independent 40 s sphere heave-decay simulations (the reference's
demos/sphere workload: dt=0.015, 2667 steps, RIRF 6x6x1001 — real BEMIO
coefficients from the reference repo) as ONE batched device program in
float32, and prints a single JSON line:

  {"metric": "batched_sphere_decay_sims_per_sec", "value": ..., "unit":
   "sims/s", "vs_baseline": ...}

vs_baseline is the per-instance real-time factor divided by the BASELINE.md
target of 100x real time per instance (>= 1.0 means the north-star target is
met at this batch size on this chip). The reference publishes no wall-time
numbers (BASELINE.md) so there is no reference ratio to report.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hydrochrono_tpu.io.bemio import load_bemio_h5
    from hydrochrono_tpu.parallel.sharding import batch_mesh, make_batched_states, shard_batch
    from hydrochrono_tpu.physics.system import Body, HydroAttachment, SystemSpec
    from hydrochrono_tpu.stepper import Simulation

    h5 = "/root/reference/demos/sphere/hydroData/sphere.h5"
    if not os.path.exists(h5):
        h5 = os.path.join(os.path.dirname(__file__), "tests", "data", "sphere.h5")

    n_dev = len(jax.devices())
    batch = int(os.environ.get("BENCH_BATCH", "512")) * n_dev
    sim_seconds = 40.0
    dt = 0.015
    nsteps = 2667

    hydro = load_bemio_h5(h5, num_bodies=1)
    spec = SystemSpec(
        bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -1.0))],
        hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
        gravity=(0.0, 0.0, -9.81),
    )
    sim = Simulation(spec, dt=dt, dtype=jnp.float32)

    # vary initial depth per instance: a real decay sweep, not clones
    rng = np.random.RandomState(0)
    offsets = np.zeros((batch, 1, 3), dtype=np.float32)
    offsets[:, 0, 2] = rng.uniform(-0.5, 0.5, size=batch)

    mesh = batch_mesh()
    states = make_batched_states(sim, batch, pos_offsets=offsets)
    states = shard_batch(states, mesh)

    run = jax.jit(jax.vmap(lambda s: sim.run(nsteps, state=s)))

    # compile
    t0 = time.time()
    final, traj = run(states)
    jax.block_until_ready(final.pos)
    compile_and_first = time.time() - t0

    # timed runs
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        final, traj = run(states)
        jax.block_until_ready(final.pos)
    wall = (time.time() - t0) / reps

    sims_per_sec = batch / wall
    per_instance_rt = sim_seconds / wall  # each instance simulates 40 s in `wall`
    target = 100.0  # BASELINE.md: >=100x real time per instance

    # sanity: finite results
    ok = bool(np.isfinite(np.asarray(final.pos)).all())

    result = {
        "metric": "batched_sphere_decay_sims_per_sec",
        "value": round(sims_per_sec, 2),
        "unit": "sims/s",
        "vs_baseline": round(per_instance_rt / target, 3),
        "batch": batch,
        "devices": n_dev,
        "steps": nsteps,
        "wall_s": round(wall, 4),
        "per_instance_realtime_factor": round(per_instance_rt, 1),
        "compile_s": round(compile_and_first, 2),
        "finite": ok,
    }
    print(json.dumps(result))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
