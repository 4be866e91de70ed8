#!/usr/bin/env python3
"""One-shot hardware tuning sweep for the whole-run fused farm kernel.

Runs the bench.py farm configuration (8 coupled spheres, nv=48,
state-space radiation, const-mass solve) through:

  * the fused whole-run kernel (ops/pallas_farm.py) at each subblock in
    --subs, for each batch size in --batches;
  * the batched XLA farm path as the reference line;
  * optional ablations (--ablate traj,tsda,...) to localize kernel cost.

Prints one table of us/step + per-instance real-time factors. Every cell
degrades to FAIL(reason) rather than aborting — Mosaic VMEM rejections at
this kernel's operand set are a known risk (PERF.md "late round 3").

Timing follows DEVNOTES: sync via host transfer (np.asarray), never
block_until_ready, one program at a time on the remote-compile service.

Usage (on the TPU):  python tools/tpu_farm_tune.py [--batches 128,512]
                       [--subs 4,8,16] [--steps 2048] [--ablate traj]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="128,512")
    ap.add_argument("--subs", default="4,8,16")
    ap.add_argument("--steps", type=int, default=2048)
    ap.add_argument("--ablate", default="",
                    help="comma list of ablation tags to also sweep at the "
                         "first batch/sub (e.g. traj,tsda,concat,adv)")
    args = ap.parse_args()

    import jax

    # the axon site hook pre-selects the TPU platform; the env var alone
    # is ignored (DEVNOTES) — honor it explicitly so CPU smoke runs work
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hydrochrono_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from hydrochrono_tpu.io.synth import write_bemio_h5
    from hydrochrono_tpu.models.builders import sphere_farm
    from hydrochrono_tpu.parallel.sharding import make_batched_states
    from hydrochrono_tpu.physics.waves import IrregularWaveParams
    from hydrochrono_tpu.stepper import Simulation

    print(f"devices: {jax.devices()}", flush=True)

    farm_h5 = "/tmp/hydrochrono_tpu_bench_farm8.h5"
    if not os.path.exists(farm_h5):
        write_bemio_h5(
            farm_h5, 8, seed=17, state_space=True,
            cg_list=[np.array([0.0, 0.0, -2.0])] * 8,
            cb_list=[np.array([0.0, 0.0, -1.7])] * 8,
            disp_vol=[261.8] * 8, rirf_tmax=15.0, rirf_steps=1501,
        )
    wave = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=300,
                               ramp_duration=20.0)
    dt, nf = 0.02, args.steps
    sim = Simulation(sphere_farm(farm_h5, nx=4, ny=2), dt=dt, wave=wave,
                     duration=1.5 * nf * dt, dtype=jnp.float32,
                     radiation="state_space", outputs=("pos",))
    assert sim.const_mass and sim.farm_fused_supported()

    def timed(fn, *a):
        out = np.asarray(fn(*a))  # compile + warm
        t0 = time.time()
        out = np.asarray(fn(*a))
        wall = time.time() - t0
        return wall, bool(np.isfinite(out).all())

    rows = []

    def cell(label, fn, states, B):
        try:
            t0 = time.time()
            wall, finite = timed(fn, states)
            compile_s = time.time() - t0 - 2 * wall
            us = wall / nf * 1e6
            rows.append((label, B, us, nf * dt / wall, compile_s,
                         "ok" if finite else "NONFINITE"))
            print(f"  {label:<28} B={B:<5} {us:8.2f} us/step  "
                  f"rt x{nf * dt / wall:8.1f}  compile ~{compile_s:.0f}s",
                  flush=True)
        except Exception as exc:  # noqa: BLE001 - record and continue
            msg = str(exc).splitlines()[0][:90]
            rows.append((label, B, None, None, None, f"FAIL {msg}"))
            print(f"  {label:<28} B={B:<5} FAIL: {msg}", flush=True)

    for B in [int(b) for b in args.batches.split(",") if b]:
        states = make_batched_states(sim, B)
        run_xla = jax.jit(jax.vmap(lambda s: sim.run(nf, state=s)[0].pos))
        cell("xla const-mass", run_xla, states, B)
        for sub in [int(s) for s in args.subs.split(",") if s]:
            run_f = jax.jit(lambda s, sub=sub: sim.run_farm_fused(
                nf, s, subblock=sub)[0].pos)
            cell(f"fused whole-run sub={sub}", run_f, states, B)

    tags = [t for t in args.ablate.split(",") if t]
    if tags:
        B = int(args.batches.split(",")[0])
        sub = int(args.subs.split(",")[0])
        states = make_batched_states(sim, B)
        runner = sim.farm_fused_builder()
        for tag in tags:
            runner.ablate = (tag,)
            run_a = jax.jit(lambda s: sim.run_farm_fused(
                nf, s, subblock=sub)[0].pos)
            cell(f"ablate {tag} sub={sub}", run_a, states, B)
        runner.ablate = ()

    print("\nsummary:")
    for label, B, us, rt, comp, status in rows:
        if us is None:
            print(f"  {label:<28} B={B:<5} {status}")
        else:
            print(f"  {label:<28} B={B:<5} {us:8.2f} us/step  rt x{rt:8.1f}"
                  f"  [{status}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
