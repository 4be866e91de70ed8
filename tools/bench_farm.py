"""Farm-scale bench rows, run as a SUBPROCESS of bench.py.

Round-5 lesson: the farm8 XLA program's remote compile can stall for 20+
minutes and then die with a transport error (UNAVAILABLE ... /remote_compile:
Broken pipe) when the compile service is degraded — and a stall inside the
parent bench process cannot be interrupted from Python (the wait sits in a C
RPC, so SIGALRM handlers never run). Isolating the farm rows in a child
process lets bench.py enforce a hard wall-clock cap with subprocess timeout
semantics: the child is killed, the primary metrics survive.

Prints one JSON line per completed section (the parent parses the LAST
line, and on timeout reads whatever partial stdout the child produced).
The fused-ERA row runs FIRST: its whole-run Pallas kernel is a much
smaller program than the farm8 XLA scan and has never been the one that
stalls, so it gets recorded even when the XLA row times out.

Usage: python tools/bench_farm.py [Bf]   (Bf = farm batch, default 128)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _timed(fn, *args):
    out = np.asarray(fn(*args))
    t0 = time.time()
    out = np.asarray(fn(*args))
    return time.time() - t0, out


def main():
    Bf = int(sys.argv[1]) if len(sys.argv) > 1 else 128

    from hydrochrono_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from hydrochrono_tpu.io.synth import write_bemio_h5
    from hydrochrono_tpu.models.builders import sphere_farm
    from hydrochrono_tpu.physics.waves import IrregularWaveParams
    from hydrochrono_tpu.stepper import Simulation

    farm_h5 = "/tmp/hydrochrono_tpu_bench_farm8_modal.h5"
    dtf = 0.02
    nf = 16384
    wave_f = IrregularWaveParams(height=2.0, period=8.0,
                                 nfrequencies=300, ramp_duration=20.0)
    if not os.path.exists(farm_h5):
        write_bemio_h5(
            farm_h5, 8, seed=17, shared_modes=4, state_space=True,
            cg_list=[np.array([0.0, 0.0, -2.0])] * 8,
            cb_list=[np.array([0.0, 0.0, -1.7])] * 8,
            disp_vol=[261.8] * 8,
            rirf_tmax=15.0, rirf_steps=1501,
        )

    result = {}

    # ---- era-mode fused whole-run farm kernel first (small program,
    # reliably compiles; bench key farm8_era)
    try:
        sim_fe = Simulation(sphere_farm(farm_h5, nx=4, ny=2), dt=dtf,
                            wave=wave_f, duration=1.5 * nf * dtf,
                            dtype=jnp.float32, radiation="era",
                            era_tol=1e-6, outputs=("pos",))
        if sim_fe.farm_fused_supported():
            from hydrochrono_tpu.parallel.sharding import make_batched_states

            st_fe = make_batched_states(sim_fe, Bf)
            run_fe = jax.jit(lambda s: sim_fe.run_farm_fused(nf, s)[0].pos)
            wall_fe, out_fe = _timed(run_fe, st_fe)
            if bool(np.isfinite(out_fe).all()):
                result.update({
                    "farm8_era_us_per_step": round(wall_fe / nf * 1e6, 2),
                    "farm8_era_per_instance_realtime_factor": round(
                        nf * dtf / wall_fe, 1),
                })
                print(json.dumps(result), flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"# farm era row failed: {exc}", file=sys.stderr)

    # ---- exact blocked-convolution baseline on the same shared-pole file,
    # batched XLA const-mass path (bench key farm8; the stall-prone compile)
    try:
        from hydrochrono_tpu.parallel.sharding import make_batched_states

        sim_f = Simulation(sphere_farm(farm_h5, nx=4, ny=2), dt=dtf,
                           wave=wave_f, duration=1.5 * nf * dtf,
                           dtype=jnp.float32, radiation="convolution",
                           block_size=128, outputs=("pos",))
        assert sim_f.const_mass and sim_f.nv == 48
        st_f = make_batched_states(sim_f, Bf)
        run_xla = jax.jit(jax.vmap(lambda s: sim_f.run(nf, state=s)[0].pos))
        wall_farm, out_f = _timed(run_xla, st_f)
        result.update({
            "farm8_us_per_step": round(wall_farm / nf * 1e6, 2),
            "farm8_per_instance_realtime_factor": round(
                nf * dtf / wall_farm, 1),
            "farm8_file": "shared_modes",
            "farm8_radiation": "convolution_exact",
            "farm8_ok": bool(np.isfinite(out_f).all()),
        })
        print(json.dumps(result), flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"# farm conv row failed: {exc}", file=sys.stderr)

    return 0 if result else 1


if __name__ == "__main__":
    sys.exit(main())
