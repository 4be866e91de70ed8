"""Headline benchmark on TPU — the two BASELINE.md workloads:

  1. RM3 two-body point absorber with TSDA PTO in irregular (PM) waves,
     dt=0.01, blocked radiation convolution, fused Pallas step kernel
     (ops/pallas_step.py). The reference rm3.h5 is a missing LFS blob, so
     RM3-class synthetic BEMIO coefficients are used (2 bodies, 12x12
     A_inf/RIRF, 15 s kernel @ 1501 samples — the sphere file's real kernel
     resolution).  <- primary metric
  2. Batched sphere heave decay (real sphere.h5 coefficients), dt=0.015,
     2667 steps — the reference demos/sphere workload, same fused path.

TIMEOUT-PROOF DESIGN (round 5): the driver records whatever the LAST JSON
line on stdout says, so this script emits the current-best result line
after EVERY section (and mirrors it to bench_partial.json) — a stall in a
later optional section can no longer forfeit the primary number, which is
printed as soon as it exists. A wall-clock budget (env BENCH_BUDGET_S,
default 1200 s) skips remaining OPTIONAL sections when exceeded; the
mandatory sections are RM3-conv and RM3-ERA.

vs_baseline is the RM3 per-instance real-time factor divided by the
BASELINE.md target (100x real time per instance at 4096 instances on
v5e-8 == 512 instances per chip); >= 1.0 means target met. The reference
itself publishes no wall-time numbers (BASELINE.md).

Also reports achieved model FLOP/s and MFU for the RM3 step program so perf
work is steered by utilization: flops counted analytically (radiation
far-field + intra-block contractions + excitation + step body), peak taken
as the v5e bf16 figure (197 TFLOP/s; the f32 MXU path runs at a fraction of
that, so mfu is a conservative lower bound).
"""

import json
import os
import sys
import time

import numpy as np

V5E_PEAK_FLOPS = 197e12  # bf16 peak, one v5e chip

T_START = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))


def _over_budget() -> bool:
    return time.time() - T_START > BUDGET_S


def _timed(fn, *args):
    out = np.asarray(fn(*args))  # host transfer == reliable sync
    t0 = time.time()
    out = np.asarray(fn(*args))
    return time.time() - t0, out


def _rm3_step_flops(B, H, tb, K, nv, m):
    """Analytic model FLOPs per simulation step (all batched instances)."""
    far = 2.0 * (H - 1) * K * K * B  # Hankel far-field matmul, amortized/step
    intra = 2.0 * tb * K * K * B  # intra-block contraction
    exc = 2.0 * K * B  # eta-window dot (kernel is shared across batch)
    # fused step body: forces + jacobian + KKT (nv^3/3 + (1+m) nv^2) + integrate
    body = (nv**3 / 3 + (1 + m) * nv**2 * 2 + m**3 / 3 + 600) * 2.0 * B
    return far + intra + exc + body


def _emit(result: dict):
    """Print the current result line (driver parses the LAST stdout JSON
    line) and mirror it to bench_partial.json for post-mortems."""
    line = json.dumps(result)
    print(line, flush=True)
    try:
        with open("bench_partial.json", "w") as f:
            f.write(line + "\n")
    except OSError:
        pass


def main():
    import jax
    import jax.numpy as jnp

    from hydrochrono_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # fresh-process compiles load from .jax_cache

    from hydrochrono_tpu.io.bemio import load_bemio_h5
    from hydrochrono_tpu.io.synth import write_bemio_h5
    from hydrochrono_tpu.models import rm3
    from hydrochrono_tpu.parallel.sharding import make_batched_states
    from hydrochrono_tpu.physics.system import Body, HydroAttachment, SystemSpec
    from hydrochrono_tpu.physics.waves import IrregularWaveParams
    from hydrochrono_tpu.stepper import Simulation

    n_dev = len(jax.devices())
    B = int(os.environ.get("BENCH_BATCH", "512")) * n_dev

    result = {
        "metric": "rm3_irregular_steps_per_sec",
        "value": 0.0,
        "unit": "instance-steps/s",
        "vs_baseline": 0.0,
        "batch": B,
        "devices": n_dev,
        "finite": False,
        "sections_done": [],
    }

    def _headline(rt_conv, rt_era, dt):
        best_rt = max(rt_conv, rt_era)
        result["value"] = round(B * best_rt / dt, 0)
        result["vs_baseline"] = round(best_rt / 100.0, 3)
        result["rm3_primary_mode"] = ("era" if rt_era > rt_conv
                                      else "convolution")

    # ---------------- RM3 irregular (primary, mandatory) ----------------
    rm3_h5 = "/tmp/hydrochrono_tpu_bench_rm3.h5"
    if not os.path.exists(rm3_h5):
        write_bemio_h5(
            rm3_h5, 2, seed=11,
            cg_list=[np.array([0.0, 0.0, -0.72]), np.array([0.0, 0.0, -21.29])],
            rirf_tmax=15.0, rirf_steps=1501,
        )
    wave = IrregularWaveParams(height=2.0, period=8.0, nfrequencies=1000,
                               ramp_duration=20.0)
    sim_t = 100.0
    dt = 0.01
    tb = 128
    n = (int(sim_t / dt) + tb - 1) // tb * tb
    sim = Simulation(rm3(rm3_h5, pto_damping=1.2e6), dt=dt, wave=wave,
                     duration=2 * sim_t, dtype=jnp.float32, block_size=tb,
                     outputs=("pos",))
    states = make_batched_states(sim, B)
    if n_dev > 1:
        from hydrochrono_tpu.parallel.sharding import batch_mesh, shard_batch

        states = shard_batch(states, batch_mesh())
    run = jax.jit(lambda s, p: sim.run_blocked_fused(n, s, params=p)[0].pos)
    t0 = time.time()
    wall_rm3, out = _timed(run, states, sim.params)
    compile_rm3 = time.time() - t0 - wall_rm3
    ok_rm3 = bool(np.isfinite(out).all())
    rm3_rt = n * dt / wall_rm3
    H = sim.params["_const"]["W_rev"].shape[0]
    flops_step = _rm3_step_flops(B, H, tb, 6 * sim.n_hydro, sim.nv,
                                 sim.n_constraints)
    achieved = flops_step * n / wall_rm3
    mfu = achieved / (V5E_PEAK_FLOPS * n_dev)

    result.update({
        "rm3_per_instance_realtime_factor": round(rm3_rt, 1),
        "rm3_wall_s": round(wall_rm3, 3),
        "rm3_compile_s": round(compile_rm3, 1),
        "rm3_us_per_step": round(wall_rm3 / n * 1e6, 2),
        "rm3_achieved_tflops": round(achieved / 1e12, 2),
        "rm3_mfu_vs_bf16_peak": round(mfu, 4),
        "finite": ok_rm3,
    })
    _headline(rm3_rt, 0.0, dt)
    result["sections_done"] = ["rm3_conv"]
    _emit(result)

    # ---- RM3 with ERA radiation (shared-pole realization of the same lag
    # kernel, physics/era.py): the far-field Hankel matmul and the ring
    # buffer disappear. Preferred execution = the whole-run fused kernel
    # (stepper.run_fused_era: the ENTIRE time loop in one pallas_call,
    # radiation in-kernel); falls back to the per-dispatch blocked runner.
    # Gated on the same reference goldens (tools/tpu_golden_gates.py 7/9).
    rm3_era_rt, rm3_era_us, era_order, era_fit_err = 0.0, 0.0, 0, -1.0
    rm3_era_mode = "none"
    sim_e = None
    try:
        sim_e = Simulation(rm3(rm3_h5, pto_damping=1.2e6), dt=dt, wave=wave,
                           duration=2 * sim_t, dtype=jnp.float32,
                           block_size=tb, radiation="era", era_tol=1e-6,
                           outputs=("pos",))
        states_e = make_batched_states(sim_e, B)
        if n_dev > 1:
            states_e = shard_batch(states_e, batch_mesh())
        wall_era, out_e = 0.0, np.asarray([np.nan])
        if n_dev == 1 and sim_e.fused_wholerun_supported():
            try:
                run_w = jax.jit(lambda s: sim_e.run_fused_era(n, s)[0].pos)
                wall_era, out_e = _timed(run_w, states_e)
                rm3_era_mode = "wholerun"
            except Exception as exc:  # noqa: BLE001
                print(f"# rm3 era wholerun failed ({exc}); blocked fallback",
                      file=sys.stderr)
        if not bool(np.isfinite(out_e).all()):
            run_e = jax.jit(
                lambda s, p: sim_e.run_blocked_fused(n, s, params=p)[0].pos)
            wall_era, out_e = _timed(run_e, states_e, sim_e.params)
            rm3_era_mode = "blocked"
        if bool(np.isfinite(out_e).all()):
            rm3_era_rt = n * dt / wall_era
            rm3_era_us = wall_era / n * 1e6
            era_order = sim_e.era_order
            era_fit_err = sim_e.era_markov_rel_err
        else:
            rm3_era_mode = "none"
    except Exception as exc:  # noqa: BLE001
        print(f"# rm3 era bench failed: {exc}", file=sys.stderr)

    result.update({
        "rm3_era_us_per_step": round(rm3_era_us, 2),
        "rm3_era_per_instance_realtime_factor": round(rm3_era_rt, 1),
        "rm3_era_exec": rm3_era_mode,
        "rm3_era_order": era_order,
        "rm3_era_kernel_fit_err": round(era_fit_err, 6),
    })
    _headline(rm3_rt, rm3_era_rt, dt)
    result["sections_done"] = result["sections_done"] + ["rm3_era"]
    _emit(result)

    # ---- order-reduced ERA fit (VERDICT r4 item 8): M=64 halves the
    # in-kernel ERA matmul cost vs the tol-selected order at the price of
    # fit error. Records throughput + fit error + final-state L2 vs the
    # full-order ERA run so the accuracy cost is visible next to the
    # speedup. Optional: budget-guarded.
    if (sim_e is not None and rm3_era_rt > 0.0 and n_dev == 1
            and sim_e.era_order > 64 and not _over_budget()):
        try:
            import warnings as _warnings

            with _warnings.catch_warnings():
                _warnings.simplefilter("ignore")  # loosened-fit warning is
                # deliberate here; the fit error is recorded in the result
                sim_m = Simulation(rm3(rm3_h5, pto_damping=1.2e6), dt=dt,
                                   wave=wave, duration=2 * sim_t,
                                   dtype=jnp.float32, block_size=tb,
                                   radiation="era", era_order=64,
                                   outputs=("pos",))
            states_m = make_batched_states(sim_m, B)
            if sim_m.fused_wholerun_supported():
                run_m = jax.jit(lambda s: sim_m.run_fused_era(n, s)[0].pos)
                wall_m, out_m = _timed(run_m, states_m)
            else:
                run_m = jax.jit(
                    lambda s, p: sim_m.run_blocked_fused(n, s, params=p)[0].pos)
                wall_m, out_m = _timed(run_m, states_m, sim_m.params)
            if bool(np.isfinite(out_m).all()):
                ref_n = float(np.linalg.norm(out_e))
                result.update({
                    "rm3_era_m64_us_per_step": round(wall_m / n * 1e6, 2),
                    "rm3_era_m64_kernel_fit_err": round(
                        float(sim_m.era_markov_rel_err), 6),
                    "rm3_era_m64_final_l2_vs_full": round(
                        float(np.linalg.norm(out_m - out_e)) / max(ref_n, 1e-30),
                        8),
                })
                result["sections_done"] = result["sections_done"] + ["rm3_era_m64"]
                _emit(result)
        except Exception as exc:  # noqa: BLE001
            print(f"# rm3 era m64 bench failed: {exc}", file=sys.stderr)

    # ---- large-batch aggregate-throughput entries (single chip): B=1024
    # and B=4096 whole-run rows (VERDICT r4 item 8 — the roofline lever is
    # full vregs at B>=1024). Optional: budget-guarded.
    for B_big in (1024, 4096):
        key = f"rm3_b{B_big}"
        if (sim_e is None or rm3_era_rt <= 0.0 or n_dev != 1
                or os.environ.get("BENCH_SKIP_B4096") == "1"
                or _over_budget()):
            if _over_budget():
                print(f"# skipping {key}: over BENCH_BUDGET_S={BUDGET_S:.0f}",
                      file=sys.stderr)
            continue
        try:
            n4 = n // 4  # quarter horizon: steady-state rate, less wall
            states4 = make_batched_states(sim_e, B_big)
            if rm3_era_mode == "wholerun":
                run4 = jax.jit(lambda s: sim_e.run_fused_era(n4, s)[0].pos)
            else:
                run4 = jax.jit(
                    lambda s: sim_e.run_blocked_fused(n4, s)[0].pos)
            wall4, out4 = _timed(run4, states4)
            if bool(np.isfinite(out4).all()):
                result[key + "_inst_steps_per_sec"] = round(
                    B_big * n4 / wall4, 0)
                result[key + "_us_per_step"] = round(wall4 / n4 * 1e6, 2)
                flops4 = _rm3_step_flops(B_big, H, tb, 6 * sim_e.n_hydro,
                                         sim_e.nv, sim_e.n_constraints)
                result[key + "_mfu_vs_bf16_peak"] = round(
                    flops4 * n4 / wall4 / V5E_PEAK_FLOPS, 4)
            result["sections_done"] = result["sections_done"] + [key]
            _emit(result)
        except Exception as exc:  # noqa: BLE001
            print(f"# rm3 B={B_big} bench failed: {exc}", file=sys.stderr)

    # ---------------- sphere decay (secondary) ----------------
    sph_h5 = "/root/reference/demos/sphere/hydroData/sphere.h5"
    ok_sph = True
    sph_sims_s = sph_rt = 0.0
    if os.path.exists(sph_h5) and not _over_budget():
        hydro = load_bemio_h5(sph_h5, num_bodies=1)
        spec = SystemSpec(
            bodies=[Body(name="body1", mass=261.8e3, pos0=(0.0, 0.0, -1.0))],
            hydro=HydroAttachment(hydro=hydro, body_indices=[0]),
            gravity=(0.0, 0.0, -9.81),
        )
        tb2 = 128
        n2 = (2667 + tb2 - 1) // tb2 * tb2
        sim2 = Simulation(spec, dt=0.015, dtype=jnp.float32, block_size=tb2,
                          outputs=("pos",))
        rng = np.random.RandomState(0)
        offs = np.zeros((B, 1, 3), dtype=np.float32)
        offs[:, 0, 2] = rng.uniform(-0.5, 0.5, size=B)
        st2 = make_batched_states(sim2, B, pos_offsets=offs)
        if n_dev > 1:
            from hydrochrono_tpu.parallel.sharding import batch_mesh, shard_batch

            st2 = shard_batch(st2, batch_mesh())
        run2 = jax.jit(lambda s, p: sim2.run_blocked_fused(n2, s, params=p)[0].pos)
        wall_sph, out2 = _timed(run2, st2, sim2.params)
        ok_sph = bool(np.isfinite(out2).all())
        sph_sims_s = B / wall_sph * (n2 / 2667.0)
        sph_rt = n2 * 0.015 / wall_sph
        result.update({
            "sphere_decay_sims_per_sec": round(sph_sims_s, 1),
            "sphere_per_instance_realtime_factor": round(sph_rt, 1),
            "finite": ok_rm3 and ok_sph,
        })
        result["sections_done"] = result["sections_done"] + ["sphere"]
        _emit(result)
    elif _over_budget():
        print("# skipping sphere: over budget", file=sys.stderr)

    # ---------------- 8-device wave farm (farm-scale N, round 3) ----------
    # nv = 48 coupled DOFs (the reference caps at 3 bodies): fused ERA farm
    # kernel + exact blocked-convolution XLA baseline, BOTH on the same
    # shared-pole (shared_modes=4) coefficient file. Run in a SUBPROCESS
    # (tools/bench_farm.py) with a hard wall-clock cap: the farm8 XLA
    # remote compile can stall 20+ min inside a C RPC (then die with a
    # transport error) when the compile service is degraded, and an
    # in-process stall there cannot be interrupted from Python — it cost
    # BENCH_r04 its artifact. Single-chip only; optional, budget-guarded.
    if n_dev == 1 and not _over_budget():
        import subprocess

        Bf = max(B // 4, 1)
        cap = float(os.environ.get("BENCH_FARM_TIMEOUT_S", "900"))
        cap = max(60.0, min(cap, BUDGET_S - (time.time() - T_START)))
        child = [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "bench_farm.py"), str(Bf)]
        out_text = ""
        try:
            proc = subprocess.run(child, capture_output=True, text=True,
                                  timeout=cap)
            out_text = proc.stdout or ""
            if proc.stderr:
                sys.stderr.write(proc.stderr[-500:])
        except subprocess.TimeoutExpired as exc:
            out_text = (exc.stdout or b"").decode() if isinstance(
                exc.stdout, bytes) else (exc.stdout or "")
            print(f"# farm child timed out after {cap:.0f}s; "
                  "partial rows kept", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            print(f"# farm child failed: {exc}", file=sys.stderr)
        lines = [ln for ln in out_text.splitlines() if ln.startswith("{")]
        if lines:
            try:
                farm = json.loads(lines[-1])
                result.update(farm)
                result["sections_done"] = result["sections_done"] + [
                    k for k in ("farm8_era", "farm8")
                    if f"{k}_us_per_step" in farm]
                _emit(result)
            except json.JSONDecodeError as exc:
                print(f"# farm child emitted bad JSON: {exc}",
                      file=sys.stderr)

    result["bench_wall_s"] = round(time.time() - T_START, 1)
    _emit(result)
    return 0 if result["finite"] else 1


if __name__ == "__main__":
    sys.exit(main())
