"""Profiling: device traces + per-force-component breakdown.

The reference instruments hydrostatics/radiation/waves with steady_clock
brackets (HydroProfileStats, hydro_forces.h:153-160) and prints a --profile
box. Here the equivalents are (a) `trace()` — a jax.profiler device trace
for TensorBoard / xprof, and (b) `component_breakdown` — wall-time of each
force component as separately-jitted kernels, the closest analogue of the
per-component call timing under a fused-program execution model.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _time(fn, *args, reps=20):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # sync
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.time() - t0) / reps


def component_breakdown(sim, state=None, reps: int = 20) -> dict:
    """Per-component evaluation times (seconds) at the given state."""
    if state is None:
        state = sim.init_state()
    params = sim.params
    const = params["_const"]
    n = jnp.int32(0)
    out = {}

    if sim.hydro is not None and sim.radiation == "convolution":
        # blocked sims carry a block-aligned ring longer than the kernel;
        # time the per-step component kernels on the kernel-length window
        import dataclasses

        H = const["W_rev"].shape[0]
        if state.vhist.shape[0] != H:
            state = dataclasses.replace(state, vhist=state.vhist[:H])

    if sim.hydro is not None:
        out["hydrostatics"] = _time(
            jax.jit(lambda: sim._hydrostatic(params, state.pos, state.quat)), reps=reps
        )
        if sim.radiation == "convolution":
            from hydrochrono_tpu.physics.radiation import radiation_force

            out["radiation"] = _time(
                jax.jit(lambda: radiation_force(const["W_rev"], state.vhist, n)),
                reps=reps,
            )
        if sim.wave_kind != "NoWave":
            out["waves"] = _time(jax.jit(lambda: sim._wave_force(params, n)), reps=reps)

    out["full_step"] = _time(
        jax.jit(lambda: sim._step(params, state, n)[0].pos), reps=reps
    )
    return out


def render_profile_box(log, breakdown: dict, setup_s: float, loop_s: float,
                       export_s: float, steps: int):
    """--profile output in the reference's breakdown-box style
    (run_hydrochrono_from_yaml.cpp:963-994)."""
    total = max(setup_s + loop_s + export_s, 1e-12)
    rows = [
        ("setup", f"{setup_s:8.3f} s  ({100 * setup_s / total:4.1f}%)"),
        ("dynamics loop", f"{loop_s:8.3f} s  ({100 * loop_s / total:4.1f}%)"),
        ("export", f"{export_s:8.3f} s  ({100 * export_s / total:4.1f}%)"),
        ("steps/s", f"{steps / max(loop_s, 1e-12):,.0f}"),
    ]
    for name, seconds in breakdown.items():
        rows.append((f"  {name} (per eval)", f"{seconds * 1e6:10.1f} us"))
    log.section_box("Runtime breakdown", rows)
