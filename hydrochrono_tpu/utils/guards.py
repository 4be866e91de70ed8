"""Guarded execution: divergence detection, body-state dumps, checkpoints.

Mirrors the reference runner's defensive loop — exception-guarded
DoStepDynamics with body-state dumps on failure, NaN/Inf scans and stall
detection (run_hydrochrono_from_yaml.cpp:746-764, 813-845, 863-905) — in a
scan-chunked form: the device runs `chunk` steps at a time; between chunks
the host checks the state, optionally writes a checkpoint, and reports
progress.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax

from hydrochrono_tpu.utils.checkpoint import save_checkpoint


@dataclasses.dataclass
class GuardReport:
    completed_steps: int
    diverged: bool
    diverged_at_chunk: Optional[int]
    state_dump: Optional[dict]
    # max |C(q)| observed over the run (None when unmonitored): the
    # const-mass fast path solves against the t=0 constraint Jacobian, so
    # rotating-joint systems accumulate position-level drift the user must
    # see (stepper.Simulation.constraint_drift)
    max_constraint_drift: Optional[float] = None


def dump_body_states(sim, state) -> dict:
    """Human-readable body state snapshot (the reference dumps position /
    rotation / velocities per body on failure)."""
    dump = {}
    for i in sim.moving:
        s = sim.slot_of[i]
        dump[sim.spec.bodies[i].name] = {
            "position": np.asarray(state.pos[..., s, :]).tolist(),
            "quaternion_wxyz": np.asarray(state.quat[..., s, :]).tolist(),
            "linear_velocity": np.asarray(state.lin_vel[..., s, :]).tolist(),
            "angular_velocity": np.asarray(state.ang_vel[..., s, :]).tolist(),
        }
    return dump


def run_guarded(sim, num_steps: int, state=None, params=None, chunk: int = 500,
                checkpoint_path: Optional[str] = None, checkpoint_every: int = 0,
                progress: Optional[Callable[[float], None]] = None,
                collect: bool = True,
                on_chunk: Optional[Callable] = None,
                drift_tol: float = 1e-3):
    """Run in host-checked chunks; stop early on non-finite states.

    Returns (final_state, trajectory-or-None, GuardReport). The trajectory is
    the concatenation of per-chunk outputs up to (and excluding) a diverged
    chunk. Uses the per-step path (start_step continuation).
    """
    if state is None:
        state = sim.init_state()
    if params is None:
        params = sim.params

    if sim.block_size:
        # blocked runs advance whole blocks; keep every chunk boundary on a
        # block boundary so start_step continuation stays exact
        tb = sim.block_size
        chunk = -(-chunk // tb) * tb
        if checkpoint_every:
            checkpoint_every = -(-checkpoint_every // tb) * tb

    # constraint-drift monitor: only the const-mass fast path can drift
    # (its KKT solve refines against the frozen t=0 Jacobian); exact-solve
    # paths hold |C| at stabilization level and need no per-chunk check
    monitor_drift = bool(getattr(sim, "const_mass", False)
                         and getattr(sim, "has_constraints", False))
    drift_max = 0.0 if monitor_drift else None
    drift_warned = False

    chunks = []
    done = 0
    n_chunks = -(-num_steps // chunk)
    for ci in range(n_chunks):
        this = min(chunk, num_steps - done)
        new_state, traj = sim.run(this, state=state, params=params, start_step=done)
        pos = np.asarray(new_state.pos)
        vel = np.asarray(new_state.lin_vel)
        if not (np.isfinite(pos).all() and np.isfinite(vel).all()):
            report = GuardReport(
                completed_steps=done, diverged=True, diverged_at_chunk=ci,
                state_dump=dump_body_states(sim, state),
                max_constraint_drift=drift_max,
            )
            out = _concat(chunks) if (collect and chunks) else None
            return state, out, report
        if monitor_drift:
            d = sim.constraint_drift(traj, params=params)
            if d is not None:
                drift_max = max(drift_max, float(np.max(d)))
                if drift_max > drift_tol and not drift_warned:
                    drift_warned = True
                    import warnings

                    warnings.warn(
                        f"constraint drift |C(q)| reached {drift_max:.2e} "
                        f"(> {drift_tol:.0e}) under const_mass=True after "
                        f"step {done + this}: the refined KKT solve against "
                        "the t=0 Jacobian is not converging at this swing "
                        f"amplitude. Raise kkt_refine_iters (currently "
                        f"{getattr(sim, 'kkt_refine_iters', '?')}; measured "
                        "iters 2/4/8 -> 5e-3/1e-4/4e-8 max drift) or run "
                        "with const_mass=False.", RuntimeWarning,
                        stacklevel=2)
        state = new_state
        done += this
        if collect:
            chunks.append(traj)
        if checkpoint_path and checkpoint_every and done % checkpoint_every == 0:
            save_checkpoint(checkpoint_path, state, done)
        if on_chunk is not None:
            # during-run observability hook (CLI --live-view): receives the
            # completed step count and this chunk's trajectory
            on_chunk(done, traj)
        if progress:
            progress(done / num_steps)

    out = _concat(chunks) if collect else None
    return state, out, GuardReport(done, False, None, None,
                                   max_constraint_drift=drift_max)


def _concat(chunks):
    return jax.tree.map(lambda *xs: np.concatenate([np.asarray(x) for x in xs]), *chunks)
