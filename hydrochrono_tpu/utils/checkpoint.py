"""Simulation checkpoint / resume.

The reference has no checkpointing (SURVEY.md §5 "Checkpoint / resume:
None"); long batched TPU runs want it. A checkpoint captures the full
dynamic state (including the radiation history ring buffer / state-space
states) plus the step counter, so a resumed run continues bit-exactly on
the per-step path (`Simulation.run(..., start_step=...)`).

Stored as a portable .npz (one file per checkpoint) plus an optional JSON
metadata sidecar — no framework dependencies, loadable anywhere.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from hydrochrono_tpu.stepper import State


def save_checkpoint(path: str, state: State, step: int, meta: dict | None = None) -> str:
    """Write a checkpoint; returns the path written."""
    arrays = {f.name: np.asarray(getattr(state, f.name))
              for f in dataclasses.fields(State)}
    payload = dict(arrays)
    payload["_step"] = np.asarray(step, dtype=np.int64)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **payload)
    out = path if path.endswith(".npz") else path + ".npz"
    if meta:
        with open(out + ".json", "w") as fh:
            json.dump(meta, fh)
    return out


def load_checkpoint(path: str, dtype=None):
    """Read a checkpoint; returns (State, step)."""
    import jax.numpy as jnp

    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    step = int(data["_step"])
    kwargs = {}
    for f in dataclasses.fields(State):
        if f.name not in data:
            # field added after the checkpoint was written (e.g. `hht`,
            # round 3): fall back to the empty default — run() re-derives
            # the HHT carry when it is absent
            kwargs[f.name] = jnp.zeros((0,), dtype)
            continue
        arr = data[f.name]
        kwargs[f.name] = jnp.asarray(arr, dtype) if dtype else jnp.asarray(arr)
    return State(**kwargs), step
