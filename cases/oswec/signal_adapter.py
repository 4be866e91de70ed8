"""Signal: flap pitch (rad) — the OSWEC decay/RAO quantity
(reference analogue: tests/regression/run_hydrochrono per-model adapters)."""
import h5py
import numpy as np


def select_signal(path):
    with h5py.File(path, "r") as f:
        t = np.asarray(f["results/time/time"][:], dtype=float)
        pitch = np.asarray(f["results/model/bodies/body1/orientation_xyz"][:, 1],
                           dtype=float)
    return t, pitch, "flap pitch (rad)"
