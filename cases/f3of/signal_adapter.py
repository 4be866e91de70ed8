"""Signal: front flap pitch (rad) — the F3OF DT3 decay quantity."""
import h5py
import numpy as np


def select_signal(path):
    with h5py.File(path, "r") as f:
        t = np.asarray(f["results/time/time"][:], dtype=float)
        pitch = np.asarray(f["results/model/bodies/body2/orientation_xyz"][:, 1],
                           dtype=float)
    return t, pitch, "front flap pitch (rad)"
