#!/usr/bin/env python3
"""Generate the synthetic BEMIO coefficient files for the in-repo YAML
regression case library (cases/).

The reference ships its model h5 files as git-LFS blobs that are missing
from the mirror (rm3.h5, oswec.h5, f3of.h5, deepcwind.h5 — see
/root/reference/.MISSING_LARGE_BLOBS), so every non-sphere topology is
exercised with deterministic synthetic coefficients of the right shape
(io/synth.py). Seeds/shapes are FROZEN: regenerating must reproduce the
committed expected baselines bit-for-bit.

Run `python cases/gen_assets.py` once before `tools/run_tests.py
--root cases`; the pytest suite generates them automatically.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")

SPECS = {
    # RM3 float + reaction plate (demos/rm3)
    "rm3.h5": dict(
        num_bodies=2, seed=11,
        cg_list=[np.array([0.0, 0.0, -0.72]), np.array([0.0, 0.0, -21.29])],
        rirf_tmax=6.0, rirf_steps=301,
    ),
    # OSWEC pitching flap (demos/oswec); base is anchored, only the flap
    # carries hydro coefficients
    "oswec.h5": dict(
        num_bodies=1, seed=21,
        cg_list=[np.array([0.0, 0.0, -3.9])],
        rirf_tmax=6.0, rirf_steps=301,
    ),
    # F3OF base + two flaps, full 18x18 coupling (demos/f3of)
    "f3of.h5": dict(
        num_bodies=3, seed=31,
        cg_list=[np.array([0.0, 0.0, -9.0]),
                 np.array([-12.5, 0.0, -6.0]),
                 np.array([12.5, 0.0, -6.0])],
        rirf_tmax=6.0, rirf_steps=301, coupling=0.2,
    ),
    # 2x2 sphere wave farm (beyond-reference; SURVEY §2.5 TP row): 4
    # identical coupled point absorbers with exact order-2 state-space
    # radiation fits — drives const_mass + state_space through the full
    # YAML surface (cases/farm)
    "farm4.h5": dict(
        num_bodies=4, seed=71, state_space=True,
        cg_list=[np.array([0.0, 0.0, -2.0])] * 4,
        cb_list=[np.array([0.0, 0.0, -1.7])] * 4,
        disp_vol=[261.8] * 4,
        rirf_tmax=6.0, rirf_steps=301,
    ),
    # DeepCWind semisubmersible platform (demos/DeepCWind)
    "deepcwind.h5": dict(
        num_bodies=1, seed=41,
        cg_list=[np.array([0.0, 0.0, -13.46])],
        disp_vol=[13917.0],
        rirf_tmax=6.0, rirf_steps=301,
    ),
}


def ensure_assets(verbose: bool = False) -> str:
    from hydrochrono_tpu.io.synth import write_bemio_h5

    os.makedirs(ASSETS, exist_ok=True)
    for name, kw in SPECS.items():
        path = os.path.join(ASSETS, name)
        if not os.path.exists(path):
            kw = dict(kw)
            nb = kw.pop("num_bodies")
            write_bemio_h5(path, nb, **kw)
            if verbose:
                print(f"wrote {path}")
    return ASSETS


if __name__ == "__main__":
    ensure_assets(verbose=True)
