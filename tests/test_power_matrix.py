"""Power-matrix tool (tools/power_matrix.py + Simulation.irregular_eta_grid).

Physics gate: for a linear WEC, mean absorbed PTO power scales with Hs^2
(spectrum density scales with Hs^2 and every response is linear in eta), so
P(2 Hs) / P(Hs) must be ~4 on the same phase seed.
"""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.physics.system import (
    Body, HydroAttachment, Joint, SystemSpec, TSDA)
from hydrochrono_tpu.physics.waves import IrregularWaveParams
from hydrochrono_tpu.stepper import Simulation

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SPHERE_H5 = "/root/reference/demos/sphere/hydroData/sphere.h5"


@pytest.fixture(scope="module")
def pto_sim():
    hydro = load_bemio_h5(SPHERE_H5, 1)
    spec = SystemSpec(
        bodies=[Body("body1", 261.8e3, (0.0, 0.0, -2.0)),
                Body("ground", 999.0, (0.0, 0.0, -5.0), fixed=True)],
        joints=[Joint("prismatic", 0, 1, location=(0.0, 0.0, -2.0),
                      axis=(0.0, 0.0, 1.0))],
        tsdas=[TSDA(0, 1, (0.0, 0.0, -2.0), (0.0, 0.0, -5.0),
                    spring_coeff=0.0, damping_coeff=3e5)],
        hydro=HydroAttachment(hydro, [0]), gravity=(0.0, 0.0, -9.81))
    wave = IrregularWaveParams(height=1.0, period=8.0, nfrequencies=120,
                               ramp_duration=10.0, seed=3)
    return Simulation(spec, dt=0.015, wave=wave, duration=120.0,
                      dtype=jnp.float64, outputs=("pos", "tsda"))


def test_power_matrix_hs_squared_scaling(pto_sim):
    from power_matrix import compute_power_matrix

    P, std, per = compute_power_matrix(
        pto_sim, pto_sim.wave, hs_list=[1.0, 2.0], tp_list=[7.0, 9.0],
        seeds=1, use_fused=False)
    assert P.shape == (2, 2) and per.shape == (2, 2, 1)
    assert np.isfinite(P).all() and (P > 0).all()
    ratio = P[1] / P[0]  # P(2m) / P(1m) per Tp column
    assert np.all(ratio > 3.3) and np.all(ratio < 4.7), ratio


def test_irregular_eta_grid_matches_single_build(pto_sim):
    """Grid entry (Hs, Tp, seed) == the eta a dedicated Simulation builds."""
    import dataclasses

    w2 = dataclasses.replace(pto_sim.wave, height=1.7, period=9.5, seed=11)
    eta_grid = np.asarray(pto_sim.irregular_eta_grid([w2]))[0]
    sim2 = Simulation(pto_sim.spec, dt=pto_sim.dt, wave=w2,
                      duration=pto_sim.duration, dtype=jnp.float64,
                      outputs=("pos",))
    eta_ref = np.asarray(sim2.params["irr_eta"])
    m = min(len(eta_grid), len(eta_ref))
    np.testing.assert_array_equal(eta_grid[:m], eta_ref[:m])
    # padding region (if any) is zeros
    assert not np.any(eta_grid[m:]) and not np.any(eta_ref[m:])
