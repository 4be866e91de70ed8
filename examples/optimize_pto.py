#!/usr/bin/env python3
"""Gradient-based PTO tuning: recover the RAO-predicted optimal damping.

Differentiability is this framework's headline advantage over the
reference (whose Chrono core is not differentiable): `Simulation.run` is
a pure JAX scan, so absorbed PTO power differentiates end-to-end with
respect to design parameters. This example tunes the linear PTO damping
of a heave-constrained sphere in regular waves by gradient ascent on mean
absorbed power, and checks the optimum against the closed-form result

    c_opt = sqrt(B(w)^2 + (w (m + A(w)) - K/w)^2)

with A(w), B(w) reconstructed from the BEMIO radiation IRF via Ogilvie's
relations (B = int K cos, A = A_inf - int K sin / w) — the same data the
simulation integrates, so the two routes must agree.

The production TPU inference path is the fused Pallas kernel
(run_blocked_fused); optimization deliberately runs the XLA scan path,
which the fused kernel is tested to match to ~1e-11 per step
(tests/test_fused_step.py) — that equivalence is the documented gradient
guarantee for production models (see PARITY.md).

Usage:  python examples/optimize_pto.py [--steps 40] [--n 1500]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# design optimization is a float64 job: force CPU (the axon site hook
# pre-selects the TPU platform; the env var alone loses — DEVNOTES.md)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.models.builders import sphere_heave_constrained
from hydrochrono_tpu.physics.waves import RegularWave
from hydrochrono_tpu.stepper import Simulation

DATA = os.environ.get(
    "HYDROCHRONO_DATA_DIR", "/root/reference/demos"
)
H5 = os.path.join(DATA, "sphere/hydroData/sphere.h5")


def radiation_coeffs_at(hd, omega):
    """Heave-heave A(w), B(w) via the shared Ogilvie transform
    (physics/freqdomain.radiation_coeffs — also the FD solver's source)."""
    from hydrochrono_tpu.physics.freqdomain import radiation_coeffs

    A, B = radiation_coeffs(hd, [omega])
    return float(A[0, 2, 2]), float(B[0, 2, 2])


def theoretical_optimum(hd, mass, omega):
    A, B = radiation_coeffs_at(hd, omega)
    K_hs = hd.rho * hd.g * hd.lin_stiffness[0, 2, 2]
    X = omega * (mass + A) - K_hs / omega
    return float(np.sqrt(B * B + X * X)), A, B, K_hs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40, help="Adam steps")
    ap.add_argument("--n", type=int, default=1500, help="sim steps per eval")
    ap.add_argument("--omega", type=float, default=0.8)
    args = ap.parse_args()

    hd = load_bemio_h5(H5, num_bodies=1)
    mass = 261.8e3
    spec = sphere_heave_constrained(H5, damping=1.0)
    wave = RegularWave(amplitude=1.0, omega=args.omega)
    sim = Simulation(spec, dt=0.02, wave=wave, outputs=("pos", "lin_vel"))

    c_opt, A, B, K_hs = theoretical_optimum(hd, mass, args.omega)
    print(f"BEM coefficients at w={args.omega}: A={A:.4g} B={B:.4g} "
          f"K={K_hs:.4g}")
    print(f"theory optimum: c_opt = {c_opt:.5g} N s/m")

    # average over an INTEGER number of wave periods — a fractional window
    # biases mean power and shifts the recovered optimum
    n = args.n
    period_steps = int(round(2.0 * np.pi / args.omega / 0.02))
    n_cycles = max(1, (n - n // 3) // period_steps)
    settle = n - n_cycles * period_steps

    @jax.jit
    @jax.value_and_grad
    def neg_power(log_c):
        c = jnp.exp(log_c)
        params = dict(sim.params)
        params["tsda_c"] = jnp.asarray([c])
        _, traj = sim.run(n, params=params)
        vz = traj["lin_vel"][settle:, 0, 2]
        return -c * jnp.mean(vz ** 2)  # mean absorbed power (damper only)

    import optax

    log_c = jnp.asarray(np.log(0.2 * c_opt))  # start 5x off
    opt = optax.adam(0.25)
    state = opt.init(log_c)
    for k in range(args.steps):
        val, g = neg_power(log_c)
        upd, state = opt.update(g, state)
        log_c = optax.apply_updates(log_c, upd)
        if k % 5 == 0 or k == args.steps - 1:
            print(f"  step {k:3d}: c = {float(jnp.exp(log_c)):12.5g}  "
                  f"P = {-float(val) / 1e3:10.4f} kW")

    c_star = float(jnp.exp(log_c))
    err = abs(c_star - c_opt) / c_opt
    print(f"\noptimized c = {c_star:.5g} N s/m  "
          f"(theory {c_opt:.5g}; {100 * err:.1f}% apart)")
    return 0 if err < 0.2 else 1


if __name__ == "__main__":
    sys.exit(main())
