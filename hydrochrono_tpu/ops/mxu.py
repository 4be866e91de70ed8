"""TPU MXU matmul precision policy.

On TPU, the DEFAULT precision for float32 `jnp.dot`/`jnp.einsum` is a
single bf16 MXU pass: ~2.3e-3 relative error (measured on v5e, jax 0.9 —
probe in DEVNOTES round 3; HIGH = 3-pass bf16x3 ~1.3e-5, HIGHEST = true
f32 ~1.4e-7). That default is fine for ML losses but NOT for physics
matmuls that feed an integrator: a 0.4%/step bias in the hydrostatic
stiffness shifts every natural frequency, and was exactly the farm-kernel
vs XLA-path divergence chased down in round 3.

Policy:
- Every f32 matmul on the physics path is pinned to HIGHEST via `FULL`.
  These contractions are small ([6N, 6N] solves, [N, 6, 6] restoring,
  order-2 state-space); the extra MXU passes are invisible next to the
  surrounding work.
- The radiation-history contractions (far-field Hankel matmul, mid-field
  slab matmul, excitation windows) honor the existing `far_dtype` knob:
  f32 operands get HIGHEST (true f32 — the accuracy the knob always
  claimed), bf16 operands keep the single-pass fast path (bf16 inputs
  are exact in one pass, so HIGHEST costs nothing there). Use
  `radiation_precision(dtype)`.

Note bf16 operands + HIGHEST is still a single exact pass — the pass
multiplication only applies to f32 inputs — so it is always safe to pass
`precision=FULL` when operands may be bf16.
"""

from __future__ import annotations

import jax

FULL = jax.lax.Precision.HIGHEST


def radiation_precision(dtype):
    """Precision for the radiation/excitation history contractions."""
    # bf16 inputs: one MXU pass is exact, HIGHEST adds nothing; f32
    # inputs: HIGHEST restores true f32 (default would silently be bf16).
    return FULL


def with_full_matmul(fn):
    """Run `fn` with default matmul precision pinned to HIGHEST.

    Trace-time setting — free at runtime; used for solver routines whose
    many small einsums would be noisy to annotate individually."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
