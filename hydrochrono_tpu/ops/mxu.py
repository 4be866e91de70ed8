"""TPU MXU matmul precision policy.

On TPU, the DEFAULT precision for float32 `jnp.dot`/`jnp.einsum` is a
single bf16 MXU pass: ~2.3e-3 relative error (measured on v5e, jax 0.9 —
probe in DEVNOTES round 3; HIGH = 3-pass bf16x3 ~1.3e-5, HIGHEST = true
f32 ~1.4e-7). That default is fine for ML losses but NOT for physics
matmuls that feed an integrator: a 0.4%/step bias in the hydrostatic
stiffness shifts every natural frequency, and was exactly the farm-kernel
vs XLA-path divergence chased down in round 3.

Policy:
- Every f32 matmul on the physics/solver path is pinned to HIGHEST via
  `FULL`. These contractions are small ([6N, 6N] solves, [N, 6, 6]
  restoring) or feed a recursion whose error compounds (the ERA/state-
  space advance z <- Ad z + B v over 10^4+ steps), so the extra MXU
  passes are either invisible or load-bearing.
- The radiation/excitation HISTORY contractions (far-field Hankel
  matmul, mid-field slab matmul, in-block intra, excitation windows) run
  at the TPU default — ONE bf16 MXU pass with f32 accumulation — via
  `radiation_precision()`. These are MEMORYLESS dots of past velocities
  (no error recursion), they are where the conv-path FLOPs live, and the
  strictly-worse configuration (bf16 OPERANDS, the `far_dtype` knob) was
  measured passing every reference golden gate with 429x/707x margins
  (tools/tpu_golden_gates.py gate 6). Pinning them to HIGHEST was
  measured costing 2.1x on the whole RM3 fused step (14.2 vs ~6.6
  us/step at B=512 — the late-round-3 "degraded chip" conv numbers were
  actually this pin).

Note bf16 operands + HIGHEST is still a single exact pass — the pass
multiplication only applies to f32 inputs — so it is always safe to pass
`precision=FULL` when operands may be bf16.
"""

from __future__ import annotations

import os

import jax

FULL = jax.lax.Precision.HIGHEST

_RAD = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[os.environ.get("HYDROCHRONO_RADIATION_PRECISION", "default").lower()]


def radiation_precision(dtype=None):
    """Precision for the memoryless radiation/excitation history
    contractions (see module policy). Override with
    HYDROCHRONO_RADIATION_PRECISION={default,high,highest} for an exact-
    f32 history convolution at ~3x/6x the far-field cost."""
    return _RAD


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
