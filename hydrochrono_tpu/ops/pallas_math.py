"""Transcendentals missing from the Mosaic TPU lowering, as f32 polynomials.

The fused step kernel (ops/pallas_step.py) needs `arctan2` and `arcsin` for
the Cardan-angle extraction in the hydrostatic restoring force
(physics/rotations.py::cardan_xyz_from_quat), but Pallas TPU has no lowering
for `atan2` / `asin`. These are branchless Cephes-style single-precision
kernels (~1 ulp over the full range) built only from primitives Mosaic does
lower: mul/add/div, sqrt, sign, select. They are plain jnp functions, so the
same code runs inside Pallas kernels and in ordinary jitted code (tests
compare them against numpy).
"""

from __future__ import annotations

import jax.numpy as jnp

_TAN_3PI_8 = 2.414213562373095  # tan(3*pi/8)
_TAN_PI_8 = 0.4142135623730950  # tan(pi/8)
_PI_2 = 1.5707963267948966
_PI_4 = 0.7853981633974483
_PI = 3.141592653589793


def atan_tpu(x):
    """arctan for f32, Cephes atanf polynomial (branchless)."""
    t = jnp.abs(x)
    t_safe = jnp.maximum(t, 1e-30)

    hi = t > _TAN_3PI_8
    mid = (t > _TAN_PI_8) & ~hi

    z = jnp.where(hi, -1.0 / t_safe, jnp.where(mid, (t - 1.0) / (t + 1.0), t))
    y0 = jnp.where(hi, _PI_2, jnp.where(mid, _PI_4, 0.0))

    zz = z * z
    p = ((8.05374449538e-2 * zz - 1.38776856032e-1) * zz + 1.99777106478e-1) * zz \
        - 3.33329491539e-1
    out = y0 + z + z * zz * p
    return jnp.where(x < 0, -out, out)


def atan2_tpu(y, x):
    """Full-quadrant arctan2 for f32 (atan_tpu + quadrant fixup)."""
    x_safe = jnp.where(x == 0.0, 1.0, x)
    base = atan_tpu(y / x_safe)
    # x > 0: base;  x < 0: base +/- pi by sign of y;  x == 0: +/- pi/2 (0 at origin)
    shift = jnp.where(y < 0, -_PI, _PI)
    out = jnp.where(x > 0, base, base + shift)
    vert = jnp.where(y > 0, _PI_2, jnp.where(y < 0, -_PI_2, 0.0))
    return jnp.where(x == 0.0, vert, out)


def asin_tpu(x):
    """arcsin for f32, Cephes asinf polynomial (branchless). |x| <= 1."""
    a = jnp.abs(x)
    big = a > 0.5
    z = jnp.where(big, 0.5 * (1.0 - a), a * a)
    s = jnp.where(big, jnp.sqrt(jnp.maximum(z, 0.0)), a)
    p = ((((4.2163199048e-2 * z + 2.4181311049e-2) * z + 4.5470025998e-2) * z
          + 7.4953002686e-2) * z + 1.6666752422e-1) * z * s + s
    out = jnp.where(big, _PI_2 - 2.0 * p, p)
    return jnp.where(x < 0, -out, out)
