"""Radiation-damping convolution: kernel preprocessing and TPU-friendly ops.

The Cummins-equation radiation force at time t is

    F_rad(t) = int_0^Tmax K(tau) v(t - tau) dtau
            ~= sum_s K(tau_s) . v(t - tau_s) . w_s        (trapezoid widths w_s)

where K is the [6N, 6N, Tr] rho-scaled radiation IRF on the grid tau_s
(reference: hydro_forces.cpp:537-691). The reference linearly interpolates the
velocity history at the query times t - tau_s. With a *fixed* simulation step
dt, every query time falls at a fixed fractional offset between history
samples, so the interpolation weights are constant across steps. That lets us
push the interpolation into the kernel once, producing an equivalent kernel W
indexed by *history lag m* (in units of dt):

    v(t - tau_s) = (1-f_s) v[n - l_s] + f_s v[n - l_s - 1],
        l_s = floor(tau_s/dt), f_s = frac(tau_s/dt)
    W[m] = sum_s w_s K(tau_s) [ (1-f_s) 1{m=l_s} + f_s 1{m=l_s+1} ]
    F_rad[n] = sum_m W[m] . v[n - m]

This is bit-equivalent to the reference *provided* the initial velocity is
zero: the reference skips lags with no bracketing history during warm-up
(hydro_forces.cpp:604-606), which equals zero-padding the history buffer when
v(0) = 0 (true for every reference workload — all demos start from rest).

The per-step product then becomes one MXU matmul over the whole batch:
    F[b, i] = sum_{m,j} W[m, i, j] Vhist[b, m, j].

TaperedDirect preprocessing (smoothing / truncation / half-cosine taper) is a
host-side transform applied to the raw kernel before resampling
(reference: hydro_forces.cpp:385-535).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from hydrochrono_tpu.ops.mxu import FULL, radiation_precision

from hydrochrono_tpu.io.bemio import trapezoid_widths


@dataclasses.dataclass(frozen=True)
class TaperedDirectOptions:
    """Defaults match the reference (hydro_forces.h:236-259)."""

    smoothing: str = "sg"  # "sg" (Savitzky-Golay 5pt) or "moving_average"
    window_length: int = 5
    rirf_end_time: float = -1.0  # <=0 means full length
    taper_start_percent: float = 0.8
    taper_end_percent: float = 1.0
    taper_final_amplitude: float = 0.0


def preprocess_rirf_tapered(
    rirf: np.ndarray, rirf_time: np.ndarray, opts: TaperedDirectOptions
) -> np.ndarray:
    """TaperedDirect kernel conditioning (reference: hydro_forces.cpp:385-535).

    rirf: [6N, 6N, Tr] rho-scaled kernel. Returns same shape.
    """
    k = np.array(rirf, dtype=np.float64)
    steps = k.shape[-1]

    effective = steps
    if opts.rirf_end_time > 0.0:
        dt_r = rirf_time[1] - rirf_time[0]
        effective = min(int(np.floor(opts.rirf_end_time / dt_r)), steps)

    kr = k[..., :effective]

    # smoothing
    if opts.smoothing == "moving_average":
        w = max(3, opts.window_length)
        half = w // 2
        sm = np.empty_like(kr)
        for s in range(effective):
            a, b = max(0, s - half), min(effective - 1, s + half)
            sm[..., s] = kr[..., a : b + 1].mean(axis=-1)
    else:
        sm = kr.copy()
        if effective >= 5:
            sg5 = np.array([-3.0, 12.0, 17.0, 12.0, -3.0]) / 35.0
            for s in range(2, effective - 2):
                sm[..., s] = (
                    sg5[0] * kr[..., s - 2]
                    + sg5[1] * kr[..., s - 1]
                    + sg5[2] * kr[..., s]
                    + sg5[3] * kr[..., s + 1]
                    + sg5[4] * kr[..., s + 2]
                )

    # half-cosine taper
    tc = int(np.floor(opts.taper_start_percent * effective))
    tc_end = int(np.floor(opts.taper_end_percent * effective))
    tc = max(0, min(tc, effective))
    tc_end = max(tc, min(tc_end, effective))
    taper_len = tc_end - tc
    fa = opts.taper_final_amplitude

    weights = np.ones(effective)
    if taper_len > 0:
        s = np.arange(tc, tc_end)
        tt = (s - tc) / taper_len
        weights[tc:tc_end] = fa + (1.0 - fa) * 0.5 * (1.0 + np.cos(np.pi * tt))
    weights[tc_end:] = 0.0

    out = np.zeros_like(k)
    out[..., :effective] = sm * weights
    return out


def resample_kernel_to_history(
    rirf: np.ndarray, rirf_time: np.ndarray, dt: float
) -> np.ndarray:
    """Fold trapezoid quadrature + velocity interpolation into a history-lag kernel.

    Returns W: [H, 6N, 6N] with H = floor(tau_max/dt) + 2 such that
    F_rad[n] = sum_m W[m] @ v[n - m] reproduces the reference convolution for
    zero initial velocity. Time axis moved first so the per-step contraction
    is a single [B, H*6N] x [H*6N, 6N] matmul.
    """
    rirf_time = np.asarray(rirf_time, dtype=np.float64)
    w = trapezoid_widths(rirf_time)
    ratio = rirf_time / dt
    l = np.floor(ratio + 1e-12).astype(np.int64)
    f = ratio - l
    # guard tiny negative due to the epsilon
    f = np.where(f < 0, 0.0, f)

    H = int(l[-1]) + 2
    nd = rirf.shape[0]
    W = np.zeros((H, nd, nd))
    kw = np.moveaxis(rirf, -1, 0) * w[:, None, None]  # [Tr, 6N, 6N]
    np.add.at(W, l, (1.0 - f)[:, None, None] * kw)
    np.add.at(W, l + 1, f[:, None, None] * kw)
    return W


def radiation_force(W_rev: jnp.ndarray, vhist: jnp.ndarray, step: jnp.ndarray) -> jnp.ndarray:
    """Per-step radiation force from a ring buffer.

    W_rev: [H, 6N, 6N] = W[::-1] (host-precomputed reversed kernel)
    vhist: [..., H, 6N] ring buffer; slot (n mod H) holds v at step n
    step:  current step index n (traced scalar); vhist slot n holds v(t_n)

    Returns [..., 6N].
    """
    H = W_rev.shape[0]
    # W2[slot] = W[(n - slot) mod H]
    W2 = jnp.roll(W_rev, step + 1, axis=0)
    return jnp.einsum("mij,...mj->...i", W2, vhist, precision=FULL)


def radiation_force_linear(W: jnp.ndarray, vhist_recent: jnp.ndarray) -> jnp.ndarray:
    """Radiation force when the history is stored newest-first (no ring).

    vhist_recent: [..., H, 6N] with index m = lag m*dt. Mainly for tests.
    """
    return jnp.einsum("mij,...mj->...i", W, vhist_recent, precision=FULL)


# ---------------------------------------------------------------------------
# blocked (far-field) convolution
# ---------------------------------------------------------------------------
#
# The per-step formulation reads the whole velocity history every step —
# arithmetic intensity 6N/2 flops/byte, i.e. HBM-bandwidth-bound on TPU. The
# blocked scheme splits F[n0+d] = sum_m W[m] v[n0+d-m] at m = d:
#
#   intra (m <= d):  uses only this block's velocities — tiny, stays in the
#                    inner scan
#   far   (m > d):   uses only pre-block history — computed ONCE per block for
#                    all T_b offsets as a single MXU matmul against a
#                    precomputed Hankel expansion of W:
#
#       F_far[d] = sum_j W[d+1+j] . Vold[j],   Vold[j] = v[n0-1-j]
#                = [B, (H-1)*6N] @ Hankel(W)[(H-1)*6N, T_b*6N]
#
# Hankel(W) is static (built once, shared across the batch); the history is
# read once per T_b steps instead of every step — bandwidth / T_b.


def build_hankel_far_kernel(W: np.ndarray, block: int) -> np.ndarray:
    """Hankel expansion Wfar[d, j] = W[d+1+j] (zero past the end).

    W: [H, K, K]; returns [block, H-1, K, K] (float64 host-side; cast at use).
    """
    H, K, _ = W.shape
    Wfar = np.zeros((block, H - 1, K, K), dtype=W.dtype)
    for d in range(block):
        n = H - 1 - d  # number of valid j entries
        if n > 0:
            Wfar[d, :n] = W[d + 1 : d + 1 + n]
    return Wfar


def far_field_block(Wfar: jnp.ndarray, vold: jnp.ndarray) -> jnp.ndarray:
    """F_far [..., T_b, K] from newest-first old history vold [..., Hj, K]."""
    # memoryless history dot: single-pass precision by policy (ops/mxu.py —
    # golden-gated; HIGHEST here measured 2.1x on the whole fused step)
    return jnp.einsum("djik,...jk->...di", Wfar, vold,
                      precision=radiation_precision())


def build_hankel_excitation(E: np.ndarray, block: int) -> np.ndarray:
    """Hankel expansion of the eta-space excitation kernel.

    E: [K, M] with F_exc[n, i] = sum_u E[i, u] eta[n+u]. For a block of T_b
    steps the window eta[n0 : n0+T_b-1+M] gives
        F_exc[d, i] = sum_j EH[d, j, i] etaw[j],  EH[d, j, i] = E[i, j-d]
    Returns EH [block, M+block-1, K].
    """
    K, M = E.shape
    EH = np.zeros((block, M + block - 1, K), dtype=E.dtype)
    for d in range(block):
        EH[d, d : d + M] = E.T
    return EH


def excitation_block(EH: jnp.ndarray, eta_window: jnp.ndarray) -> jnp.ndarray:
    """F_exc [..., T_b, K] for the block from eta window [..., M+T_b-1]."""
    return jnp.einsum("djk,...j->...dk", EH, eta_window,
                      precision=radiation_precision())


def excitation_block_spread(EH: jnp.ndarray, eta_windows: jnp.ndarray) -> jnp.ndarray:
    """Directional seas: per-heading Hankel kernels EH [H, T_b, M+T_b-1, K]
    against per-heading eta windows [..., H, M+T_b-1], summed over H."""
    return jnp.einsum("hdjk,...hj->...dk", EH, eta_windows,
                      precision=radiation_precision())
