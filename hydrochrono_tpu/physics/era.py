"""Shared-pole radiation realization via the Eigensystem Realization Algorithm.

The production radiation convolution is a discrete FIR over the dt-resampled
lag kernel W (physics/radiation.py; reference hot loop being replaced:
hydro_forces.cpp:537-691):

    F[n] = sum_{m=0}^{H-1} W[m] @ v[n-m],   W[m] in R^{KxK}, K = 6N.

ERA fits a minimal shared-state LTI system to exactly this Markov sequence
(Juang & Pappa 1985; marine-hydro use: Taghipour, Perez & Fossen 2008):

    z[n+1] = Ad z[n] + Bd v[n]
    F[n]   = C z[n] + D v[n],      D = W[0],  C Ad^{s-1} Bd ~= W[s]

so the per-step radiation cost collapses from an O(H K^2) history matmul
(or an O(o^2 K^2) per-entry state advance, physics/statespace.py) to three
small MXU matmuls against ONE [M] state vector — M is the numerical rank of
the block-Hankel matrix of the kernel (tens, not thousands). Unlike the
BEMIO per-entry state-space fits this needs nothing extra in the h5: it is
computed from the same RIRF the convolution uses (taper/smoothing included),
so `radiation="era"` works for every BEMIO file.

Accuracy is controlled by the Hankel singular-value truncation `tol` and
reported as `markov_rel_err` (Frobenius error over the whole Markov
sequence); golden-trajectory gates in tests/test_era.py and
tools/tpu_golden_gates.py decide fitness per workload.

The Hankel factorization uses a randomized SVD with FFT-based block-Hankel
matvecs, so farm-scale fits ([H~750, 48, 48] kernels -> 18000^2 Hankel
matrices) take seconds instead of an O((qK)^3) dense SVD.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class EraRadiation:
    """Discrete shared-state radiation system, host-side float64.

    Ad [M, M], Bd [M, K], C [K, M], D [K, K] with K = 6N;
    sing_vals: leading Hankel singular values (diagnostics);
    markov_rel_err: Frobenius-norm relative error of the reconstructed
    Markov sequence vs the lag kernel it realizes.
    """

    Ad: np.ndarray
    Bd: np.ndarray
    C: np.ndarray
    D: np.ndarray
    sing_vals: np.ndarray
    markov_rel_err: float

    @property
    def order(self) -> int:
        return self.Ad.shape[0]


class _HankelOps:
    """FFT-based matvecs for the block-Hankel matrices H0/H1 of a Markov
    sequence A[s] in R^{KxK}: H[i, j] = A[off + i + j], i < p, j < q."""

    def __init__(self, markov: np.ndarray, p: int, q: int):
        self.A = markov  # [T, K, K]
        self.K = markov.shape[1]
        self.p, self.q = p, q
        self.nfft = 1 << int(np.ceil(np.log2(p + q)))
        # forward (H @ X) uses A as-is; adjoint (H^T @ Y) uses block
        # transposes with p/q swapped
        self.Fa = np.fft.rfft(markov, self.nfft, axis=0)
        self.Fat = np.fft.rfft(markov.transpose(0, 2, 1), self.nfft, axis=0)

    def _corr(self, F_a, X, n_lead, n_out, off):
        """y[i] = sum_j A[off + i + j] X[j] for i < n_out, X [n_lead, K, r].

        Correlation via FFT: reverse X in lag, convolve, read the aligned
        slice. off shifts the kernel (0 for H0, 1 for H1).
        """
        Xr = X[::-1]
        Fx = np.fft.rfft(Xr, self.nfft, axis=0)
        prod = np.einsum("fab,fbr->far", F_a, Fx)
        y = np.fft.irfft(prod, self.nfft, axis=0)
        return y[n_lead - 1 + off : n_lead - 1 + off + n_out]

    def matmul(self, X, off=0):
        """H_off @ X: X [qK, r] -> [pK, r]."""
        r = X.shape[1]
        Xb = X.reshape(self.q, self.K, r)
        y = self._corr(self.Fa, Xb, self.q, self.p, off)
        return y.reshape(self.p * self.K, r)

    def rmatmul(self, Y, off=0):
        """H_off^T @ Y: Y [pK, r] -> [qK, r]."""
        r = Y.shape[1]
        Yb = Y.reshape(self.p, self.K, r)
        z = self._corr(self.Fat, Yb, self.p, self.q, off)
        return z.reshape(self.q * self.K, r)


_FIT_CACHE: dict = {}


def era_fit(
    W: np.ndarray,
    order: int | None = None,
    tol: float = 1e-6,
    max_order: int = 192,
    power_iters: int = 1,
    seed: int = 0,
) -> EraRadiation:
    """Realize the lag kernel W [H, K, K] as (Ad, Bd, C, D).

    order: fixed state dimension; None = smallest M with
    sigma_M / sigma_0 < tol (capped at max_order). Fits are memoized
    in-process on (kernel bytes, options) — rebuilding a Simulation with
    the same kernel is free.
    """
    import hashlib

    key = (hashlib.sha256(np.ascontiguousarray(W)).hexdigest(),
           W.shape, order, tol, max_order, power_iters, seed)
    hit = _FIT_CACHE.get(key)
    if hit is not None:
        return hit
    out = _era_fit_impl(W, order, tol, max_order, power_iters, seed)
    _FIT_CACHE[key] = out
    return out


def _era_fit_impl(W, order, tol, max_order, power_iters, seed):
    W = np.asarray(W, dtype=np.float64)
    H, K, _ = W.shape
    D = W[0].copy()
    Wm = W[1:]  # Markov parameters C Ad^{s-1} Bd, s = 1..H-1
    T = Wm.shape[0]
    scale = np.linalg.norm(Wm)
    if T == 0 or scale == 0.0:
        return EraRadiation(
            Ad=np.zeros((0, 0)), Bd=np.zeros((0, K)), C=np.zeros((K, 0)),
            D=D, sing_vals=np.zeros(0), markov_rel_err=0.0)

    # Hankel extents: H1 needs i + j + 1 <= T - 1
    q = max(T // 2, 1)
    p = max(T - q, 1)
    ops = _HankelOps(Wm, p, q)

    cap = int(min(max_order if order is None else order, p * K, q * K))
    rng = np.random.default_rng(seed)
    # adaptive sketch: physical kernels have modal order ~tens, so start
    # small and escalate only if the singular-value tail hasn't dropped
    # below tol inside the sketch (each matvec is O(nfft K^2 sketch) — a
    # full-cap sketch costs minutes at farm-scale K for nothing)
    sketch = min(64, cap + 24, q * K)
    while True:
        Om = rng.standard_normal((q * K, sketch))
        Y = ops.matmul(Om)
        for _ in range(power_iters):
            Y = ops.matmul(ops.rmatmul(Y))
        Q, _ = np.linalg.qr(Y)
        Z = ops.rmatmul(Q)  # [qK, sketch] = H0^T Q
        Ub, S, Vt = np.linalg.svd(Z.T, full_matrices=False)
        tail_ok = (S[min(cap, len(S)) - 1] < tol * S[0]
                   if order is None else len(S) >= min(order + 8, cap + 8))
        if tail_ok or sketch >= min(cap + 24, q * K):
            break
        sketch = min(max(sketch * 4, cap // 2), cap + 24, q * K)
    U = Q @ Ub  # left singular vectors of H0

    if order is None:
        M = int(np.sum(S >= tol * S[0]))
        M = max(1, min(M, cap))
    else:
        M = int(min(order, len(S)))
    Us, Ss, Vs = U[:, :M], S[:M], Vt[:M].T  # Vs [qK, M]
    rs = np.sqrt(Ss)

    H1V = ops.matmul(Vs, off=1)  # [pK, M]
    Ad = (Us.T @ H1V) / np.outer(rs, rs)
    Bd = rs[:, None] * Vs[:K, :].T  # first block column of S^1/2 V^T
    C = Us[:K, :] * rs[None, :]  # first block row of U S^1/2

    # enforce discrete-time stability (rare: a truncated realization of a
    # decaying kernel is almost always stable; clip any |lambda| >= 1)
    lam, V = np.linalg.eig(Ad)
    mag = np.abs(lam)
    if np.any(mag >= 1.0):
        lam = lam * np.minimum(1.0, (1.0 - 1e-9) / mag)
        Ad = np.real(V @ np.diag(lam) @ np.linalg.inv(V))

    rec = reconstruct_markov(Ad, Bd, C, T)
    err = float(np.linalg.norm(rec - Wm) / scale)
    return EraRadiation(Ad=Ad, Bd=Bd, C=C, D=D,
                        sing_vals=S[: min(len(S), M + 8)].copy(),
                        markov_rel_err=err)


def reconstruct_markov(Ad, Bd, C, T: int) -> np.ndarray:
    """[T, K, K] with entry s = C Ad^s Bd (the realized W[1 + s])."""
    K = C.shape[0]
    out = np.empty((T, K, K))
    G = Bd.copy()
    for s in range(T):
        out[s] = C @ G
        G = Ad @ G
    return out


def era_step_fused(Ad, Bd, C, D, z, v):
    """(F, z+) — jit-safe single pass; z [..., M], v [..., K].

    F[n] = C z[n] + D v[n];  z[n+1] = Ad z[n] + Bd v[n]. Matches the
    radiation_force/ring-buffer time alignment (W[0] multiplies the
    current velocity; see stepper._step).
    """
    import jax.numpy as jnp

    from hydrochrono_tpu.ops.mxu import FULL

    f = (jnp.einsum("km,...m->...k", C, z, precision=FULL)
         + jnp.einsum("kj,...j->...k", D, v, precision=FULL))
    zn = (jnp.einsum("nm,...m->...n", Ad, z, precision=FULL)
          + jnp.einsum("nj,...j->...n", Bd, v, precision=FULL))
    return f, zn


def fir_reference(W, vs):
    """Direct FIR convolution for tests: vs [T, K] -> F [T, K] (numpy)."""
    H = W.shape[0]
    T, K = vs.shape
    out = np.zeros((T, K))
    for n in range(T):
        m = np.arange(0, min(H, n + 1))
        out[n] = np.einsum("mij,mj->i", W[m], vs[n - m])
    return out
