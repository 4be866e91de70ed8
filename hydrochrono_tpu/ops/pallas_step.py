"""Fused per-step Pallas TPU kernel: forces + KKT solve + integration.

Why this exists (PERF.md "fusion lottery"): the vmapped XLA step graph
compiles into dozens of small fused kernels whose per-scan-step dispatch
overhead dominates the ~1 us of actual math, and whose partitioning is
chaotically sensitive to the graph (measured 134 us/step for RM3 at B=512,
and *removing* work sometimes made it slower). This module fuses the entire
step body — gravity/gyroscopic forces, TSDA/RSDA elements, hydrostatic
restoring (with polynomial Cardan-angle extraction, ops/pallas_math.py),
analytic constraint Jacobians, the unrolled Cholesky/Schur KKT solve and the
semi-implicit update — into ONE Pallas kernel, so a scan step is a single
dispatch regardless of how XLA feels about fusion that day.

Layout: component-major batch tiles. Every per-instance physical scalar is a
[R, 128] array (R*128 = batch tile), i.e. exactly one (sublane, lane) vector
register per op at R=8. State is packed as [C, RB, 128] where C enumerates
scalar components (pos/quat/vel rows per body) and RB*128 = padded batch.
Shared run constants (masses, inertia, A_inf, stiffness, joint/TSDA anchors)
travel in ONE flat f32 vector in SMEM and are broadcast against the batch
registers — so per-step HBM traffic is just the state + forcing tiles.

The radiation/excitation history terms stay OUTSIDE the kernel: the blocked
far-field Hankel matmul and the eta-window matmul are already MXU-shaped
(physics/radiation.py); the kernel receives their per-step combination
`fx = f_wave - f_rad` as a [6Nh, RB, 128] operand.

The step math mirrors stepper.Simulation._step_core exactly (reference hot
loop being replaced: hydro_forces.cpp:537-691 + Chrono's per-step solve);
the analytic Jacobian rows are verified against the jvp-based ones in
tests/test_fused_step.py. The same `step_rows` function runs outside Pallas
too (it is plain jnp), which is how CPU tests validate the kernel path via
`interpret=True`.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from hydrochrono_tpu.ops.pallas_math import asin_tpu, atan2_tpu

LANE = 128


# ---------------------------------------------------------------------------
# tiny scalar/vector helpers over "batch scalars" ([R,128] arrays or floats)
# ---------------------------------------------------------------------------

def _sadd(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return a + b


def _ssub(a, b):
    if b is None:
        return a
    if a is None:
        return -b
    return a - b


def _smul(a, b):
    if a is None or b is None:
        return None
    return a * b


def _sneg(a):
    return None if a is None else -a


def _dot3(a, b):
    return _sadd(_sadd(_smul(a[0], b[0]), _smul(a[1], b[1])), _smul(a[2], b[2]))


def _cross3(a, b):
    return [
        _ssub(_smul(a[1], b[2]), _smul(a[2], b[1])),
        _ssub(_smul(a[2], b[0]), _smul(a[0], b[2])),
        _ssub(_smul(a[0], b[1]), _smul(a[1], b[0])),
    ]


def _vadd(a, b):
    return [_sadd(x, y) for x, y in zip(a, b)]


def _vsub(a, b):
    return [_ssub(x, y) for x, y in zip(a, b)]


def _vscale(s, a):
    return [_smul(s, x) for x in a]


def _z(x):
    """Structural zero -> concrete 0.0 (for outputs that must be arrays)."""
    return 0.0 if x is None else x


def _quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return [
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ]


def _quat_conj(q):
    return [q[0], -q[1], -q[2], -q[3]]


def _quat_rotate(q, v):
    """Rotate 3-vector v (list, entries scalar/None) by quaternion q."""
    w, u = q[0], q[1:4]
    uv = _cross3(u, v)
    uuv = _cross3(u, uv)
    t = [_sadd(_smul(w, uv[k]), uuv[k]) for k in range(3)]
    return [_sadd(v[k], _smul(2.0, t[k])) for k in range(3)]


def _rot_matrix(q):
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return [
        [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
    ]


# ---------------------------------------------------------------------------
# list-based unrolled Cholesky / KKT (None-aware RHS columns)
# ---------------------------------------------------------------------------

def _chol(A, n):
    """Unrolled Cholesky with reciprocal diagonals: one rsqrt per pivot
    replaces the O(n^2 + n*nc) per-element divides in the factor+solve
    (divides cost ~10x a multiply on the VPU and dominated the fused
    step body — measured on the whole-run kernel round 4). Returns L with
    L[i][i] = sqrt(d) and the cached inverse diagonal Linv[i] = 1/sqrt(d)."""
    L = [[None] * n for _ in range(n)]
    Linv = [None] * n
    for i in range(n):
        for j in range(i + 1):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                r = jax.lax.rsqrt(s)
                Linv[i] = r
                L[i][j] = s * r  # sqrt(s) without a second transcendental
            else:
                L[i][j] = s * Linv[j]
    return L, Linv


def _chol_solve_cols(LLinv, b, n, nc):
    """Solve A x = b for A = L L^T; b is [n][nc] with None structural zeros."""
    L, Linv = LLinv
    y = [[None] * nc for _ in range(n)]
    for i in range(n):
        for c in range(nc):
            s = b[i][c]
            for k in range(i):
                s = _ssub(s, _smul(L[i][k], y[k][c]))
            y[i][c] = None if s is None else s * Linv[i]
    x = [[None] * nc for _ in range(n)]
    for i in reversed(range(n)):
        for c in range(nc):
            s = y[i][c]
            for k in range(i + 1, n):
                s = _ssub(s, _smul(L[k][i], x[k][c]))
            x[i][c] = None if s is None else s * Linv[i]
    return x


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------

class FusedStepBuilder:
    """Compiles a Simulation's step math into a single Pallas TPU kernel.

    Supported configuration (everything the production blocked TPU path
    uses): euler_implicit_linearized or HHT-alpha integrators, convolution
    radiation, TSDAs with coefficients or tabulated nonlinear curves
    (evaluated in-kernel from SMEM tables), RSDAs, float32/float64.
    Unsupported configs (motors, state-space radiation) raise at
    construction; callers fall back to the XLA step.

    Forward-only: pallas_call has no automatic VJP, so jax.grad flows
    through the XLA stepper path (stepper.run / run_batch), which remains
    fully differentiable (tests/test_talos_and_grad.py).
    """

    def __init__(self, sim, for_kernel: bool = True):
        """for_kernel=False builds a geometry-only variant (constraint rows +
        constant vector) used by the exporter to reconstruct world-frame joint
        reaction wrenches along a trajectory; it skips the kernel-path gates
        so it also serves motor / curve configurations."""
        spec = sim.spec
        self.hht = sim.integrator == "hht"
        if for_kernel:
            if sim.integrator not in ("euler_implicit_linearized", "hht"):
                raise NotImplementedError(
                    f"fused step: integrator {sim.integrator}")
            if sim.radiation not in ("convolution", "era"):
                # "era" composes with this kernel unchanged: the blocked-ERA
                # far field is just a different producer for the fpre operand
                # (stepper.run_blocked_fused); the in-kernel W_small lags are
                # identical in both modes
                raise NotImplementedError(
                    "fused step: convolution/era radiation only")
            if getattr(sim, "const_mass", False):
                # farm-scale const-mass systems take the batched XLA path
                # (stepper._step_core fast branch): with no factorization in
                # the graph it is already dense matmul work, and the
                # unrolled in-kernel Cholesky this builder emits would both
                # blow up Mosaic compile time at nv >= 24 and diverge
                # numerically from the inverse-apply design
                raise NotImplementedError("fused step: const_mass uses XLA path")
            if spec.motors:
                raise NotImplementedError("fused step: motors unsupported")
            # moorings run IN-KERNEL for both integrators (round 3): the
            # catenary Newton (mooring.catenary_newton_core — analytic 2x2
            # Jacobians, log-form asinh, every op Mosaic-lowerable) runs
            # warm-started from carried (H, V) rows, so moored systems keep
            # the sub-block dispatch amortization. Euler evaluates it once
            # at the step-start state; HHT inside each modified-Newton
            # iteration at the iterate state — both exactly the XLA path's
            # placement (stepper._forces_mech / _step_hht).
            for t in spec.tsdas:
                for curve in (t.spring_curve, t.damping_curve):
                    if curve is not None and np.any(np.diff(curve[:, 0]) <= 0):
                        # the unrolled segment interp divides by x[i+1]-x[i];
                        # duplicated breakpoints would NaN — leave such
                        # tables to the XLA path's jnp.interp
                        raise NotImplementedError(
                            "fused step: curve abscissae must be strictly "
                            "increasing")
        if sim.dtype not in (jnp.float32, jnp.dtype("float64")):
            raise NotImplementedError("fused step: float32/float64 only")
        self.dtype = sim.dtype

        self.sim = sim
        self.spec = spec
        self.nm = sim.n_moving
        self.nv = sim.nv
        self.m = sim.n_constraints
        self.nh = sim.n_hydro
        self.K = 6 * self.nh
        self.dt = sim.dt

        nm = self.nm
        # state component indices
        self.ip = lambda s, k: s * 3 + k
        self.iq = lambda s, k: nm * 3 + s * 4 + k
        self.il = lambda s, k: nm * 7 + s * 3 + k
        self.ia = lambda s, k: nm * 10 + s * 3 + k
        self.CS = nm * 13

        # extra-output component indices: acc [nv], lambda [m], tsda [4*nt]
        self.n_tsda = len(spec.tsdas)
        self.CE = self.nv + self.m + 4 * self.n_tsda
        # mooring lines: carried warm-start rows (H, V) per line
        self.n_moor = (len(spec.moorings.lines)
                       if spec.moorings is not None else 0)
        self.moor_seabed = ([bool(ml.seabed) for ml in spec.moorings.lines]
                            if spec.moorings is not None else [])
        self.CM = 2 * self.n_moor

        self._build_cvec_layout()

    # -- constant vector ---------------------------------------------------
    def _build_cvec_layout(self):
        sim, spec = self.sim, self.spec
        off = {}
        fetch = []  # (name, size, fn(params) -> flat array, batch_key)
        pos = 0

        def reg(name, size, fn, batch_key=None):
            nonlocal pos
            off[name] = pos
            pos += size
            fetch.append((name, size, fn, batch_key))

        reg("mass", self.nm, lambda p: p["mass"], batch_key="mass")
        if getattr(sim, "has_viscous", False):
            nm6 = self.nm * 6
            reg("visc_lin", nm6, lambda p: p["visc_lin"].reshape(
                p["visc_lin"].shape[:-2] + (nm6,)), batch_key="visc_lin")
            reg("visc_quad", nm6, lambda p: p["visc_quad"].reshape(
                p["visc_quad"].shape[:-2] + (nm6,)), batch_key="visc_quad")
        reg("g", 3, lambda p: p["_const"]["gravity"])
        reg("inertia", self.nm * 9,
            lambda p: p["_const"]["inertia_body"].reshape(-1))
        reg("ainf", self.nv * self.nv, lambda p: p["_const"]["ainf"].reshape(-1))

        if sim.hydro is not None:
            nh = self.nh
            reg("rho_g", 1, lambda p: (
                sim.rho * jnp.linalg.norm(p["_const"]["gravity"])
            ).reshape(1))
            reg("klin", nh * 36, lambda p: p["_const"]["k_lin"].reshape(-1))
            reg("cg", nh * 3, lambda p: p["_const"]["cg_eq"].reshape(-1))

            def buoy6(p):
                c = p["_const"]
                fb = sim.rho * (-c["gravity"])[None, :] * c["disp_vol"][:, None]
                tb = jnp.cross(c["cb_minus_cg"], fb)
                return jnp.concatenate([fb, tb], axis=-1).reshape(-1)

            reg("buoy6", nh * 6, buoy6)

        for j, (kind, locked, nrows, b1, b2) in enumerate(sim.joint_rows):
            def jc(key, idx=j):
                return lambda p: p["_const"]["joints"][idx][key].reshape(-1)

            reg(f"j{j}_l1", 3, jc("l1"))
            reg(f"j{j}_l2", 3, jc("l2"))
            if kind == "prismatic":
                reg(f"j{j}_n1l", 3, jc("n1l"))
                reg(f"j{j}_n2l", 3, jc("n2l"))
                reg(f"j{j}_qrel0", 4, jc("q_rel0"))
            elif kind == "revolute":
                reg(f"j{j}_a2", 3, jc("a2"))
                reg(f"j{j}_n1l", 3, jc("n1l"))
                reg(f"j{j}_n2l", 3, jc("n2l"))
                if locked:
                    reg(f"j{j}_qrel0", 4, jc("q_rel0"))
            elif kind == "universal":
                reg(f"j{j}_a1", 3, jc("a1"))
                reg(f"j{j}_ax2", 3, jc("axis2_b2"))
            elif kind == "fixed":
                reg(f"j{j}_qrel0", 4, jc("q_rel0"))
            elif kind == "motor":
                reg(f"j{j}_a1", 3, jc("a1"))
                reg(f"j{j}_a2", 3, jc("a2"))
                reg(f"j{j}_n1l", 3, jc("n1l"))
                reg(f"j{j}_n2l", 3, jc("n2l"))
            elif kind == "spherical":
                pass
            else:  # pragma: no cover - guarded in __init__
                raise NotImplementedError(f"fused step: joint kind {kind}")

        for t in range(self.n_tsda):
            def tc(key, idx=t):
                return lambda p: p["_const"]["tsda"][idx][key].reshape(-1)

            reg(f"t{t}_l1", 3, tc("l1"))
            reg(f"t{t}_l2", 3, tc("l2"))
            reg(f"t{t}_L0", 1,
                lambda p, idx=t: jnp.asarray([self.sim.tsda_rest[idx]], self.dtype))
            reg(f"t{t}_k", 1, lambda p, idx=t: p["tsda_k"][..., idx].reshape(
                p["tsda_k"].shape[:-1] + (1,)), batch_key="tsda_k")
            reg(f"t{t}_c", 1, lambda p, idx=t: p["tsda_c"][..., idx].reshape(
                p["tsda_c"].shape[:-1] + (1,)), batch_key="tsda_c")
            ts = spec.tsdas[t]
            if ts.spring_curve is not None:
                reg(f"t{t}_sx", len(ts.spring_curve),
                    lambda p, idx=t: p["_const"]["tsda"][idx]["spring_x"])
                reg(f"t{t}_sf", len(ts.spring_curve),
                    lambda p, idx=t: p["_const"]["tsda"][idx]["spring_f"])
            if ts.damping_curve is not None:
                reg(f"t{t}_dx", len(ts.damping_curve),
                    lambda p, idx=t: p["_const"]["tsda"][idx]["damp_x"])
                reg(f"t{t}_df", len(ts.damping_curve),
                    lambda p, idx=t: p["_const"]["tsda"][idx]["damp_f"])

        for r, rs in enumerate(spec.rsdas):
            reg(f"r{r}_a1l", 3,
                lambda p, idx=r: p["_const"]["rsda"][idx]["a1l"].reshape(-1))
            reg(f"r{r}_k", 1, lambda p, idx=r: p["rsda_k"][..., idx].reshape(
                p["rsda_k"].shape[:-1] + (1,)), batch_key="rsda_k")
            reg(f"r{r}_c", 1, lambda p, idx=r: p["rsda_c"][..., idx].reshape(
                p["rsda_c"].shape[:-1] + (1,)), batch_key="rsda_c")
            reg(f"r{r}_rest", 1,
                lambda p, idx=r: jnp.asarray([rs.rest_angle], self.dtype))

        for i in range(self.n_moor):
            reg(f"m{i}_local", 3,
                lambda p, idx=i: p["_const"]["moor"]["local"][idx])
            reg(f"m{i}_anchor", 3,
                lambda p, idx=i: p["_const"]["moor"]["anchor"][idx])
            reg(f"m{i}_L0", 1,
                lambda p, idx=i: p["_const"]["moor"]["L0"][idx].reshape(1))
            reg(f"m{i}_w", 1,
                lambda p, idx=i: p["_const"]["moor"]["w"][idx].reshape(1))
            reg(f"m{i}_ea", 1,
                lambda p, idx=i: p["_const"]["moor"]["ea"][idx].reshape(1))

        # fixed bodies referenced by joints / elements
        fixed_refs = set()
        for j in spec.joints:
            for b in (j.body1, j.body2):
                if b >= 0 and spec.bodies[b].fixed:
                    fixed_refs.add(b)
        for t in spec.tsdas:
            for b in (t.body1, t.body2):
                if b >= 0 and spec.bodies[b].fixed:
                    fixed_refs.add(b)
        for r in spec.rsdas:
            for b in (r.body1, r.body2):
                if b >= 0 and spec.bodies[b].fixed:
                    fixed_refs.add(b)
        for b in sorted(fixed_refs):
            reg(f"fix{b}_pos", 3,
                lambda p, idx=b: p["_const"]["fixed_pos"][str(idx)])
            reg(f"fix{b}_quat", 4,
                lambda p, idx=b: p["_const"]["fixed_quat"][str(idx)])

        # within-sub-block radiation weights W[0..s) for the multi-step
        # kernel (make_fused_subblock); W_small_rev[m] = W[tb-1-m]
        self.max_substep = 0
        if sim.hydro is not None and sim.block_size:
            self.max_substep = min(16, sim.block_size)
            ms = self.max_substep
            reg("wsub", ms * self.K * self.K,
                lambda p, ms=ms: p["_const"]["W_small_rev"][::-1][:ms].reshape(-1))
        # ERA lag-0 feedthrough D for the whole-run kernel's in-kernel
        # radiation (make_fused_wholerun): frad = D v + C z, row MACs from
        # SMEM (K x K is tiny; the C z / state-advance terms ride the MXU)
        if sim.hydro is not None and sim.radiation == "era":
            reg("erad", self.K * self.K,
                lambda p: p["_const"]["era_D"].reshape(-1))

        self._off = off
        self._fetch = fetch
        self.NC = pos

    def batched_entries(self, params):
        """Names of cvec entries whose backing params leaf carries a leading
        batch dim (fused sweeps: per-instance mass / PTO coefficients)."""
        # single source of truth for unbatched ranks: the Simulation's
        # own table (a private copy here once drifted when a new sweepable
        # param was added to only one of the two)
        base_ndim = self.sim._param_base_ndim()
        out = set()
        for name, _, _, bk in self._fetch:
            if bk is not None and bk in params and \
                    params[bk].ndim > base_ndim[bk]:
                out.add(name)
        return out

    def cvec(self, params, batched=()):
        """Assemble the flat constant vector from the params pytree.

        Entries in `batched` are per-instance (they ride the bvec operand
        instead); their SMEM slot is filled from instance 0 and unused.
        """
        parts = []
        for name, size, fn, _ in self._fetch:
            arr = jnp.asarray(fn(params), self.dtype)
            if name in batched:
                arr = arr.reshape(-1, size)[0]
            parts.append(arr.reshape(-1))
        return jnp.concatenate(parts) if parts else jnp.zeros((1,), self.dtype)

    def bvec(self, params, batched, RB):
        """Per-instance constant rows [NBatched, RB, 128] for the entries in
        `batched` (order = registration order). Returns (bvec, idx_map) with
        idx_map: cvec index -> bvec row."""
        rows = []
        idx_map = {}
        Bp = RB * LANE
        for name, size, fn, _ in self._fetch:
            if name not in batched:
                continue
            arr = jnp.asarray(fn(params), self.dtype).reshape(-1, size)
            B = arr.shape[0]
            sel = jnp.minimum(jnp.arange(Bp), B - 1)
            arr = arr[sel]  # [Bp, size]
            for k in range(size):
                idx_map[self._off[name] + k] = len(rows)
                rows.append(arr[:, k].reshape(RB, LANE))
        bv = (jnp.stack(rows) if rows
              else jnp.zeros((1, RB, LANE), self.dtype))
        return bv, idx_map

    # -- packing -----------------------------------------------------------
    def pad_batch(self, B):
        return -(-B // LANE) * LANE

    def pack_state(self, st):
        """State with leading batch dim B -> (sc [CS, RB, 128], vhist packed)."""
        B = st.pos.shape[0]
        Bp = self.pad_batch(B)
        idx = jnp.minimum(jnp.arange(Bp), B - 1)
        nm = self.nm

        def prep(x):
            return x[idx]

        sc = jnp.concatenate([
            prep(st.pos).reshape(Bp, nm * 3),
            prep(st.quat).reshape(Bp, nm * 4),
            prep(st.lin_vel).reshape(Bp, nm * 3),
            prep(st.ang_vel).reshape(Bp, nm * 3),
        ], axis=1)  # [Bp, CS]
        sc = sc.T.reshape(self.CS, Bp // LANE, LANE)
        # vhist [B, H2, K] -> [H2, K, RB, 128]
        vh = prep(st.vhist)
        H2, K = vh.shape[1], vh.shape[2]
        vh = jnp.moveaxis(vh, 0, -1).reshape(H2, K, Bp // LANE, LANE)
        return sc, vh

    def unpack_state(self, sc, vhist, B, ss_like):
        import dataclasses as dc

        from hydrochrono_tpu.stepper import State

        nm = self.nm
        Bp = sc.shape[1] * LANE
        flat = sc.reshape(self.CS, Bp).T[:B]  # [B, CS]
        pos = flat[:, : nm * 3].reshape(B, nm, 3)
        quat = flat[:, nm * 3 : nm * 7].reshape(B, nm, 4)
        lin = flat[:, nm * 7 : nm * 10].reshape(B, nm, 3)
        ang = flat[:, nm * 10 :].reshape(B, nm, 3)
        H2, K = vhist.shape[0], vhist.shape[1]
        vh = vhist.reshape(H2, K, Bp).transpose(2, 0, 1)[:B]
        return State(pos=pos, quat=quat, lin_vel=lin, ang_vel=ang,
                     vhist=vh, ss=ss_like)

    # -- shared row-space physics helpers (plain jnp; in or out of Pallas) --
    def _accessors(self, C, pos, quat, lin, ang):
        """pose/vel/slot closures over per-slot component lists."""
        sim, spec = self.sim, self.spec
        o = self._off

        def c1(name, i=0):
            return C(o[name] + i)

        def c3(name, base=0):
            return [c1(name, base + k) for k in range(3)]

        def pose_of(i):
            if i < 0:
                return [0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]
            if spec.bodies[i].fixed:
                return c3(f"fix{i}_pos"), [c1(f"fix{i}_quat", k) for k in range(4)]
            s = sim.slot_of[i]
            return pos[s], quat[s]

        def vel_of(i):
            if i < 0 or spec.bodies[i].fixed:
                return [None, None, None], [None, None, None]
            s = sim.slot_of[i]
            return lin[s], ang[s]

        def slot(i):
            if i < 0 or spec.bodies[i].fixed:
                return None
            return sim.slot_of[i]

        return c1, c3, pose_of, vel_of, slot

    def _interp_table(self, c1, x, name_x, name_f, npts):
        """np.interp on a strictly-increasing SMEM table, statically unrolled
        as telescoping clamped segments (exact, incl. end clamping)."""
        y = c1(name_f, 0)
        for s in range(npts - 1):
            x0 = c1(name_x, s)
            x1 = c1(name_x, s + 1)
            t = jnp.clip((x - x0) / (x1 - x0), 0.0, 1.0)
            y = y + t * (c1(name_f, s + 1) - c1(name_f, s))
        return y

    def _tsda_state(self, idx, c3, pos_of, vel_fn):
        spec = self.spec
        t = spec.tsdas[idx]
        pb1, qb1 = pos_of(t.body1)
        pb2, qb2 = pos_of(t.body2)
        P1 = _vadd(pb1, _quat_rotate(qb1, c3(f"t{idx}_l1")))
        P2 = _vadd(pb2, _quat_rotate(qb2, c3(f"t{idx}_l2")))
        u1, w1 = vel_fn(t.body1)
        u2, w2 = vel_fn(t.body2)
        V1 = _vadd(u1, _cross3(w1, _vsub(P1, pb1)))
        V2 = _vadd(u2, _cross3(w2, _vsub(P2, pb2)))
        d = _vsub(P2, P1)
        L = jnp.sqrt(_z(_dot3(d, d)) + 1e-30)
        Lsafe = jnp.maximum(L, 1e-12)
        dhat = [_z(x) / Lsafe for x in d]
        dV = _vsub(V2, V1)
        Ldot = _z(_dot3(dV, dhat))
        return t, P1, P2, L, Ldot, dhat, pb1, pb2

    def _tsda_scalar_forces(self, idx, c1, L, Ldot):
        """Spring/damping force split; tabulated curves evaluated from SMEM
        tables (stepper._tsda_forces_scalar / jnp.interp semantics)."""
        t = self.spec.tsdas[idx]
        if t.spring_curve is not None:
            fs = -self._interp_table(c1, L - c1(f"t{idx}_L0"), f"t{idx}_sx",
                                     f"t{idx}_sf", len(t.spring_curve))
        else:
            fs = -c1(f"t{idx}_k") * (L - c1(f"t{idx}_L0"))
        if t.damping_curve is not None:
            fd = -self._interp_table(c1, Ldot, f"t{idx}_dx", f"t{idx}_df",
                                     len(t.damping_curve))
        else:
            fd = -c1(f"t{idx}_c") * Ldot
        return fs, fd

    def _tsda_extras(self, c1, c3, pos_n, quat_n, lin_n, ang_n):
        """Per-TSDA exporter rows [L, Ldot, f_spring, f_damp] evaluated at
        the post-step state (stepper._tsda_outputs)."""
        sim, spec = self.sim, self.spec

        def pose_new(i):
            if i < 0:
                return [0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]
            if spec.bodies[i].fixed:
                return c3(f"fix{i}_pos"), [c1(f"fix{i}_quat", k)
                                           for k in range(4)]
            s = sim.slot_of[i]
            return pos_n[s], quat_n[s]

        def vel_new(i):
            if i < 0 or spec.bodies[i].fixed:
                return [None] * 3, [None] * 3
            s = sim.slot_of[i]
            return lin_n[s], ang_n[s]

        rows = []
        for idx in range(self.n_tsda):
            _, P1, P2, L, Ldot, dhat, pb1, pb2 = self._tsda_state(
                idx, c3, pose_new, vel_new)
            fs, fd = self._tsda_scalar_forces(idx, c1, L, Ldot)
            rows.extend([L, Ldot, fs, fd])
        return rows

    def _mooring_wrench(self, C, pos, quat, mhv):
        """In-kernel quasi-static catenary (stepper._mooring_forces):
        warm-started analytic-Jacobian Newton per line
        (mooring.catenary_newton_core — Mosaic-lowerable).

        mhv: list[2*nl] carry rows (H_i, V_i). Returns (wrenches, mhv_new)
        with wrenches = [(slot, f3, tau3), ...]."""
        from hydrochrono_tpu.physics.mooring import catenary_newton_core

        sim = self.sim
        o = self._off

        def c1(name, i=0):
            return C(o[name] + i)

        out, mhv_new = [], []
        for i in range(self.n_moor):
            s = sim.moor_slots[i]
            rloc = _quat_rotate(quat[s], [c1(f"m{i}_local", k)
                                          for k in range(3)])
            d = [pos[s][k] + rloc[k] - c1(f"m{i}_anchor", k)
                 for k in range(3)]
            dx = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + 1e-30)
            H, V = catenary_newton_core(
                dx, d[2], c1(f"m{i}_L0"), c1(f"m{i}_w"), c1(f"m{i}_ea"),
                self.moor_seabed[i], (mhv[2 * i], mhv[2 * i + 1]), iters=10)
            inv = 1.0 / jnp.maximum(dx, 1e-9)
            f = [-H * d[0] * inv, -H * d[1] * inv, -V]
            tau = _cross3(rloc, f)
            out.append((s, f, tau))
            mhv_new.extend([H, V])
        return out, mhv_new

    def _forces_rows(self, C, pos, quat, lin, ang):
        """Mechanical generalized forces (gravity, gyroscopic, TSDA, RSDA)
        and world inertia. Returns (F list[nv] w/ None zeros, IW, R)."""
        sim, spec = self.sim, self.spec
        nm, nv = self.nm, self.nv
        c1, c3, pose_of, vel_of, slot = self._accessors(C, pos, quat, lin, ang)

        R = [_rot_matrix(quat[s]) for s in range(nm)]

        # world inertia I_w = R I_body R^T
        IW = []
        for s in range(nm):
            Ib = [[c1("inertia", s * 9 + a * 3 + b) for b in range(3)]
                  for a in range(3)]
            RI = [[sum(R[s][a][k] * Ib[k][b] for k in range(3)) for b in range(3)]
                  for a in range(3)]
            IW.append([[sum(RI[a][k] * R[s][b][k] for k in range(3))
                        for b in range(3)] for a in range(3)])

        F = [None] * nv
        for s in range(nm):
            ms = c1("mass", s)
            for k in range(3):
                F[s * 6 + k] = _sadd(F[s * 6 + k], ms * c1("g", k))
            Iw_w = [_sadd(_sadd(_smul(IW[s][a][0], ang[s][0]),
                                _smul(IW[s][a][1], ang[s][1])),
                          _smul(IW[s][a][2], ang[s][2])) for a in range(3)]
            gyro = _cross3(ang[s], Iw_w)
            for k in range(3):
                F[s * 6 + 3 + k] = _ssub(F[s * 6 + 3 + k], gyro[k])

        if getattr(sim, "has_viscous", False):
            # viscous (Morison-type) per-DOF damping rows, mirroring
            # stepper._forces_mech: F_k -= cl v_k + cq |v_k| v_k
            for s in range(nm):
                for k in range(6):
                    v = lin[s][k] if k < 3 else ang[s][k - 3]
                    cl = c1("visc_lin", s * 6 + k)
                    cq = c1("visc_quad", s * 6 + k)
                    F[s * 6 + k] = _ssub(
                        F[s * 6 + k], cl * v + cq * jnp.abs(v) * v)

        def add_wrench(body, force, torque):
            sl = slot(body)
            if sl is None:
                return
            for k in range(3):
                F[sl * 6 + k] = _sadd(F[sl * 6 + k], force[k])
                F[sl * 6 + 3 + k] = _sadd(F[sl * 6 + 3 + k], torque[k])

        for idx in range(self.n_tsda):
            t, P1, P2, L, Ldot, dhat, pb1, pb2 = self._tsda_state(
                idx, c3, pose_of, vel_of)
            fs, fd = self._tsda_scalar_forces(idx, c1, L, Ldot)
            fmag = fs + fd
            fvec2 = [fmag * x for x in dhat]
            add_wrench(t.body2, fvec2, _cross3(_vsub(P2, pb2), fvec2))
            fneg = [-x for x in fvec2]
            add_wrench(t.body1, fneg, _cross3(_vsub(P1, pb1), fneg))

        for idx, r in enumerate(spec.rsdas):
            _, q1 = pose_of(r.body1)
            _, q2 = pose_of(r.body2)
            ahat = _quat_rotate(q1, c3(f"r{idx}_a1l"))
            q_rel = _quat_mul(_quat_conj(q1), q2)
            sgn = jnp.sign(_z(q_rel[0]) + 0.0)
            rotvec = [2.0 * sgn * q_rel[1 + k] for k in range(3)]
            theta = _z(_dot3(_quat_rotate(q1, rotvec), ahat))
            _, w1 = vel_of(r.body1)
            _, w2 = vel_of(r.body2)
            theta_dot = _z(_dot3(_vsub(w2, w1), ahat))
            tau = (-c1(f"r{idx}_k") * (theta - c1(f"r{idx}_rest"))
                   - c1(f"r{idx}_c") * theta_dot)
            tvec = [tau * x for x in ahat]
            add_wrench(r.body2, [None] * 3, tvec)
            add_wrench(r.body1, [None] * 3, [-x for x in tvec])

        return F, IW, R

    def _add_hydro_rows(self, C, F, pos, R, fx):
        """Add hydrostatic restoring + buoyancy + external hydro forcing
        (fx = f_wave - f_rad) into F, in place."""
        sim = self.sim
        o = self._off

        def c1(name, i=0):
            return C(o[name] + i)

        rho_g = c1("rho_g")
        for hb in range(self.nh):
            s = sim.hydro_slots[hb]
            r02 = jnp.clip(R[s][0][2], -1.0, 1.0)
            card_b = asin_tpu(r02)
            card_a = atan2_tpu(-R[s][1][2], R[s][2][2])
            card_c = atan2_tpu(-R[s][0][1], R[s][0][0])
            disp6 = [pos[s][0] - c1("cg", hb * 3 + 0),
                     pos[s][1] - c1("cg", hb * 3 + 1),
                     pos[s][2] - c1("cg", hb * 3 + 2),
                     card_a, card_b, card_c]
            for i in range(6):
                acc = None
                for jj in range(6):
                    acc = _sadd(acc, _smul(c1("klin", hb * 36 + i * 6 + jj),
                                           disp6[jj]))
                fhs = -rho_g * _z(acc) + c1("buoy6", hb * 6 + i)
                F[s * 6 + i] = _sadd(F[s * 6 + i], fhs + fx[hb * 6 + i])
        return F

    def _mass_rows(self, C, IW):
        """Mhat = blockdiag(m I3, I_w) + A_inf as an [nv][nv] list matrix."""
        nv, nm = self.nv, self.nm
        o = self._off

        def c1(name, i=0):
            return C(o[name] + i)

        M = [[c1("ainf", i * nv + j) for j in range(nv)] for i in range(nv)]
        for s in range(nm):
            ms = c1("mass", s)
            for k in range(3):
                M[s * 6 + k][s * 6 + k] = M[s * 6 + k][s * 6 + k] + ms
            for a in range(3):
                for b in range(3):
                    M[s * 6 + 3 + a][s * 6 + 3 + b] = (
                        M[s * 6 + 3 + a][s * 6 + 3 + b] + IW[s][a][b]
                    )
        return M

    # -- the Euler step math ------------------------------------------------
    def step_rows(self, C, sc, fx, mhv=None):
        """One step on component rows.

        C: scalar accessor (idx -> 0-d value); sc: [CS, ...] state rows;
        fx: [K, ...] (f_wave - f_rad) rows or None; mhv: [2*nl] mooring
        warm-start rows or None.
        Returns (new_sc_rows list[CS], extra_rows list[CE]) — plus mhv_new
        appended when mhv is given.
        """
        sim, spec = self.sim, self.spec
        nm, nv, m = self.nm, self.nv, self.m
        h = self.dt

        pos = [[sc[self.ip(s, k)] for k in range(3)] for s in range(nm)]
        quat = [[sc[self.iq(s, k)] for k in range(4)] for s in range(nm)]
        lin = [[sc[self.il(s, k)] for k in range(3)] for s in range(nm)]
        ang = [[sc[self.ia(s, k)] for k in range(3)] for s in range(nm)]

        c1, c3, pose_of, vel_of, slot = self._accessors(C, pos, quat, lin, ang)

        F, IW, R = self._forces_rows(C, pos, quat, lin, ang)

        # ----- hydrostatics + external hydro forcing -----
        if sim.hydro is not None and fx is not None:
            F = self._add_hydro_rows(C, F, pos, R, fx)

        # ----- mooring (step-start state, matching _forces_mech) -----
        mhv_new = None
        if mhv is not None and self.n_moor:
            wrenches, mhv_new = self._mooring_wrench(C, pos, quat, mhv)
            for s, fm, taum in wrenches:
                for k in range(3):
                    F[s * 6 + k] = _sadd(F[s * 6 + k], fm[k])
                    F[s * 6 + 3 + k] = _sadd(F[s * 6 + 3 + k], taum[k])

        M = self._mass_rows(C, IW)

        v = []
        for s in range(nm):
            v.extend(lin[s])
            v.extend(ang[s])
        rhs = []
        for i in range(nv):
            acc = None
            for j in range(nv):
                acc = _sadd(acc, _smul(M[i][j], v[j]))
            rhs.append(_sadd(acc, _smul(h, F[i])))

        # ----- constraints: residual + analytic Jacobian rows -----
        crows, Jrows = self._constraints(C, pose_of, slot)

        Lm = _chol(M, nv)
        if m > 0:
            # columns: [rhs | J^T]
            bcols = [[rhs[i]] + [Jrows[a][i] for a in range(m)] for i in range(nv)]
            sol = _chol_solve_cols(Lm, bcols, nv, 1 + m)
            minv_r = [sol[i][0] for i in range(nv)]
            minv_jt = [[sol[i][1 + a] for a in range(m)] for i in range(nv)]
            S = [[_z(_dot_list([Jrows[a][i] for i in range(nv)],
                               [minv_jt[i][b] for i in range(nv)]))
                  for b in range(m)] for a in range(m)]
            g = [-(_z(crows[a]) / h) for a in range(m)]
            jr = [_z(_dot_list([Jrows[a][i] for i in range(nv)], minv_r))
                  for a in range(m)]
            Ls = _chol(S, m)
            lam_cols = _chol_solve_cols(Ls, [[jr[a] - g[a]] for a in range(m)], m, 1)
            lam = [_z(lam_cols[a][0]) for a in range(m)]
            v_new = [minv_r[i] - _z(_dot_list(minv_jt[i], lam)) for i in range(nv)]
        else:
            bcols = [[rhs[i]] for i in range(nv)]
            sol = _chol_solve_cols(Lm, bcols, nv, 1)
            v_new = [_z(sol[i][0]) for i in range(nv)]
            lam = []

        # ----- integrate -----
        new_pos, new_quat, new_lin, new_ang = [], [], [], []
        for s in range(nm):
            u_n = v_new[s * 6 : s * 6 + 3]
            w_n = v_new[s * 6 + 3 : s * 6 + 6]
            new_lin.append(u_n)
            new_ang.append(w_n)
            new_pos.append([pos[s][k] + h * u_n[k] for k in range(3)])
            new_quat.append(self._quat_integrate(quat[s], w_n, h))

        sc_new = []
        for s in range(nm):
            sc_new.extend(new_pos[s])
        for s in range(nm):
            sc_new.extend(new_quat[s])
        for s in range(nm):
            sc_new.extend(new_lin[s])
        for s in range(nm):
            sc_new.extend(new_ang[s])

        extra = []
        for i in range(nv):
            extra.append((v_new[i] - _z(v[i])) / h)
        extra.extend(lam)
        if self.n_tsda:
            extra.extend(self._tsda_extras(c1, c3, new_pos, new_quat,
                                           new_lin, new_ang))

        if mhv is not None and self.n_moor:
            return sc_new, extra, mhv_new
        return sc_new, extra

    # -- the HHT-alpha step math (stepper._step_hht on component rows) ------
    def step_rows_hht(self, C, sc, hc, fx, mhv=None):
        """One HHT-alpha step with `sim.hht_iterations` modified-Newton
        iterations (mirrors stepper._step_hht: plain predictor, hydro frozen
        at the predicted state, Chrono-matching on the reference YAML cases).
        Mooring (when mhv is given) is re-evaluated at each iterate state —
        exactly stepper._forces_mech's placement — with the warm start
        chained through the iterations.

        hc: list[2*nv] HHT carry rows — a_prev[nv] then f_prev[nv].
        Returns (new_sc_rows, new_hc_rows, extra_rows).
        """
        sim, spec = self.sim, self.spec
        nm, nv, m = self.nm, self.nv, self.m
        h = self.dt
        alpha = sim.hht_alpha
        gamma = 0.5 - alpha
        beta = (1.0 - alpha) ** 2 / 4.0

        pos = [[sc[self.ip(s, k)] for k in range(3)] for s in range(nm)]
        quat = [[sc[self.iq(s, k)] for k in range(4)] for s in range(nm)]
        lin = [[sc[self.il(s, k)] for k in range(3)] for s in range(nm)]
        ang = [[sc[self.ia(s, k)] for k in range(3)] for s in range(nm)]
        ap = [hc[i] for i in range(nv)]
        f_prev = [hc[nv + i] for i in range(nv)]

        c1, c3, _, _, slot = self._accessors(C, pos, quat, lin, ang)

        # plain predictor (x + h v, v) — the state at which the memoized
        # hydro force freezes (hydro_forces.cpp:742-744)
        x_p = [[pos[s][k] + h * lin[s][k] for k in range(3)] for s in range(nm)]
        q_p = [self._quat_integrate(quat[s], ang[s], h) for s in range(nm)]

        # frozen hydro wrench rows (hydrostatics at predicted pose + fx)
        f_hydro = None
        if sim.hydro is not None and fx is not None:
            Rp = [_rot_matrix(q_p[s]) for s in range(nm)]
            fh = [None] * nv
            fh = self._add_hydro_rows(C, fh, x_p, Rp, fx)
            f_hydro = fh

        def kinematics(a):
            pos_i, quat_i, lin_i, ang_i = [], [], [], []
            for s in range(nm):
                dx = [h * lin[s][k]
                      + h * h * ((0.5 - beta) * _z(ap[s * 6 + k])
                                 + beta * _z(a[s * 6 + k])) for k in range(3)]
                drot = [h * ang[s][k]
                        + h * h * ((0.5 - beta) * _z(ap[s * 6 + 3 + k])
                                   + beta * _z(a[s * 6 + 3 + k]))
                        for k in range(3)]
                pos_i.append([pos[s][k] + dx[k] for k in range(3)])
                quat_i.append(self._quat_integrate(
                    quat[s], [d / h for d in drot], h))
                lin_i.append([lin[s][k]
                              + h * ((1 - gamma) * _z(ap[s * 6 + k])
                                     + gamma * _z(a[s * 6 + k]))
                              for k in range(3)])
                ang_i.append([ang[s][k]
                              + h * ((1 - gamma) * _z(ap[s * 6 + 3 + k])
                                     + gamma * _z(a[s * 6 + 3 + k]))
                              for k in range(3)])
            return pos_i, quat_i, lin_i, ang_i

        a = [None] * nv
        lam = [None] * m
        f_new = f_prev
        for _ in range(sim.hht_iterations):
            pos_i, quat_i, lin_i, ang_i = kinematics(a)
            F, IW, _ = self._forces_rows(C, pos_i, quat_i, lin_i, ang_i)
            if f_hydro is not None:
                F = [_sadd(F[i], f_hydro[i]) for i in range(nv)]
            if mhv is not None and self.n_moor:
                wrenches, mhv = self._mooring_wrench(C, pos_i, quat_i, mhv)
                for s_m, fm, taum in wrenches:
                    for k in range(3):
                        F[s_m * 6 + k] = _sadd(F[s_m * 6 + k], fm[k])
                        F[s_m * 6 + 3 + k] = _sadd(F[s_m * 6 + 3 + k],
                                                   taum[k])
            f_new = F
            M = self._mass_rows(C, IW)
            r_a = []
            for i in range(nv):
                ma = None
                for j in range(nv):
                    ma = _sadd(ma, _smul(M[i][j], a[j]))
                r_a.append(_sadd(_ssub(ma, _smul(1.0 + alpha, F[i])),
                                 _smul(alpha, f_prev[i])))
            if m > 0:
                _, _, pose_i_of, _, _ = self._accessors(
                    C, pos_i, quat_i, lin_i, ang_i)
                crows, Jrows = self._constraints(C, pose_i_of, slot)
                for i in range(nv):
                    jl = None
                    for aa in range(m):
                        jl = _sadd(jl, _smul(Jrows[aa][i], lam[aa]))
                    r_a[i] = _ssub(r_a[i], jl)
                r_c = [_z(crows[aa]) / (beta * h * h) for aa in range(m)]
                # KKT-structured modified-Newton update:
                #   M da + J^T dneg_lam = -r_a ; J da = -r_c
                Lm = _chol(M, nv)
                bcols = [[_sneg(r_a[i])] + [Jrows[aa][i] for aa in range(m)]
                         for i in range(nv)]
                sol = _chol_solve_cols(Lm, bcols, nv, 1 + m)
                minv_r = [sol[i][0] for i in range(nv)]
                minv_jt = [[sol[i][1 + aa] for aa in range(m)]
                           for i in range(nv)]
                S = [[_z(_dot_list([Jrows[aa][i] for i in range(nv)],
                                   [minv_jt[i][bb] for i in range(nv)]))
                      for bb in range(m)] for aa in range(m)]
                jr = [_dot_list([Jrows[aa][i] for i in range(nv)], minv_r)
                      for aa in range(m)]
                Ls = _chol(S, m)
                dn_cols = _chol_solve_cols(
                    Ls, [[_z(_sadd(jr[aa], r_c[aa]))] for aa in range(m)], m, 1)
                dneg_lam = [_z(dn_cols[aa][0]) for aa in range(m)]
                da = [_ssub(minv_r[i], _dot_list(minv_jt[i], dneg_lam))
                      for i in range(nv)]
                a = [_z(_sadd(a[i], da[i])) for i in range(nv)]
                lam = [_z(_ssub(lam[aa], dneg_lam[aa])) for aa in range(m)]
            else:
                Lm = _chol(M, nv)
                sol = _chol_solve_cols(
                    Lm, [[_sneg(r_a[i])] for i in range(nv)], nv, 1)
                a = [_z(_sadd(a[i], sol[i][0])) for i in range(nv)]

        pos_n, quat_n, lin_n, ang_n = kinematics(a)

        sc_new = []
        for s in range(nm):
            sc_new.extend(pos_n[s])
        for s in range(nm):
            sc_new.extend(quat_n[s])
        for s in range(nm):
            sc_new.extend(lin_n[s])
        for s in range(nm):
            sc_new.extend(ang_n[s])
        hc_new = [_z(a[i]) for i in range(nv)] + [_z(f_new[i]) for i in range(nv)]

        extra = [_z(a[i]) for i in range(nv)]
        # export multipliers in the Euler impulse convention (stepper._step_hht)
        extra.extend([-_z(lam[aa]) * h for aa in range(m)])
        if self.n_tsda:
            extra.extend(self._tsda_extras(c1, c3, pos_n, quat_n,
                                           lin_n, ang_n))

        if mhv is not None and self.n_moor:
            return sc_new, hc_new, extra, mhv
        return sc_new, hc_new, extra

    @staticmethod
    def _quat_integrate(q, w, h):
        th = [w[k] * h for k in range(3)]
        sq = th[0] * th[0] + th[1] * th[1] + th[2] * th[2]
        small = sq < 1e-16
        sq_safe = jnp.where(small, 1.0, sq)
        angle = jnp.sqrt(sq_safe)
        half = 0.5 * angle
        dw = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
        k = jnp.where(small, 0.5 * (1.0 - sq / 24.0), jnp.sin(half) / angle)
        dq = [dw, th[0] * k, th[1] * k, th[2] * k]
        qn = _quat_mul(dq, q)
        norm = jnp.sqrt(qn[0] * qn[0] + qn[1] * qn[1] + qn[2] * qn[2] + qn[3] * qn[3])
        return [x / norm for x in qn]

    # -- constraints: residuals + analytic Jacobians ------------------------
    def _constraints(self, C, pose_of, slot):
        """Returns (crows list[m], Jrows list[m][nv]) with None zeros.

        Analytic time-derivative rows of stepper._constraint_residual;
        verified against the jvp-based Jacobian in tests/test_fused_step.py.
        """
        sim = self.sim
        nv, m = self.nv, self.m
        o = self._off
        crows, Jrows = [], []

        def c1(name, i=0):
            return C(o[name] + i)

        def c3(name):
            return [c1(name, k) for k in range(3)]

        def new_row():
            return [None] * nv

        def add_block(row, sl, base, vec, sign=1.0):
            if sl is None:
                return
            for k in range(3):
                if vec[k] is not None:
                    row[sl * 6 + base + k] = _sadd(
                        row[sl * 6 + base + k],
                        vec[k] if sign > 0 else _sneg(vec[k]),
                    )

        for j, ((kind, locked, nrows, b1, b2), _) in enumerate(
            zip(sim.joint_rows, sim.joint_rows)
        ):
            p1, q1 = pose_of(b1)
            p2, q2 = pose_of(b2)
            s1, s2 = slot(b1), slot(b2)
            r1 = _quat_rotate(q1, c3(f"j{j}_l1"))
            r2 = _quat_rotate(q2, c3(f"j{j}_l2"))
            P1 = _vadd(p1, r1)
            P2 = _vadd(p2, r2)

            if kind in ("spherical", "revolute", "fixed", "universal", "motor"):
                # point rows: c = P1 - P2
                for k in range(3):
                    crows.append(_z(_ssub(P1[k], P2[k])))
                    row = new_row()
                    e = [1.0 if kk == k else None for kk in range(3)]
                    add_block(row, s1, 0, e)
                    # (w1 x r1).e_k = w1.(r1 x e_k)  =>  d/dw1 = r1 x e_k
                    add_block(row, s1, 3, _cross3(r1, e))
                    add_block(row, s2, 0, e, sign=-1.0)
                    add_block(row, s2, 3, _cross3(r2, e), sign=-1.0)
                    Jrows.append(row)

            if kind == "prismatic":
                d = _vsub(P2, P1)
                for nkey in ("n1l", "n2l"):
                    w = _quat_rotate(q1, c3(f"j{j}_{nkey}"))
                    crows.append(_z(_dot3(d, w)))
                    row = new_row()
                    add_block(row, s2, 0, w)
                    add_block(row, s1, 0, w, sign=-1.0)
                    add_block(row, s2, 3, _cross3(r2, w))
                    w1_term = _vadd(_vscale(-1.0, _cross3(r1, w)), _cross3(w, d))
                    add_block(row, s1, 3, w1_term)
                    Jrows.append(row)

            if (kind == "revolute" and not locked) or kind == "motor":
                aw2 = _quat_rotate(q2, c3(f"j{j}_a2"))
                for nkey in ("n1l", "n2l"):
                    w = _quat_rotate(q1, c3(f"j{j}_{nkey}"))
                    crows.append(_z(_dot3(aw2, w)))
                    row = new_row()
                    aw_x_w = _cross3(aw2, w)
                    add_block(row, s2, 3, aw_x_w)
                    add_block(row, s1, 3, aw_x_w, sign=-1.0)
                    Jrows.append(row)

            if kind == "universal":
                a1w = _quat_rotate(q1, c3(f"j{j}_a1"))
                a2w = _quat_rotate(q2, c3(f"j{j}_ax2"))
                crows.append(_z(_dot3(a1w, a2w)))
                row = new_row()
                axa = _cross3(a1w, a2w)
                add_block(row, s1, 3, axa)
                add_block(row, s2, 3, axa, sign=-1.0)
                Jrows.append(row)

            if kind == "motor":
                # driven row: zero residual placeholder; analytic jacobian
                # a1w . (w2 - w1) (stepper._motor_jrows)
                crows.append(0.0)
                row = new_row()
                a1w = _quat_rotate(q1, c3(f"j{j}_a1"))
                add_block(row, s2, 3, a1w)
                add_block(row, s1, 3, a1w, sign=-1.0)
                Jrows.append(row)

            if kind in ("prismatic", "fixed") or (kind == "revolute" and locked):
                # rotation lock rows: c = 2 sign(w_err) * vec(q_err)
                qr0 = [c1(f"j{j}_qrel0", k) for k in range(4)]
                A = _quat_mul(q1, qr0)
                B = _quat_conj(A)
                q_err = _quat_mul(B, q2)
                sgn = jnp.sign(_z(q_err[0]) + 0.0)
                for k in range(3):
                    crows.append(2.0 * sgn * _z(q_err[1 + k]))
                # columns M e_k = sign * vec(B (0,e_k) q2)
                cols = []
                for k in range(3):
                    ek = [0.0] * 3
                    ek[k] = 1.0
                    t = _quat_mul([0.0] + ek, q2)
                    out = _quat_mul(B, t)
                    cols.append([sgn * out[1 + a] for a in range(3)])
                for a in range(3):
                    row = new_row()
                    vec = [cols[k][a] for k in range(3)]
                    add_block(row, s2, 3, vec)
                    add_block(row, s1, 3, vec, sign=-1.0)
                    Jrows.append(row)

        assert len(crows) == m and len(Jrows) == m
        return crows, Jrows

    # -- pallas wrapper ------------------------------------------------------
    def make_fused_step(self, RB, interpret=False, idx_map=None):
        """Returns fn(cvec [NC], sc [CS, RB, 128], fx [K, RB, 128] or None,
        bvec [NB, RB, 128] or None, hc [2nv, RB, 128] when HHT) ->
        (sc_new, extra [CE, RB, 128]) — or (sc_new, hc_new, extra) for HHT.

        idx_map (from bvec()): cvec index -> bvec row, for per-instance
        batched constants (sweeps over PTO coefficients / masses)."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        CS, CE, K = self.CS, self.CE, max(self.K, 1)
        # Mosaic requires the sublane block dim to be a multiple of 8 or to
        # equal the full array dim; grid-tile only when RB splits into
        # 8-sublane tiles, otherwise run the whole batch in one program
        RT = 8 if RB % 8 == 0 else RB
        grid = (RB // RT,)
        has_fx = self.sim.hydro is not None
        has_bv = bool(idx_map)
        hht = self.hht
        moored = self.n_moor > 0
        CH = 2 * self.nv
        CM = self.CM
        idx_map = idx_map or {}
        NB = max(len(set(idx_map.values())), 1)

        def kernel(cref, *rest):
            rest = list(rest)
            bv = rest.pop(0)[...] if has_bv else None
            fx = rest.pop(0)[...] if has_fx else None
            hcref = rest.pop(0) if hht else None
            mvref = rest.pop(0) if moored else None
            scref = rest.pop(0)
            scoref = rest.pop(0)
            hcoref = rest.pop(0) if hht else None
            mvoref = rest.pop(0) if moored else None
            exref = rest.pop(0)

            def C(i):
                j = idx_map.get(i)
                return cref[i] if j is None else bv[j]

            sc = scref[...]
            mhv = None
            if moored:
                mv = mvref[...]
                mhv = [mv[i] for i in range(CM)]

            def bstack(rows):
                return _bstack(rows, sc.shape[1:], self.dtype)

            if hht:
                hc = hcref[...]
                if moored:
                    sc_new, hc_new, extra, mhv_new = self.step_rows_hht(
                        C, sc, hc, fx, mhv)
                    mvoref[...] = bstack(mhv_new)
                else:
                    sc_new, hc_new, extra = self.step_rows_hht(C, sc, hc, fx)
                hcoref[...] = bstack(hc_new)
            else:
                if moored:
                    sc_new, extra, mhv_new = self.step_rows(C, sc, fx, mhv)
                    mvoref[...] = bstack(mhv_new)
                else:
                    sc_new, extra = self.step_rows(C, sc, fx)
            scoref[...] = bstack(sc_new)
            exref[...] = bstack(extra)

        def vspec(c):
            return pl.BlockSpec((c, RT, LANE), lambda g: (0, g, 0),
                                memory_space=pltpu.VMEM)

        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        if has_bv:
            in_specs.append(vspec(NB))
        if has_fx:
            in_specs.append(vspec(K))
        if hht:
            in_specs.append(vspec(CH))
        if moored:
            in_specs.append(vspec(CM))
        in_specs.append(vspec(CS))
        out_specs = [vspec(CS)]
        out_shape = [jax.ShapeDtypeStruct((CS, RB, LANE), self.dtype)]
        if hht:
            out_specs.append(vspec(CH))
            out_shape.append(jax.ShapeDtypeStruct((CH, RB, LANE), self.dtype))
        if moored:
            out_specs.append(vspec(CM))
            out_shape.append(jax.ShapeDtypeStruct((CM, RB, LANE), self.dtype))
        out_specs.append(vspec(CE))
        out_shape.append(jax.ShapeDtypeStruct((CE, RB, LANE), self.dtype))
        call = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )

        def fn(cvec, sc, fx=None, bvec=None, hc=None, mhv=None):
            args = [cvec]
            if has_bv:
                args.append(bvec)
            if has_fx:
                args.append(fx)
            if hht:
                args.append(hc)
            if moored:
                args.append(mhv)
            args.append(sc)
            return call(*args)

        return fn



    def make_fused_subblock(self, RB, sub, interpret=False, idx_map=None):
        """Multi-step kernel: `sub` statically-unrolled integration steps per
        Pallas dispatch (within-sub-block radiation handled in-kernel with
        static weight indices from SMEM; far- and mid-field arrive per step
        in `fpre`). Amortizes the per-step dispatch overhead that dominates
        the single-step kernel (~5 XLA dispatches/step -> ~5 per `sub`).

        Returns fn(cvec, sc [CS,RB,128], fpre [sub,K,RB,128], bvec?, hc?) ->
        (sc_final, [hc_final,] vout [sub,K,...], traj [sub,CS,...],
        extra [sub,CE,...]).
        """
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        if self.sim.hydro is None or not self.sim.block_size:
            raise NotImplementedError("sub-block kernel requires blocked hydro")
        if sub > self.max_substep:
            raise ValueError(f"sub={sub} exceeds max_substep={self.max_substep}")
        CS, CE, K = self.CS, self.CE, self.K
        RT = 8 if RB % 8 == 0 else RB
        grid = (RB // RT,)
        has_bv = bool(idx_map)
        hht = self.hht
        moored = self.n_moor > 0
        CH = 2 * self.nv
        CM = self.CM
        idx_map = idx_map or {}
        NB = max(len(set(idx_map.values())), 1)
        woff = self._off["wsub"]

        v6_rows = []
        for sl in self.sim.hydro_slots:
            v6_rows.extend([self.il(sl, k) for k in range(3)])
            v6_rows.extend([self.ia(sl, k) for k in range(3)])

        def kernel(cref, *rest):
            rest = list(rest)
            bv = rest.pop(0)[...] if has_bv else None

            def C(i):
                j = idx_map.get(i)
                return cref[i] if j is None else bv[j]

            fpre = rest.pop(0)[...]  # [sub, K, RT, LANE]
            hc_rows = None
            if hht:
                hc = rest.pop(0)[...]
                hc_rows = [hc[i] for i in range(CH)]
            mhv_rows = None
            if moored:
                mv = rest.pop(0)[...]
                mhv_rows = [mv[i] for i in range(CM)]
            sc = rest.pop(0)[...]
            scoref = rest.pop(0)
            hcoref = rest.pop(0) if hht else None
            mvoref = rest.pop(0) if moored else None
            voutref, trajref, exref = rest[0], rest[1], rest[2]

            sc_rows = [sc[i] for i in range(CS)]
            hist = []
            v_steps, traj_steps, ex_steps = [], [], []
            for e in range(sub):
                v6 = [sc_rows[i] for i in v6_rows]
                hist.append(v6)
                fx = []
                for i in range(K):
                    acc = fpre[e, i]
                    for j in range(e + 1):
                        base = woff + (e - j) * K * K + i * K
                        for k in range(K):
                            acc = acc - C(base + k) * hist[j][k]
                    fx.append(acc)
                if hht:
                    if moored:
                        sc_rows, hc_rows, extra, mhv_rows = self.step_rows_hht(
                            C, sc_rows, hc_rows, fx, mhv_rows)
                    else:
                        sc_rows, hc_rows, extra = self.step_rows_hht(
                            C, sc_rows, hc_rows, fx)
                else:
                    if moored:
                        sc_rows, extra, mhv_rows = self.step_rows(
                            C, sc_rows, fx, mhv_rows)
                    else:
                        sc_rows, extra = self.step_rows(C, sc_rows, fx)
                v_steps.append(v6)
                traj_steps.append(sc_rows)
                ex_steps.append(extra)

            def bstack(rows):
                return _bstack(rows, sc.shape[1:], self.dtype)

            scoref[...] = bstack(sc_rows)
            if hht:
                hcoref[...] = bstack(hc_rows)
            if moored:
                mvoref[...] = bstack(mhv_rows)
            voutref[...] = jnp.stack([bstack(v) for v in v_steps])
            trajref[...] = jnp.stack([bstack(r) for r in traj_steps])
            exref[...] = jnp.stack([bstack(r) for r in ex_steps])

        def vspec(*dims):
            n = len(dims)
            if n == 2:
                return pl.BlockSpec(dims + (RT, LANE), lambda g: (0, 0, g, 0),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec(dims + (RT, LANE), lambda g: (0, g, 0),
                                memory_space=pltpu.VMEM)

        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        if has_bv:
            in_specs.append(vspec(NB))
        in_specs.append(vspec(sub, K))
        if hht:
            in_specs.append(vspec(CH))
        if moored:
            in_specs.append(vspec(CM))
        in_specs.append(vspec(CS))
        out_specs = [vspec(CS)]
        out_shape = [jax.ShapeDtypeStruct((CS, RB, LANE), self.dtype)]
        if hht:
            out_specs.append(vspec(CH))
            out_shape.append(jax.ShapeDtypeStruct((CH, RB, LANE), self.dtype))
        if moored:
            out_specs.append(vspec(CM))
            out_shape.append(jax.ShapeDtypeStruct((CM, RB, LANE), self.dtype))
        out_specs += [vspec(sub, K), vspec(sub, CS), vspec(sub, CE)]
        out_shape += [
            jax.ShapeDtypeStruct((sub, K, RB, LANE), self.dtype),
            jax.ShapeDtypeStruct((sub, CS, RB, LANE), self.dtype),
            jax.ShapeDtypeStruct((sub, CE, RB, LANE), self.dtype),
        ]
        call = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )

        def fn(cvec, sc, fpre, bvec=None, hc=None, mhv=None):
            args = [cvec]
            if has_bv:
                args.append(bvec)
            args.append(fpre)
            if hht:
                args.append(hc)
            if moored:
                args.append(mhv)
            args.append(sc)
            return call(*args)

        return fn

    def make_fused_wholerun(self, RB, sub, nchunks, interpret=False,
                            idx_map=None, has_fexc=True,
                            sc_span=None, ex_span=None, inner=1):
        """Whole-run kernel for ERA radiation: grid = (batch tile, time
        chunk), `sub` statically-unrolled steps per grid step, the ENTIRE
        time loop inside one pallas_call.

        The per-dispatch blocked runner pays, per sub-block: a kernel
        dispatch, the [sub, K, RB, 128] fpre DMA round trip, XLA glue
        (dynamic slices, scan carry traffic) and separate mid-/far-field
        matmul dispatches. Here radiation is the shared-pole ERA
        realization evaluated IN-KERNEL every step — frad = D v + C z (D
        row-MACs from SMEM, C z on the MXU) and z <- Ad z + Bd v (MXU) —
        so the carried state (sc rows, HHT carry, mooring warm starts, z)
        stays VMEM-resident across the whole sweep and only the compact
        excitation series streams in (trajectory rows stream out). Same
        design as the farm whole-run kernel (ops/pallas_farm.py, measured
        ~4x its per-dispatch form), generalized to the full step body:
        rotating constraint Jacobians, time-varying world inertia, unrolled
        Cholesky KKT, HHT, moorings, TSDA/RSDA curves.

        Pure per-step ERA matches the XLA path `Simulation(radiation="era",
        block_size=None)` (stepper._step -> era.era_step_fused), NOT the
        blocked FIR+ERA hybrid — equivalence gated in tests/test_wholerun.py.

        sc_span/ex_span: contiguous (lo, hi) row ranges of the state /
        extra rows to STREAM per step (None = all / none for ex_span) —
        broadcasting and writing unrequested rows costs both VPU glue and
        HBM bandwidth every step, so the runner passes the minimal span
        covering its output keys.

        inner: time chunks processed PER GRID STEP via an in-kernel
        fori_loop (must divide nchunks). Motivation was amortizing the
        ~21 us per-grid-iteration sequencing floor measured on a NULL
        kernel with this block structure; MEASURED RESULT (round 4, RM3
        era B=512): inner=1 4.42 us/step, inner=2 4.46, inner=8 5.19 —
        in the real kernel that floor is already hidden behind compute
        (Mosaic double-buffers the streamed fexc/traj blocks across grid
        steps), and the dynamic in-loop indexing of those windows costs
        more than it saves. inner=1 (the default) traces bit-identically
        to the pre-inner kernel; >1 is kept for re-testing on future
        shapes/toolchains and is covered by the interpret-mode
        equivalence tests (n=11 -> nchunks=5 picks inner=5).

        Returns fn(cvec, sc, z, fexc, bvec=None, hc=None, mhv=None) ->
        (sc_f, [hc_f,] [mhv_f,] z_f, traj [nchunks, sub, span, RB, L]
        [, extra [nchunks, sub, span, RB, L]]).
        """
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        if self.sim.radiation != "era" or self.sim.hydro is None:
            raise NotImplementedError("whole-run kernel requires ERA radiation")
        CS, CE, K = self.CS, self.CE, self.K
        RT = 8 if RB % 8 == 0 else RB
        if nchunks % inner:
            raise ValueError(f"inner={inner} must divide nchunks={nchunks}")
        grid = (RB // RT, nchunks // inner)
        has_bv = bool(idx_map)
        hht = self.hht
        moored = self.n_moor > 0
        CH = 2 * self.nv
        CM = self.CM
        idx_map = idx_map or {}
        NB = max(len(set(idx_map.values())), 1)
        doff = self._off["erad"]
        sc_lo, sc_hi = sc_span if sc_span is not None else (0, CS)
        has_ex = ex_span is not None
        ex_lo, ex_hi = ex_span if has_ex else (0, 0)

        M = self.sim.era_order
        Mp = max(8, -(-M // 8) * 8)   # sublane-pad the state
        Kp = max(8, -(-K // 8) * 8)   # sublane-pad the force rows
        self.era_Mp, self.era_Kp = Mp, Kp

        v6_idx = []
        for sl in self.sim.hydro_slots:
            v6_idx.extend([self.il(sl, k) for k in range(3)])
            v6_idx.extend([self.ia(sl, k) for k in range(3)])

        dtype = self.dtype
        prec = jax.lax.Precision.HIGHEST  # era recursion compounds error
        import os as _os
        ab = tuple(_os.environ.get(
            "HYDROCHRONO_WHOLERUN_ABLATE", "").split(","))  # perf triage
        # Excitation residency: the per-chunk (sub, K, 1) fexc window is a
        # TINY streamed DMA whose fixed issue cost is per-grid-step
        # overhead. Keeping the WHOLE forcing sequence VMEM-resident
        # (constant index map -> fetched once) removes it — BUT the
        # (nchunks, sub, K, 1) array's minor dim of 1 is lane-padded x128
        # in VMEM (bench RM3: 485 KB logical -> ~80 MB physical, a
        # measured scoped-vmem OOM), so the auto policy budgets the PADDED
        # footprint and real-length runs stream; tiny runs (and the
        # interpret-mode equivalence tests) still exercise the resident
        # path. Env HYDROCHRONO_WHOLERUN_FEXC=resident/stream overrides.
        fexc_mode = _os.environ.get("HYDROCHRONO_WHOLERUN_FEXC", "auto")
        fexc_bytes = nchunks * sub * K * 128 * np.dtype(dtype).itemsize
        fexc_resident = has_fexc and fexc_mode != "stream" and (
            fexc_mode == "resident" or fexc_bytes <= (2 << 20))

        def kernel(cref, *rest):
            rest = list(rest)
            bv = rest.pop(0)[...] if has_bv else None

            def C(i):
                j = idx_map.get(i)
                return cref[i] if j is None else bv[j]

            eAref = rest.pop(0)              # (Mp, Mp)
            eBref = rest.pop(0)              # (Mp, Kp)
            eCref = rest.pop(0)              # (Kp, Mp)
            fexcref = rest.pop(0) if has_fexc else None  # (inner, sub, K, 1)
            hcin = rest.pop(0) if hht else None
            mvin = rest.pop(0) if moored else None
            scin = rest.pop(0)
            zin = rest.pop(0)
            scoref = rest.pop(0)
            hcoref = rest.pop(0) if hht else None
            mvoref = rest.pop(0) if moored else None
            zoref = rest.pop(0)
            trajref = rest.pop(0)
            exref = rest.pop(0) if has_ex else None

            tc = pl.program_id(1)

            @pl.when(tc == 0)
            def _init():  # new batch tile: load the carried state
                scoref[...] = scin[...]
                zoref[...] = zin[...]
                if hht:
                    hcoref[...] = hcin[...]
                if moored:
                    mvoref[...] = mvin[...]

            def tstore(ref, j, e, val):
                # chunk-j store: static fast path when inner == 1
                if isinstance(j, int):
                    ref[j, e] = val
                else:
                    ref[pl.ds(j, 1), e] = val[None]

            zpad = ([jnp.zeros((Kp - K, LANE), dtype)] if Kp > K else [])
            fpad = ([jnp.zeros((Kp - K, 1), dtype)] if Kp > K else [])

            def chunk_body(j):
                # per-chunk excitation window: dynamic index into the
                # VMEM-resident full sequence, or a slice of the streamed
                # super-chunk block
                if fexcref is None:
                    fexc = None
                elif fexc_resident:
                    fexc = fexcref[pl.ds(tc * inner + j, 1)][0]
                elif isinstance(j, int):
                    fexc = fexcref[j]                       # (sub, K, 1)
                else:
                    fexc = fexcref[pl.ds(j, 1)][0]
                # carried state: load from the out-blocks (written by _init
                # on the first chunk of each batch tile, then by the
                # previous chunk) — same per-chunk load/store the one-chunk
                # grid-step form paid
                sc = scoref[...]
                sc_rows = [sc[i] for i in range(CS)]
                hc_rows = None
                if hht:
                    hc = hcoref[...]
                    hc_rows = [hc[i] for i in range(CH)]
                mhv_rows = None
                if moored:
                    mv = mvoref[...]
                    mhv_rows = [mv[i] for i in range(CM)]

                for e in range(sub):
                    # ---- in-kernel ERA radiation: frad = D v + C z ------
                    v6 = [sc_rows[i] for i in v6_idx]  # K rows of (RT, LANE)
                    # excitation folds into the per-r (f_exc - C z) arrays
                    # BEFORE the row slicing: Mosaic has no dual
                    # sublane+lane broadcast, so the (Kp,1)->(Kp,LANE) lane
                    # broadcast must combine with materialized data, never
                    # be re-sliced
                    feb = None
                    if fexc is not None:
                        feb = jnp.broadcast_to(
                            jnp.concatenate([fexc[e]] + fpad, axis=0),
                            (Kp, LANE))
                    # z lives in the VMEM out-block and is updated IN PLACE
                    # per r-slice: holding RT (Mp, LANE) arrays as SSA
                    # values across the unrolled step body spills
                    # catastrophically (measured ~100x) — each slice is
                    # loaded, advanced, stored before the step body runs
                    if "era" in ab:
                        fcz_r = [(feb - 0.0 if feb is not None
                                  else jnp.zeros((Kp, LANE), dtype))
                                 for _ in range(RT)]
                    else:
                        fcz_r = []
                        for r in range(RT):
                            v6r = jnp.concatenate(
                                [row[r:r + 1] for row in v6] + zpad, axis=0)
                            zr = zoref[r]
                            czr = jnp.dot(eCref[...], zr, precision=prec,
                                          preferred_element_type=dtype)
                            fcz_r.append(feb - czr if feb is not None
                                         else -czr)
                            zoref[r] = (
                                jnp.dot(eAref[...], zr, precision=prec,
                                        preferred_element_type=dtype)
                                + jnp.dot(eBref[...], v6r, precision=prec,
                                          preferred_element_type=dtype))
                    fcz = jnp.stack(fcz_r, axis=1)  # (Kp, RT, LANE)
                    fx = []
                    for i in range(K):
                        acc = fcz[i]
                        for k in range(K):
                            acc = acc - C(doff + i * K + k) * v6[k]
                        fx.append(acc)
                    if "step" in ab:
                        # bypass the solve: trivial damped integrate (triage)
                        sc_rows = [r * 0.999 for r in sc_rows]
                        extra = [fx[0] for _ in range(CE)]
                        tstore(trajref, j, e, _bstack(
                            sc_rows[sc_lo:sc_hi], sc.shape[1:], dtype))
                        if has_ex:
                            tstore(exref, j, e, _bstack(
                                extra[ex_lo:ex_hi], sc.shape[1:], dtype))
                        continue

                    # ---- the general step body (shared with the other
                    # kernels)
                    if hht:
                        if moored:
                            sc_rows, hc_rows, extra, mhv_rows = \
                                self.step_rows_hht(
                                    C, sc_rows, hc_rows, fx, mhv_rows)
                        else:
                            sc_rows, hc_rows, extra = self.step_rows_hht(
                                C, sc_rows, hc_rows, fx)
                    else:
                        if moored:
                            sc_rows, extra, mhv_rows = self.step_rows(
                                C, sc_rows, fx, mhv_rows)
                        else:
                            sc_rows, extra = self.step_rows(C, sc_rows, fx)
                    tstore(trajref, j, e, _bstack(
                        sc_rows[sc_lo:sc_hi], sc.shape[1:], dtype))
                    if has_ex:
                        tstore(exref, j, e, _bstack(
                            extra[ex_lo:ex_hi], sc.shape[1:], dtype))

                scoref[...] = _bstack(sc_rows, sc.shape[1:], dtype)
                if hht:
                    hcoref[...] = _bstack(hc_rows, sc.shape[1:], dtype)
                if moored:
                    mvoref[...] = _bstack(mhv_rows, sc.shape[1:], dtype)

            if inner == 1:
                chunk_body(0)
            else:
                def _loop(j, carry):
                    chunk_body(j)
                    return carry

                jax.lax.fori_loop(0, inner, _loop, 0)

        def cspec(*dims):
            # constants: fetched once per call
            return pl.BlockSpec(dims, lambda g, tc: (0,) * len(dims),
                                memory_space=pltpu.VMEM)

        def sspec(c):
            # carried state rows: revisited across the time sweep
            return pl.BlockSpec((c, RT, LANE), lambda g, tc: (0, g, 0),
                                memory_space=pltpu.VMEM)

        zspec = pl.BlockSpec((RT, Mp, LANE), lambda g, tc: (g, 0, 0),
                             memory_space=pltpu.VMEM)

        def tspec(*dims):
            # streamed per grid step: a super-chunk of `inner` time chunks
            return pl.BlockSpec((inner,) + dims,
                                lambda g, tc: (tc,) + (0,) * (len(dims) - 2)
                                + (g, 0),
                                memory_space=pltpu.VMEM)

        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        if has_bv:
            in_specs.append(sspec(NB))
        in_specs += [cspec(Mp, Mp), cspec(Mp, Kp), cspec(Kp, Mp)]
        if has_fexc:
            if fexc_resident:
                in_specs.append(pl.BlockSpec(
                    (nchunks, sub, K, 1), lambda g, tc: (0, 0, 0, 0),
                    memory_space=pltpu.VMEM))
            else:
                in_specs.append(pl.BlockSpec(
                    (inner, sub, K, 1), lambda g, tc: (tc, 0, 0, 0),
                    memory_space=pltpu.VMEM))
        if hht:
            in_specs.append(sspec(CH))
        if moored:
            in_specs.append(sspec(CM))
        in_specs += [sspec(CS), zspec]

        f = dtype
        out_specs = [sspec(CS)]
        out_shape = [jax.ShapeDtypeStruct((CS, RB, LANE), f)]
        if hht:
            out_specs.append(sspec(CH))
            out_shape.append(jax.ShapeDtypeStruct((CH, RB, LANE), f))
        if moored:
            out_specs.append(sspec(CM))
            out_shape.append(jax.ShapeDtypeStruct((CM, RB, LANE), f))
        out_specs.append(zspec)
        out_shape.append(jax.ShapeDtypeStruct((RB, Mp, LANE), f))
        out_specs.append(tspec(sub, sc_hi - sc_lo, RT, LANE))
        out_shape.append(jax.ShapeDtypeStruct(
            (nchunks, sub, sc_hi - sc_lo, RB, LANE), f))
        if has_ex:
            out_specs.append(tspec(sub, ex_hi - ex_lo, RT, LANE))
            out_shape.append(jax.ShapeDtypeStruct(
                (nchunks, sub, ex_hi - ex_lo, RB, LANE), f))
        call = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=interpret,
        )

        def era_ops(params):
            """Padded (eraA, eraB, eraC) matmul operands for this kernel."""
            c = params["_const"]
            eA = jnp.zeros((Mp, Mp), f).at[:M, :M].set(
                jnp.asarray(c["era_Ad"], f))
            eB = jnp.zeros((Mp, Kp), f).at[:M, :K].set(
                jnp.asarray(c["era_Bd"], f))
            eC = jnp.zeros((Kp, Mp), f).at[:K, :M].set(
                jnp.asarray(c["era_C"], f))
            return eA, eB, eC

        def fn(cvec, sc, z, fexc=None, bvec=None, hc=None, mhv=None,
               era_consts=None):
            args = [cvec]
            if has_bv:
                args.append(bvec)
            args.extend(era_consts)
            if has_fexc:
                args.append(fexc)
            if hht:
                args.append(hc)
            if moored:
                args.append(mhv)
            args += [sc, z]
            return call(*args)

        fn.era_ops = era_ops
        return fn


def _dot_list(a, b):
    acc = None
    for x, y in zip(a, b):
        acc = _sadd(acc, _smul(x, y))
    return acc


def _bstack(rows, tile_shape, dtype):
    """Stack row values into one array; rows produced purely from SMEM
    constants stay scalar-shaped, so broadcast everything to the batch tile
    first."""
    return jnp.stack([
        jnp.broadcast_to(jnp.asarray(r, dtype), tile_shape) for r in rows
    ])
