"""Fused Pallas step kernel for farm-scale simulations (const-mass +
state-space radiation).

The general fused kernel (ops/pallas_step.py) unrolls every scalar of the
KKT solve into register-resident rows — ideal for nv <= ~18 but its op
count explodes at farm scale (DEVNOTES: unrolled Cholesky at nv >= 24
blows up Mosaic compile). Farms sit in a different regime: a
time-invariant mass matrix (stepper.py const_mass), joints that are
either absent or configuration-independent (heave rails — solved
in-kernel as a direct cached-inverse KKT, all MXU matmuls), and
state-space radiation (physics/statespace.py) whose [6N, 6N, o]
per-instance state dwarfs everything else. The XLA path pays the fusion lottery on ~20 small
kernels per step (measured ~57 us/step at nv=48, B=128 — PERF.md round 3).

This kernel keeps the whole step in one dispatch and the state-space
tensor VMEM-resident across `sub` integration steps:

* packed [nv(sublane), 128(lane)] layout for every 6N vector — the
  48x48 solves (minv, mhat, D, K_hs) are single MXU matmuls per step;
* the radiation state rides as [o, nv, nv, 128] pages; the ZOH advance
  (ss_step_fused's exact op structure) is o*(o+1) elementwise
  multiply-adds over full (8,128) tiles, and the force contraction is a
  sublane reduction per row page;
* per-body math (quaternion integration, Cardan hydrostatic angles via
  the Cephes atan2/asin polynomials, TSDA wrenches) runs on (1, 128)
  row slices exactly like the general kernel;
* wave excitation depends only on t, so the whole [T, 6N] forcing series
  is precomputed once outside (vmapped Simulation._wave_force — all wave
  kinds) and streamed per dispatch;
* gyroscopic torque is omitted: const_mass requires isotropic inertias,
  for which w x (I w) = 0 identically (the XLA path computes it through
  R I R^T and gets f32 roundoff ~1e-8 of the hydrostatic torque).

Reference being replaced: the 6N-system assembly generalized from
chloadaddedmass.cpp:27-53 + the hot force loop hydro_forces.cpp:537-691,
at a scale (N > 3 coupled bodies) the reference never reaches.

Equivalence with the XLA const-mass path is gated by
tests/test_farm.py::test_farm_fused_matches_xla (interpret mode).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hydrochrono_tpu.ops.pallas_math import asin_tpu, atan2_tpu

LANE = 128

# TPU MXU default precision for f32 dots is ONE bf16 pass (~2.3e-3 rel,
# measured on v5e; precision probe in DEVNOTES round 3). The physics
# matmuls below feed the integrator directly — a 0.4%/step bias in the
# hydrostatic stiffness — so they are pinned to HIGHEST (true f32,
# ~1.4e-7 rel). At [48, 48] x [48, 128] the extra MXU passes are noise
# next to the kernel's VPU work; measured step cost is unchanged.
_PREC = jax.lax.Precision.HIGHEST


def _np_const(x):
    return np.asarray(jax.device_get(x), dtype=np.float64)


class FarmFusedRunner:
    """Compiles a const-mass + state-space Simulation into one Pallas
    step kernel. Raises NotImplementedError for unsupported configs
    (mirrors FusedStepBuilder's probe contract)."""

    def __init__(self, sim, params=None):
        self.sim = sim
        p = sim.params if params is None else params
        if not sim.const_mass:
            raise NotImplementedError("farm kernel requires const_mass")
        if sim.radiation not in ("state_space", "era") or sim.hydro is None:
            raise NotImplementedError(
                "farm kernel requires history-free radiation (state_space/era)")
        if sim.integrator != "euler_implicit_linearized":
            raise NotImplementedError("farm kernel: euler integrator only")
        if sim.dtype != jnp.float32:
            raise NotImplementedError("farm kernel is float32")
        if sim.hydro_slots != list(range(sim.n_moving)):
            raise NotImplementedError(
                "farm kernel requires every moving body hydro, in slot order")
        if sim.spec.rsdas or sim.spec.motors or sim.spec.moorings is not None:
            raise NotImplementedError("farm kernel: TSDA elements only")
        self.constrained = bool(sim.has_constraints)
        if self.constrained:
            # in-kernel KKT is limited to configuration-INDEPENDENT
            # Jacobians: every joint must fully lock the rotation of one
            # moving body against a fixed body (heave-rail prismatic /
            # fixed / locked-revolute farms) so J(t) = J0 exactly (up to
            # integrator roundoff) and the direct cached-inverse solve is
            # exact. Rotating constrained farms take the XLA refined path.
            def _is_fixed(i):
                return i < 0 or sim.spec.bodies[i].fixed

            for kind, locked, _r, b1, b2 in sim.joint_rows:
                locks_rot = kind in ("prismatic", "fixed") or (
                    kind == "revolute" and locked)
                if not locks_rot:
                    raise NotImplementedError(
                        "farm kernel: only rotation-locking joints "
                        "(prismatic/fixed/locked-revolute) are fused")
                if _is_fixed(b1) == _is_fixed(b2):
                    raise NotImplementedError(
                        "farm kernel: fused joints must pair one moving "
                        "body with a fixed body")
            for i in sim.moving:
                if not np.allclose(sim.spec.bodies[i].quat0,
                                   (1.0, 0.0, 0.0, 0.0)):
                    raise NotImplementedError(
                        "farm kernel: constrained farms require identity "
                        "initial orientations (linearized residual)")
        for t in sim.spec.tsdas:
            if t.spring_curve is not None or t.damping_curve is not None:
                raise NotImplementedError("farm kernel: linear TSDA only")
        if sim.n_moving > 32:
            raise NotImplementedError("farm kernel unrolls per-body math; nm <= 32")

        c = p["_const"]
        self.mode = sim.radiation
        nv, nm = sim.nv, sim.n_moving
        o = sim.ss_order if self.mode == "state_space" else 0
        self.nv, self.nm, self.o = nv, nm, o
        f32 = np.float32

        if self.mode == "state_space":
            # --- per-entry state-space tensors, pre-broadcast to lanes --
            Ad = _np_const(c["ss_Ad"])  # [nv, nv, o, o]
            Bd = _np_const(c["ss_Bd"])  # [nv, nv, o]
            Cm = _np_const(c["ss_C"])   # [nv, nv, o]
            # NOTE: constants stay numpy (materialized per trace) — building
            # jnp arrays here would leak tracers when the runner is first
            # constructed inside a jit trace (the runner is cached on sim).
            self.adb = np.ascontiguousarray(np.broadcast_to(
                Ad.transpose(2, 3, 0, 1)[..., None], (o, o, nv, nv, LANE)), f32)
            self.bdb = np.ascontiguousarray(np.broadcast_to(
                Bd.transpose(2, 0, 1)[..., None], (o, nv, nv, LANE)), f32)
            self.cmb = np.ascontiguousarray(np.broadcast_to(
                Cm.transpose(2, 0, 1)[..., None], (o, nv, nv, LANE)), f32)
        else:
            # --- shared-pole ERA realization (physics/era.py): the state
            # is ONE [M, LANE] tile and advance/output are MXU matmuls —
            # the per-entry pages (o * nv^2 rows) disappear entirely
            M = sim.era_order
            self.Mp = max(8, -(-M // 8) * 8)  # sublane-pad to 8
            eA = np.zeros((self.Mp, self.Mp))
            eB = np.zeros((self.Mp, nv))
            eC = np.zeros((nv, self.Mp))
            eA[:M, :M] = _np_const(c["era_Ad"])
            eB[:M] = _np_const(c["era_Bd"])
            eC[:, :M] = _np_const(c["era_C"])
            self.eraA = np.ascontiguousarray(eA, f32)
            self.eraB = np.ascontiguousarray(eB, f32)
            self.eraC = np.ascontiguousarray(eC, f32)

        # --- matmul operands: Dm, mhat, minv, Kneg ---------------------
        grav = _np_const(c["gravity"])
        g_mag = float(np.linalg.norm(grav))
        k_lin = _np_const(c["k_lin"])  # [Nh, 6, 6] unscaled
        Kneg = np.zeros((nv, nv))
        for b in range(nm):
            Kneg[b * 6:(b + 1) * 6, b * 6:(b + 1) * 6] = (
                -(sim.rho * g_mag) * k_lin[b])
        dmat = _np_const(c["ss_D"] if self.mode == "state_space"
                         else c["era_D"])
        self.mats = np.stack([
            dmat, _np_const(c["mhat"]),
            _np_const(c["minv"]), Kneg]).astype(f32)

        # --- constant-J KKT operands (constrained farms) ---------------
        if self.constrained:
            J0 = _np_const(c["kkt_j0"])          # [m, nv]
            MinvJt = _np_const(c["kkt_minvjt"])  # [nv, m]
            Sinv = _np_const(c["kkt_sinv"])      # [m, m]
            self.m_rows = J0.shape[0]
            # Baumgarte residual, linearized about the initial
            # configuration: c(x) ~= J0 @ dx with dx = [P - pos0, cardan].
            # The kernel's disp vector is [P - cg_eq, cardan], so
            # c = J0 @ disp + J0 @ (cg_eq - pos0) = J0 @ disp + ccon.
            doff = np.zeros((nv,))
            cg_eq = _np_const(c["cg_eq"])
            for s, i in enumerate(sim.moving):
                doff[6 * s:6 * s + 3] = (
                    cg_eq[s] - np.asarray(sim.spec.bodies[i].pos0, np.float64))
            ccon = J0 @ doff
            self.jmat = np.ascontiguousarray(J0, f32)
            self.minvjt = np.ascontiguousarray(MinvJt, f32)
            self.sinv = np.ascontiguousarray(Sinv, f32)
            self.ccon = np.ascontiguousarray(np.broadcast_to(
                ccon[:, None], (self.m_rows, LANE)), f32)
        else:
            self.m_rows = 0

        # --- viscous (Morison-type) per-DOF damping --------------------
        self.has_visc = bool(getattr(sim, "has_viscous", False))
        if self.has_visc:
            vl = _np_const(p["visc_lin"])
            vq = _np_const(p["visc_quad"])
            if vl.ndim != 2:
                raise NotImplementedError(
                    "farm kernel: per-instance viscous coefficients are "
                    "XLA-path only")
            self.visc = np.ascontiguousarray(np.broadcast_to(
                np.stack([vl.reshape(-1), vq.reshape(-1)])[:, :, None],
                (2, nv, LANE)), f32)

        # --- static force rows: gravity + buoyancy ---------------------
        mass = _np_const(p["mass"])
        disp_vol = _np_const(c["disp_vol"])
        cb_cg = _np_const(c["cb_minus_cg"])
        fstat = np.zeros((nv,))
        for b in range(nm):
            fstat[b * 6:b * 6 + 3] += mass[b] * grav
            f_buoy = sim.rho * (-grav) * disp_vol[b]
            fstat[b * 6:b * 6 + 3] += f_buoy
            fstat[b * 6 + 3:b * 6 + 6] += np.cross(cb_cg[b], f_buoy)
        cgoff = np.zeros((nv,))
        cg_eq = _np_const(c["cg_eq"])
        for b in range(nm):
            cgoff[b * 6:b * 6 + 3] = cg_eq[b]
        self.fstat = np.ascontiguousarray(
            np.broadcast_to(fstat[:, None], (nv, LANE)), f32)
        self.cgoff = np.ascontiguousarray(
            np.broadcast_to(cgoff[:, None], (nv, LANE)), f32)

        # --- TSDA constants (embedded as python scalars) ---------------
        self.tsdas = []
        for idx, t in enumerate(sim.spec.tsdas):
            tc = c["tsda"][idx]
            self.tsdas.append(dict(
                body1=t.body1, body2=t.body2,
                l1=tuple(_np_const(tc["l1"])), l2=tuple(_np_const(tc["l2"])),
                k=float(_np_const(p["tsda_k"])[idx]),
                cc=float(_np_const(p["tsda_c"])[idx]),
                L0=float(sim.tsda_rest[idx]),
            ))
        self.fixed_pose = {
            i: (tuple(map(float, pq[0])), tuple(map(float, pq[1])))
            for i, pq in sim.fixed_pose_np.items()
        }

    # ------------------------------------------------------------------
    # in-kernel row helpers ((1, LANE) arrays; constants are floats)
    # ------------------------------------------------------------------
    @staticmethod
    def _cross(a, b):
        return [a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0]]

    @staticmethod
    def _dot3(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    @staticmethod
    def _qrot(q, v):
        """Rotate v (3 rows or floats) by quaternion rows q (wxyz)."""
        w, u = q[0], q[1:4]
        t = [2.0 * (u[1] * v[2] - u[2] * v[1]),
             2.0 * (u[2] * v[0] - u[0] * v[2]),
             2.0 * (u[0] * v[1] - u[1] * v[0])]
        utx = [u[1] * t[2] - u[2] * t[1],
               u[2] * t[0] - u[0] * t[2],
               u[0] * t[1] - u[1] * t[0]]
        return [v[k] + w * t[k] + utx[k] for k in range(3)]

    def _cardan_rows(self, q):
        """Cardan XYZ angles from quaternion rows (rotations.py
        cardan_xyz_from_quat; reference hydro_forces.cpp:280-289)."""
        w, x, y, z = q
        r00 = 1.0 - 2.0 * (y * y + z * z)
        r01 = 2.0 * (x * y - w * z)
        r02 = 2.0 * (x * z + w * y)
        r12 = 2.0 * (y * z - w * x)
        r22 = 1.0 - 2.0 * (x * x + y * y)
        a = atan2_tpu(-r12, r22)
        b = asin_tpu(jnp.clip(r02, -1.0, 1.0))
        cc = atan2_tpu(-r01, r00)
        return [a, b, cc]

    @staticmethod
    def _quat_integrate(q, wv, h):
        th = [wv[k] * h for k in range(3)]
        sq = th[0] * th[0] + th[1] * th[1] + th[2] * th[2]
        small = sq < 1e-16
        sq_safe = jnp.where(small, 1.0, sq)
        angle = jnp.sqrt(sq_safe)
        half = 0.5 * angle
        dw = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
        k = jnp.where(small, 0.5 * (1.0 - sq / 24.0), jnp.sin(half) / angle)
        dq = [dw, th[0] * k, th[1] * k, th[2] * k]
        aw, ax, ay, az = dq
        bw, bx, by, bz = q
        qn = [aw * bw - ax * bx - ay * by - az * bz,
              aw * bx + ax * bw + ay * bz - az * by,
              aw * by - ax * bz + ay * bw + az * bx,
              aw * bz + ax * by - ay * bx + az * bw]
        norm = jnp.sqrt(qn[0] * qn[0] + qn[1] * qn[1]
                        + qn[2] * qn[2] + qn[3] * qn[3])
        return [e / norm for e in qn]

    # ------------------------------------------------------------------
    def _tsda_rows(self, P, Q, V):
        """TSDA generalized-force row additions: {row_index: (1,L) term}.

        Mirrors stepper._element_forces for linear coefficients; fixed
        bodies contribute their constant pose and zero velocity."""
        nm = self.nm
        adds = {}

        def pose_of(i):
            if i < 0 or self.sim.spec.bodies[i].fixed:
                pp, qq = self.fixed_pose.get(
                    i, ((0.0, 0.0, 0.0), (1.0, 0.0, 0.0, 0.0)))
                return list(pp), list(qq), None
            s = self.sim.slot_of[i]
            return ([P[3 * s + k] for k in range(3)],
                    [Q[4 * s + k] for k in range(4)], s)

        def vel_of(s):
            if s is None:
                return [0.0] * 3, [0.0] * 3
            return ([V[6 * s + k] for k in range(3)],
                    [V[6 * s + 3 + k] for k in range(3)])

        def add(s, rows6):
            if s is None:
                return
            for k in range(6):
                key = 6 * s + k
                adds[key] = adds.get(key, 0.0) + rows6[k]

        for t in self.tsdas:
            pb1, qb1, s1 = pose_of(t["body1"])
            pb2, qb2, s2 = pose_of(t["body2"])
            # moving: rotate rows in-kernel; fixed: constant fold on host
            r1 = (self._qrot(qb1, t["l1"]) if s1 is not None
                  else list(_rot_const(qb1, t["l1"])))
            r2 = (self._qrot(qb2, t["l2"]) if s2 is not None
                  else list(_rot_const(qb2, t["l2"])))
            P1 = [pb1[k] + r1[k] for k in range(3)]
            P2 = [pb2[k] + r2[k] for k in range(3)]
            u1, w1 = vel_of(s1)
            u2, w2 = vel_of(s2)
            rel1 = [P1[k] - pb1[k] for k in range(3)]
            rel2 = [P2[k] - pb2[k] for k in range(3)]
            V1 = [u1[k] + cv for k, cv in enumerate(self._cross(w1, rel1))] \
                if s1 is not None else [0.0] * 3
            V2 = [u2[k] + cv for k, cv in enumerate(self._cross(w2, rel2))] \
                if s2 is not None else [0.0] * 3
            d = [P2[k] - P1[k] for k in range(3)]
            L = jnp.sqrt(self._dot3(d, d))
            Ls = jnp.maximum(L, 1e-12)
            dhat = [d[k] / Ls for k in range(3)]
            dV = [V2[k] - V1[k] for k in range(3)]
            Ldot = self._dot3(dV, dhat)
            fmag = -t["k"] * (L - t["L0"]) - t["cc"] * Ldot
            fvec2 = [fmag * dhat[k] for k in range(3)]
            if s2 is not None:
                add(s2, fvec2 + self._cross(rel2, fvec2))
            if s1 is not None:
                nf = [-fvec2[k] for k in range(3)]
                add(s1, nf + self._cross(rel1, nf))
        return adds

    # ------------------------------------------------------------------
    def make_kernel(self, sub: int, RBt: int, nchunks: int, interpret: bool):
        """Build the whole-run pallas_call: grid = (batch tile, time chunk),
        `sub` integration steps per grid step.

        The decisive design point (measured, DEVNOTES round 3): per-call
        operand DMA dominates a per-chunk kernel — a NULL kernel with this
        kernel's operand set costs ~116 us/invocation (~14 us/step at
        sub=8) because the 9.6 MB of pre-broadcast constants and the
        radiation state re-enter VMEM on every dispatch. Running the WHOLE
        time loop as the inner grid dimension makes every constant and
        state block a revisited VMEM-resident block (fetched once per
        batch tile; constants once per call): only the compact wave
        forcing streams in and the position trajectory streams out. The
        state out-blocks double as the carry: they are initialized from
        the state inputs at time-chunk 0 and flushed to HBM only when the
        batch tile advances (the standard Pallas accumulator pattern)."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        nv, nm, o = self.nv, self.nm, self.o
        nm3, nm4 = nm * 3, nm * 4
        h = float(self.sim.dt)
        ab = getattr(self, "ablate", ())  # perf-tuning ablation hooks
        con = self.constrained

        vis = self.has_visc

        era = self.mode == "era"

        def kernel(*refs):
            if era:
                eA, eB, eC, mats, fstat, cgoff = refs[:6]
            else:
                adb, bdb, cmb, mats, fstat, cgoff = refs[:6]
            i = 6
            if vis:
                visc_ref = refs[i]
                i += 1
            if con:
                jmat, sinv, minvjt, ccon = refs[i:i + 4]
                i += 4
            fw = refs[i]
            p_in, q_in, v_in, x_in = refs[i + 1:i + 5]
            p_out, q_out, v_out, x_out, traj = refs[i + 5:i + 10]
            tc = pl.program_id(1)

            @pl.when(tc == 0)
            def _init():  # new batch tile: load the carried state
                p_out[0] = p_in[0]
                q_out[0] = q_in[0]
                v_out[0] = v_in[0]
                x_out[0] = x_in[0]

            P = p_out[0]     # (nm3, L)
            Qm = q_out[0]    # (nm4, L)
            Vp = v_out[0]    # (nv, L)
            if era:
                Z = x_out[0]  # (Mp, L) shared-pole radiation state
                eAv, eBv, eCv = eA[...], eB[...], eC[...]
            else:
                X = [x_out[0, i] for i in range(o)]  # each (nv, nv, L)
            dm, mhat, minv, kneg = (mats[k] for k in range(4))
            fstat = fstat[...]
            cgoff = cgoff[...]
            if vis:
                vlin, vquad = visc_ref[0], visc_ref[1]
            if con:
                jmat, sinv, minvjt, ccon = (
                    jmat[...], sinv[...], minvjt[...], ccon[...])

            for e in range(0 if "empty" in ab else sub):
                Prows = [P[k:k + 1] for k in range(nm3)]
                Qrows = [Qm[k:k + 1] for k in range(nm4)]
                Vrows = [Vp[k:k + 1] for k in range(nv)]

                # -- radiation: F = D v + C z (era) / per-entry reduce (ss);
                #    state advance as matmuls (era) / ZOH elementwise (ss)
                if "mats" in ab:
                    frad = 0.001 * Vp
                else:
                    frad = jnp.dot(dm, Vp, precision=_PREC,
                                   preferred_element_type=jnp.float32)
                if era:
                    if "reduce" not in ab:
                        frad = frad + jnp.dot(
                            eCv, Z, precision=_PREC,
                            preferred_element_type=jnp.float32)
                    if "adv" not in ab:
                        Zn = (jnp.dot(eAv, Z, precision=_PREC,
                                      preferred_element_type=jnp.float32)
                              + jnp.dot(eBv, Vp, precision=_PREC,
                                        preferred_element_type=jnp.float32))
                    else:
                        Zn = Z
                else:
                    if "reduce" not in ab:
                        for i in range(o):
                            frad = frad + jnp.sum(cmb[i] * X[i], axis=1)
                    if "adv" not in ab:
                        Xn = []
                        for i in range(o):
                            xi = bdb[i] * Vp[None, :, :]
                            for pp in range(o):
                                xi = xi + adb[i, pp] * X[pp]
                            Xn.append(xi)
                    else:
                        Xn = X

                # -- hydrostatics: Kneg @ disp6 (buoyancy sits in fstat)
                if "concat" in ab:
                    disp = Vp * 0.5
                else:
                    disp_chunks = []
                    for b in range(nm):
                        card = self._cardan_rows(
                            [Qrows[4 * b + k] for k in range(4)])
                        disp_chunks.append(P[3 * b:3 * b + 3])
                        disp_chunks.append(jnp.concatenate(card, axis=0))
                    disp = jnp.concatenate(disp_chunks, axis=0) - cgoff
                if "mats" in ab:
                    fhs = -1000.0 * disp
                else:
                    fhs = jnp.dot(kneg, disp, precision=_PREC,
                                  preferred_element_type=jnp.float32)

                # -- mechanical elements (TSDA)
                adds = {} if "tsda" in ab else \
                    self._tsda_rows(Prows, Qrows, Vrows)
                if adds:
                    zero = jnp.zeros((1, LANE), jnp.float32)
                    fel = jnp.concatenate(
                        [adds[k] if k in adds else zero for k in range(nv)],
                        axis=0)
                else:
                    fel = 0.0

                fwe = jnp.broadcast_to(fw[0, e], (nv, LANE))
                ftot = fstat + fel + fhs - frad + fwe
                if vis:
                    ftot = ftot - (vlin * Vp + vquad * jnp.abs(Vp) * Vp)
                if "mats" in ab:
                    rhs = Vp + h * ftot
                    Vn = 0.999 * rhs * 1e-6
                else:
                    rhs = jnp.dot(mhat, Vp, precision=_PREC,
                                  preferred_element_type=jnp.float32) + h * ftot
                    Vn = jnp.dot(minv, rhs, precision=_PREC,
                                 preferred_element_type=jnp.float32)
                if con:
                    # constant-J KKT, direct with the cached inverses
                    # (exact — M and J are both time-invariant here):
                    #   lam = S0^-1 (J0 Minv rhs - g),  g = -c/h
                    #   Vn  = Minv rhs - Minv J0^T lam
                    cres = jnp.dot(jmat, disp, precision=_PREC,
                                   preferred_element_type=jnp.float32) \
                        + ccon
                    jt = jnp.dot(jmat, Vn, precision=_PREC,
                                 preferred_element_type=jnp.float32)
                    lam = jnp.dot(sinv, jt + cres * (1.0 / h),
                                  precision=_PREC,
                                  preferred_element_type=jnp.float32)
                    Vn = Vn - jnp.dot(minvjt, lam, precision=_PREC,
                                      preferred_element_type=jnp.float32)

                # -- semi-implicit update
                if "concat" in ab:
                    P = P + h * Vn[:nm3]
                else:
                    p_chunks, q_chunks = [], []
                    for b in range(nm):
                        p_chunks.append(
                            P[3 * b:3 * b + 3] + h * Vn[6 * b:6 * b + 3])
                        wrows = [Vn[6 * b + 3 + k:6 * b + 4 + k]
                                 for k in range(3)]
                        qn = self._quat_integrate(
                            [Qrows[4 * b + k] for k in range(4)], wrows, h)
                        q_chunks.append(jnp.concatenate(qn, axis=0))
                    P = jnp.concatenate(p_chunks, axis=0)
                    Qm = jnp.concatenate(q_chunks, axis=0)
                Vp = Vn
                if era:
                    Z = Zn
                else:
                    X = Xn
                if "dumpf0" in ab:
                    traj[0, 0, e] = ftot[:nm3]
                elif "dumpf1" in ab:
                    traj[0, 0, e] = ftot[nm3:2 * nm3]
                elif "dumph0" in ab:
                    traj[0, 0, e] = fhs[:nm3]
                elif "dumprad0" in ab:
                    traj[0, 0, e] = frad[:nm3]
                elif "dumpw0" in ab:
                    traj[0, 0, e] = fwe[:nm3]
                elif "dumpd0" in ab:
                    traj[0, 0, e] = disp[:nm3]
                elif "dumpd1" in ab:
                    traj[0, 0, e] = disp[nm3:2 * nm3]
                elif "traj" not in ab:
                    traj[0, 0, e] = P
                elif e == sub - 1:
                    for e2 in range(sub):
                        traj[0, 0, e2] = P

            p_out[0] = P
            q_out[0] = Qm
            v_out[0] = Vp
            x_out[0] = Z if era else jnp.stack(X)

        def cspec(*dims):
            # constants: block index never changes -> DMA'd once per call
            return pl.BlockSpec(dims, lambda bt, tc: (0,) * len(dims),
                                memory_space=pltpu.VMEM)

        def sspec(*dims):
            # carried state: revisited across the whole time sweep of one
            # batch tile (index ignores tc)
            nd = len(dims)
            return pl.BlockSpec((1,) + dims,
                                lambda bt, tc, nd=nd: (bt,) + (0,) * nd,
                                memory_space=pltpu.VMEM)

        def tspec(*dims):
            # streamed per time chunk
            nd = len(dims)
            return pl.BlockSpec((1, 1) + dims,
                                lambda bt, tc, nd=nd: (bt, tc) + (0,) * nd,
                                memory_space=pltpu.VMEM)

        fw_spec = pl.BlockSpec(
            (1, sub, nv, 1), lambda bt, tc: (tc, 0, 0, 0),
            memory_space=pltpu.VMEM)

        m = self.m_rows
        visc_specs = [cspec(2, nv, LANE)] if vis else []
        kkt_specs = ([cspec(m, nv), cspec(m, m), cspec(nv, m),
                      cspec(m, LANE)] if con else [])
        if era:
            Mp = self.Mp
            rad_specs = [cspec(Mp, Mp), cspec(Mp, nv), cspec(nv, Mp)]
            rad_state = sspec(Mp, LANE)
            rad_shape = (RBt, Mp, LANE)
        else:
            rad_specs = [cspec(o, o, nv, nv, LANE), cspec(o, nv, nv, LANE),
                         cspec(o, nv, nv, LANE)]
            rad_state = sspec(o, nv, nv, LANE)
            rad_shape = (RBt, o, nv, nv, LANE)
        in_specs = [
            *rad_specs, cspec(4, nv, nv),
            cspec(nv, LANE), cspec(nv, LANE), *visc_specs, *kkt_specs,
            fw_spec,
            sspec(nm3, LANE), sspec(nm4, LANE), sspec(nv, LANE),
            rad_state,
        ]
        out_specs = [
            sspec(nm3, LANE), sspec(nm4, LANE), sspec(nv, LANE),
            rad_state, tspec(sub, nm3, LANE),
        ]
        f32 = jnp.float32
        out_shape = [
            jax.ShapeDtypeStruct((RBt, nm3, LANE), f32),
            jax.ShapeDtypeStruct((RBt, nm4, LANE), f32),
            jax.ShapeDtypeStruct((RBt, nv, LANE), f32),
            jax.ShapeDtypeStruct(rad_shape, f32),
            jax.ShapeDtypeStruct((RBt, nchunks, sub, nm3, LANE), f32),
        ]
        return pl.pallas_call(
            kernel, grid=(RBt, nchunks), in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shape, interpret=interpret,
        )

    # ------------------------------------------------------------------
    # packing between State pytrees and the kernel layout
    # ------------------------------------------------------------------
    def pack(self, states):
        nm, nv, o = self.nm, self.nv, self.o
        B = states.pos.shape[0]
        RBt = -(-B // LANE)
        Bp = RBt * LANE
        sel = jnp.minimum(jnp.arange(Bp), B - 1)

        def tile2(x, rows):  # [B, rows] -> [RBt, rows, LANE]
            xp = x[sel]  # [Bp, rows]
            return xp.T.reshape(rows, RBt, LANE).transpose(1, 0, 2)

        f32 = jnp.float32
        P = tile2(states.pos.reshape(B, nm * 3).astype(f32), nm * 3)
        Qm = tile2(states.quat.reshape(B, nm * 4).astype(f32), nm * 4)
        V = tile2(jnp.concatenate(
            [states.lin_vel, states.ang_vel], axis=-1
        ).reshape(B, nv).astype(f32), nv)
        if self.mode == "era":
            zpad = jnp.zeros(
                (states.ss.shape[0], self.Mp - states.ss.shape[-1]), f32)
            z = jnp.concatenate([states.ss.astype(f32), zpad], axis=-1)
            X = tile2(z, self.Mp)  # [RBt, Mp, LANE]
        else:
            ss = states.ss.astype(f32)[sel]  # [Bp, nv, nv, o]
            X = ss.transpose(3, 1, 2, 0).reshape(
                o, nv, nv, RBt, LANE).transpose(3, 0, 1, 2, 4)
        return P, Qm, V, X, RBt, B

    def unpack(self, P, Qm, V, X, B, states):
        nm, nv, o = self.nm, self.nv, self.o
        RBt = P.shape[0]

        def untile(x, rows):  # [RBt, rows, LANE] -> [B, rows]
            return x.transpose(1, 0, 2).reshape(rows, RBt * LANE).T[:B]

        dt = states.pos.dtype
        pos = untile(P, nm * 3).reshape(B, nm, 3).astype(dt)
        quat = untile(Qm, nm * 4).reshape(B, nm, 4).astype(dt)
        v = untile(V, nv).reshape(B, nm, 6).astype(dt)
        if self.mode == "era":
            M = states.ss.shape[-1]
            ss = untile(X, self.Mp)[:, :M].astype(dt)
        else:
            ss = X.transpose(1, 2, 3, 0, 4).reshape(
                o, nv, nv, RBt * LANE).transpose(3, 1, 2, 0)[:B].astype(dt)
        return dataclasses.replace(
            states, pos=pos, quat=quat,
            lin_vel=v[..., :3], ang_vel=v[..., 3:], ss=ss)

    # ------------------------------------------------------------------
    def run(self, num_steps: int, states, params=None, interpret=None,
            subblock=None, start_step: int = 0):
        """Batched fused farm run: (final State [B,...], {"pos": [B,T,nm,3]}).

        Equivalent to vmap(sim.run) for the supported configuration
        (gated by tests/test_farm.py); per-instance params are not
        supported (the XLA path handles those)."""
        sim = self.sim
        p = sim.params if params is None else params
        if params is not None and params is not sim.params:
            # everything except the wave forcing is BAKED into the kernel
            # at construction (self.tsdas/self.mats/fstat); silently
            # running an overridden tsda_c with the old damping is the
            # optimize-pto footgun — refuse what we cannot honor. Traced
            # values (params passed through jit) cannot be checked here;
            # the production callers pass concrete params.
            for key in ("tsda_k", "tsda_c", "mass", "visc_lin",
                        "visc_quad"):
                if key not in sim.params:
                    continue
                new_v, old_v = params.get(key), sim.params[key]
                if new_v is None:
                    continue  # omitted key == use the baked value
                if isinstance(new_v, jax.core.Tracer) or not np.array_equal(
                        np.asarray(jax.device_get(new_v)),
                        np.asarray(jax.device_get(old_v))):
                    # a traced override can never be honored either — the
                    # value is baked; raising beats silently-stale physics
                    raise ValueError(
                        f"run_farm_fused bakes '{key}' into the kernel at "
                        "build time; rebuild the Simulation with the new "
                        "value, or use the differentiable XLA path "
                        "(sim.run / vmap) for parameter studies")
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        # sub=8 measured best on v5e (B=128: 15.7/16.4/18.6 us/step for
        # sub 8/16/32 — dispatch overhead is already amortized at 8 and
        # larger subs only grow the program)
        sub = subblock or (8 if not interpret else 4)
        sub = min(sub, num_steps)

        # wave forcing series [T, nv] (t-only dependent for every kind)
        steps = start_step + jnp.arange(num_steps, dtype=jnp.int32)
        fwave = jax.vmap(lambda n: sim._wave_force(p, n))(steps)
        fwave = fwave.astype(jnp.float32)

        P, Qm, V, X, RBt, B = self.pack(states)
        if self.mode == "era":
            consts = (self.eraA, self.eraB, self.eraC, self.mats,
                      self.fstat, self.cgoff)
        else:
            consts = (self.adb, self.bdb, self.cmb, self.mats,
                      self.fstat, self.cgoff)
        if self.has_visc:
            consts = consts + (self.visc,)
        if self.constrained:
            consts = consts + (self.jmat, self.sinv, self.minvjt, self.ccon)

        nfull = num_steps // sub
        rem = num_steps - nfull * sub

        trs = []
        carry = (P, Qm, V, X)
        if nfull:
            call = self.make_kernel(sub, RBt, nfull, interpret)
            fwb = fwave[:nfull * sub].reshape(nfull, sub, self.nv, 1)
            Pn, Qn, Vn, Xn, tr = call(*consts, fwb, *carry)
            carry = (Pn, Qn, Vn, Xn)
            trs.append(tr)  # [RBt, nfull, sub, nm3, L]
        if rem:
            call_r = self.make_kernel(rem, RBt, 1, interpret)
            fwb = fwave[nfull * sub:].reshape(1, rem, self.nv, 1)
            Pn, Qn, Vn, Xn, tr = call_r(*consts, fwb, *carry)
            carry = (Pn, Qn, Vn, Xn)
            trs.append(tr)  # [RBt, 1, rem, nm3, L]

        final = self.unpack(*carry, B, states)

        # [RBt, chunks, sub, nm3, L] -> [B, T, nm, 3]
        parts = []
        for tr in trs:
            _, nc, s, nm3, _ = tr.shape
            parts.append(
                tr.transpose(0, 4, 1, 2, 3).reshape(RBt * LANE, nc * s, nm3))
        pos_traj = jnp.concatenate(parts, axis=1)[:B]
        T = pos_traj.shape[1]
        traj = {"pos": pos_traj.reshape(B, T, self.nm, 3).astype(
            states.pos.dtype)}
        return final, traj


def _rot_const(q, v):
    """Host-side rotate of constant v by constant quaternion q (wxyz)."""
    w = q[0]
    u = np.asarray(q[1:4])
    vv = np.asarray(v, dtype=np.float64)
    t = 2.0 * np.cross(u, vv)
    return vv + w * t + np.cross(u, t)
