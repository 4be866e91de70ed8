"""The time-domain stepper: one `jax.lax.scan` over the whole simulation.

Numerical scheme, matching Chrono's EULER_IMPLICIT_LINEARIZED default
timestepper (verified to reproduce the reference golden trajectories to
~1e-7 m):

  per step n (t = n*dt):

    1. record v(t) into the velocity-history ring buffer
    2. F(t) = F_hydrostatic(x) - F_radiation(history) + F_wave(t)
              + gravity + gyroscopic + TSDA/RSDA
    3. solve the velocity-level KKT system with position stabilization
         [ M^  J^T ] [v+]   [ M^ v + h F ]
         [ J    0  ] [-l] = [    -c/h    ]
       where M^ = blockdiag(m I3, R I R^T) + A_inf  (world-frame Newton-Euler
       with the rho-scaled infinite-frequency added mass injected, mirroring
       ChLoadAddedMass, reference: chloadaddedmass.cpp:27-71)
    4. x+ = x + h u+ ; q+ = exp(h w+/2) * q   (semi-implicit update)

The radiation convolution uses the dt-resampled history kernel
(physics/radiation.py) so the per-step hot loop is one MXU matmul.

Batching: every per-instance-variable quantity (wave arrays, PTO
coefficients, body masses) lives in a `params` pytree that `run` takes
explicitly; `run_batch` vmaps over any subset of those leaves, which is how
the reference's serial YAML period sweeps (hydro_yaml_parser.cpp:409-524)
become one batched device program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from hydrochrono_tpu.io.bemio import HydroData
from hydrochrono_tpu.ops.linalg import solve_kkt, solve_spd
from hydrochrono_tpu.physics import radiation as rad
from hydrochrono_tpu.physics import waves as wv
from hydrochrono_tpu.physics.hydrostatics import hydrostatic_force
from hydrochrono_tpu.physics.rotations import (
    quat_integrate,
    quat_multiply,
    quat_rotate,
    quat_to_matrix,
)
from hydrochrono_tpu.physics.system import SystemSpec

DOF = 6


@dataclasses.dataclass
class State:
    """Dynamic state of one simulation instance (a pytree)."""

    pos: jnp.ndarray  # [Nm, 3]
    quat: jnp.ndarray  # [Nm, 4] wxyz
    lin_vel: jnp.ndarray  # [Nm, 3] world
    ang_vel: jnp.ndarray  # [Nm, 3] world
    vhist: jnp.ndarray  # [H, 6*Nh] radiation ring buffer (zeros if no hydro)


jax.tree_util.register_dataclass(
    State, data_fields=["pos", "quat", "lin_vel", "ang_vel", "vhist"], meta_fields=[]
)


def _orthonormal_basis(axis: np.ndarray):
    a = axis / np.linalg.norm(axis)
    ref = np.array([1.0, 0.0, 0.0]) if abs(a[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    n1 = np.cross(a, ref)
    n1 /= np.linalg.norm(n1)
    n2 = np.cross(a, n1)
    return a, n1, n2


def _quat_conj(q):
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def _rot_np(q0):
    w, x, y, z = q0
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


class Simulation:
    """Compiled simulation: static metadata + device arrays + scan step.

    `self.params` is the default parameter pytree; pass modified / batched
    versions to `run` / `run_batch` for sweeps without rebuilding.
    """

    def __init__(self, spec: SystemSpec, dt: float, wave=None, duration: Optional[float] = None,
                 dtype=None, tapered: Optional[rad.TaperedDirectOptions] = None,
                 outputs: tuple = ("pos", "quat", "lin_vel", "ang_vel")):
        self.spec = spec
        self.dt = float(dt)
        self.dtype = dtype if dtype is not None else jnp.zeros(0).dtype
        self.wave = wave if wave is not None else wv.NoWave()
        self.duration = duration
        self.outputs = outputs

        bodies = spec.bodies
        self.moving = [i for i, b in enumerate(bodies) if not b.fixed]
        self.slot_of = {i: s for s, i in enumerate(self.moving)}
        nm = len(self.moving)
        self.n_moving = nm
        self.nv = DOF * nm

        params = {}
        params["mass"] = jnp.asarray([bodies[i].mass for i in self.moving], self.dtype)
        self.inertia_body = jnp.asarray(
            np.stack([bodies[i].inertia_matrix() for i in self.moving]), self.dtype
        )
        self.gravity = jnp.asarray(spec.gravity, self.dtype)

        # fixed-body poses (anchors for constraints)
        self.fixed_pos = {
            i: np.asarray(bodies[i].pos0, dtype=np.float64)
            for i, b in enumerate(bodies) if b.fixed
        }
        self.fixed_quat = {
            i: np.asarray(bodies[i].quat0, dtype=np.float64)
            for i, b in enumerate(bodies) if b.fixed
        }

        # ----- hydro attachment -----
        self.hydro = spec.hydro
        if self.hydro is not None:
            hd: HydroData = self.hydro.hydro
            nh = hd.num_bodies
            self.hydro_slots = jnp.asarray(
                [self.slot_of[i] for i in self.hydro.body_indices], jnp.int32
            )
            self.k_lin = jnp.asarray(hd.lin_stiffness, self.dtype)
            self.cg_eq = jnp.asarray(hd.cg, self.dtype)
            self.cb_minus_cg = jnp.asarray(hd.cb - hd.cg, self.dtype)
            self.disp_vol = jnp.asarray(hd.disp_vol, self.dtype)
            self.rho = float(hd.rho)

            kernel = hd.rirf
            if tapered is not None:
                kernel = rad.preprocess_rirf_tapered(kernel, hd.rirf_time, tapered)
            W = rad.resample_kernel_to_history(kernel, hd.rirf_time, self.dt)
            self.hist_len = W.shape[0]
            self.W_rev = jnp.asarray(W[::-1].copy(), self.dtype)

            # A_inf padded to the full moving-body system (chloadaddedmass.cpp:34-42)
            ainf_sys = np.zeros((self.nv, self.nv))
            for hb1, sb1 in enumerate(self.hydro.body_indices):
                for hb2, sb2 in enumerate(self.hydro.body_indices):
                    s1, s2 = self.slot_of[sb1], self.slot_of[sb2]
                    ainf_sys[s1 * 6 : s1 * 6 + 6, s2 * 6 : s2 * 6 + 6] = hd.inf_added_mass[
                        hb1 * 6 : hb1 * 6 + 6, hb2 * 6 : hb2 * 6 + 6
                    ]
            self.ainf = jnp.asarray(ainf_sys, self.dtype)
            self.n_hydro = nh
        else:
            self.hist_len = 1
            self.n_hydro = 0
            self.ainf = jnp.zeros((self.nv, self.nv), self.dtype)
            self.hydro_slots = jnp.zeros((0,), jnp.int32)

        # ----- wave force arrays -----
        self._build_wave_arrays(params)

        # ----- constraints -----
        self._build_constraints()

        # ----- TSDA / RSDA -----
        self._build_force_elements(params)

        self.params = params

    # ------------------------------------------------------------------
    def _build_wave_arrays(self, params):
        wave = self.wave
        self.wave_kind = type(wave).__name__
        if isinstance(wave, wv.NoWave) or self.hydro is None:
            self.wave_kind = "NoWave"
            return
        hd = self.hydro.hydro
        if isinstance(wave, wv.RegularWave):
            data = wv.build_regular_wave(hd, wave)
            params["reg_mag"] = jnp.asarray(data.force_mag, self.dtype)
            params["reg_phase"] = jnp.asarray(data.force_phase, self.dtype)
            params["reg_amp"] = jnp.asarray(data.amplitude, self.dtype)
            params["reg_omega"] = jnp.asarray(data.omega, self.dtype)
        elif isinstance(wave, wv.IrregularWaveParams):
            if self.duration is None:
                raise ValueError("irregular waves require `duration` at build time")
            data = wv.build_irregular_wave(hd, wave, self.dt, self.duration)
            self.irr = data
            # zero-pad the eta series so the per-step dynamic_slice window
            # stays in bounds for every step (jax clamps out-of-range starts,
            # which would silently misalign the window otherwise)
            M = data.exc_kernel.shape[1]
            n_max = int(np.ceil(self.duration / self.dt)) + 2
            eta = np.asarray(data.eta)
            need = n_max + M
            if eta.shape[-1] < need:
                pad = need - eta.shape[-1]
                eta = np.concatenate([eta, np.zeros(eta.shape[:-1] + (pad,))], axis=-1)
            params["irr_eta"] = jnp.asarray(eta, self.dtype)
            self.irr_kernel = jnp.asarray(data.exc_kernel, self.dtype)
        else:
            raise TypeError(f"unknown wave model {wave!r}")

    def _wave_force(self, params, n):
        """Excitation force [6*Nh] at step n (t = n*dt)."""
        if self.wave_kind == "NoWave":
            return jnp.zeros((self.n_hydro * 6,), self.dtype)
        t = n.astype(self.dtype) * self.dt
        if self.wave_kind == "RegularWave":
            # F_i = mag_i * A * cos(w t + phase_i)   (wave_types.cpp:315-327)
            return params["reg_mag"] * params["reg_amp"] * jnp.cos(
                params["reg_omega"] * t + params["reg_phase"]
            )
        # irregular: windowed dot against the precomputed eta series
        M = self.irr_kernel.shape[1]
        window = jax.lax.dynamic_slice_in_dim(params["irr_eta"], n, M, axis=-1)
        return self.irr_kernel @ window

    # ------------------------------------------------------------------
    def _build_constraints(self):
        """Compile joint residual functions c(pos, quat) -> [m]."""
        spec = self.spec
        residual_fns = []
        self.joint_rows = []  # (kind, nrows) for reporting

        def pose_of(i, pos, quat):
            if i < 0 or spec.bodies[i].fixed:
                p = jnp.asarray(self.fixed_pos.get(i, np.zeros(3)), self.dtype)
                q = jnp.asarray(self.fixed_quat.get(i, np.array([1.0, 0, 0, 0])), self.dtype)
                return p, q
            s = self.slot_of[i]
            return pos[s], quat[s]

        for j in spec.joints:
            b1, b2 = j.body1, j.body2
            loc = np.asarray(j.location, dtype=np.float64)
            axis = np.asarray(j.axis, dtype=np.float64)
            a_hat, n1, n2 = _orthonormal_basis(axis)

            p01, q01 = self._initial_pose(b1)
            p02, q02 = self._initial_pose(b2)
            l1 = jnp.asarray(_rot_np(q01).T @ (loc - p01), self.dtype)
            l2 = jnp.asarray(_rot_np(q02).T @ (loc - p02), self.dtype)
            a2 = jnp.asarray(_rot_np(q02).T @ a_hat, self.dtype)
            n1l = jnp.asarray(_rot_np(q01).T @ n1, self.dtype)
            n2l = jnp.asarray(_rot_np(q01).T @ n2, self.dtype)
            q_rel0 = quat_multiply(
                _quat_conj(jnp.asarray(q01, self.dtype)), jnp.asarray(q02, self.dtype)
            )

            kind = j.kind.lower()
            locked = j.locked

            def make_res(b1=b1, b2=b2, l1=l1, l2=l2, a2=a2,
                         n1l=n1l, n2l=n2l, q_rel0=q_rel0, kind=kind, locked=locked):
                def res(pos, quat):
                    p1, q1 = pose_of(b1, pos, quat)
                    p2, q2 = pose_of(b2, pos, quat)
                    P1 = p1 + quat_rotate(q1, l1)
                    P2 = p2 + quat_rotate(q2, l2)
                    parts = []
                    if kind in ("spherical", "revolute", "fixed"):
                        parts.append(P1 - P2)
                    if kind == "prismatic":
                        d = P2 - P1
                        w1 = quat_rotate(q1, n1l)
                        w2 = quat_rotate(q1, n2l)
                        parts.append(jnp.stack([jnp.dot(d, w1), jnp.dot(d, w2)]))
                    if kind == "revolute" and not locked:
                        aw2 = quat_rotate(q2, a2)
                        w1 = quat_rotate(q1, n1l)
                        w2 = quat_rotate(q1, n2l)
                        parts.append(jnp.stack([jnp.dot(aw2, w1), jnp.dot(aw2, w2)]))
                    if kind in ("prismatic", "fixed") or (kind == "revolute" and locked):
                        # full rotation lock: small-angle rotation vector of the
                        # relative-orientation error
                        q_err = quat_multiply(_quat_conj(quat_multiply(q1, q_rel0)), q2)
                        parts.append(2.0 * jnp.sign(q_err[0]) * q_err[1:4])
                    return jnp.concatenate(parts)

                return res

            residual_fns.append(make_res())
            nrows = {"spherical": 3, "revolute": 5, "prismatic": 5, "fixed": 6}[kind]
            if kind == "revolute" and locked:
                nrows = 6
            self.joint_rows.append((kind, nrows))

        self.n_constraints = sum(r for _, r in self.joint_rows)
        if residual_fns:
            def c_all(pos, quat):
                return jnp.concatenate([f(pos, quat) for f in residual_fns])
            self._c_fn = c_all
        else:
            self._c_fn = None

    def _constraint_jacobian(self, pos, quat):
        """J [m, nv] with v = [u0, w0, u1, w1, ...] (world frame) via jvp."""
        def cdot(v):
            v = v.reshape(self.n_moving, 6)
            u, w = v[:, :3], v[:, 3:]
            wq = jnp.concatenate([jnp.zeros_like(w[:, :1]), w], axis=-1)
            qdot = 0.5 * quat_multiply(wq, quat)
            _, out = jax.jvp(self._c_fn, (pos, quat), (u, qdot))
            return out

        return jax.jacfwd(cdot)(jnp.zeros((self.nv,), self.dtype))

    # ------------------------------------------------------------------
    def _build_force_elements(self, params):
        spec = self.spec
        self._tsda = []
        tsda_k, tsda_c = [], []
        for t in spec.tsdas:
            p1 = np.asarray(t.point1, dtype=np.float64)
            p2 = np.asarray(t.point2, dtype=np.float64)
            L0 = t.free_length
            if L0 is None:
                # ChLinkTSDA computes rest length from the initial distance
                # when not set (demo_sphere_reg_waves.cpp:120-122)
                L0 = float(np.linalg.norm(p2 - p1))
            p01, q01 = self._initial_pose(t.body1)
            p02, q02 = self._initial_pose(t.body2)
            l1 = jnp.asarray(_rot_np(q01).T @ (p1 - p01), self.dtype)
            l2 = jnp.asarray(_rot_np(q02).T @ (p2 - p02), self.dtype)
            self._tsda.append((t, l1, l2, L0))
            tsda_k.append(t.spring_coeff)
            tsda_c.append(t.damping_coeff)
        if self._tsda:
            params["tsda_k"] = jnp.asarray(tsda_k, self.dtype)
            params["tsda_c"] = jnp.asarray(tsda_c, self.dtype)

        self._rsda = []
        rsda_k, rsda_c = [], []
        for r in spec.rsdas:
            a = np.asarray(r.axis, dtype=np.float64)
            a = a / np.linalg.norm(a)
            _, q01 = self._initial_pose(r.body1)
            a1l = jnp.asarray(_rot_np(q01).T @ a, self.dtype)
            self._rsda.append((r, a1l))
            rsda_k.append(r.spring_coeff)
            rsda_c.append(r.damping_coeff)
        if self._rsda:
            params["rsda_k"] = jnp.asarray(rsda_k, self.dtype)
            params["rsda_c"] = jnp.asarray(rsda_c, self.dtype)

    def _initial_pose(self, i):
        if i < 0:
            return np.zeros(3), np.array([1.0, 0, 0, 0])
        b = self.spec.bodies[i]
        return np.asarray(b.pos0, dtype=np.float64), np.asarray(b.quat0, dtype=np.float64)

    def _body_pose(self, i, pos, quat):
        if i < 0 or self.spec.bodies[i].fixed:
            p = jnp.asarray(self.fixed_pos.get(i, np.zeros(3)), self.dtype)
            q = jnp.asarray(self.fixed_quat.get(i, np.array([1.0, 0, 0, 0])), self.dtype)
            return p, q
        s = self.slot_of[i]
        return pos[s], quat[s]

    def _body_vel(self, i, lin_vel, ang_vel):
        if i < 0 or self.spec.bodies[i].fixed:
            z = jnp.zeros((3,), self.dtype)
            return z, z
        s = self.slot_of[i]
        return lin_vel[s], ang_vel[s]

    def _tsda_state(self, idx, pos, quat, lin_vel, ang_vel):
        """Geometry of TSDA `idx`: (P1, P2, L, Ldot, dhat, pb1, pb2)."""
        t, l1, l2, L0 = self._tsda[idx]
        pb1, qb1 = self._body_pose(t.body1, pos, quat)
        pb2, qb2 = self._body_pose(t.body2, pos, quat)
        P1 = pb1 + quat_rotate(qb1, l1)
        P2 = pb2 + quat_rotate(qb2, l2)
        u1, w1 = self._body_vel(t.body1, lin_vel, ang_vel)
        u2, w2 = self._body_vel(t.body2, lin_vel, ang_vel)
        V1 = u1 + jnp.cross(w1, P1 - pb1)
        V2 = u2 + jnp.cross(w2, P2 - pb2)
        d = P2 - P1
        L = jnp.linalg.norm(d)
        dhat = d / jnp.maximum(L, 1e-12)
        Ldot = jnp.dot(V2 - V1, dhat)
        return P1, P2, L, Ldot, dhat, pb1, pb2, L0

    def _element_forces(self, params, pos, quat, lin_vel, ang_vel):
        """TSDA/RSDA generalized forces, accumulated into [nv]."""
        F = jnp.zeros((self.nv,), self.dtype)

        def add_wrench(F, i, force, torque):
            if i < 0 or self.spec.bodies[i].fixed:
                return F
            s = self.slot_of[i]
            F = F.at[s * 6 : s * 6 + 3].add(force)
            F = F.at[s * 6 + 3 : s * 6 + 6].add(torque)
            return F

        for idx, (t, l1, l2, L0) in enumerate(self._tsda):
            P1, P2, L, Ldot, dhat, pb1, pb2, L0 = self._tsda_state(
                idx, pos, quat, lin_vel, ang_vel
            )
            if t.spring_curve is not None:
                xs = jnp.asarray(t.spring_curve[:, 0], self.dtype)
                ys = jnp.asarray(t.spring_curve[:, 1], self.dtype)
                f_spring = -jnp.interp(L - L0, xs, ys)
            else:
                f_spring = -params["tsda_k"][idx] * (L - L0)
            if t.damping_curve is not None:
                xs = jnp.asarray(t.damping_curve[:, 0], self.dtype)
                ys = jnp.asarray(t.damping_curve[:, 1], self.dtype)
                f_damp = -jnp.interp(Ldot, xs, ys)
            else:
                f_damp = -params["tsda_c"][idx] * Ldot
            fmag = f_spring + f_damp  # >0 pushes bodies apart

            fvec2 = fmag * dhat  # force on body2
            F = add_wrench(F, t.body2, fvec2, jnp.cross(P2 - pb2, fvec2))
            F = add_wrench(F, t.body1, -fvec2, jnp.cross(P1 - pb1, -fvec2))

        for idx, (r, a1l) in enumerate(self._rsda):
            _, qb1 = self._body_pose(r.body1, pos, quat)
            ahat = quat_rotate(qb1, a1l)
            _, q1 = self._body_pose(r.body1, pos, quat)
            _, q2 = self._body_pose(r.body2, pos, quat)
            q_rel = quat_multiply(_quat_conj(q1), q2)
            rotvec = 2.0 * jnp.sign(q_rel[0]) * q_rel[1:4]
            theta = jnp.dot(quat_rotate(q1, rotvec), ahat)
            u1, w1 = self._body_vel(r.body1, lin_vel, ang_vel)
            u2, w2 = self._body_vel(r.body2, lin_vel, ang_vel)
            theta_dot = jnp.dot(w2 - w1, ahat)

            tau = (
                -params["rsda_k"][idx] * (theta - r.rest_angle)
                - params["rsda_c"][idx] * theta_dot
            )
            tvec = tau * ahat
            F = add_wrench(F, r.body2, jnp.zeros(3, self.dtype), tvec)
            F = add_wrench(F, r.body1, jnp.zeros(3, self.dtype), -tvec)

        return F

    # ------------------------------------------------------------------
    def init_state(self) -> State:
        bodies = self.spec.bodies
        pos = jnp.asarray(np.stack([bodies[i].pos0 for i in self.moving]), self.dtype)
        quat = jnp.asarray(np.stack([bodies[i].quat0 for i in self.moving]), self.dtype)
        zeros3 = jnp.zeros((self.n_moving, 3), self.dtype)
        vhist = jnp.zeros((self.hist_len, 6 * max(self.n_hydro, 1)), self.dtype)
        return State(pos=pos, quat=quat, lin_vel=zeros3, ang_vel=zeros3, vhist=vhist)

    def _forces(self, params, state: State, n):
        """Total generalized force [nv] at the current state/time."""
        pos, quat = state.pos, state.quat
        lv, av = state.lin_vel, state.ang_vel
        F = jnp.zeros((self.n_moving, 6), self.dtype)

        # gravity
        F = F.at[:, :3].add(params["mass"][:, None] * self.gravity[None, :])

        # gyroscopic torque: -w x (I_w w)
        R = quat_to_matrix(quat)
        I_w = R @ self.inertia_body @ jnp.swapaxes(R, -1, -2)
        F = F.at[:, 3:].add(-jnp.cross(av, jnp.einsum("nij,nj->ni", I_w, av)))
        F = F.reshape(self.nv)

        # hydro forces
        if self.hydro is not None:
            hs = self.hydro_slots
            f_hs = hydrostatic_force(
                pos[hs], quat[hs], self.k_lin, self.cg_eq, self.cb_minus_cg,
                self.disp_vol, self.rho, self.gravity,
            ).reshape(-1)
            f_rad = rad.radiation_force(self.W_rev, state.vhist, n)
            f_wave = self._wave_force(params, n)
            f_hydro = (f_hs - f_rad + f_wave).reshape(self.n_hydro, 6)
            for hb in range(self.n_hydro):
                slot = self.slot_of[int(self.hydro.body_indices[hb])]
                F = F.at[slot * 6 : slot * 6 + 6].add(f_hydro[hb])

        # spring-dampers
        if self._tsda or self._rsda:
            F = F + self._element_forces(params, pos, quat, lv, av)

        return F, I_w

    def _step(self, params, state: State, n):
        """One integration step. `n` is the *unbatched* step counter — keeping
        it out of the (vmapped) State means the kernel roll and ring-buffer
        update stay uniform across the batch; a per-instance traced index
        would turn them into per-instance gathers/scatters (measured 20x
        slower on TPU)."""
        h = self.dt
        nm = self.n_moving

        # 1) record current velocity in the ring buffer
        if self.hydro is not None:
            hs = self.hydro_slots
            v6 = jnp.concatenate([state.lin_vel[hs], state.ang_vel[hs]], axis=-1).reshape(-1)
            slot = jnp.mod(n, self.hist_len)
            vhist = jax.lax.dynamic_update_slice_in_dim(
                state.vhist, v6[None, :], slot, axis=0
            )
            state = dataclasses.replace(state, vhist=vhist)

        # 2) forces
        F, I_w = self._forces(params, state, n)

        # 3) mass matrix + KKT solve
        Mhat = jnp.zeros((self.nv, self.nv), self.dtype)
        for s in range(nm):
            Mhat = Mhat.at[s * 6 : s * 6 + 3, s * 6 : s * 6 + 3].add(
                params["mass"][s] * jnp.eye(3, dtype=self.dtype)
            )
            Mhat = Mhat.at[s * 6 + 3 : s * 6 + 6, s * 6 + 3 : s * 6 + 6].add(I_w[s])
        Mhat = Mhat + self.ainf

        v = jnp.concatenate([state.lin_vel, state.ang_vel], axis=-1).reshape(self.nv)
        rhs = Mhat @ v + h * F

        if self._c_fn is not None:
            c = self._c_fn(state.pos, state.quat)
            J = self._constraint_jacobian(state.pos, state.quat)
            # unrolled Cholesky + Schur solve: ~60x faster per scan step on
            # TPU than the batched LU custom call (see ops/linalg.py)
            v_new, lam = solve_kkt(Mhat, J, rhs, -c / h)
        else:
            v_new = solve_spd(Mhat, rhs)
            lam = jnp.zeros((0,), self.dtype)

        vr = v_new.reshape(nm, 6)
        lin_new, ang_new = vr[:, :3], vr[:, 3:]

        # 4) semi-implicit position update
        pos_new = state.pos + h * lin_new
        quat_new = quat_integrate(state.quat, ang_new, h)

        new_state = dataclasses.replace(
            state, pos=pos_new, quat=quat_new, lin_vel=lin_new, ang_vel=ang_new,
        )
        full_out = {
            "pos": pos_new,
            "quat": quat_new,
            "lin_vel": lin_new,
            "ang_vel": ang_new,
            "acc": ((v_new - v) / h).reshape(nm, 6),
            "lambda": lam,
        }
        if "tsda" in self.outputs and self._tsda:
            # per-TSDA scalars for the exporter (simulation_exporter.cpp:763-807)
            rows = []
            for idx, (t, l1, l2, L0) in enumerate(self._tsda):
                P1, P2, L, Ldot, dhat, pb1, pb2, L0 = self._tsda_state(
                    idx, pos_new, quat_new, lin_new, ang_new
                )
                if t.spring_curve is not None:
                    xs = jnp.asarray(t.spring_curve[:, 0], self.dtype)
                    ys = jnp.asarray(t.spring_curve[:, 1], self.dtype)
                    f_spring = -jnp.interp(L - L0, xs, ys)
                else:
                    f_spring = -params["tsda_k"][idx] * (L - L0)
                if t.damping_curve is not None:
                    xs = jnp.asarray(t.damping_curve[:, 0], self.dtype)
                    ys = jnp.asarray(t.damping_curve[:, 1], self.dtype)
                    f_damp = -jnp.interp(Ldot, xs, ys)
                else:
                    f_damp = -params["tsda_c"][idx] * Ldot
                rows.append(jnp.stack([L, Ldot, f_spring, f_damp]))
            full_out["tsda"] = jnp.stack(rows)  # [n_tsda, 4] = (len, speed, fs, fd)

        out = {k: v for k, v in full_out.items()
               if k in self.outputs or k in ("pos",)}
        return new_state, out

    def step_fn(self, state: State, n=0):
        return self._step(self.params, state, jnp.asarray(n, jnp.int32))

    def run(self, num_steps: int, state: Optional[State] = None, params=None,
            start_step: int = 0):
        """Run `num_steps` steps; returns (final_state, trajectory pytree).

        Trajectory arrays have leading dim num_steps and hold post-step values
        at times (n+1)*dt, matching the reference output convention
        (demo_sphere_decay.cpp:110-120 records after DoStepDynamics).
        """
        if params is None:
            params = self.params
        if state is None:
            state = self.init_state()

        def step(s, n):
            return self._step(params, s, n)

        steps = start_step + jnp.arange(num_steps, dtype=jnp.int32)
        final, traj = jax.lax.scan(step, state, steps)
        return final, traj

    def run_batch(self, num_steps: int, batched: dict, state: Optional[State] = None):
        """vmap `run` over the leaves named in `batched` (leading batch dim).

        Example: sweep 10 regular-wave cases in one device program:
            sim.run_batch(n, {"reg_amp": amps, "reg_omega": omegas,
                              "reg_mag": mags, "reg_phase": phases})
        """
        params = dict(self.params)
        axes = {k: None for k in params}
        for k, v in batched.items():
            params[k] = v
            axes[k] = 0

        def f(p):
            return self.run(num_steps, state=state, params=p)

        return jax.vmap(f, in_axes=(axes,))(params)

    def times(self, num_steps: int) -> np.ndarray:
        return (np.arange(1, num_steps + 1)) * self.dt
