"""Results HDF5 exporter — schema v0.3, matching the reference's
SimulationExporter (reference: src/simulation_exporter.cpp, esp. the group
layout at :177-199, per-step channels :723-858, finalize :860-973).

Layout:
  /inputs/model/{bodies,joints,tsdas,rsdas}   static model description
  /inputs/simulation/{time,environment,waves} run configuration
  /results/model/bodies/<name>/{position,velocity,acceleration,
      orientation (wxyz), orientation_xyz (Cardan), angular_velocity}
  /results/model/tsdas/<name>/{extension,speed,spring_force,damping_force,
      force_mag,force_vec,reaction_force_body1,reaction_force_body2}
  /results/model/joints/<name>/{reaction1_force,reaction1_torque,
      reaction2_force,reaction2_torque}
  /results/time/time
  /meta{,/system,/config,/run}   provenance: file paths, YAML texts + sha256,
      run statistics

The output file is named results.<wave_type>.h5
(run_hydrochrono_from_yaml.cpp:647-649).
"""

from __future__ import annotations

import hashlib
import os
import socket
import time
from typing import Optional

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

from hydrochrono_tpu import __version__
from hydrochrono_tpu.physics.rotations import cardan_xyz_from_quat

SCHEMA_VERSION = "0.3"


def _sha256(text: str) -> str:
    return hashlib.sha256(text.encode()).hexdigest()


def _str_attr(obj, key, val):
    obj.attrs[key] = val


def wave_type_name(case) -> str:
    if case.hydro_spec is None:
        return "still"
    return {"still": "still", "regular": "regular", "irregular": "irregular"}.get(
        case.hydro_spec.waves.kind, "still"
    )


def _tsda_direction(case, k, pos, quat, slot_of, nsteps):
    """Unit vector point1 -> point2 of TSDA k along the trajectory."""
    import jax.numpy as jnp

    from hydrochrono_tpu.physics.rotations import quat_rotate

    sim = getattr(case, "_sim", None)
    spec_t = case.system.tsdas[k]

    def point(body_idx, local):
        if body_idx < 0:
            return np.broadcast_to(np.asarray(local, dtype=np.float64), (nsteps, 3))
        if case.system.bodies[body_idx].fixed:
            base = np.asarray(case.system.bodies[body_idx].pos0) + np.asarray(local)
            return np.broadcast_to(base, (nsteps, 3))
        s = slot_of[body_idx]
        return pos[:, s] + np.asarray(
            quat_rotate(jnp.asarray(quat[:, s]), jnp.asarray(local))
        )

    if sim is not None and sim.spec.tsdas:
        tc = sim.params["_const"]["tsda"][k]
        l1 = np.asarray(tc["l1"], dtype=np.float64)
        l2 = np.asarray(tc["l2"], dtype=np.float64)
    else:
        l1 = np.asarray(spec_t.point1) - np.asarray(
            case.system.bodies[spec_t.body1].pos0 if spec_t.body1 >= 0 else 0.0
        )
        l2 = np.asarray(spec_t.point2) - np.asarray(
            case.system.bodies[spec_t.body2].pos0 if spec_t.body2 >= 0 else 0.0
        )
    p1 = point(spec_t.body1, l1)
    p2 = point(spec_t.body2, l2)
    d = p2 - p1
    norm = np.linalg.norm(d, axis=-1, keepdims=True)
    return d / np.maximum(norm, 1e-12)


def _joint_reaction_wrenches(sim, pos, quat, lam_force):
    """World-frame reaction wrenches per joint along a trajectory.

    Constraint forces on the generalized coordinates are -J^T lambda (the KKT
    convention of ops/linalg.solve_kkt); restricted to one joint's rows and
    one body's 6-dof block this gives the world force on that body and the
    torque about its origin, which is shifted to the joint anchor point.
    Mirrors the reference's world-frame transform of Chrono link reactions
    (simulation_exporter.cpp:816-840). Returns list of (F1, T1, F2, T2),
    each [T, 3]; wrench 2 = -wrench 1 (ideal constraints).

    lam_force: [T, m] multipliers already in force units (impulse / dt).
    """
    import jax.numpy as jnp

    from hydrochrono_tpu.ops.pallas_step import (
        FusedStepBuilder, _quat_rotate as _qrot_l,
    )

    b = FusedStepBuilder(sim, for_kernel=False)
    cvec = b.cvec(sim.params)
    spec = sim.spec
    nm, nv = sim.n_moving, sim.nv
    T = pos.shape[0]

    def C(i):
        return cvec[i]

    posl = [[jnp.asarray(pos[:, s, k]) for k in range(3)] for s in range(nm)]
    quatl = [[jnp.asarray(quat[:, s, k]) for k in range(4)] for s in range(nm)]

    def pose_of(i):
        if i < 0:
            return [0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]
        if spec.bodies[i].fixed:
            o = b._off
            return ([C(o[f"fix{i}_pos"] + k) for k in range(3)],
                    [C(o[f"fix{i}_quat"] + k) for k in range(4)])
        s = sim.slot_of[i]
        return posl[s], quatl[s]

    def slot(i):
        if i < 0 or spec.bodies[i].fixed:
            return None
        return sim.slot_of[i]

    _, Jrows = b._constraints(C, pose_of, slot)
    Jnp = [[None if e is None else np.broadcast_to(np.asarray(e, np.float64), (T,))
            for e in row] for row in Jrows]

    out = []
    row0 = 0
    for jidx, (kind, _locked, nrows, b1, b2) in enumerate(sim.joint_rows):
        lamj = lam_force[:, row0:row0 + nrows]  # [T, nrows]
        s1, s2 = slot(b1), slot(b2)

        # joint anchor point in world along the trajectory
        p1, q1 = pose_of(b1)
        l1 = [C(b._off[f"j{jidx}_l1"] + k) for k in range(3)]
        P = _qrot_l(q1, l1)
        Pw = np.stack([np.broadcast_to(np.asarray(p1[k] + P[k], np.float64), (T,))
                       for k in range(3)], axis=-1)

        def side_wrench(s):
            if s is None:
                return None
            F = np.zeros((T, 3))
            Tq = np.zeros((T, 3))
            for a in range(nrows):
                for k in range(3):
                    e = Jnp[row0 + a][s * 6 + k]
                    if e is not None:
                        F[:, k] -= lamj[:, a] * e
                    e = Jnp[row0 + a][s * 6 + 3 + k]
                    if e is not None:
                        Tq[:, k] -= lamj[:, a] * e
            return F, Tq

        w1 = side_wrench(s1)
        w2 = side_wrench(s2)
        if w1 is not None:
            F1, T1cg = w1
            r1 = Pw - pos[:, s1].astype(np.float64)
            T1 = T1cg - np.cross(r1, F1)
        if w2 is not None:
            F2, T2cg = w2
            r2 = Pw - pos[:, s2].astype(np.float64)
            T2 = T2cg - np.cross(r2, F2)
        if w1 is None and w2 is None:
            F1 = T1 = F2 = T2 = np.zeros((T, 3))
        elif w1 is None:
            F1, T1 = -F2, -T2
        elif w2 is None:
            F2, T2 = -F1, -T1
        out.append((F1, T1, F2, T2))
        row0 += nrows
    return out


def _rsda_channels(case, sim, k, pos, quat, ang_vel, slot_of, nsteps):
    """Per-RSDA result channels from the exported trajectory (channel set
    per reference simulation_exporter.cpp:785-807)."""
    import jax.numpy as jnp

    from hydrochrono_tpu.physics.rotations import quat_rotate

    zeros1 = np.zeros(nsteps)
    zeros3 = np.zeros((nsteps, 3))
    empty = {
        "angle": zeros1, "ang_speed": zeros1, "spring_torque": zeros1,
        "damping_torque": zeros1, "torque_mag": zeros1, "torque_vec": zeros3,
        "reaction_torque_body1": zeros3, "reaction_torque_body2": zeros3,
    }
    if sim is None or k >= len(sim.spec.rsdas):
        return empty
    r = sim.spec.rsdas[k]
    a1l = np.asarray(sim.params["_const"]["rsda"][k]["a1l"], np.float64)
    kk = float(np.asarray(sim.params["rsda_k"][k]))
    cc = float(np.asarray(sim.params["rsda_c"][k]))

    def body_qw(i):
        if i < 0:
            return (np.broadcast_to(np.array([1.0, 0, 0, 0]), (nsteps, 4)),
                    np.zeros((nsteps, 3)))
        if case.system.bodies[i].fixed:
            q0 = np.asarray(case.system.bodies[i].quat0, np.float64)
            return np.broadcast_to(q0, (nsteps, 4)), np.zeros((nsteps, 3))
        s = slot_of[i]
        return quat[:, s].astype(np.float64), ang_vel[:, s].astype(np.float64)

    q1, w1 = body_qw(r.body1)
    q2, w2 = body_qw(r.body2)
    ahat = np.asarray(quat_rotate(jnp.asarray(q1), jnp.asarray(a1l)))
    q1c = np.concatenate([q1[:, :1], -q1[:, 1:]], axis=-1)

    def qmul(a, bq):
        aw, ax, ay, az = a[:, 0], a[:, 1], a[:, 2], a[:, 3]
        bw, bx, by, bz = bq[:, 0], bq[:, 1], bq[:, 2], bq[:, 3]
        return np.stack([
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ], axis=-1)

    q_rel = qmul(q1c, q2)
    rotvec = 2.0 * np.sign(q_rel[:, :1]) * q_rel[:, 1:]
    theta = np.einsum(
        "tk,tk->t", np.asarray(quat_rotate(jnp.asarray(q1), jnp.asarray(rotvec))),
        ahat,
    )
    rel_angle = theta - r.rest_angle
    ang_speed = np.einsum("tk,tk->t", w2 - w1, ahat)
    spring_torque = kk * rel_angle
    damping_torque = cc * ang_speed
    tmag = spring_torque + damping_torque
    tvec = ahat * tmag[:, None]
    return {
        "angle": rel_angle, "ang_speed": ang_speed,
        "spring_torque": spring_torque, "damping_torque": damping_torque,
        "torque_mag": tmag, "torque_vec": tvec,
        "reaction_torque_body1": tvec, "reaction_torque_body2": -tvec,
    }


def export_results(case, traj: dict, times: np.ndarray, out_dir: str,
                   wall_time_s: float = 0.0, run_metadata: Optional[dict] = None,
                   verbose_log=None, eta_index: Optional[int] = None,
                   sweep_index: Optional[int] = None) -> str:
    """Write one case's trajectory to results.<wave>.h5; returns the path.

    traj: trajectory pytree from Simulation.run with outputs including at
    least pos/quat/lin_vel/ang_vel (acc/lambda/tsda optional).
    verbose_log: optional logger; when given, each discovered element and
    written channel family is logged (reference --h5-verbose behavior,
    simulation_exporter.cpp H5Verbosity::Verbose discovery messages).
    """
    _v = (verbose_log.info if verbose_log is not None else (lambda *_: None))
    os.makedirs(out_dir, exist_ok=True)
    fname = os.path.join(out_dir, f"results.{wave_type_name(case)}.h5")

    # channel reconstruction (Cardan angles, joint reaction wrenches, RSDA
    # channels) is hundreds of tiny jnp ops over host arrays — pin them to
    # the host CPU backend: on remote-TPU stacks each device dispatch costs
    # ~ms round trips, which made export dominate small-case wall time
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        return _export_results_impl(case, traj, times, fname, wall_time_s,
                                    run_metadata, _v, eta_index, sweep_index)


def _export_results_impl(case, traj, times, fname, wall_time_s,
                         run_metadata, _v, eta_index=None,
                         sweep_index=None) -> str:

    model = case.model
    moving = [i for i, b in enumerate(case.system.bodies) if not b.fixed]
    slot_of = {i: s for s, i in enumerate(moving)}
    nsteps = times.shape[0]

    pos = np.asarray(traj["pos"])
    quat = np.asarray(traj["quat"])
    lin_vel = np.asarray(traj["lin_vel"])
    ang_vel = np.asarray(traj["ang_vel"])
    acc = np.asarray(traj["acc"]) if "acc" in traj else None
    lam = np.asarray(traj["lambda"]) if "lambda" in traj else None
    tsda = np.asarray(traj["tsda"]) if "tsda" in traj else None

    import jax.numpy as jnp

    cardan = np.asarray(cardan_xyz_from_quat(jnp.asarray(quat)))

    with h5py.File(fname, "w") as f:
        # ---------------- inputs/model ----------------
        gb = f.require_group("inputs/model/bodies")
        for mb in model.bodies:
            g = gb.require_group(mb.name)
            g.create_dataset("location", data=np.asarray(mb.location, dtype=np.float64))
            g.create_dataset("orientation_xyz_initial",
                             data=np.asarray(mb.orientation, dtype=np.float64))
            g.create_dataset("inertia_moments",
                             data=np.asarray(mb.inertia_moments, dtype=np.float64))
            g.create_dataset("inertia_products",
                             data=np.asarray(mb.inertia_products, dtype=np.float64))
            g.create_dataset("com_location",
                             data=np.asarray(mb.com_location, dtype=np.float64))
            g.create_dataset("com_orientation",
                             data=np.asarray(mb.com_orientation, dtype=np.float64))
            g.create_dataset("visualization_file",
                             data=(mb.visualization_file or ""))
            g.attrs["mass"] = float(mb.mass)
            g.attrs["fixed"] = 1.0 if mb.fixed else 0.0
            g.attrs["orientation_xyz_initial_convention"] = "TaitBryan_extrinsic_XYZ"
            g.attrs["orientation_xyz_initial_units"] = "rad"

        gj = f.require_group("inputs/model/joints")
        gj.create_dataset("names", data=np.array([j.name for j in model.joints], dtype=object),
                          dtype=h5py.string_dtype())
        for j in model.joints:
            g = gj.require_group(j.name)
            g.create_dataset("location", data=np.asarray(j.location, dtype=np.float64))
            g.create_dataset("axis", data=np.asarray(j.axis, dtype=np.float64))
            g.attrs["type"] = j.kind.upper()
            g.attrs["body1"] = j.body1
            g.attrs["body2"] = j.body2
            g.attrs["frame"] = "world"

        _v(f"H5: writing {len(model.bodies)} bodies, {len(model.joints)} joints, "
           f"{len(model.tsdas)} TSDAs, {len(model.rsdas)} RSDAs")
        gt = f.require_group("inputs/model/tsdas")
        gt.create_dataset("names", data=np.array([t.name for t in model.tsdas], dtype=object),
                          dtype=h5py.string_dtype())
        for t in model.tsdas:
            g = gt.require_group(t.name)
            g.create_dataset("point1", data=np.asarray(t.point1, dtype=np.float64))
            g.create_dataset("point2", data=np.asarray(t.point2, dtype=np.float64))
            g.attrs["type"] = "TSDA"
            g.attrs["body1"] = t.body1
            g.attrs["body2"] = t.body2
            g.attrs["spring_coefficient"] = float(t.spring_coefficient)
            g.attrs["damping_coefficient"] = float(t.damping_coefficient)
            g.attrs["free_length"] = float(t.free_length or 0.0)
            g.attrs["frame"] = "world"

        gr = f.require_group("inputs/model/rsdas")
        gr.create_dataset("names", data=np.array([r.name for r in model.rsdas], dtype=object),
                          dtype=h5py.string_dtype())
        for r in model.rsdas:
            g = gr.require_group(r.name)
            g.create_dataset("location", data=np.asarray(r.location, dtype=np.float64))
            g.create_dataset("axis", data=np.asarray(r.axis, dtype=np.float64))
            g.attrs["type"] = "RSDA"
            g.attrs["body1"] = r.body1
            g.attrs["body2"] = r.body2
            g.attrs["spring_coefficient"] = float(r.spring_coefficient)
            g.attrs["damping_coefficient"] = float(r.damping_coefficient)

        # ---------------- inputs/simulation ----------------
        gs = f.require_group("inputs/simulation/time")
        gs.attrs["dt"] = float(case.dt)
        gs.attrs["duration"] = float(case.end_time)
        ge = f.require_group("inputs/simulation/environment")
        ge.create_dataset("gravity", data=np.asarray(case.system.gravity, dtype=np.float64))
        ge.attrs["frame"] = "world"
        ge.attrs["units"] = "m/s^2"
        gw = f.require_group("inputs/simulation/waves")
        gw.attrs["type"] = wave_type_name(case)
        sim = getattr(case, "_sim", None)
        _depth = (float(sim.hydro.hydro.water_depth)
                  if sim is not None and sim.hydro is not None else np.inf)
        _dirn = np.asarray(getattr(case.hydro_spec.waves, "direction", 0.0)
                           if case.hydro_spec is not None else 0.0,
                           dtype=np.float64)  # scalar, or [B] heading sweep
        if case.hydro_spec is not None and case.hydro_spec.waves.kind == "irregular":
            # spectrum + free-surface inputs (simulation_exporter.cpp:365-393)
            irr = getattr(sim, "irr", None) if sim is not None else None
            if irr is not None:
                gi = gw.require_group("irregular")
                gi.create_dataset("frequencies_hz", data=np.asarray(irr.freqs_hz))
                gi.create_dataset("spectral_densities",
                                  data=np.asarray(irr.spectral_densities))
                gi.create_dataset("free_surface_time", data=np.asarray(irr.eta_time))
                eta = np.asarray(irr.eta)
                phases = np.asarray(irr.phases)
                spread = irr.directions is not None
                if eta.ndim > (2 if spread else 1):
                    # batched seed realizations: each per-seed file carries
                    # ITS OWN series (shape parity with single-seed runs)
                    eta = eta[eta_index if eta_index is not None else 0]
                    phases = phases[eta_index if eta_index is not None else 0]
                if spread:
                    # directional seas: full [D, Neta] per-heading series
                    # (the physical elevation at the origin is the sum)
                    gi.create_dataset("directions_deg",
                                      data=np.asarray(irr.directions))
                    gi.create_dataset("direction_weights",
                                      data=np.asarray(irr.dir_weights))
                gi.create_dataset("free_surface_eta", data=eta)
                # full field reconstruction inputs (beyond-reference): lets
                # tools/animate.py / physics/wavefield.py rebuild the
                # spatial wave field (elevation + particle kinematics) from
                # the results file alone
                gi.create_dataset("spectral_widths",
                                  data=np.asarray(irr.spectral_widths))
                gi.create_dataset("phases", data=phases)
                gi.create_dataset("wavenumbers", data=np.asarray(irr.wavenumbers))
                gi.create_dataset("water_depth", data=_depth)
                gi.create_dataset("direction_deg", data=_dirn)
                # Wheeler stretching is part of the field definition —
                # without it WaveField.from_results_h5 rebuilds surface
                # kinematics unstretched (review finding)
                gi.create_dataset(
                    "wave_stretching",
                    data=bool(getattr(sim.wave, "wave_stretching", False)))
        elif (case.hydro_spec is not None
              and case.hydro_spec.waves.kind == "regular"
              and sim is not None and sim.hydro is not None):
            from hydrochrono_tpu.physics.waves import compute_wavenumber

            wv_spec = case.wave
            om = np.atleast_1d(np.asarray(wv_spec.omega, dtype=np.float64))
            amp = np.atleast_1d(np.asarray(wv_spec.amplitude, np.float64))
            if sweep_index is not None:
                # per-case file of a batched sweep: write THIS case's
                # scalar, not the whole sweep axis (readers like
                # WaveField.from_results_h5 take element [0])
                om = om[sweep_index:sweep_index + 1] if om.size > 1 else om
                amp = (amp[sweep_index:sweep_index + 1]
                       if amp.size > 1 else amp)
                if _dirn.ndim > 0 and _dirn.size > 1:
                    _dirn = _dirn.reshape(-1)[sweep_index]
            gr = gw.require_group("regular")
            gr.create_dataset("omega", data=om)
            gr.create_dataset("amplitude", data=amp)
            gr.create_dataset("phase", data=float(wv_spec.phase))
            gr.create_dataset(
                "wavenumber",
                data=compute_wavenumber(om, _depth, sim.hydro.hydro.g))
            gr.create_dataset("water_depth", data=_depth)
            gr.create_dataset("direction_deg", data=_dirn)

        # ---------------- results ----------------
        # groups created up front regardless of content, matching the
        # reference's layout (simulation_exporter.cpp:177-199)
        for grp in ("results/model/bodies", "results/model/tsdas",
                    "results/model/rsdas", "results/model/joints"):
            f.require_group(grp)
        f.require_group("results/time").create_dataset("time", data=np.asarray(times))
        f["results/time"].attrs["units"] = "s"

        body_attrs = {
            "position_frame": "world", "position_units": "m",
            "velocity_frame": "world", "velocity_units": "m/s",
            "acceleration_frame": "world", "acceleration_units": "m/s^2",
            "angular_velocity_frame": "world", "angular_velocity_units": "rad/s",
            "orientation_order": "wxyz",
            "orientation_xyz_convention": "TaitBryan_extrinsic_XYZ",
            "orientation_xyz_units": "rad",
        }
        for i, mb in enumerate(model.bodies):
            g = f.require_group(f"results/model/bodies/{mb.name}")
            for k, v in body_attrs.items():
                g.attrs[k] = v
            if i in slot_of:
                s = slot_of[i]
                g.create_dataset("position", data=pos[:, s])
                g.create_dataset("velocity", data=lin_vel[:, s])
                g.create_dataset("orientation", data=quat[:, s])
                g.create_dataset("orientation_xyz", data=cardan[:, s])
                g.create_dataset("angular_velocity", data=ang_vel[:, s])
                if acc is not None:
                    g.create_dataset("acceleration", data=acc[:, s, :3])
                else:
                    g.create_dataset("acceleration", data=np.zeros((nsteps, 3)))
            else:
                # fixed bodies: constant pose, zero rates
                b = case.system.bodies[i]
                g.create_dataset("position",
                                 data=np.tile(np.asarray(b.pos0), (nsteps, 1)))
                g.create_dataset("velocity", data=np.zeros((nsteps, 3)))
                g.create_dataset("acceleration", data=np.zeros((nsteps, 3)))
                g.create_dataset("orientation",
                                 data=np.tile(np.asarray(b.quat0), (nsteps, 1)))
                g.create_dataset("orientation_xyz", data=np.zeros((nsteps, 3)))
                g.create_dataset("angular_velocity", data=np.zeros((nsteps, 3)))

        # TSDA results
        for k, t in enumerate(model.tsdas):
            _v(f"TSDA discovered: {t.name}")
            g = f.require_group(f"results/model/tsdas/{t.name}")
            g.attrs.update({"frame": "world", "time_ref": "/results/time/time",
                            "type": "TSDA", "units_extension": "m",
                            "units_force": "N", "units_speed": "m/s"})
            if tsda is not None:
                L, Ldot, fs, fd = (tsda[:, k, 0], tsda[:, k, 1], tsda[:, k, 2],
                                   tsda[:, k, 3])
                L0 = t.free_length if t.free_length is not None else float(
                    np.linalg.norm(np.asarray(t.point2) - np.asarray(t.point1))
                )
                g.create_dataset("extension", data=L - L0)
                g.create_dataset("speed", data=Ldot)
                g.create_dataset("spring_force", data=fs)
                g.create_dataset("damping_force", data=fd)
                g.create_dataset("force_mag", data=np.abs(fs + fd))
                # instantaneous PTO power (absorbed > 0); beyond-reference
                # channel for WEC energy-capture studies
                power = -(fs + fd) * Ldot
                g.create_dataset("power", data=power)
                g.attrs["mean_power_w"] = float(np.mean(power))
                # force vector on body2 along the current element axis,
                # reconstructed from the exported body poses
                dhat = _tsda_direction(case, k, pos, quat, slot_of, nsteps)
                fvec = (fs + fd)[:, None] * dhat
                g.create_dataset("force_vec", data=fvec)
                g.create_dataset("reaction_force_body1", data=-fvec)
                g.create_dataset("reaction_force_body2", data=fvec)
            else:
                for name in ("extension", "speed", "spring_force", "damping_force",
                             "force_mag"):
                    g.create_dataset(name, data=np.zeros(nsteps))
                for name in ("force_vec", "reaction_force_body1", "reaction_force_body2"):
                    g.create_dataset(name, data=np.zeros((nsteps, 3)))

        # joint reaction wrenches: world-frame, reconstructed from the KKT
        # multipliers and the constraint-row geometry along the trajectory
        # (reference transforms per-joint reactions to world the same way,
        # simulation_exporter.cpp:816-840). reaction1 = wrench exerted by the
        # joint ON body1, force in world axes, torque about the (moving)
        # joint anchor point.
        sim = getattr(case, "_sim", None)
        joint_rows = getattr(sim, "joint_rows", []) if sim is not None else []
        reactions = None
        if lam is not None and sim is not None and joint_rows:
            reactions = _joint_reaction_wrenches(sim, pos, quat, lam / case.dt)
        for jidx, (j, (kind, _locked, nrows, _b1, _b2)) in enumerate(
            zip(model.joints, joint_rows)
        ):
            _v(f"joint discovered: {j.name} ({j.kind})")
            g = f.require_group(f"results/model/joints/{j.name}")
            g.attrs.update({"type": j.kind.upper(), "frame1": "world",
                            "frame2": "world", "time_ref": "/results/time/time",
                            "units_force": "N", "units_torque": "N*m",
                            "torque_about": "joint_anchor_point"})
            if reactions is not None:
                F1, T1, F2, T2 = reactions[jidx]
                g.create_dataset("reaction1_force", data=F1)
                g.create_dataset("reaction1_torque", data=T1)
                g.create_dataset("reaction2_force", data=F2)
                g.create_dataset("reaction2_torque", data=T2)
            else:
                for name in ("reaction1_force", "reaction1_torque",
                             "reaction2_force", "reaction2_torque"):
                    g.create_dataset(name, data=np.zeros((nsteps, 3)))

        # RSDA results (reference channels: simulation_exporter.cpp:785-807
        # per-step, finalize writes torque_vec/torque_mag/angle/ang_speed/
        # spring_torque/damping_torque/reaction_torque_body{1,2}). Computed
        # from the exported trajectory with the stepper's own kinematics.
        # NOTE the reference hardcodes the RSDA axis to (1,0,0) when the link
        # frame is unavailable (:533-537); we use the actual element axis.
        for k, r in enumerate(model.rsdas):
            _v(f"RSDA discovered: {r.name}")
            g = f.require_group(f"results/model/rsdas/{r.name}")
            g.attrs.update({"time_ref": "/results/time/time", "type": "RSDA",
                            "units_torque": "N*m", "units_angle": "rad",
                            "frame": "world"})
            ch = _rsda_channels(case, sim, k, pos, quat, ang_vel, slot_of, nsteps)
            for name, data in ch.items():
                g.create_dataset(name, data=data)

        # mooring line channels (beyond-reference: the reference declares a
        # moordyn block but implements nothing). Quasi-static tensions are
        # reconstructed from the body poses (physics/mooring.py).
        moorings = getattr(case.system, "moorings", None)
        if moorings is not None and sim is not None:
            import jax
            import jax.numpy as jnp_

            from hydrochrono_tpu.physics import mooring as moor_
            from hydrochrono_tpu.physics.rotations import quat_rotate

            mc = sim.params["_const"]["moor"]
            dyn_ten = (np.asarray(traj["moor_tension"])
                       if getattr(sim, "moor_dynamic", False)
                       and "moor_tension" in traj else None)
            for i, ml in enumerate(moorings.lines):
                _v(f"mooring line discovered: line{i + 1}")
                g = f.require_group(f"results/model/moorings/line{i + 1}")
                g.attrs.update({
                    "time_ref": "/results/time/time",
                    "type": ("lumped-mass-dynamic" if dyn_ten is not None
                             else "quasi-static"),
                    "units_force": "N", "frame": "world",
                    "unstretched_length_m": float(ml.length),
                    "weight_per_m_N": float(ml.weight_per_m),
                    "ea_N": float(ml.ea),
                })
                if dyn_ten is not None:
                    # dynamic lines: the in-step fairlead tension channel
                    # (physics/mooring_dynamic.line_tensions) — the
                    # quasi-static pose reconstruction below would be the
                    # wrong physics for snap loads / line inertia
                    g.create_dataset("tension_mag", data=dyn_ten[:, i])
                    continue
                s = sim.moor_slots[i]
                pq = jnp_.asarray(pos[:, s]), jnp_.asarray(quat[:, s])
                pf = pq[0] + quat_rotate(pq[1], mc["local"][i][None, :])
                fvec, (Hc, Vc) = jax.vmap(
                    lambda p: moor_.fairlead_force(
                        mc["anchor"][i], p, mc["L0"][i], mc["w"][i],
                        mc["ea"][i], mc["seabed"][i])
                )(pf)
                g.create_dataset("fairlead_force", data=np.asarray(fvec))
                g.create_dataset("tension_h", data=np.asarray(Hc))
                g.create_dataset("tension_v", data=np.asarray(Vc))
                g.create_dataset(
                    "tension_mag",
                    data=np.sqrt(np.asarray(Hc) ** 2 + np.asarray(Vc) ** 2))

        # ---------------- meta ----------------
        meta = f.require_group("meta")
        meta.attrs["schema_version"] = SCHEMA_VERSION
        meta.attrs["build_version"] = __version__
        if case.setup is not None:
            meta.attrs["files_model"] = case.setup.model_file or ""
            meta.attrs["files_simulation"] = case.setup.simulation_file or ""
            meta.attrs["files_hydro"] = case.setup.hydro_file or ""
            meta.attrs["files_output"] = fname

        cfg = f.require_group("meta/config")
        for label, text, path in (
            ("model_yaml", model.raw_text,
             case.setup.model_file if case.setup else ""),
            ("simulation_yaml", case.simulation.raw_text,
             case.setup.simulation_file if case.setup else ""),
        ):
            cfg.create_dataset(label, data=text)
            cfg.attrs[f"{label}.bytes"] = float(len(text.encode()))
            cfg.attrs[f"{label}.sha256"] = _sha256(text)
            cfg.attrs[f"{label}.content_type"] = "text/yaml"
            cfg.attrs[f"{label}.encoding"] = "utf-8"
            cfg.attrs[f"{label}.source_path"] = path or ""
        if case.hydro_spec is not None:
            cfg.create_dataset("hydro_yaml", data=case.hydro_spec.raw_text)
            cfg.attrs["hydro_yaml.sha256"] = _sha256(case.hydro_spec.raw_text)

        sysg = f.require_group("meta/system")
        try:
            pages = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
            sysg.attrs["ram_total_gb"] = pages / 2 ** 30
        except (ValueError, OSError):
            pass
        sysg.attrs["hostname"] = socket.gethostname()

        rung = f.require_group("meta/run")
        rung.attrs["dt_s"] = float(case.dt)
        rung.attrs["steps"] = float(nsteps)
        rung.attrs["time_final_s"] = float(times[-1]) if nsteps else 0.0
        rung.attrs["wall_time_s"] = float(wall_time_s)
        rung.attrs["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        sim = getattr(case, "_sim", None)
        if sim is not None and getattr(sim, "has_constraints", False):
            # constraint-violation channel: |C(q)|_inf over the run. The
            # const-mass farm path refines against the frozen t=0 Jacobian
            # and can drift at large swings (stepper.constraint_drift);
            # exact-solve paths record their stabilization level.
            d = sim.constraint_drift(traj)
            if d is not None:
                rung.attrs["constraint_drift_max"] = float(np.max(d))
                rung.attrs["constraint_drift_final"] = float(
                    np.asarray(d).reshape(-1)[-1])
        for k, v in (run_metadata or {}).items():
            rung.attrs[k] = v

    return fname


def write_seed_statistics(out_dir: str, case, traj, times, seeds,
                          finite) -> str:
    """Cross-realization statistics for a batched seed sweep (--seeds N).

    One statistics.h5 next to the per-seed result directories, holding
    per-seed AND cross-seed response statistics per body, plus PTO power
    per TSDA — the wave-farm / fatigue quantities a seed sweep exists to
    estimate. Beyond-reference: the reference runs one seed per process
    and aggregates nothing.

    Layout:
      /seeds [S], /finite [S] (divergence mask; stats use finite seeds)
      /bodies/body{k}/position_std      [S_ok, 3]  std over time per axis
      /bodies/body{k}/significant_range [S_ok, 3]  4*std (the Hs = 4 sigma
                                                  significant-value analog)
      /bodies/body{k}/position_mean     [S_ok, 3]
      /tsda/tsda{k}/mean_pto_power      [S_ok]  mean of c*Ldot^2 = -f_damp*Ldot
      /tsda/tsda{k}/max_force           [S_ok]  max |f_spring + f_damp|
      /aggregate/... cross-seed mean/std of each per-seed statistic
    """
    import h5py

    finite = np.asarray(finite, dtype=bool)
    pos = np.asarray(traj["pos"])[finite]  # [S_ok, T, nm, 3]
    path = os.path.join(out_dir, "statistics.h5")
    os.makedirs(out_dir, exist_ok=True)
    sim = case._sim
    with h5py.File(path, "w") as f:
        f.create_dataset("seeds", data=np.asarray(seeds, dtype=np.int64))
        f.create_dataset("finite", data=finite)
        f.create_dataset("time/start", data=float(times[0]))
        f.create_dataset("time/end", data=float(times[-1]))
        agg = {}

        def put(group, name, arr):
            arr = np.asarray(arr)
            f.create_dataset(f"{group}/{name}", data=arr)
            agg[f"{group}/{name}"] = arr

        for s in range(pos.shape[2]):
            grp = f"bodies/body{s + 1}"
            p = pos[:, :, s, :]  # [S_ok, T, 3]
            put(grp, "position_mean", p.mean(axis=1))
            put(grp, "position_std", p.std(axis=1))
            put(grp, "significant_range", 4.0 * p.std(axis=1))
        if "tsda" in traj:
            ts = np.asarray(traj["tsda"])[finite]  # [S_ok, T, n_tsda, 4]
            for k in range(ts.shape[2]):
                grp = f"tsda/tsda{k + 1}"
                ldot, f_total = ts[:, :, k, 1], ts[:, :, k, 2] + ts[:, :, k, 3]
                f_damp = ts[:, :, k, 3]
                put(grp, "mean_pto_power", (-f_damp * ldot).mean(axis=1))
                put(grp, "max_force", np.abs(f_total).max(axis=1))
        for key, arr in agg.items():
            f.create_dataset(f"aggregate/{key}/mean", data=arr.mean(axis=0))
            f.create_dataset(f"aggregate/{key}/std", data=arr.std(axis=0))
    return path
