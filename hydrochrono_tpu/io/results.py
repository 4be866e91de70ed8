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


def export_results(case, traj: dict, times: np.ndarray, out_dir: str,
                   wall_time_s: float = 0.0, run_metadata: Optional[dict] = None) -> str:
    """Write one case's trajectory to results.<wave>.h5; returns the path.

    traj: trajectory pytree from Simulation.run with outputs including at
    least pos/quat/lin_vel/ang_vel (acc/lambda/tsda optional).
    """
    os.makedirs(out_dir, exist_ok=True)
    fname = os.path.join(out_dir, f"results.{wave_type_name(case)}.h5")

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
        if case.hydro_spec is not None and case.hydro_spec.waves.kind == "irregular":
            # spectrum + free-surface inputs (simulation_exporter.cpp:365-393)
            sim = getattr(case, "_sim", None)
            irr = getattr(sim, "irr", None) if sim is not None else None
            if irr is not None:
                gi = gw.require_group("irregular")
                gi.create_dataset("frequencies_hz", data=np.asarray(irr.freqs_hz))
                gi.create_dataset("spectral_densities",
                                  data=np.asarray(irr.spectral_densities))
                gi.create_dataset("free_surface_time", data=np.asarray(irr.eta_time))
                gi.create_dataset("free_surface_eta", data=np.asarray(irr.eta))

        # ---------------- results ----------------
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

        # joint reaction wrenches from the KKT multipliers
        row = 0
        sim = getattr(case, "_sim", None)
        joint_rows = getattr(sim, "joint_rows", []) if sim is not None else []
        for j, (kind, _locked, nrows, _b1, _b2) in zip(model.joints, joint_rows):
            g = f.require_group(f"results/model/joints/{j.name}")
            g.attrs.update({"type": j.kind.upper(), "frame1": "world",
                            "frame2": "world", "time_ref": "/results/time/time",
                            "units_force": "N", "units_torque": "N*m"})
            if lam is not None and lam.shape[-1] >= row + nrows:
                lj = lam[:, row : row + nrows] / case.dt
                force = np.zeros((nsteps, 3))
                torque = np.zeros((nsteps, 3))
                if kind in ("spherical", "revolute", "fixed"):
                    force = lj[:, :3]
                    if nrows > 3:
                        torque[:, : nrows - 3] = lj[:, 3:]
                g.create_dataset("reaction1_force", data=force)
                g.create_dataset("reaction1_torque", data=torque)
                g.create_dataset("reaction2_force", data=-force)
                g.create_dataset("reaction2_torque", data=-torque)
            else:
                for name in ("reaction1_force", "reaction1_torque",
                             "reaction2_force", "reaction2_torque"):
                    g.create_dataset(name, data=np.zeros((nsteps, 3)))
            row += nrows

        # RSDA results
        for r in model.rsdas:
            g = f.require_group(f"results/model/rsdas/{r.name}")
            g.attrs.update({"time_ref": "/results/time/time", "type": "RSDA",
                            "units_torque": "N*m", "units_angle": "rad"})

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
        for k, v in (run_metadata or {}).items():
            rung.attrs[k] = v

    return fname
