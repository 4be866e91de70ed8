"""Scene builder: YAML specs -> SystemSpec + Simulation.

Mirrors the reference's SetupHydroFromYAML / ChParserMbsYAML pipeline
(setup_hydro_from_yaml.cpp:126-190, run_hydrochrono_from_yaml.cpp:185-214):
bodies matched by name, first hydro body's h5 file used for all, wave built
from the YAML wave settings with the runner's defaults (ramp 0, seed 1).
Period sweeps become a *batched* parameter pytree instead of serial re-runs.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.physics import waves as wv
from hydrochrono_tpu.physics.radiation import TaperedDirectOptions
from hydrochrono_tpu.physics.rotations import quat_from_cardan_xyz
from hydrochrono_tpu.physics.system import (
    Body,
    HydroAttachment,
    Joint,
    Motor,
    RSDA,
    SystemSpec,
    TSDA,
)
from hydrochrono_tpu.scene import yaml as sy


@dataclasses.dataclass
class Case:
    """A fully-resolved simulation case ready to run."""

    setup: Optional[sy.SetupSpec]
    model: sy.ModelSpec
    simulation: sy.SimulationSpec
    hydro_spec: Optional[sy.HydroSpec]
    system: SystemSpec
    wave: object
    sweep: Optional[dict]  # batched params pytree for period sweeps (or None)
    dt: float
    end_time: float
    output_directory: Optional[str]
    warnings: list

    @property
    def num_steps(self) -> int:
        # the runner loops while t < end_time stepping by dt
        # (run_hydrochrono_from_yaml.cpp:716-764)
        return int(round(self.end_time / self.dt))

    def build_simulation(self, dtype=None, outputs=("pos", "quat", "lin_vel", "ang_vel"),
                         block_size=None, radiation=None):
        """radiation: optional override of the YAML per-body
        radiation_calculation ("convolution" / "state_space" / "era")."""
        from hydrochrono_tpu.stepper import Simulation

        # YAML integrator selection (simulation_file integrator.type;
        # Chrono's ChTimestepperHHT default alpha is -0.2)
        integ_cfg = self.simulation.integrator or {}
        integ_type = str(integ_cfg.get("type", "")).lower()
        integrator = "hht" if integ_type == "hht" else "euler_implicit_linearized"

        # per-body radiation_calculation: "state_space" switches to the
        # BEMIO per-entry fits (declared but unimplemented in the reference,
        # hydro_types.h:24); "era" switches to the shared-pole realization
        # fitted from the RIRF itself (physics/era.py, beyond-reference —
        # works for any h5, composes with HHT and the blocked fused kernel)
        if radiation is None:
            radiation = "convolution"
            if self.hydro_spec is not None and self.hydro_spec.bodies:
                modes = {b.radiation_calculation
                         for b in self.hydro_spec.bodies}
                if modes == {"state_space"}:
                    radiation = "state_space"
                elif modes == {"era"}:
                    radiation = "era"
        if radiation == "state_space" and (integrator == "hht" or block_size):
            self.warnings.append(
                "state_space radiation pairs with the per-step Euler "
                "path; ignoring HHT/block_size for this run"
            )
            integrator = "euler_implicit_linearized"
            block_size = None

        tapered = None
        if self.hydro_spec is not None and self.hydro_spec.convolution.mode in (
            "tapered_direct", "tapereddirect"
        ):
            c = self.hydro_spec.convolution
            tapered = TaperedDirectOptions(
                smoothing=c.smoothing,
                window_length=c.window_length,
                rirf_end_time=c.rirf_end_time,
                taper_start_percent=c.taper_start_percent,
                taper_end_percent=c.taper_end_percent,
                taper_final_amplitude=c.taper_final_amplitude,
            )
        return Simulation(
            self.system, dt=self.dt, wave=self.wave, duration=self.end_time,
            dtype=dtype, tapered=tapered, outputs=outputs,
            integrator=integrator, block_size=block_size, radiation=radiation,
        )


def _quat0_from_orientation(orientation, degrees: bool):
    ang = np.asarray(orientation, dtype=np.float64)
    if degrees:
        ang = np.deg2rad(ang)
    if np.allclose(ang, 0.0):
        return (1.0, 0.0, 0.0, 0.0)
    import jax.numpy as jnp

    q = np.asarray(quat_from_cardan_xyz(jnp.asarray(ang)))
    return tuple(float(x) for x in q)


def _build_moorings(moordyn: dict, hydro_file: str, name_to_idx: dict,
                    hd, warnings: list, g: float = 9.81):
    """Wire the hydro-YAML `moordyn:` block to the quasi-static catenary
    module (physics/mooring.py). The reference declares this block in its
    demo YAML (demos/yaml/rm3/rm3_decay.hydro.yaml) but implements nothing;
    here `enabled: true` + an existing input file activates real mooring.
    A missing file degrades to a warning (the reference tree ships none)."""
    from hydrochrono_tpu.physics import mooring as moor

    if not moordyn.get("enabled", False):
        warnings.append("moordyn block present but enabled: false; ignored")
        return None
    input_file = moordyn.get("input_file")
    if not input_file:
        warnings.append("moordyn block has no input_file; mooring skipped")
        return None
    path = input_file
    if not os.path.isabs(path):
        path = os.path.join(os.path.dirname(os.path.abspath(hydro_file)), path)
    if not os.path.exists(path):
        warnings.append(
            f"moordyn input file {input_file} not found; mooring skipped "
            "(the reference tree ships no MoorDyn input either)")
        return None
    body_names = moordyn.get("bodies") or []
    missing = [nm for nm in body_names if nm not in name_to_idx]
    if missing:
        # the reference ignores the moordyn block entirely, so a stale body
        # name in a reference-tree YAML must not abort the run (ADVICE r2)
        warnings.append(
            f"moordyn bodies {missing} not found among model bodies; "
            "mooring skipped")
        return None
    rho = float(hd.rho) if hd is not None else 1025.0
    try:
        spec = moor.parse_moordyn_file(path, body_names, rho=rho, g=g)
    except (ValueError, KeyError, OSError) as exc:
        warnings.append(
            f"moordyn input file {input_file} could not be parsed "
            f"({exc}); mooring skipped")
        return None
    # remap fairlead indices: parser indexes into body_names
    import dataclasses as _dc

    lines = tuple(
        _dc.replace(ln, body=name_to_idx[body_names[ln.body]])
        for ln in spec.lines
    )
    # dynamic lumped-mass lines (physics/mooring_dynamic.py): the block's
    # `dynamics: lumped_mass` switches the model; optional nsegs/substeps/
    # water_depth/kb/cb override the file-derived defaults
    dynamics = str(moordyn.get("dynamics", "quasi_static")).lower()
    if dynamics in ("lumped_mass", "dynamic", "moordyn"):
        dynamics = "lumped_mass"
        if moordyn.get("nsegs"):
            lines = tuple(_dc.replace(ln, nsegs=int(moordyn["nsegs"]))
                          for ln in lines)
        opts = dict(spec.dyn_options or {})
        for k in ("water_depth", "kb", "cb", "substeps", "cfl",
                  "max_substeps"):
            if moordyn.get(k) is not None:
                opts[k] = moordyn[k]
        return moor.MooringSpec(lines=lines, dynamics="lumped_mass",
                                dyn_options=opts)
    elif dynamics not in ("quasi_static", "quasistatic", "catenary"):
        warnings.append(
            f"moordyn dynamics '{moordyn.get('dynamics')}' unknown; "
            "using quasi_static")
    return moor.MooringSpec(lines=lines, dyn_options=spec.dyn_options)


def build_case(setup_path: Optional[str] = None, *, model_file: Optional[str] = None,
               simulation_file: Optional[str] = None, hydro_file: Optional[str] = None,
               output_directory: Optional[str] = None) -> Case:
    """Resolve a case from a setup file / directory / explicit file paths
    (mirrors ResolveInputFiles, run_hydrochrono_from_yaml.cpp:95-183)."""
    warnings = []
    setup = None
    if setup_path is not None:
        if os.path.isdir(setup_path):
            setup_path = sy.find_setup_file(setup_path)
        setup = sy.parse_setup_file(setup_path)
        model_file = model_file or setup.model_file
        simulation_file = simulation_file or setup.simulation_file
        hydro_file = hydro_file or setup.hydro_file
        output_directory = output_directory or setup.output_directory

    if model_file is None or simulation_file is None:
        raise FileNotFoundError("model_file and simulation_file are required")

    model = sy.parse_model_file(model_file)
    sim = sy.parse_simulation_file(simulation_file)
    hydro_spec = None
    if hydro_file:
        if os.path.exists(hydro_file):
            hydro_spec = sy.parse_hydro_file(hydro_file)
        else:
            # some reference cases reference a hydro file that does not exist
            # (demos/yaml/slider_crank: "not used yet") — run without hydro
            warnings.append(f"hydro file {hydro_file} not found; running without hydro")

    # bodies
    name_to_idx = {}
    bodies = []
    for mb in model.bodies:
        name_to_idx[mb.name] = len(bodies)
        inertia = np.diag(mb.inertia_moments).astype(np.float64)
        # Chrono convention: products (Ixy, Ixz, Iyz) enter off-diagonal with
        # negative sign
        ixy, ixz, iyz = mb.inertia_products
        inertia[0, 1] = inertia[1, 0] = -ixy
        inertia[0, 2] = inertia[2, 0] = -ixz
        inertia[1, 2] = inertia[2, 1] = -iyz
        bodies.append(Body(
            name=mb.name,
            mass=mb.mass,
            pos0=tuple(mb.location),
            quat0=_quat0_from_orientation(mb.orientation, model.angle_degrees),
            inertia=inertia,
            fixed=mb.fixed,
        ))

    def idx(name):
        if name in ("ground", "world") and name not in name_to_idx:
            return -1
        return name_to_idx[name]

    joints = [
        Joint(kind=j.kind, body1=idx(j.body1), body2=idx(j.body2),
              location=tuple(j.location), axis=tuple(j.axis),
              axis2=tuple(j.axis2) if j.axis2 is not None else None)
        for j in model.joints
    ]
    motors = []
    for mo in model.motors:
        if mo.kind != "rotation" or mo.actuation_type != "SPEED":
            warnings.append(
                f"motor '{mo.name}' ({mo.kind}/{mo.actuation_type}) unsupported; "
                "only ROTATION/SPEED motors are implemented"
            )
            continue
        motors.append(Motor(body1=idx(mo.body1), body2=idx(mo.body2),
                            location=tuple(mo.location), axis=tuple(mo.axis),
                            speed=mo.value))
    tsdas = [
        TSDA(body1=idx(t.body1), body2=idx(t.body2), point1=tuple(t.point1),
             point2=tuple(t.point2), spring_coeff=t.spring_coefficient,
             damping_coeff=t.damping_coefficient, free_length=t.free_length,
             spring_curve=t.spring_curve, damping_curve=t.damping_curve)
        for t in model.tsdas
    ]
    rsdas = [
        RSDA(body1=idx(r.body1), body2=idx(r.body2), axis=tuple(r.axis),
             spring_coeff=r.spring_coefficient, damping_coeff=r.damping_coefficient,
             rest_angle=r.free_angle)
        for r in model.rsdas
    ]

    # hydro attachment: h5 body i <-> i-th hydro.yaml entry <-> model body by name
    hydro_att = None
    wave = wv.NoWave()
    sweep = None
    moorings = None
    if hydro_spec is not None and hydro_spec.bodies:
        h5_file = hydro_spec.bodies[0].h5_file  # first body's file used for all
        # (setup_hydro_from_yaml.cpp:92-95)
        hd = load_bemio_h5(h5_file, num_bodies=len(hydro_spec.bodies))
        inc_exc = [hb.include_excitation for hb in hydro_spec.bodies]
        inc_rad = [hb.include_radiation for hb in hydro_spec.bodies]
        if not (all(inc_exc) and all(inc_rad)):
            # strictly-better parity: the reference parses these flags but
            # never applies them (hydro_yaml_parser.cpp:377-380)
            from hydrochrono_tpu.io.bemio import mask_hydro_bodies

            hd = mask_hydro_bodies(hd, inc_exc, inc_rad)
            warnings.append(
                "per-body include_excitation/include_radiation flags are "
                "APPLIED here (the reference parses them but ignores them)")
        body_indices = []
        for hb in hydro_spec.bodies:
            if hb.name not in name_to_idx:
                raise KeyError(
                    f"hydro body '{hb.name}' not found among model bodies "
                    f"{sorted(name_to_idx)}"
                )
            body_indices.append(name_to_idx[hb.name])
            if hb.viscous_linear is not None or hb.viscous_quadratic is not None:
                # beyond-reference viscous (Morison-type) drag extension
                i = name_to_idx[hb.name]
                bodies[i] = dataclasses.replace(
                    bodies[i],
                    linear_damping=hb.viscous_linear,
                    quadratic_damping=hb.viscous_quadratic)
                warnings.append(
                    f"viscous_damping on {hb.name} is a hydrochrono-tpu "
                    "extension (not in the reference)")
        hydro_att = HydroAttachment(hydro=hd, body_indices=body_indices)

        ws = hydro_spec.waves
        if np.any(np.asarray(ws.direction)) and ws.kind in ("regular", "irregular"):
            warnings.append(
                f"wave direction {ws.direction} deg is APPLIED here (the "
                "reference parses `direction:` but hard-codes +x "
                "propagation, wave_types.cpp:20,34)")
        if ws.kind == "regular":
            periods = np.atleast_1d(np.asarray(ws.periods, dtype=np.float64))
            omegas = 2.0 * np.pi / periods
            amp = ws.height / 2.0
            if ws.is_direction_sweep and periods.size > 1:
                raise ValueError(
                    "period and direction sweeps cannot be combined in one "
                    "run (one batch axis); sweep one and loop the other")
            if periods.size > 1:
                # sweep: batch over the period axis
                wave = wv.RegularWave(amplitude=amp, omega=omegas,
                                      direction=ws.direction,
                                      axisymmetric=ws.axisymmetric)
            elif ws.is_direction_sweep:
                # heading sweep (beyond-reference): batch over direction
                wave = wv.RegularWave(amplitude=amp, omega=float(omegas[0]),
                                      phase=ws.phase,
                                      direction=np.asarray(ws.direction,
                                                           np.float64),
                                      axisymmetric=ws.axisymmetric)
            else:
                wave = wv.RegularWave(amplitude=amp, omega=float(omegas[0]),
                                      phase=ws.phase,
                                      direction=ws.direction,
                                      axisymmetric=ws.axisymmetric)
        elif ws.kind == "irregular":
            if ws.is_direction_sweep:
                raise ValueError(
                    "direction sweeps are regular-wave only (irregular "
                    "multi-heading seas use the spreading: block instead)")
            period = float(np.atleast_1d(ws.periods)[0]) if ws.periods is not None else 0.0
            # reference behavior: PM spectrum (gamma=1, unnormalized), ramp 0
            # (run_hydrochrono_from_yaml.cpp:457). `spectrum: jonswap` is an
            # extension — the reference parses the key but never applies it.
            gamma = 1.0
            normalized = False
            if ws.spectrum == "jonswap":
                gamma = ws.gamma
                normalized = True
            wave = wv.IrregularWaveParams(
                height=ws.height, period=period,
                peak_enhancement_factor=gamma, is_normalized=normalized,
                nfrequencies=ws.nfrequencies,
                seed=(ws.seed if ws.seed > 0 else 1),
                ramp_duration=ws.ramp_duration,
                frequency_min=ws.frequency_min,
                frequency_max=ws.frequency_max,
                wave_stretching=ws.wave_stretching,
                eta_file_path=ws.eta_file,
                direction=ws.direction,
                axisymmetric=ws.axisymmetric,
                spreading_exponent=ws.spreading_exponent,
                n_directions=ws.n_directions,
                spreading_span=ws.spreading_span,
            )
        if hydro_spec.moordyn:
            moorings = _build_moorings(
                hydro_spec.moordyn, hydro_file, name_to_idx, hd, warnings,
                g=float(np.linalg.norm(np.asarray(sim.gravity))),
            )

    system = SystemSpec(
        bodies=bodies, joints=joints, tsdas=tsdas, rsdas=rsdas, motors=motors,
        hydro=hydro_att, gravity=tuple(sim.gravity), moorings=moorings,
    )

    case = Case(
        setup=setup, model=model, simulation=sim, hydro_spec=hydro_spec,
        system=system, wave=wave, sweep=sweep, dt=sim.time_step,
        end_time=sim.end_time, output_directory=output_directory,
        warnings=warnings,
    )
    return case
