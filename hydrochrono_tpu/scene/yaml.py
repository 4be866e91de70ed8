"""The four-file YAML configuration surface.

Preserves the reference's user API (README.md:69-95):

  *.setup.yaml       orchestrator: model_file / simulation_file / hydro_file /
                     output_directory                   (setup_parser.h:10-20)
  *.model.yaml       bodies, joints, tsdas, rsdas       (Chrono ChParserMbsYAML)
  *.simulation.yaml  time_step, end_time, gravity, integrator, solver
  *.hydro.yaml       hydro bodies + wave settings + convolution options
                     (hydro_yaml_parser.cpp:154-610)

The reference hand-rolls an indentation parser for *.hydro.yaml; the accepted
key surface (aliases height/h vs amplitude/a with the 2A=H consistency check,
period/t/tp/p, sweep forms values/linspace/range, the convolution block) is
reproduced here on top of PyYAML.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence

import numpy as np
import yaml


# ---------------------------------------------------------------------------
# setup file
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SetupSpec:
    setup_path: str
    model_file: str
    simulation_file: str
    hydro_file: Optional[str]
    output_directory: Optional[str]


def find_setup_file(directory: str) -> str:
    """Locate a single *.setup.yaml inside `directory`
    (reference: setup_parser.cpp:10-36)."""
    candidates = sorted(
        f for f in os.listdir(directory) if f.endswith(".setup.yaml")
    )
    if not candidates:
        raise FileNotFoundError(f"no *.setup.yaml found in {directory}")
    return os.path.join(directory, candidates[0])


def parse_setup_file(path: str) -> SetupSpec:
    with open(path) as fh:
        data = yaml.safe_load(fh) or {}
    base = os.path.dirname(os.path.abspath(path))

    def resolve(p):
        if p is None:
            return None
        return p if os.path.isabs(p) else os.path.normpath(os.path.join(base, p))

    return SetupSpec(
        setup_path=os.path.abspath(path),
        model_file=resolve(data.get("model_file")),
        simulation_file=resolve(data.get("simulation_file")),
        hydro_file=resolve(data.get("hydro_file")),
        output_directory=resolve(data.get("output_directory")),
    )


# ---------------------------------------------------------------------------
# model file
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ModelBody:
    name: str
    location: Sequence[float]
    mass: float
    fixed: bool
    inertia_moments: Sequence[float]
    inertia_products: Sequence[float]
    orientation: Sequence[float]  # Cardan XYZ radians (or degrees per flag)
    com_location: Sequence[float]
    com_orientation: Sequence[float]
    visualization_file: Optional[str]


@dataclasses.dataclass(frozen=True)
class ModelJoint:
    name: str
    kind: str
    body1: str
    body2: str
    location: Sequence[float]
    axis: Sequence[float]
    axis2: Optional[Sequence[float]] = None  # UNIVERSAL joints


@dataclasses.dataclass(frozen=True)
class ModelMotor:
    """ChLinkMotor* from the model YAML (demos/yaml/slider_crank)."""

    name: str
    kind: str  # 'rotation' | 'linear' (rotation supported)
    body1: str
    body2: str
    location: Sequence[float]
    axis: Sequence[float]
    actuation_type: str  # SPEED supported
    value: float


@dataclasses.dataclass(frozen=True)
class ModelTSDA:
    name: str
    body1: str
    body2: str
    point1: Sequence[float]
    point2: Sequence[float]
    spring_coefficient: float
    damping_coefficient: float
    free_length: Optional[float]
    spring_curve: Optional[np.ndarray]
    damping_curve: Optional[np.ndarray]


@dataclasses.dataclass(frozen=True)
class ModelRSDA:
    name: str
    body1: str
    body2: str
    location: Sequence[float]
    axis: Sequence[float]
    spring_coefficient: float
    damping_coefficient: float
    free_angle: float


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    angle_degrees: bool
    bodies: List[ModelBody]
    joints: List[ModelJoint]
    tsdas: List[ModelTSDA]
    rsdas: List[ModelRSDA]
    motors: List["ModelMotor"]
    raw_text: str


def _vec(x, default=(0.0, 0.0, 0.0)):
    if x is None:
        return tuple(default)
    return tuple(float(v) for v in x)


def parse_model_file(path: str) -> ModelSpec:
    with open(path) as fh:
        text = fh.read()
    data = yaml.safe_load(text) or {}
    model = data.get("model", {})
    angle_degrees = bool(model.get("angle_degrees", False))

    bodies = []
    for b in model.get("bodies", []) or []:
        inertia = b.get("inertia", {}) or {}
        com = b.get("com", {}) or {}
        vis = b.get("visualization", {}) or {}
        bodies.append(ModelBody(
            name=str(b["name"]),
            location=_vec(b.get("location")),
            mass=float(b.get("mass", 0.0)),
            fixed=bool(b.get("fixed", False)),
            inertia_moments=_vec(inertia.get("moments"), (1.0, 1.0, 1.0)),
            inertia_products=_vec(inertia.get("products")),
            orientation=_vec(b.get("orientation")),
            com_location=_vec(com.get("location")),
            com_orientation=_vec(com.get("orientation")),
            visualization_file=vis.get("model_file") or vis.get("mesh"),
        ))

    joints = []
    for j in model.get("joints", []) or []:
        axis = j.get("axis", j.get("axis1"))
        axis2 = j.get("axis2")
        joints.append(ModelJoint(
            name=str(j.get("name", f"joint{len(joints)}")),
            kind=str(j.get("type", "fixed")).lower(),
            body1=str(j["body1"]),
            body2=str(j["body2"]),
            location=_vec(j.get("location")),
            axis=_vec(axis, (0.0, 0.0, 1.0)),
            axis2=_vec(axis2) if axis2 is not None else None,
        ))

    motors = []
    for mo in model.get("motors", []) or []:
        fn = mo.get("actuation_function", {}) or {}
        motors.append(ModelMotor(
            name=str(mo.get("name", f"motor{len(motors)}")),
            kind=str(mo.get("type", "rotation")).lower(),
            body1=str(mo["body1"]),
            body2=str(mo["body2"]),
            location=_vec(mo.get("location")),
            axis=_vec(mo.get("axis"), (0.0, 1.0, 0.0)),
            actuation_type=str(mo.get("actuation_type", "SPEED")).upper(),
            value=float(fn.get("value", 0.0)),
        ))

    def curve(d, key):
        pts = d.get(key)
        if pts is None:
            return None
        return np.asarray(pts, dtype=np.float64)

    tsdas = []
    for t in model.get("tsdas", []) or []:
        tsdas.append(ModelTSDA(
            name=str(t.get("name", f"tsda{len(tsdas)}")),
            body1=str(t["body1"]),
            body2=str(t["body2"]),
            point1=_vec(t.get("point1")),
            point2=_vec(t.get("point2")),
            spring_coefficient=float(t.get("spring_coefficient", 0.0)),
            damping_coefficient=float(t.get("damping_coefficient", 0.0)),
            free_length=(float(t["free_length"]) if "free_length" in t else None),
            spring_curve=curve(t, "spring_curve_data"),
            damping_curve=curve(t, "damping_curve_data"),
        ))

    rsdas = []
    for r in model.get("rsdas", []) or []:
        rsdas.append(ModelRSDA(
            name=str(r.get("name", f"rsda{len(rsdas)}")),
            body1=str(r["body1"]),
            body2=str(r["body2"]),
            location=_vec(r.get("location")),
            axis=_vec(r.get("axis"), (0.0, 1.0, 0.0)),
            spring_coefficient=float(r.get("spring_coefficient", 0.0)),
            damping_coefficient=float(r.get("damping_coefficient", 0.0)),
            free_angle=float(r.get("free_angle", 0.0)),
        ))

    return ModelSpec(
        name=str(model.get("name", os.path.basename(path))),
        angle_degrees=angle_degrees,
        bodies=bodies,
        joints=joints,
        tsdas=tsdas,
        rsdas=rsdas,
        motors=motors,
        raw_text=text,
    )


# ---------------------------------------------------------------------------
# simulation file
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SimulationSpec:
    time_step: float
    end_time: float
    gravity: Sequence[float]
    contact_method: str
    integrator: dict
    solver: dict
    visualization: dict
    raw_text: str


def parse_simulation_file(path: str) -> SimulationSpec:
    with open(path) as fh:
        text = fh.read()
    data = yaml.safe_load(text) or {}
    sim = data.get("simulation", {})
    return SimulationSpec(
        time_step=float(sim.get("time_step", 0.01)),
        end_time=float(sim.get("end_time", 10.0)),
        gravity=_vec(sim.get("gravity"), (0.0, 0.0, -9.81)),
        contact_method=str(sim.get("contact_method", "NSC")),
        integrator=dict(sim.get("integrator", {}) or {}),
        solver=dict(sim.get("solver", {}) or {}),
        visualization=dict(sim.get("visualization", {}) or {}),
        raw_text=text,
    )


# ---------------------------------------------------------------------------
# hydro file
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class HydroBodyEntry:
    name: str
    h5_file: str
    include_excitation: bool = True
    include_radiation: bool = True
    # viscous (Morison-type) per-DOF damping extension (beyond-reference):
    # viscous_damping: {linear: [6], quadratic: [6]}
    viscous_linear: object = None
    viscous_quadratic: object = None
    radiation_calculation: str = "convolution"  # "state_space" declared but
    # unimplemented in the reference (hydro_types.h:24); implemented here.


@dataclasses.dataclass(frozen=True)
class WaveSettings:
    kind: str  # 'still' | 'regular' | 'irregular'
    height: float = 0.0
    periods: Optional[np.ndarray] = None  # scalar stored as shape-() array
    direction: float = 0.0  # degrees; APPLIED here (the reference parses
    # the key and hard-codes +x propagation, wave_types.cpp:20,34)
    axisymmetric: bool = False  # allow direction on single-heading files
    phase: float = 0.0
    spectrum: str = "pierson_moskowitz"
    # extensions beyond the reference surface (which parses `spectrum` but
    # never applies it): jonswap peak enhancement, start ramp, bin count
    gamma: float = 3.3
    ramp_duration: float = 0.0
    nfrequencies: int = 0
    seed: int = -1  # -1 = unset -> defaults to 1 (setup_hydro_from_yaml.cpp:60-61)
    # further extensions (reference keeps these C++-API-only, SURVEY §2.2):
    frequency_min: float = 0.001
    frequency_max: float = 1.0
    wave_stretching: bool = False
    eta_file: Optional[str] = None  # time/eta text file (ReadEtaFromFile)
    # directional spreading (beyond-reference): cos-2s about `direction`
    spreading_exponent: Optional[float] = None
    n_directions: int = 7
    spreading_span: float = 180.0

    @property
    def is_sweep(self) -> bool:
        return self.periods is not None and self.periods.ndim > 0 and self.periods.size > 1

    @property
    def is_direction_sweep(self) -> bool:
        d = np.asarray(self.direction)
        return d.ndim > 0 and d.size > 1


@dataclasses.dataclass(frozen=True)
class ConvolutionSettings:
    mode: str = "baseline"  # or "tapered_direct"
    smoothing: str = "sg"
    window_length: int = 5
    taper_start_percent: float = 0.8
    taper_end_percent: float = 1.0
    taper_final_amplitude: float = 0.0
    rirf_end_time: float = -1.0
    export_csv: bool = False


@dataclasses.dataclass(frozen=True)
class HydroSpec:
    bodies: List[HydroBodyEntry]
    waves: WaveSettings
    convolution: ConvolutionSettings
    moordyn: Optional[dict]
    raw_text: str


def _parse_periods(wave: dict) -> Optional[np.ndarray]:
    """Period may be scalar, values list, linspace or range
    (hydro_yaml_parser.cpp:409-524)."""
    for key in ("period", "t", "tp", "p"):
        if key in wave:
            val = wave[key]
            break
    else:
        return None
    if isinstance(val, (int, float)):
        return np.asarray(float(val))
    if isinstance(val, dict):
        if "values" in val:
            return np.asarray([float(v) for v in val["values"]])
        if "linspace" in val:
            ls = val["linspace"]
            return np.linspace(float(ls["start"]), float(ls["stop"]), int(ls["num"]))
        if "range" in val:
            rg = val["range"]
            start, stop, step = float(rg["start"]), float(rg["stop"]), float(rg["step"])
            inclusive = bool(rg.get("inclusive", True))
            n = int(np.floor((stop - start) / step + (1e-9 if inclusive else -1e-9))) + 1
            return start + step * np.arange(n)
        if "values" not in val and {"start", "stop", "num"} <= set(val):
            return np.linspace(float(val["start"]), float(val["stop"]), int(val["num"]))
    if isinstance(val, list):
        return np.asarray([float(v) for v in val])
    raise ValueError(f"unsupported period specification: {val!r}")


def _parse_directions(wave: dict):
    """`direction:` accepts the same scalar / values / linspace / range
    forms as `period:` (beyond-reference: heading sweeps for directional
    RAO studies; the reference ignores the key entirely)."""
    if "direction" not in wave:
        return 0.0
    val = wave["direction"]
    if isinstance(val, (int, float)):
        return float(val)
    arr = _parse_periods({"period": val})
    return float(arr) if arr.ndim == 0 else arr


def parse_hydro_file(path: str) -> HydroSpec:
    with open(path) as fh:
        text = fh.read()
    data = yaml.safe_load(text) or {}
    hyd = data.get("hydrodynamics", {}) or {}
    base = os.path.dirname(os.path.abspath(path))

    bodies = []
    for b in hyd.get("bodies", []) or []:
        h5 = b.get("h5_file", "")
        if h5 and not os.path.isabs(h5):
            h5 = os.path.normpath(os.path.join(base, h5))
        visc = b.get("viscous_damping", {}) or {}
        if visc and not (visc.get("linear") or visc.get("quadratic")):
            raise ValueError(
                f"viscous_damping on body {b['name']} needs a "
                "linear: [6] and/or quadratic: [6] list")
        bodies.append(HydroBodyEntry(
            name=str(b["name"]),
            h5_file=h5,
            include_excitation=bool(b.get("include_excitation", True)),
            include_radiation=bool(b.get("include_radiation", True)),
            viscous_linear=([float(x) for x in visc["linear"]]
                            if visc.get("linear") else None),
            viscous_quadratic=([float(x) for x in visc["quadratic"]]
                               if visc.get("quadratic") else None),
            radiation_calculation=str(b.get("radiation_calculation", "convolution")),
        ))

    wave = hyd.get("waves", {}) or {}
    kind = str(wave.get("type", "still")).lower()
    if kind in ("no_wave", "still_ci", "still"):
        kind = "still"
    if kind not in ("still", "regular", "irregular"):
        # the reference throws for unknown types (setup_hydro_from_yaml.cpp:77-79)
        raise ValueError(f"Unsupported wave type: {wave.get('type')}")

    # height/amplitude aliases with the 2A == H consistency check
    # (hydro_yaml_parser.cpp:572-583)
    height = None
    for key in ("height", "h"):
        if key in wave:
            height = float(wave[key])
    amplitude = None
    for key in ("amplitude", "a"):
        if key in wave:
            amplitude = float(wave[key])
    if height is not None and amplitude is not None:
        if abs(height - 2.0 * amplitude) > 1e-9 * max(1.0, abs(height)):
            raise ValueError(
                f"wave height {height} and amplitude {amplitude} are inconsistent (H must equal 2A)"
            )
    if height is None:
        height = 2.0 * amplitude if amplitude is not None else 0.0

    periods = _parse_periods(wave)
    if kind == "regular" and periods is None:
        raise ValueError("regular waves require a period (hydro_yaml_parser.cpp:585-598)")

    waves = WaveSettings(
        kind=kind,
        height=height,
        periods=periods,
        direction=_parse_directions(wave),
        axisymmetric=bool(wave.get("axisymmetric", False)),
        phase=float(wave.get("phase", 0.0)),
        spectrum=str(wave.get("spectrum", "pierson_moskowitz")).lower(),
        gamma=float(wave.get("gamma", 3.3)),
        ramp_duration=float(wave.get("ramp_duration", 0.0)),
        nfrequencies=int(wave.get("nfrequencies", 0)),
        seed=int(wave.get("seed", -1)),
        frequency_min=float(wave.get("frequency_min", 0.001)),
        frequency_max=float(wave.get("frequency_max", 1.0)),
        wave_stretching=bool(wave.get("wave_stretching", False)),
        eta_file=(os.path.join(base, str(wave["eta_file"]))
                  if wave.get("eta_file") else None),
        spreading_exponent=(
            float(spreading["exponent"])
            if (spreading := wave.get("spreading", {}) or {}).get(
                "exponent") is not None else None),
        n_directions=int(spreading.get("n_directions", 7)),
        spreading_span=float(spreading.get("span", 180.0)),
    )

    conv = hyd.get("convolution", {}) or {}
    smoothing = conv.get("smoothing", {}) or {}
    taper = conv.get("taper", {}) or {}
    diagnostics = conv.get("diagnostics", {}) or {}
    mode = str(conv.get("mode", "baseline")).lower()
    convolution = ConvolutionSettings(
        mode=mode,
        smoothing=str(smoothing.get("type", "sg")),
        window_length=int(smoothing.get("window_length", 5)),
        taper_start_percent=float(taper.get("start_percent", 0.8)),
        taper_end_percent=float(taper.get("end_percent", 1.0)),
        taper_final_amplitude=float(taper.get("final_amplitude", 0.0)),
        rirf_end_time=float(taper.get("end_time", -1.0)),
        export_csv=bool(diagnostics.get("export_csv", False)),
    )

    moordyn = hyd.get("moordyn")  # declared in demo YAML but unimplemented in
    # the reference (SURVEY.md §2.2); parsed and surfaced as a warning upstream

    return HydroSpec(bodies=bodies, waves=waves, convolution=convolution,
                     moordyn=moordyn, raw_text=text)
