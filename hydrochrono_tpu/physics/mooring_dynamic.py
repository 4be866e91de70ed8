"""Dynamic lumped-mass mooring lines (MoorDyn-class capability).

The reference declares a `moordyn:` hydro-YAML block (hydro_types.h,
demos/yaml/rm3/rm3_decay.hydro.yaml) and implements nothing; round 2 built
the quasi-static elastic catenary (physics/mooring.py). This module adds
the DYNAMIC line model the block's name promises — the standard lumped-mass
discretization (Hall & Goupee 2015, the MoorDyn formulation): each line is
N segments / N+1 nodes; interior nodes carry structural mass plus
anisotropic hydrodynamic added mass and integrate Newton's law under

  * axial elastic tension (no compression: a slack segment carries zero
    internal force) with internal strain-rate damping (the MoorDyn `BA`
    coefficient; negative BA = fraction of segment-critical damping),
  * net submerged weight,
  * Morison drag split into tangential/normal components of the relative
    flow — against the Airy water-particle velocity at each node when the
    simulation carries a regular/irregular wave (see
    `wave_kinematics_arrays`), still water otherwise,
  * Morison fluid inertia (Froude-Krylov + added mass on the fluid
    acceleration): rho*V*((1+Can)*a_n + (1+Cat)*a_t) per node, the
    MoorDyn-v2 wave-loading form consistent with the anisotropic added
    mass already on the structural side,
  * seabed contact as a vertical spring-damper penalty (MoorDyn `kb`/`cb`),

while the two end nodes are kinematically driven: node 0 sits on the
anchor, node N follows the body fairlead. The line ODE is stiff (axial
wave speed sqrt(EA/m)), so each outer simulation step advances the lines
with `nsub` midpoint-RK2 substeps chosen at setup from the axial CFL — the
same scheme and default stability margins as MoorDyn v1.

TPU-native design: all lines integrate as ONE [nl, N+1, 3] array program
(shared N enforced at setup — padding ragged lines would poison the
vectorized segment math), the substep loop is a `lax.scan`, and everything
is pure-functional so `vmap` batches fleets of moored instances and
`jax.grad` flows end-to-end (the coupling force is plain elementwise math;
no custom_root needed because nothing is solved implicitly).

Coupling to the body (stepper.py) is the standard loose/staggered scheme
(MoorDyn + FAST): within a body step the line nodes are frozen and the
fairlead force comes from the last segment evaluated against the CURRENT
body pose (so the body integrator sees an implicit restoring force); after
the body step the lines advance with the fairlead swept linearly between
the old and new poses.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from hydrochrono_tpu.physics import mooring as qs

TWO_PI = 2.0 * np.pi


@dataclasses.dataclass(frozen=True)
class DynamicLineOptions:
    """Solver/contact options shared by all dynamic lines of a system."""

    water_depth: Optional[float] = None  # seabed plane z = -water_depth;
    #                                      None = deepest anchor's z
    kb: float = 3.0e6   # seabed normal stiffness [Pa/m]  (MoorDyn default)
    cb: float = 3.0e5   # seabed normal damping  [Pa s/m] (MoorDyn default)
    cfl: float = 0.25   # substep = cfl * axial-CFL limit
    max_substeps: int = 512   # hard cap (setup raises if stability needs more)
    substeps: Optional[int] = None  # explicit override (skips the CFL choice)
    rho: float = 1025.0
    g: float = 9.81


def _line_dynamic_fields(ln, rho: float = 1025.0, g: float = 9.81) -> dict:
    """Dynamic per-line properties with MoorDyn-flavoured defaults.

    `mass_per_m`/`diam` come from the LINE TYPES table when the spec was
    parsed from a MoorDyn file; a programmatically built MooringLine that
    only knows the net submerged weight gets a consistent structural mass
    back-solved at neutral displacement (diam -> 0: mass = w/g), using the
    SAME rho/g the weight was computed with (ADVICE r4).
    """
    diam = float(getattr(ln, "diam", 0.0) or 0.0)
    mass = float(getattr(ln, "mass_per_m", 0.0) or 0.0)
    if mass <= 0.0:
        mass = ln.weight_per_m / g + rho * np.pi / 4.0 * diam * diam
    return {
        "diam": diam,
        "mass_per_m": mass,
        "nsegs": int(getattr(ln, "nsegs", 0) or 0),
        "ba": float(getattr(ln, "ba", -0.8)),
        "cdn": float(getattr(ln, "cdn", 1.6)),
        "cdt": float(getattr(ln, "cdt", 0.05)),
        "can": float(getattr(ln, "can", 1.0)),
        "cat": float(getattr(ln, "cat", 0.0)),
    }


def build_dynamic_consts(spec, anchors: np.ndarray, dt: float,
                         options: Optional[DynamicLineOptions] = None,
                         dtype=jnp.float32):
    """Host-side constants for the dynamic line integrator.

    spec: MooringSpec with `dynamics == "lumped_mass"`; anchors [nl, 3]
    world anchor positions (already resolved by the stepper). Returns
    (meta, arrays): `meta` holds the STATIC values (segment count, substep
    count, contact scalars) the stepper keeps on `self` — they steer
    compile-time structure and must never ride the traced params pytree —
    while `arrays` is stored under params["_const"]["moor_dyn"]. The
    device functions below take the merged dict {**meta, **arrays}. All
    lines must share one segment count N (static shapes; ragged fleets
    would force masked segment math on every substep).
    """
    opts = options or DynamicLineOptions()
    nl = len(spec.lines)
    dyn = [_line_dynamic_fields(ln, opts.rho, opts.g) for ln in spec.lines]
    nsegs = [d["nsegs"] if d["nsegs"] > 0 else 20 for d in dyn]
    if len(set(nsegs)) != 1:
        raise ValueError(
            f"dynamic mooring requires one shared segment count; got {nsegs}"
            " (set nsegs per line-type or the YAML moordyn.nsegs override)")
    N = nsegs[0]
    if N < 2:
        raise ValueError("dynamic mooring needs nsegs >= 2")

    L = np.array([ln.length for ln in spec.lines], np.float64)
    w = np.array([ln.weight_per_m for ln in spec.lines], np.float64)
    EA = np.array([ln.ea for ln in spec.lines], np.float64)
    mass = np.array([d["mass_per_m"] for d in dyn], np.float64)
    diam = np.array([d["diam"] for d in dyn], np.float64)
    lseg = L / N
    area = np.pi / 4.0 * diam * diam
    m_node = mass * lseg                       # interior node structural mass
    can = np.array([d["can"] for d in dyn], np.float64)
    cat = np.array([d["cat"] for d in dyn], np.float64)
    cdn = np.array([d["cdn"] for d in dyn], np.float64)
    cdt = np.array([d["cdt"] for d in dyn], np.float64)

    # internal damping: BA >= 0 is the MoorDyn N*s coefficient directly
    # (force = BA * strain rate); BA < 0 means |BA| * critical damping of
    # one segment-node axial oscillator (k = EA/lseg, m = m_node + added)
    ma_node = opts.rho * area * lseg * np.maximum(can, cat)
    ba_in = np.array([d["ba"] for d in dyn], np.float64)
    ba_crit = 2.0 * np.sqrt(EA * lseg * (m_node + ma_node))
    ba = np.where(ba_in >= 0.0, ba_in, -ba_in * ba_crit)

    # substep count from the stiffest line's axial CFL (+ damping limit)
    c_ax = np.sqrt(EA / np.maximum(mass + opts.rho * area * can, 1e-12))
    dt_cfl = (lseg / c_ax).min()
    # explicit stability of the damped axial mode: h < 2 m / c
    dt_damp = (2.0 * (m_node + ma_node) * lseg
               / np.maximum(ba, 1e-12)).min()
    dt_sub = opts.cfl * min(dt_cfl, dt_damp)
    nsub = int(opts.substeps) if opts.substeps else int(np.ceil(dt / dt_sub))
    nsub = max(nsub, 1)
    if nsub > opts.max_substeps:
        raise ValueError(
            f"dynamic mooring needs {nsub} substeps per dt={dt} step "
            f"(axial CFL {dt_cfl:.2e}s, damping {dt_damp:.2e}s) — above "
            f"max_substeps={opts.max_substeps}; raise it, shorten dt, or "
            "use coarser segments")

    depth = opts.water_depth
    if depth is None:
        depth = float(-anchors[:, 2].min())

    f8 = lambda a: jnp.asarray(a, dtype)
    meta = {
        "N": N, "nsub": nsub, "nl": nl,
        "rho": float(opts.rho), "g": float(opts.g),
        "depth": float(depth), "kb": float(opts.kb), "cb": float(opts.cb),
        "dt_sub_limit": float(dt_sub),
    }
    arrays = {
        "anchor": f8(anchors),
        "lseg": f8(lseg), "EA": f8(EA), "ba": f8(ba), "w": f8(w),
        "m_node": f8(m_node), "area": f8(area), "diam": f8(diam),
        "can": f8(can), "cat": f8(cat), "cdn": f8(cdn), "cdt": f8(cdt),
    }
    return meta, arrays


def init_line_nodes(consts: dict, pf0: np.ndarray) -> np.ndarray:
    """Initial node states [nl, N+1, 6] (pos ++ vel) on the quasi-static
    catenary profile between each anchor and its fairlead pf0 [nl, 3] —
    the same equilibrium the quasi-static model starts from, so a decay
    case starts force-identical in both modes. Host-side (numpy + one
    catenary_hv call); velocities start at zero.
    """
    anchors = np.asarray(consts["anchor"], np.float64)
    pf0 = np.asarray(pf0, np.float64)
    nl, N = consts["nl"], consts["N"]
    L = np.asarray(consts["lseg"], np.float64) * N
    w = np.asarray(consts["w"], np.float64)
    EA = np.asarray(consts["EA"], np.float64)

    d = pf0 - anchors
    xf = np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2) + 1e-12
    zf = d[:, 2]
    hv = qs.catenary_hv(jnp.asarray(xf), jnp.asarray(zf), jnp.asarray(L),
                        jnp.asarray(w), jnp.asarray(EA),
                        jnp.asarray(np.ones(nl, bool)))
    H, V = (np.asarray(a, np.float64) for a in hv)
    H = np.maximum(H, 1e-8 * w * L)
    Va = V - w * L  # vertical tension at the anchor (negative on touchdown)

    s = np.linspace(0.0, 1.0, N + 1)[None, :] * L[:, None]   # [nl, N+1]
    Hc, Vac, wc, Lc, EAc = (a[:, None] for a in (H, Va, w, L, EA))
    Vs = Vac + wc * s
    # suspended-span profile from the anchor-end tension (grounded spans:
    # clamp the suspended arc at the touchdown point Lb = -Va/w)
    Lb = np.clip(-Vac / wc, 0.0, Lc)
    s_up = np.maximum(s - Lb, 0.0)           # arc length above touchdown
    V0 = np.maximum(Vac, 0.0)                # vertical tension at lift-off
    t1 = (V0 + wc * s_up) / Hc
    t0 = V0 / Hc
    asinh = np.arcsinh
    # grounded span (s < Lb): the line lies ALONG the seabed under tension
    # ~H, so x ~= s (+ elastic stretch) — NOT at the touchdown point Lb
    # (ADVICE r4: mapping every grounded node to x=Lb collapsed them into
    # zero-length segments and snapped segment 0 by ~Lb on the first step)
    x_prof = (np.minimum(s, Lb) + (Hc / wc) * (asinh(t1) - asinh(t0))
              + Hc * s / EAc)
    z_prof = ((Hc / wc) * (np.sqrt(1 + t1 * t1) - np.sqrt(1 + t0 * t0))
              + (V0 * s_up + 0.5 * wc * s_up * s_up) / EAc)
    # distribute the (small, ~1e-8 catenary-residual) endpoint error as a
    # linear correction so the fairlead node lands EXACTLY on pf0 — the
    # first-substep fairlead-segment strain must be consistent with the
    # body pose, not with the solver tolerance
    frac = s / Lc
    x_prof = x_prof + (xf[:, None] - x_prof[:, -1:]) * frac
    z_prof = z_prof + (zf[:, None] - z_prof[:, -1:]) * frac
    e_h = d[:, :2] / xf[:, None]
    pos = np.zeros((nl, N + 1, 3))
    pos[:, :, 0] = anchors[:, None, 0] + x_prof * e_h[:, None, 0]
    pos[:, :, 1] = anchors[:, None, 1] + x_prof * e_h[:, None, 1]
    pos[:, :, 2] = anchors[:, None, 2] + z_prof
    pos[:, -1] = pf0
    out = np.zeros((nl, N + 1, 6))
    out[:, :, :3] = pos
    return out


def init_line_nodes_jax(consts: dict, pf0: jnp.ndarray) -> jnp.ndarray:
    """Traceable twin of init_line_nodes: node states [.., nl, N+1, 6] on
    the quasi-static profile for fairleads pf0 [.., nl, 3]. Runs under
    jit/vmap/grad (catenary_hv is custom_root-differentiable), so the
    stepper can re-seed line state from the ACTUAL body pose at run start
    — the MoorDyn "IC generation" role: a user who displaces the body
    after init_state must not hand the first step a fairlead segment
    stretched by the whole offset. Keep the profile math in sync with the
    float64 host version above (init_state precision path)."""
    anchors = consts["anchor"]
    N = consts["N"]
    L = consts["lseg"] * N
    w, EA = consts["w"], consts["EA"]

    d = pf0 - anchors
    xf = jnp.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2) + 1e-12
    zf = d[..., 2]
    H, V = qs.catenary_hv(xf, zf, L, w, EA, jnp.ones(xf.shape, bool))
    H = jnp.maximum(H, 1e-8 * w * L)
    Va = V - w * L

    s = jnp.linspace(0.0, 1.0, N + 1, dtype=pf0.dtype) * L[..., None]
    Hc, Vac, wc, Lc, EAc = (a[..., None] for a in (H, Va, w, L, EA))
    Lb = jnp.clip(-Vac / wc, 0.0, Lc)
    s_up = jnp.maximum(s - Lb, 0.0)
    V0 = jnp.maximum(Vac, 0.0)
    t1 = (V0 + wc * s_up) / Hc
    t0 = V0 / Hc
    x_prof = (jnp.minimum(s, Lb)
              + (Hc / wc) * (jnp.arcsinh(t1) - jnp.arcsinh(t0))
              + Hc * s / EAc)
    z_prof = ((Hc / wc) * (jnp.sqrt(1 + t1 * t1) - jnp.sqrt(1 + t0 * t0))
              + (V0 * s_up + 0.5 * wc * s_up * s_up) / EAc)
    frac = s / Lc
    x_prof = x_prof + (xf[..., None] - x_prof[..., -1:]) * frac
    z_prof = z_prof + (zf[..., None] - z_prof[..., -1:]) * frac
    e_h = d[..., :2] / xf[..., None]
    pos = jnp.stack([
        anchors[..., None, 0] + x_prof * e_h[..., None, 0],
        anchors[..., None, 1] + x_prof * e_h[..., None, 1],
        anchors[..., None, 2] + z_prof,
    ], axis=-1)
    pos = pos.at[..., -1, :].set(pf0)
    return jnp.concatenate([pos, jnp.zeros_like(pos)], axis=-1)


def wave_kinematics_arrays(wave, irr_data, water_depth: float, g: float,
                           dtype=jnp.float32):
    """Airy component tables for line-node wave kinematics, or None.

    Returns (meta, arrays): meta = {"wave_kin": True, "wv_depth", "wv_ch",
    "wv_sh"} (static scalars), arrays = {"wv_om", "wv_amp", "wv_ph",
    "wv_k"} [K] component tables evaluated by `_water_kinematics` at every
    node and substep. Covers the production wave models:

      * RegularWave with scalar amplitude/omega (K = 1),
      * unidirectional, single-seed IrregularWaveParams via its built
        IrregularWaveData (K = nfrequencies; amp = sqrt(2 S dw), the same
        components the excitation uses, wave_types.cpp:432-520),

    and returns None (documented still-water fallback — drag on -v only)
    for batched sweeps (per-instance component tables would have to ride
    the vmapped state) and directional spreading (nodes would need per-
    heading superposition; the body excitation supports it, line loading
    does not yet).
    """
    from hydrochrono_tpu.physics import waves as wv

    heading = float(np.atleast_1d(
        np.asarray(getattr(wave, "direction", 0.0) or 0.0, np.float64))[0])
    if isinstance(wave, wv.RegularWave):
        amp = np.asarray(wave.amplitude, np.float64)
        om = np.asarray(wave.omega, np.float64)
        if amp.ndim or om.ndim or np.ndim(getattr(wave, "direction", 0.0)):
            return None, None  # batched sweep
        k = wv.compute_wavenumber(np.array([float(om)]), water_depth, g)
        om_a = np.array([float(om)])
        amp_a = np.array([float(amp)])
        ph_a = np.array([float(wave.phase)])
    elif isinstance(wave, wv.IrregularWaveParams) and irr_data is not None:
        ph = np.asarray(irr_data.phases, np.float64)
        if ph.ndim != 1 or irr_data.directions is not None:
            return None, None  # seed-batched or directional sea
        amp_a = np.sqrt(2.0 * np.asarray(irr_data.spectral_densities)
                        * np.asarray(irr_data.spectral_widths))
        om_a = 2.0 * np.pi * np.asarray(irr_data.freqs_hz, np.float64)
        k = np.asarray(irr_data.wavenumbers, np.float64)
        ph_a = ph
    else:
        return None, None

    depth = float(water_depth)
    if not np.isfinite(depth) or depth <= 0.0:
        depth = 1.0e5  # deep-water branch triggers on k*depth > 500
    th = np.deg2rad(heading)
    meta = {"wave_kin": True, "wv_depth": depth,
            "wv_ch": float(np.cos(th)), "wv_sh": float(np.sin(th))}
    f8 = lambda a: jnp.asarray(a, dtype)
    arrays = {"wv_om": f8(om_a), "wv_amp": f8(amp_a),
              "wv_ph": f8(ph_a), "wv_k": f8(k)}
    return meta, arrays


# ---------------------------------------------------------------------------
# device-side line dynamics
# ---------------------------------------------------------------------------

def _water_kinematics(consts, pos, t):
    """Airy particle velocity/acceleration at node positions [.., nl, N+1, 3]
    at time t — the superposed deep/finite-depth profiles of
    physics/kinematics.py evaluated for the component tables of
    `wave_kinematics_arrays` (wave along the stored heading). z is clamped
    to the mean water line (no Wheeler stretching on lines: mooring nodes
    live at depth, where linear kinematics are the standard fidelity —
    Hall & Goupee 2015 section 2.2)."""
    om, amp = consts["wv_om"], consts["wv_amp"]
    ph, k = consts["wv_ph"], consts["wv_k"]
    ch, sh = consts["wv_ch"], consts["wv_sh"]
    depth = consts["wv_depth"]

    xp = pos[..., 0] * ch + pos[..., 1] * sh            # [.., nl, N+1]
    z = jnp.minimum(pos[..., 2], 0.0)
    arg = k * xp[..., None] - om * t + ph               # [.., nl, N+1, K]
    deep = jnp.logical_or(TWO_PI / k > depth, k * depth > 500.0)
    decay = jnp.exp(k * z[..., None])
    kd = jnp.minimum(k * depth, 500.0)
    kz = jnp.minimum(k * (z[..., None] + depth), 500.0)
    sinh_kd = jnp.sinh(kd)
    prof_h = jnp.where(deep, decay, jnp.cosh(kz) / sinh_kd)
    prof_v = jnp.where(deep, decay, jnp.sinh(kz) / sinh_kd)

    c, s = jnp.cos(arg), jnp.sin(arg)
    uh = (om * amp * prof_h * c).sum(-1)
    uv = (om * amp * prof_v * s).sum(-1)
    ah = (om * om * amp * prof_h * s).sum(-1)
    av = -(om * om * amp * prof_v * c).sum(-1)
    u = jnp.stack([uh * ch, uh * sh, uv], axis=-1)
    a = jnp.stack([ah * ch, ah * sh, av], axis=-1)
    return u, a


def _segment_tension(consts, pos, vel):
    """Axial internal force per segment: [nl, N, 3] (taut-only spring +
    strain-rate damping along the current unit vector)."""
    seg = pos[..., 1:, :] - pos[..., :-1, :]                  # [nl, N, 3]
    lm = jnp.sqrt(jnp.sum(seg * seg, axis=-1) + 1e-30)
    u = seg / lm[..., None]
    lseg = consts["lseg"][..., None]
    strain = lm / lseg - 1.0
    srate = jnp.sum((vel[..., 1:, :] - vel[..., :-1, :]) * u,
                    axis=-1) / lseg
    taut = strain > 0.0
    tmag = jnp.where(taut, consts["EA"][..., None] * strain
                     + consts["ba"][..., None] * srate, 0.0)
    # damping must not turn a taut segment compressive (energy + snap
    # robustness): clamp at zero total
    tmag = jnp.maximum(tmag, 0.0)
    return tmag[..., None] * u, u


def _node_forces(consts, pos, vel, t_abs=None):
    """External + internal forces on every node [nl, N+1, 3] and the
    tangent directions used for the added-mass split. `t_abs` is the absolute
    substep time — used only when the consts carry wave-kinematics tables
    (`wave_kin`), in which case drag acts on the relative flow u_wave - v
    and the Morison fluid-inertia force is added."""
    T, u = _segment_tension(consts, pos, vel)
    nl_shape = pos.shape[:-2]
    zeros_end = jnp.zeros(nl_shape + (1, 3), pos.dtype)
    # node i feels +T_i (segment toward the fairlead) - T_{i-1}
    f_int = (jnp.concatenate([T, zeros_end], axis=-2)
             - jnp.concatenate([zeros_end, T], axis=-2))

    lseg = consts["lseg"][..., None]
    # node tangent = mean of adjacent segment tangents (ends: the one)
    t_lo = jnp.concatenate([u[..., :1, :], u], axis=-2)
    t_hi = jnp.concatenate([u, u[..., -1:, :]], axis=-2)
    t = t_lo + t_hi
    t = t / jnp.sqrt(jnp.sum(t * t, axis=-1, keepdims=True) + 1e-30)

    # net submerged weight (full segment length per interior node)
    f_w = jnp.zeros_like(pos).at[..., 2].add(-consts["w"][..., None] * lseg)

    # Morison drag on the relative flow (wave kinematics when available,
    # still water otherwise: v_rel = u_wave - vel) + fluid inertia
    rho = consts["rho"]
    f_fl = 0.0
    if consts.get("wave_kin") and t_abs is not None:
        uw, aw = _water_kinematics(consts, pos, t_abs)
        vr = uw - vel
        # Froude-Krylov + added mass on the FLUID acceleration — the
        # structural side already carries the rho*V*Can/Cat added mass in
        # the node mass matrix (_accel), so the relative-acceleration
        # Morison form reduces to rho*V*((1+Can) a_n + (1+Cat) a_t)
        at_ = jnp.sum(aw * t, axis=-1, keepdims=True) * t
        an_ = aw - at_
        vol = (rho * consts["area"] * consts["lseg"])[..., None, None]
        f_fl = vol * ((1.0 + consts["can"][..., None, None]) * an_
                      + (1.0 + consts["cat"][..., None, None]) * at_)
    else:
        vr = -vel
    vt = jnp.sum(vr * t, axis=-1, keepdims=True) * t
    vn = vr - vt
    spn = jnp.sqrt(jnp.sum(vn * vn, axis=-1, keepdims=True) + 1e-30)
    spt = jnp.sqrt(jnp.sum(vt * vt, axis=-1, keepdims=True) + 1e-30)
    d_l = (consts["diam"] * consts["lseg"])[..., None, None]
    f_d = (0.5 * rho * consts["cdn"][..., None, None] * d_l * spn * vn
           + 0.5 * rho * jnp.pi * consts["cdt"][..., None, None] * d_l
           * spt * vt)

    # seabed spring-damper (no suction)
    pen = (-consts["depth"]) - pos[..., 2]
    fz = jnp.maximum(pen * consts["kb"] - vel[..., 2] * consts["cb"], 0.0)
    fz = jnp.where(pen > 0.0, fz, 0.0) * (consts["diam"] * consts["lseg"]
                                          )[..., None]
    f_b = jnp.zeros_like(pos).at[..., 2].add(fz)

    return f_int + f_w + f_d + f_fl + f_b, t


def _accel(consts, pos, vel, t=None):
    """Interior-node accelerations [nl, N+1, 3] (end rows garbage —
    overwritten by the kinematic boundary handling)."""
    F, t_dir = _node_forces(consts, pos, vel, t)  # t = absolute time
    # M = alpha I + beta t t^T  (structural + anisotropic added mass)
    ma = consts["rho"] * consts["area"] * consts["lseg"]
    alpha = (consts["m_node"] + ma * consts["can"])[..., None, None]
    beta = (ma * (consts["cat"] - consts["can"]))[..., None, None]
    tF = jnp.sum(t_dir * F, axis=-1, keepdims=True)
    return F / alpha - (beta / (alpha * (alpha + beta))) * tF * t_dir


def advance_lines(consts: dict, nodes: jnp.ndarray, pf0, pf1,
                  dt: float, t0=0.0) -> jnp.ndarray:
    """Advance all lines through one outer step of length dt with
    consts["nsub"] midpoint-RK2 substeps (the MoorDyn v1 integrator).

    nodes [.., nl, N+1, 6]; pf0/pf1 [.., nl, 3] fairlead world positions at
    the step's start/end (swept linearly; fairlead velocity = the sweep
    rate). t0 is the absolute time at the step's start — it drives the
    wave-kinematics evaluation when consts carry component tables (the
    flag is static, so the no-wave graph is unchanged). Returns the
    advanced nodes array.
    """
    nsub = consts["nsub"]
    h = dt / nsub
    vf = (pf1 - pf0) / dt

    def clamp(pos, vel, frac):
        pos = pos.at[..., 0, :].set(consts["anchor"])
        pos = pos.at[..., -1, :].set(pf0 + frac * dt * vf)
        vel = vel.at[..., 0, :].set(0.0)
        vel = vel.at[..., -1, :].set(vf)
        return pos, vel

    def sub(carry, k):
        pos, vel = carry
        frac0 = k / nsub
        pos, vel = clamp(pos, vel, frac0)
        a1 = _accel(consts, pos, vel, t0 + frac0 * dt)
        pm, vm = clamp(pos + 0.5 * h * vel, vel + 0.5 * h * a1,
                       frac0 + 0.5 / nsub)
        a2 = _accel(consts, pm, vm, t0 + (frac0 + 0.5 / nsub) * dt)
        return (pos + h * vm, vel + h * a2), None

    pos, vel = nodes[..., :3], nodes[..., 3:]
    (pos, vel), _ = jax.lax.scan(
        sub, (pos, vel), jnp.arange(nsub, dtype=pos.dtype))
    pos, vel = clamp(pos, vel, 1.0)
    return jnp.concatenate([pos, vel], axis=-1)


def fairlead_force(consts: dict, nodes: jnp.ndarray, pf, vf):
    """Force each line applies ON the body at its fairlead [.., nl, 3].

    Evaluated against the CURRENT body pose (pf/vf), with the neighbor
    node frozen from `nodes` — the loose-coupling force the body
    integrator sees within a step. Includes the last segment's
    tension+damping plus the fairlead half-node's share of submerged
    weight (drag/seabed on the end half-node are neglected — they act on
    the body's own hull models at this fidelity).
    """
    pos, vel = nodes[..., :3], nodes[..., 3:]
    xn = pos[..., -2, :]
    vn = vel[..., -2, :]
    seg = pf - xn
    lm = jnp.sqrt(jnp.sum(seg * seg, axis=-1) + 1e-30)
    u = seg / lm[..., None]
    lseg = consts["lseg"]
    strain = lm / lseg - 1.0
    srate = jnp.sum((vf - vn) * u, axis=-1) / lseg
    tmag = jnp.where(strain > 0.0,
                     consts["EA"] * strain + consts["ba"] * srate, 0.0)
    tmag = jnp.maximum(tmag, 0.0)
    f = -tmag[..., None] * u
    half_w = 0.5 * consts["w"] * lseg
    return f.at[..., 2].add(-half_w)


def line_tensions(consts: dict, nodes: jnp.ndarray):
    """Diagnostic fairlead/anchor tension magnitudes [.., nl] from the end
    segments of the stored node state (results-export channel)."""
    pos, vel = nodes[..., :3], nodes[..., 3:]
    T, _ = _segment_tension(consts, pos, vel)
    tm = jnp.sqrt(jnp.sum(T * T, axis=-1) + 1e-30)
    return tm[..., -1], tm[..., 0]
