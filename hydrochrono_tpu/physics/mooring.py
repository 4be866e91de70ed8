"""Quasi-static catenary mooring (the reference's declared-but-unimplemented
`moordyn:` hydro-YAML block, hydro_types.h + demos/yaml/rm3/rm3_decay.hydro.yaml
— no `src/` implementation exists in the reference and the MoorDyn input file
is absent from its tree; grep confirms the block is parsed nowhere).

This module provides the capability TPU-natively:

  * a tolerant MoorDyn-style input-file parser (LINE TYPES / POINTS /
    LINES / OPTIONS sections, v1 "Connects" and v2 "Points" spellings);
  * a quasi-static elastic catenary solver for the fairlead tension
    components (H, V) given the anchor->fairlead offsets — the classic
    two-branch formulation (fully suspended vs. seabed touchdown, e.g.
    Jonkman 2007 / MAP++), solved with a fixed-iteration Newton method so
    it compiles under `jit`/`vmap`/`lax.scan` and differentiates with
    `jax.grad`;
  * per-step fairlead wrenches applied in the stepper's mechanical-force
    assembly (both the Euler and HHT integrators).

Quasi-static means no line inertia/damping: at every step each line is in
static equilibrium with its endpoints — the standard mooring model for WEC
time-domain studies at this fidelity.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# spec dataclasses
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MooringLine:
    """One quasi-static line: world anchor -> body fairlead."""

    body: int                      # spec body index carrying the fairlead
    anchor: Sequence[float]        # world anchor position
    fairlead: Sequence[float]      # fairlead position (see fairlead_frame)
    length: float                  # unstretched length [m]
    weight_per_m: float            # net submerged weight per length [N/m]
    ea: float                      # axial stiffness EA [N]
    seabed: bool = True            # anchor rests on the seabed (touchdown
    #                                branch allowed); False = fully suspended
    # "world": fairlead given in world coordinates at t0 (programmatic API);
    # "body": fairlead given in the body frame relative to the body reference
    # point (the MoorDyn file convention for Vessel/Body attachments)
    fairlead_frame: str = "world"
    # --- dynamic (lumped-mass) line properties; consumed only when the
    # spec's dynamics == "lumped_mass" (physics/mooring_dynamic.py) ---
    mass_per_m: float = 0.0        # structural mass per length [kg/m]
    #                                (0 = back-solve from weight_per_m)
    diam: float = 0.0              # volume-equivalent diameter [m]
    nsegs: int = 0                 # lumped-mass segments (0 = default 20)
    ba: float = -0.8               # internal damping [N s]; negative =
    #                                |ba| x segment-critical (MoorDyn BA)
    cdn: float = 1.6               # normal drag coefficient
    cdt: float = 0.05              # tangential drag coefficient
    can: float = 1.0               # normal added-mass coefficient
    cat: float = 0.0               # tangential added-mass coefficient


@dataclasses.dataclass(frozen=True)
class MooringSpec:
    lines: Sequence[MooringLine]
    # "quasi_static" (default, catenary_hv below) or "lumped_mass"
    # (dynamic lines, physics/mooring_dynamic.py)
    dynamics: str = "quasi_static"
    # DynamicLineOptions keyword overrides (water_depth/kb/cb/substeps/...)
    dyn_options: Optional[dict] = None


# ---------------------------------------------------------------------------
# MoorDyn-style input file parser
# ---------------------------------------------------------------------------

def _tokens(line: str):
    return line.replace(",", " ").split()


def parse_moordyn_file(path: str, body_names: Sequence[str],
                       rho: float = 1025.0, g: float = 9.81) -> MooringSpec:
    """Parse a MoorDyn-style lines file into a MooringSpec.

    body_names: the YAML `moordyn.bodies` list — "Vessel"/"Coupled"/"Body"
    attachments resolve into it ("vessel" = first entry; "body2"/"vessel2" =
    second entry, 1-based). Returned MooringLine.body carries the INDEX INTO
    body_names; the scene layer remaps to spec body indices.

    Only the quasi-static subset is consumed: line-type diameter, mass/m and
    EA; point attachments/positions; line endpoints + unstretched length.
    Dynamic-only columns (BA, Cd, Ca, NumSegs, ...) parse and are ignored.
    Options rows may override `rho`, `g` and set `wtrdpth` (used only to mark
    fixed anchors near the seabed as touchdown-capable).
    """
    types = {}       # name -> (diam, mass_per_m, ea, ba)
    points = {}      # id -> (attach_kind, body_idx_or_None, xyz)
    lines_rows = []  # (type_name, idA, idB, unstretched_length, nsegs)
    options = {}
    # LINES column positions; default = v2 order (ID Type AttachA AttachB
    # UnstrLen ...), overridden from the section's header row when present
    # (v1 orders the columns Line Type UnstrLen [NumSegs] NodeAnch NodeFair).
    # "segs" stays None unless a NumSegs header column names its position.
    lines_cols = {"len": 4, "a": 2, "b": 3, "segs": None}

    section = None
    expect_header = True
    done = False
    with open(path) as f:
        for raw in f:
            if done:
                break
            line = raw.strip()
            if not line:
                continue
            upper = line.upper()
            # section dividers are dash/equals RULES (>= 3 leading marks) —
            # a single '-' would also match negative OPTION values
            if line.startswith("---") or line.startswith("==="):
                if section == "options":
                    # MoorDyn ignores everything after the divider that
                    # closes the options section ('need this line')
                    done = True
                elif ("TYPE" in upper or "DICTIONARY" in upper) and \
                        "LINE" in upper:
                    section = "types"
                elif ("POINT" in upper or "CONNECT" in upper
                      or "NODE" in upper):
                    section = "points"
                elif "LINES" in upper or ("LINE" in upper
                                          and "PROPERT" in upper):
                    section = "lines"
                elif "OPTION" in upper or "SOLVER" in upper:
                    section = "options"
                else:
                    section = None
                expect_header = True
                continue
            if line.startswith("(") or line.startswith("#"):
                continue
            toks = _tokens(line)
            if not toks:
                continue
            # header rows (column names) start with a non-numeric token in
            # every section except types/options where names lead — detect
            # the standard header words, but ONLY on the first row of a
            # section: a line type literally named 'line'/'node'/... in a
            # later data row must not be dropped as a header (ADVICE r2)
            first_upper = toks[0].upper()
            if expect_header and first_upper in (
                    "TYPENAME", "LINETYPE", "NAME", "ID", "LINE",
                    "NODE", "POINT"):
                expect_header = False
                if section == "lines":
                    # read the column order off the header (v1 vs v2)
                    for ci, t in enumerate(toks):
                        tu = t.upper()
                        if "UNSTRLEN" in tu or "LENGTH" in tu:
                            lines_cols["len"] = ci
                        elif "NODEANCH" in tu or "ATTACHA" in tu:
                            lines_cols["a"] = ci
                        elif "NODEFAIR" in tu or "ATTACHB" in tu:
                            lines_cols["b"] = ci
                        elif "NUMSEG" in tu or "NSEG" in tu:
                            lines_cols["segs"] = ci
                continue
            expect_header = False
            if section == "types" and len(toks) >= 4:
                name = toks[0]
                diam = float(toks[1])
                mass_per_m = float(toks[2])
                ea = _parse_stiffness(toks[3])
                # column 5 in both v1 and v2 is the internal damping BA
                # (N s; negative = damping ratio) — consumed by the
                # dynamic lumped-mass model, ignored quasi-statically
                try:
                    ba = float(toks[4]) if len(toks) >= 5 else -0.8
                except ValueError:
                    ba = -0.8
                types[name] = (diam, mass_per_m, ea, ba)
            elif section == "points" and len(toks) >= 5:
                pid = int(float(toks[0]))
                attach = toks[1].lower()
                xyz = tuple(float(t) for t in toks[2:5])
                if attach.startswith(("fix", "anchor")):
                    points[pid] = ("fixed", None, xyz)
                elif attach.startswith(("vessel", "coupled", "body")):
                    digits = "".join(c for c in attach if c.isdigit())
                    bidx = int(digits) - 1 if digits else 0
                    if not 0 <= bidx < len(body_names):
                        raise ValueError(
                            f"mooring point {pid}: attachment '{toks[1]}' "
                            f"needs {bidx + 1} bodies but the YAML moordyn "
                            f"block lists {len(body_names)}")
                    points[pid] = ("body", bidx, xyz)
                else:
                    raise ValueError(
                        f"mooring point {pid}: unknown attachment "
                        f"'{toks[1]}' (expected Fixed/Vessel/Body#)")
            elif section == "lines" and len(toks) >= 5:
                def _pid(tok):
                    try:
                        v = float(tok)
                    except ValueError:
                        return None
                    return int(v) if float(int(v)) == v else None
                c = dict(lines_cols)
                if (c["len"], c["a"], c["b"]) == (4, 2, 3):
                    # Headerless row: decide v1 vs v2 column order by which
                    # interpretation's attach columns resolve to declared
                    # point ids (ADVICE r2 — an integer UnstrLen like '850'
                    # defeats any decimal-formatting heuristic).
                    v2_ok = (_pid(toks[2]) in points
                             and _pid(toks[3]) in points)
                    v1_ok = (_pid(toks[3]) in points
                             and _pid(toks[4]) in points)
                    frac = "." in toks[2] or "e" in toks[2].lower()
                    if v1_ok and (not v2_ok or frac):
                        # v1-style: UnstrLen comes third (no NumSegs column)
                        c = {"len": 2, "a": 3, "b": 4, "segs": None}
                ida, idb = _pid(toks[c["a"]]), _pid(toks[c["b"]])
                if ida not in points or idb not in points:
                    raise ValueError(
                        f"mooring line row {line!r}: attachment ids "
                        f"({toks[c['a']]}, {toks[c['b']]}) do not resolve "
                        f"to declared point ids {sorted(points)}")
                nseg = 0
                if c["segs"] is not None and len(toks) > c["segs"]:
                    try:
                        nseg = int(float(toks[c["segs"]]))
                    except ValueError:
                        nseg = 0
                lines_rows.append((toks[1], ida, idb,
                                   float(toks[c["len"]]), nseg))
            elif section == "options" and len(toks) >= 2:
                try:
                    options[toks[1].lower()] = float(toks[0])
                except ValueError:
                    options[toks[0].lower()] = toks[1]

    rho = float(options.get("rho", options.get("wtrdnsty", rho)))
    g = abs(float(options.get("g", g)))
    depth = options.get("wtrdpth")

    out = []
    for type_name, ida, idb, L0, nseg in lines_rows:
        if type_name not in types:
            raise ValueError(f"mooring line references unknown type "
                             f"'{type_name}'")
        diam, mass_per_m, ea, ba = types[type_name]
        w = (mass_per_m - rho * np.pi / 4.0 * diam * diam) * g
        if w <= 0:
            raise ValueError(
                f"mooring type '{type_name}' is neutrally/positively "
                f"buoyant (net weight {w:.3g} N/m); the quasi-static "
                f"catenary requires negatively buoyant line")
        pa, pb = points[ida], points[idb]
        if pa[0] == "fixed" and pb[0] == "body":
            anchor, fair = pa, pb
        elif pb[0] == "fixed" and pa[0] == "body":
            anchor, fair = pb, pa
        else:
            raise ValueError(
                "each quasi-static line needs exactly one Fixed anchor and "
                "one Vessel/Body fairlead")
        seabed = True
        if depth is not None:
            # anchors hovering above the seabed hold a suspended line
            seabed = anchor[2][2] <= -abs(depth) + 1e-3
        out.append(MooringLine(
            body=fair[1], anchor=anchor[2], fairlead=fair[2], length=L0,
            weight_per_m=w, ea=ea, seabed=seabed,
            # MoorDyn convention: Vessel/Body point coordinates are given in
            # the body frame relative to the body reference point
            fairlead_frame="body",
            mass_per_m=mass_per_m, diam=diam, nsegs=nseg, ba=ba,
        ))
    if not out:
        raise ValueError(f"no mooring lines found in {path}")
    dyn_opts = {}
    if depth is not None:
        dyn_opts["water_depth"] = abs(float(depth))
    if "kb" in options:
        dyn_opts["kb"] = float(options["kb"])
    if "cb" in options:
        dyn_opts["cb"] = float(options["cb"])
    dyn_opts["rho"] = rho
    dyn_opts["g"] = g
    return MooringSpec(lines=tuple(out), dyn_options=dyn_opts)


def _parse_stiffness(tok: str) -> float:
    """MoorDyn writes EA like '384.243E6' or '3.84e8'."""
    return float(tok)


# ---------------------------------------------------------------------------
# quasi-static elastic catenary
# ---------------------------------------------------------------------------

def _profile(H, V, L, w, EA, seabed):
    """Fairlead offsets (x, z) for fairlead tension components (H, V).

    Suspended:  x = (H/w)[asinh(V/H) - asinh(Va/H)] + H L/EA
                z = (H/w)[sqrt(1+(V/H)^2) - sqrt(1+(Va/H)^2)]
                    + (V L - w L^2/2)/EA              with Va = V - wL
    Touchdown (anchor on seabed, resting length Lb = L - V/w):
                x = Lb + (H/w) asinh(V/H) + H L/EA
                z = (H/w)[sqrt(1+(V/H)^2) - 1] + V^2/(2 EA w)
    (classic quasi-static closed form, frictionless seabed)
    """
    t = V / H
    ta = (V - w * L) / H
    sq = jnp.sqrt(1.0 + t * t)
    sqa = jnp.sqrt(1.0 + ta * ta)
    x_s = (H / w) * (jnp.arcsinh(t) - jnp.arcsinh(ta)) + H * L / EA
    z_s = (H / w) * (sq - sqa) + (V * L - 0.5 * w * L * L) / EA

    Lb = L - V / w
    x_t = Lb + (H / w) * jnp.arcsinh(t) + H * L / EA
    z_t = (H / w) * (sq - 1.0) + V * V / (2.0 * EA * w)

    lifted = V >= w * L
    use_susp = jnp.logical_or(lifted, jnp.logical_not(seabed))
    return (jnp.where(use_susp, x_s, x_t), jnp.where(use_susp, z_s, z_t))


def _asinh_log(x):
    """asinh via its log closed form, sign-folded for stability: Mosaic has
    no asinh lowering, and log(x + sqrt(x^2+1)) cancels badly for x << 0."""
    ax = jnp.abs(x)
    return jnp.sign(x) * jnp.log(ax + jnp.sqrt(ax * ax + 1.0))


def _hang_length(zf, w, EA):
    """Suspended length of a vertically hanging line reaching height zf,
    including elastic stretch: zf = Ls + w Ls^2 / (2 EA)  (tension grows
    linearly from 0 at the touchdown point to w Ls at the fairlead)."""
    # stable quadratic root: Ls = 2 zf / (1 + sqrt(1 + 2 w zf / EA))
    zp = jnp.maximum(zf, 0.0)
    return 2.0 * zp / (1.0 + jnp.sqrt(1.0 + 2.0 * w * zp / EA))


def _grounded_slack(xf, zf, L, w, EA, seabed):
    """True where the quasi-static equations have NO root: with more line
    than the taut-grounded geometry needs (xf < L - Ls_hang), the physical
    configuration is a vertical hang at the fairlead with the surplus line
    slack on the seabed — H = 0, V = w Ls_hang. Newton chases a nonexistent
    root there and must be branched out (the pre-fix solver returned ~1e7 N
    phantom tensions in exactly this regime)."""
    Ls = _hang_length(zf, w, EA)
    return jnp.logical_and(seabed, xf < L - Ls), Ls


def _touchdown_start(xf, zf, L, w, Hmin):
    """Cold start for the slack touchdown regime (seabed, chord < L,
    xf > L - zf): suspended length from the chord identity
    Ls^2 = (xf - (L - Ls))^2 + zf^2  =>  Ls = ((L-xf)^2 + zf^2)/(2(L-xf)),
    horizontal tension from the parabolic sag of the suspended span.
    The Jonkman sag start assumes a fully suspended line and lands orders
    of magnitude high on H here, outside Newton's basin."""
    a = jnp.maximum(L - xf, 1e-9 * L)
    Ls0 = jnp.clip((a * a + zf * zf) / (2.0 * a), jnp.maximum(zf, 0.0), L)
    s0 = jnp.maximum(xf - (L - Ls0), 0.0)
    H0 = jnp.maximum(w * s0 * s0 / (2.0 * jnp.maximum(zf, 1e-9 * L)), Hmin)
    return H0, w * Ls0


def catenary_newton_core(xf, zf, L, w, EA, seabed, hv0, iters: int = 10):
    """Warm-started fixed-iteration damped Newton for the quasi-static
    catenary, with ANALYTIC 2x2 Jacobians and log-form asinh — every op
    lowers in Mosaic, so this exact routine runs INSIDE the fused Pallas
    step kernel (ops/pallas_step.py), restoring sub-block dispatch
    amortization for moored systems (round 3). Elementwise over any
    broadcastable shapes; converged results match catenary_hv (which adds
    cold-start heuristics, a residual-polish loop and custom_root implicit
    differentiation on the XLA side).
    """
    Hmin = 1e-6 * w * L
    xf_safe = jnp.maximum(xf, 1e-6 * L)
    seabed_arr = jnp.logical_and(jnp.ones_like(xf_safe) > 0, seabed)
    gs, Ls_hang = _grounded_slack(xf_safe, zf, L, w, EA, seabed_arr)
    H = jnp.maximum(hv0[0], Hmin)
    V = hv0[1]
    # entering the touchdown regime from a grounded-slack carry (H pinned
    # at Hmin) leaves Newton outside its basin — reseat the start there
    td = jnp.logical_and(seabed_arr, jnp.logical_not(gs))
    reseed = jnp.logical_and(td, H < 4.0 * Hmin)
    H0_td, V0_td = _touchdown_start(xf_safe, zf, L, w, Hmin)
    H = jnp.where(reseed, H0_td, H)
    V = jnp.where(reseed, V0_td, V)
    # snap-load reseed: across the slack->taut transition H grows ~4
    # decades per metre of fairlead travel, so a slack-side carry is out
    # of basin at storm-speed steps. When the carried tension is far below
    # the straight-line elastic tension, restart from the taut seed.
    chord = jnp.sqrt(xf_safe * xf_safe + zf * zf)
    T_el = EA * (chord / L - 1.0)  # negative when slack
    T_car = jnp.sqrt(H * H + V * V)
    snap = T_car < 0.25 * T_el  # implies chord > L by a margin
    T0 = jnp.maximum(T_el, w * L)
    H = jnp.where(snap, T0 * xf_safe / chord, H)
    V = jnp.where(snap, T0 * zf / chord + 0.5 * w * L, V)
    inv_w = 1.0 / w
    LEA = L / EA
    for _ in range(iters):
        t = V / H
        ta = (V - w * L) / H
        sq = jnp.sqrt(1.0 + t * t)
        sqa = jnp.sqrt(1.0 + ta * ta)
        ash_t = _asinh_log(t)
        ash_ta = _asinh_log(ta)
        # residuals (profile - target), suspended / touchdown branches
        x_s = H * inv_w * (ash_t - ash_ta) + H * LEA
        z_s = H * inv_w * (sq - sqa) + (V * L - 0.5 * w * L * L) / EA
        x_t = (L - V * inv_w) + H * inv_w * ash_t + H * LEA
        z_t = H * inv_w * (sq - 1.0) + V * V / (2.0 * EA * w)
        use_s = jnp.logical_or(V >= w * L, jnp.logical_not(seabed))
        r1 = jnp.where(use_s, x_s, x_t) - xf_safe
        r2 = jnp.where(use_s, z_s, z_t) - zf
        # analytic Jacobian [dx/dH dx/dV; dz/dH dz/dV]
        a_s = inv_w * (ash_t - ash_ta - t / sq + ta / sqa) + LEA
        b_s = inv_w * (1.0 / sq - 1.0 / sqa)
        c_s = inv_w * (sq - sqa - t * t / sq + ta * ta / sqa)
        d_s = inv_w * (t / sq - ta / sqa) + LEA
        a_t = inv_w * (ash_t - t / sq) + LEA
        b_t = inv_w * (1.0 / sq - 1.0)
        c_t = inv_w * (sq - 1.0 - t * t / sq)
        d_t = inv_w * (t / sq) + V / (EA * w)
        a = jnp.where(use_s, a_s, a_t)
        b = jnp.where(use_s, b_s, b_t)
        c = jnp.where(use_s, c_s, c_t)
        d = jnp.where(use_s, d_s, d_t)
        det = a * d - b * c
        det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        dh = (d * r1 - b * r2) / det
        dv = (a * r2 - c * r1) / det
        # multiplicatively clamped step [0.1H, 10H]: unbounded upward jumps
        # near the H->0 touchdown edge threw Newton onto the phantom
        # elastic-stretch branch (H ~ 1e7 N), matching catenary_hv
        Hn = jnp.clip(H - dh, 0.1 * H, 10.0 * H)
        Vn = V - dv
        Vn = jnp.where(seabed, jnp.maximum(Vn, Hmin), Vn)
        Vn = jnp.clip(Vn, V - w * L - jnp.abs(V), V + w * L + jnp.abs(V))
        # freeze grounded-slack elements at their exact closed form: the
        # residual has no root there and iterating it diverges
        H = jnp.where(gs, Hmin, jnp.maximum(Hn, Hmin))
        V = jnp.where(gs, w * Ls_hang, Vn)
    return H, V


import functools


@functools.partial(jax.jit, static_argnames=("iters",))
def catenary_hv(xf, zf, L, w, EA, seabed=True, iters: int = 24, hv0=None):
    """Solve the quasi-static catenary for fairlead tension (H, V).

    Broadcast-batched: every argument may carry arbitrary (mutually
    broadcastable) leading shape — one elementwise Newton per element, so
    a whole [batch] of lines solves in a single fused elementwise chain.
    xf: horizontal anchor->fairlead distance (>= 0); zf: fairlead height
    above the anchor; L/w/EA: line properties; seabed: allow touchdown.
    Fixed-iteration damped Newton inside `lax.custom_root`, so gradients
    flow by implicit differentiation (one 2x2 tangent solve) instead of
    unrolling the iteration — jit/vmap/scan/grad-safe; H kept positive.
    The 2x2 Jacobians come from two `jax.jvp` unit-tangent passes, which
    stays elementwise for any batch shape (jacfwd on stacked vectors would
    build a dense cross-batch Jacobian).
    """
    dtype = jnp.result_type(xf, zf, L, w, EA, jnp.float32)
    xf = jnp.asarray(xf, dtype)
    zf = jnp.asarray(zf, dtype)
    L = jnp.asarray(L, dtype)
    w = jnp.asarray(w, dtype)
    EA = jnp.asarray(EA, dtype)
    seabed = jnp.asarray(seabed, bool)

    Hmin = 1e-6 * w * L
    xf_safe = jnp.maximum(xf, 1e-6 * L)
    gs, Ls_hang = _grounded_slack(xf_safe, zf, L, w, EA, seabed)

    shape = jnp.broadcast_shapes(xf_safe.shape, zf.shape, L.shape, w.shape,
                                 EA.shape, seabed.shape)
    ones = jnp.ones(shape, dtype)
    zeros = jnp.zeros(shape, dtype)

    slack = L * L > zf * zf + xf_safe * xf_safe
    touchdown = jnp.logical_and(seabed, jnp.logical_and(
        slack, jnp.logical_not(gs)))
    H0_td, V0_td = _touchdown_start(xf_safe, zf, L, w, Hmin)
    if hv0 is not None:
        # warm start (e.g. the previous time step's solution carried through
        # a scan) — Newton re-converges in a few iterations. A grounded-slack
        # carry (H pinned at Hmin) entering the touchdown regime is reseated
        # on the touchdown start (Newton's basin does not reach down to Hmin).
        Hw = jnp.broadcast_to(jnp.maximum(jnp.asarray(hv0[0], dtype), Hmin),
                              shape)
        Vw = jnp.broadcast_to(jnp.asarray(hv0[1], dtype), shape)
        reseed = jnp.logical_and(touchdown, Hw < 4.0 * Hmin)
        H0 = jnp.where(reseed, H0_td, Hw)
        V0 = jnp.where(reseed, V0_td, Vw)
        # snap-load reseed (see catenary_newton_core): a slack-side carry
        # is out of basin across a fast slack->taut transition
        chordw = jnp.sqrt(xf_safe * xf_safe + zf * zf)
        T_el = EA * (chordw / L - 1.0)
        snap = jnp.sqrt(H0 * H0 + V0 * V0) < 0.25 * T_el
        T0w = jnp.maximum(T_el, w * L)
        H0 = jnp.where(snap, T0w * xf_safe / chordw, H0)
        V0 = jnp.where(snap, T0w * zf / chordw + 0.5 * w * L, V0)
    else:
        # Jonkman starting values: catenary parameter from the inextensible
        # sag estimate, taut fallback when the chord exceeds L. In the slack
        # touchdown regime the sag start assumes a fully suspended line and
        # lands orders of magnitude high on H — use the touchdown-aware
        # start instead (pre-fix this diverged across most of the regime).
        lam = jnp.where(
            slack,
            jnp.sqrt(jnp.maximum(3.0 * ((L * L - zf * zf) / (xf_safe * xf_safe)
                                        - 1.0), 1e-8)),
            1.0,
        )
        H0 = jnp.broadcast_to(jnp.maximum(jnp.abs(w * xf_safe / (2.0 * lam)),
                                          Hmin), shape)
        V0 = jnp.broadcast_to(0.5 * w * (zf / jnp.tanh(lam) + L), shape)
        H0 = jnp.where(touchdown, H0_td, H0)
        V0 = jnp.where(touchdown, V0_td, V0)
        # taut start (chord >= L): the sag-based start lands orders of
        # magnitude low on H once elastic stretch dominates — seed from the
        # straight-line elastic tension instead (weight-floored), with the
        # fairlead carrying ~half the line weight vertically
        chord = jnp.sqrt(xf_safe * xf_safe + zf * zf)
        taut = chord >= L
        T0 = jnp.maximum(EA * (chord / L - 1.0), w * L)
        H0 = jnp.where(taut, T0 * xf_safe / chord, H0)
        V0 = jnp.where(taut, T0 * zf / chord + 0.5 * w * L, V0)
    H0 = jnp.where(gs, Hmin * ones, H0)
    V0 = jnp.where(gs, w * Ls_hang * ones, V0)

    def residual(hv):
        x, z = _profile(hv[0], hv[1], L, w, EA, seabed)
        # grounded-slack regime: the profile equations have no root (any
        # xf < L - Ls_hang maps to the same vertical-hang configuration);
        # substitute the well-posed vertical-hang system so the root is
        # exact and custom_root's implicit gradients stay meaningful:
        #   H = Hmin,  zf = V/w + V^2/(2 EA w)
        r1 = jnp.where(gs, hv[0] - Hmin, x - xf_safe)
        r2 = jnp.where(gs, hv[1] / w + hv[1] * hv[1] / (2.0 * EA * w) - zf,
                       z - zf)
        return (r1, r2)

    def _jac2(f, hv):
        """Elementwise 2x2 Jacobian of f at hv via two unit-tangent jvps."""
        r, (a, c) = jax.jvp(f, (hv,), ((ones, zeros),))
        _, (b, d) = jax.jvp(f, (hv,), ((zeros, ones),))
        return r, (a, b, c, d)

    def _apply_inv(a, b, c, d, y1, y2):
        det = a * d - b * c
        det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        return (d * y1 - b * y2) / det, (a * y2 - c * y1) / det

    def _newton_step(f, hv):
        (r1, r2), (a, b, c, d) = _jac2(f, hv)
        dh, dv = _apply_inv(a, b, c, d, r1, r2)
        # multiplicatively clamped step [0.1H, 10H]: unbounded upward jumps
        # near the H->0 touchdown edge threw Newton onto the phantom
        # elastic-stretch branch (H ~ 1e7 N with metre-scale residuals)
        Hn = jnp.clip(hv[0] - dh, 0.1 * hv[0], 10.0 * hv[0])
        Vn = hv[1] - dv
        Vn = jnp.where(seabed, jnp.maximum(Vn, Hmin), Vn)
        Vn = jnp.clip(Vn, hv[1] - w * L - jnp.abs(hv[1]),
                      hv[1] + w * L + jnp.abs(hv[1]))
        return (jnp.maximum(Hn, Hmin), Vn)

    # residual tolerance: 1e-6 of the line length resolves tensions far
    # below any physically meaningful scale
    _rscale = jnp.maximum(jnp.broadcast_to(L, shape), 1e-3)

    def solve(f, hv0):
        hv = hv0
        for _ in range(iters):
            hv = _newton_step(f, hv)

        # Convergence polish (ADVICE r2, medium): the fixed-iteration loop
        # can leave slack-to-taut transitions unconverged (the fused
        # production path warm-starts with iters=10). Keep iterating while
        # any element's relative residual exceeds tol, up to 64 extra
        # Newton steps. custom_root never differentiates through solve, so
        # the while_loop is jit/vmap/scan/grad-safe.
        def _err(hv):
            r1, r2 = f(hv)
            return jnp.max(jnp.maximum(jnp.abs(r1), jnp.abs(r2)) / _rscale)

        def cond(carry):
            hv, k = carry
            return jnp.logical_and(_err(hv) > 1e-6, k < 64)

        def body(carry):
            hv, k = carry
            return _newton_step(f, hv), k + 1

        hv, _ = jax.lax.while_loop(cond, body, (hv, jnp.int32(0)))
        return hv

    def tangent_solve(g, y):
        _, (a, b, c, d) = _jac2(g, (zeros, zeros))
        dh, dv = _apply_inv(a, b, c, d, y[0], y[1])
        return (dh, dv)

    hv = jax.lax.custom_root(residual, (H0, V0), solve, tangent_solve)
    return hv[0], hv[1]


def fairlead_force(anchor, pf, L, w, EA, seabed, iters: int = 24):
    """World-frame force the line exerts on the body at fairlead position pf."""
    d = pf - anchor
    dx = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + 1e-30)
    H, V = catenary_hv(dx, d[2], L, w, EA, seabed, iters=iters)
    ux = jnp.where(dx > 1e-9, d[0] / dx, 0.0)
    uy = jnp.where(dx > 1e-9, d[1] / dx, 0.0)
    # the line pulls the fairlead horizontally back toward the anchor and
    # vertically down
    return jnp.stack([-H * ux, -H * uy, -V]), (H, V)
