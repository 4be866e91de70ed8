"""Dynamic lumped-mass mooring lines (physics/mooring_dynamic.py).

The reference declares the `moordyn:` hydro-YAML block and implements
nothing (hydro_types.h; no src/ match); the quasi-static catenary covered
it in round 2. These tests gate the round-4 dynamic (MoorDyn-class)
lumped-mass model: static equilibrium against the quasi-static closed
form, the quasi-static limit under slow fairlead motion, and the stepper
coupling (Euler + HHT), including the staggered node-state carry.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hydrochrono_tpu.physics import mooring as moor
from hydrochrono_tpu.physics import mooring_dynamic as mdyn
from hydrochrono_tpu.physics.system import Body, SystemSpec, TSDA
from hydrochrono_tpu.stepper import Simulation

# a 90 mm chain-like line (MoorDyn-style properties)
CHAIN = dict(weight_per_m=698.0, ea=3.84e8, mass_per_m=77.7, diam=0.09)


def _line_consts(xf, L, nsegs=24, depth=50.0, dt=0.05):
    line = moor.MooringLine(body=0, anchor=(0.0, 0.0, -depth),
                            fairlead=(xf, 0.0, 0.0), length=L,
                            nsegs=nsegs, **CHAIN)
    spec = moor.MooringSpec(lines=(line,), dynamics="lumped_mass")
    meta, arrays = mdyn.build_dynamic_consts(
        spec, np.array([[0.0, 0.0, -depth]]), dt,
        mdyn.DynamicLineOptions(), dtype=jnp.float64)
    return {**meta, **arrays}


def _relax(md, nodes, pf, dt, steps):
    adv = jax.jit(lambda nd: mdyn.advance_lines(md, nd, pf, pf, dt))
    return jax.jit(lambda nd: jax.lax.fori_loop(
        0, steps, lambda i, n: adv(n), nd))(nodes)


@pytest.mark.parametrize("xf,L,tolH,tolV", [
    # touchdown case: H carries an O(lseg) error from touchdown-point
    # quantization (the suspended span resolves in segment units) — the
    # 34.8 m span at N=24 measures 0.8%; a short-span case (xf=100,
    # 14.3 m suspended) measures ~8% at the same N, converging ~1/N
    (110.0, 140.0, 0.02, 0.06),   # slack, seabed touchdown
    (120.0, 125.0, 1e-3, 1e-3),   # taut suspended (elastic-dominated)
    (105.0, 118.0, 5e-3, 0.03),   # slack fully suspended
])
def test_line_static_equilibrium_matches_catenary(xf, L, tolH, tolV):
    """A line relaxed under its internal damping + drag settles onto the
    quasi-static elastic catenary: fairlead (H, V) match catenary_hv to
    the lumped-mass discretization error (O(1/N); the touchdown point
    quantizes in segment units)."""
    depth, dt = 50.0, 0.05
    md = _line_consts(xf, L, depth=depth, dt=dt)
    pf = jnp.asarray([[xf, 0.0, 0.0]])
    nodes = jnp.asarray(mdyn.init_line_nodes(md, np.asarray(pf)))
    nodes = _relax(md, nodes, pf, dt, 2500)
    assert float(jnp.abs(nodes[..., 3:]).max()) < 0.05  # settled

    f = np.asarray(mdyn.fairlead_force(md, nodes, pf, jnp.zeros_like(pf)))
    H, V = (float(np.asarray(a)[0]) for a in moor.catenary_hv(
        jnp.asarray([xf]), jnp.asarray([depth]), jnp.asarray([L]),
        jnp.asarray([CHAIN["weight_per_m"]]), jnp.asarray([CHAIN["ea"]]),
        jnp.asarray([True])))
    lseg = L / md["N"]
    assert abs(-f[0, 0] - H) / H < tolH
    # fairlead_force carries the end half-node weight on top of V
    assert abs(-f[0, 2] - 0.5 * CHAIN["weight_per_m"] * lseg - V) / V < tolV


def test_line_quasistatic_limit_slow_motion():
    """Under slow fairlead motion the dynamic tension tracks the
    quasi-static solution pose-by-pose. The sweep stays in the compliant
    catenary band (xf in [102, 105] for L=118): approaching the taut
    transition dT/dx blows past 1e6 N/m and millimeter-scale dynamic lag
    dominates any relative-tension comparison."""
    depth, dt, L, x0 = 50.0, 0.05, 118.0, 103.5
    md = _line_consts(x0, L, depth=depth, dt=dt)
    pf0 = np.array([[x0, 0.0, 0.0]])
    nodes = jnp.asarray(mdyn.init_line_nodes(md, pf0))
    nodes = _relax(md, nodes, jnp.asarray(pf0), dt, 1000)

    period, amp = 120.0, 1.5   # very slow surge oscillation
    nchk = 0

    @jax.jit
    def step(nodes, k):
        t0, t1 = k * dt, (k + 1) * dt
        w = 2 * np.pi / period
        p0 = jnp.asarray([[x0 + amp * jnp.sin(w * t0), 0.0, 0.0]])
        p1 = jnp.asarray([[x0 + amp * jnp.sin(w * t1), 0.0, 0.0]])
        v1 = jnp.asarray([[amp * w * jnp.cos(w * t1), 0.0, 0.0]])
        return mdyn.advance_lines(md, nodes, p0, p1, dt), p1, v1

    for k in range(int(period / dt / 2)):
        nodes, pf, vf = step(nodes, k)
        if k % 300 == 299:
            xf = float(pf[0, 0])
            # evaluate at the TRUE fairlead velocity (the stepper coupling
            # always does): with vf=0 the internal-damping term ba*srate
            # sees a spurious strain rate -vn.u/lseg from the moving nodes
            # (~16 kN here, ba ~ 1.4e6 N s) that is not a tension error
            f = np.asarray(mdyn.fairlead_force(md, nodes, pf, vf))
            H, V = (float(np.asarray(a)[0]) for a in moor.catenary_hv(
                jnp.asarray([xf]), jnp.asarray([depth]), jnp.asarray([L]),
                jnp.asarray([CHAIN["weight_per_m"]]),
                jnp.asarray([CHAIN["ea"]]), jnp.asarray([True])))
            t_dyn = float(np.hypot(f[0, 0], f[0, 2]))
            t_qs = float(np.hypot(H, V))
            assert abs(t_dyn - t_qs) / t_qs < 0.05
            nchk += 1
    assert nchk >= 3


def _moored_spec(dynamics):
    return SystemSpec(
        bodies=[
            Body(name="buoy", mass=5e4, pos0=(0.0, 0.0, 0.0),
                 inertia=np.diag([1e6, 1e6, 1e6])),
            Body(name="ground", mass=1.0, pos0=(0.0, 0.0, -50.0),
                 fixed=True),
        ],
        tsdas=[TSDA(0, 1, (0.0, 0.0, 0.0), (0.0, 0.0, -50.0),
                    spring_coeff=4e4, damping_coeff=6e4)],
        gravity=(0.0, 0.0, 0.0),  # buoyancy-balanced; mooring is the force
        # slack touchdown spread (the quasi-static round-2 test's line,
        # plus consistent structural mass/diameter for the dynamic model;
        # near-taut chains would make the coupled system ring at the
        # line's elastic frequency instead of decaying in 20 s)
        moorings=moor.MooringSpec(
            lines=tuple(
                moor.MooringLine(
                    body=0,
                    anchor=(120.0 * np.cos(th), 120.0 * np.sin(th), -50.0),
                    fairlead=(2.0 * np.cos(th), 2.0 * np.sin(th), -1.0),
                    length=140.0, weight_per_m=300.0, ea=1e8,
                    mass_per_m=32.6, diam=0.05, nsegs=16)
                for th in np.linspace(0.0, 2 * np.pi, 4, endpoint=False)
            ),
            dynamics=dynamics,
        ),
    )


def test_moored_body_dynamic_tracks_quasistatic():
    """A 4-line spread on a surge-offset buoy: the dynamic-line simulation
    restores toward station like the quasi-static one. Gates (measured
    behavior: a slow ~45 s restoring sweep, QS crossing station at 10.95 s,
    dynamic at 13.05 s — the lag is the real line inertia + water drag the
    quasi-static form cannot see, so an instantaneous mid-sweep position
    comparison is NOT a valid agreement metric):
      * early-time agreement: both start from the SAME catenary profile
        (stepper._reseed_moor_nodes puts the displaced start on the
        quasi-static shape), so the first 1.5 s must track tightly;
      * same restoring stiffness scale: station-crossing times within 30%.
    """
    trajs = {}
    for dynamics in ("quasi_static", "lumped_mass"):
        sim = Simulation(_moored_spec(dynamics), dt=0.05,
                         outputs=("pos", "moor_tension")
                         if dynamics == "lumped_mass" else ("pos",))
        st = sim.init_state()
        st = dataclasses.replace(st, pos=st.pos.at[0, 0].add(3.0))
        _, traj = jax.jit(lambda s, sim=sim: sim.run(400, state=s))(st)
        trajs[dynamics] = np.asarray(traj["pos"])
        if dynamics == "lumped_mass":
            ten = np.asarray(traj["moor_tension"])
            assert ten.shape == (400, 4)
            assert np.isfinite(ten).all() and (ten > 0).all()
    cross = {}
    for k, p in trajs.items():
        assert np.isfinite(p).all()
        x = p[:, 0, 0]
        assert abs(x[-1]) < 3.0                 # restored toward station
        idx = np.where(np.sign(x[1:]) * np.sign(x[:-1]) < 0)[0]
        assert idx.size >= 1                    # actually crossed station
        cross[k] = (idx[0] + 1) * 0.05
    # identical initial line shape -> tight early-time tracking
    d_early = np.abs(trajs["lumped_mass"][:30, 0, 0]
                     - trajs["quasi_static"][:30, 0, 0])
    assert d_early.max() < 0.06
    # same restoring physics at equilibrium scale
    assert abs(cross["lumped_mass"] - cross["quasi_static"]) \
        < 0.30 * cross["quasi_static"]


def test_moored_body_dynamic_hht_runs():
    sim = Simulation(_moored_spec("lumped_mass"), dt=0.05,
                     integrator="hht", outputs=("pos",))
    st = sim.init_state()
    st = dataclasses.replace(st, pos=st.pos.at[0, 0].add(1.0))
    final, traj = jax.jit(lambda s: sim.run(60, state=s))(st)
    p = np.asarray(traj["pos"])
    assert np.isfinite(p).all()
    assert np.isfinite(np.asarray(final.moor)).all()


def test_dynamic_mooring_gates_fused_paths():
    sim = Simulation(_moored_spec("lumped_mass"), dt=0.05)
    with pytest.raises(NotImplementedError):
        sim.fused_builder()
    assert not sim.farm_fused_supported()


def test_dynamic_mooring_gradient_flows():
    """jax.grad through the whole coupled system (line EA scaling ->
    surge trajectory) — the design-loop surface for mooring optimization."""
    sim = Simulation(_moored_spec("lumped_mass"), dt=0.05)
    st = sim.init_state()
    st = dataclasses.replace(st, pos=st.pos.at[0, 0].add(2.0))

    def surge_after(k):
        params = jax.tree.map(lambda x: x, sim.params)
        params["_const"]["moor_dyn"]["EA"] = (
            params["_const"]["moor_dyn"]["EA"] * k)
        _, tr = sim.run(20, state=st, params=params)
        return tr["pos"][-1, 0, 0]

    g = jax.grad(surge_after)(jnp.float64(1.0))
    assert np.isfinite(float(g))


def test_checkpoint_roundtrip_with_moor_state(tmp_path):
    """Dynamic node state rides State.moor: a checkpoint/resume split run
    is bit-exact against the unbroken run."""
    from hydrochrono_tpu.utils.checkpoint import (load_checkpoint,
                                                  save_checkpoint)

    sim = Simulation(_moored_spec("lumped_mass"), dt=0.05)
    st = sim.init_state()
    st = dataclasses.replace(st, pos=st.pos.at[0, 0].add(2.0))
    run = jax.jit(lambda s, n, k: sim.run(n, state=s, start_step=k),
                  static_argnums=(1, 2))
    final_a, _ = run(st, 40, 0)

    mid, _ = run(st, 20, 0)
    path = save_checkpoint(str(tmp_path / "ck"), mid, 20)
    mid2, step = load_checkpoint(path, dtype=st.pos.dtype)
    assert step == 20
    final_b, _ = run(mid2, 20, 20)
    np.testing.assert_array_equal(np.asarray(final_a.pos),
                                  np.asarray(final_b.pos))
    np.testing.assert_array_equal(np.asarray(final_a.moor),
                                  np.asarray(final_b.moor))


def test_dynamic_moordyn_yaml_end_to_end(tmp_path):
    """`dynamics: lumped_mass` in the hydro-YAML moordyn block switches the
    CLI run onto the dynamic line model; the results file carries the
    in-step tension channel tagged lumped-mass-dynamic."""
    import os
    import textwrap

    from hydrochrono_tpu import cli

    sphere_h5 = "/root/reference/demos/sphere/hydroData/sphere.h5"
    if not os.path.exists(sphere_h5):
        pytest.skip("sphere.h5 unavailable")

    case = tmp_path / "moored_dyn"
    (case / "inputs" / "mooring").mkdir(parents=True)
    (case / "inputs" / "m.setup.yaml").write_text(textwrap.dedent("""\
        model_file: m.model.yaml
        simulation_file: m.simulation.yaml
        hydro_file: m.hydro.yaml
        output_directory: ../outputs
    """))
    (case / "inputs" / "m.model.yaml").write_text(textwrap.dedent("""\
        chrono-version: 9.0
        model:
          name: moored_sphere_dyn
          angle_degrees: false
          bodies:
            - name: body1
              location: [0, 0, -1.5]
              mass: 261800.0
              fixed: false
              inertia:
                moments: [1e6, 1e6, 1e6]
                products: [0, 0, 0]
    """))
    (case / "inputs" / "m.simulation.yaml").write_text(textwrap.dedent("""\
        chrono-version: 9.0
        simulation:
          contact_method: SMC
          time_step: 0.015
          end_time: 1.5
          gravity: [0, 0, -9.81]
          integrator:
            type: EULER_IMPLICIT_LINEARIZED
    """))
    (case / "inputs" / "m.hydro.yaml").write_text(textwrap.dedent("""\
        hydrodynamics:
          bodies:
            - name: body1
              h5_file: %s
          waves:
            type: still
          moordyn:
            enabled: true
            input_file: mooring/lines.txt
            bodies: [body1]
            dynamics: lumped_mass
            nsegs: 10
    """ % sphere_h5))
    (case / "inputs" / "mooring" / "lines.txt").write_text(textwrap.dedent("""\
        --------------------- MoorDyn Input File -------------------
        Dynamic mooring for the moored-sphere test
        ----------------------- LINE TYPES -------------------------
        TypeName  Diam   Mass/m  EA        BA/-zeta
        (name)    (m)    (kg/m)  (N)       (N-s/-)
        chain     0.09   77.7    3.842E8   -0.8
        ---------------------- POINTS -------------------------------
        ID  Attachment  X      Y     Z      M  V  CdA  Ca
        1   Fixed       60.0   0.0  -40.0   0  0  0    0
        2   Vessel     -60.0   0.0  -40.0   0  0  0    0
        3   Fixed        2.5   0.0  -2.5    0  0  0    0
        4   Vessel      -2.5   0.0  -2.5    0  0  0    0
        ---------------------- LINES --------------------------------
        ID  LineType  AttachA  AttachB  UnstrLen  NumSegs  Outputs
        1   chain     1        4        75.0      20       -
        2   chain     3        2        75.0      20       -
        ---------------------- OPTIONS ------------------------------
        40.0   wtrdpth
        ---------------------- need this line -----------------------
    """))

    rc = cli.main([str(case / "inputs"), "--quiet",
                   "--output-h5", str(case / "out")])
    assert rc == 0
    import h5py

    with h5py.File(str(case / "out" / "results.still.h5"), "r") as f:
        z = f["results/model/bodies/body1/position"][:, 2]
        g1 = f["results/model/moorings/line1"]
        assert g1.attrs["type"] == "lumped-mass-dynamic"
        t1 = g1["tension_mag"][:]
        t2 = f["results/model/moorings/line2/tension_mag"][:]
    assert np.isfinite(z).all()
    assert np.isfinite(t1).all() and np.isfinite(t2).all()
    assert t1.min() > 0 and t2.min() > 0


def test_parser_dynamic_columns(tmp_path):
    """NumSegs + BA columns flow from a MoorDyn v2 file into the line
    spec (consumed by the dynamic model, ignored quasi-statically)."""
    p = tmp_path / "lines.txt"
    p.write_text("""
--------------------- LINE TYPES ---------------------
TypeName  Diam   Mass/m   EA        BA/-zeta
(-)       (m)    (kg/m)   (N)       (N-s/-)
chain     0.09   77.7     3.84E8    -1.0
---------------------- POINTS ------------------------
ID  Attachment  X      Y     Z
(-) (-)         (m)    (m)   (m)
1   Fixed       120.0  0.0   -50.0
2   Vessel      2.0    0.0   -1.0
---------------------- LINES -------------------------
ID  LineType  AttachA  AttachB  UnstrLen  NumSegs  Outputs
(-) (-)       (-)      (-)      (m)       (-)      (-)
1   chain     1        2        128.0     24       -
---------------------- OPTIONS -----------------------
50.0   wtrdpth
------------------------- need this line --------------
""")
    spec = moor.parse_moordyn_file(str(p), ["float"])
    ln = spec.lines[0]
    assert ln.nsegs == 24
    assert ln.ba == -1.0
    assert ln.mass_per_m == 77.7
    assert ln.diam == 0.09
    assert spec.dyn_options["water_depth"] == 50.0


# ---------------------------------------------------------------------------
# wave kinematics on line nodes (round 5)
# ---------------------------------------------------------------------------

def _wave_consts(xf=110.0, L=140.0, depth=50.0, dt=0.05,
                 amp=1.5, omega=0.7, heading=0.0):
    """Line consts with regular-wave component tables attached."""
    from hydrochrono_tpu.physics import waves as wv

    md = _line_consts(xf, L, depth=depth, dt=dt)
    wave = wv.RegularWave(amplitude=amp, omega=omega, direction=heading)
    wk_meta, wk_arr = mdyn.wave_kinematics_arrays(
        wave, None, depth, 9.81, dtype=jnp.float64)
    assert wk_meta is not None
    return {**md, **wk_meta, **wk_arr}, wave


def test_water_kinematics_matches_airy_oracle():
    """_water_kinematics reproduces the reference-cited Airy profiles of
    physics/kinematics.py (velocity AND acceleration, finite depth and
    deep water) at submerged node positions."""
    from hydrochrono_tpu.physics import kinematics as kin
    from hydrochrono_tpu.physics import waves as wv

    amp, omega = 1.2, 0.9
    rng = np.random.default_rng(3)
    pos = np.stack([rng.uniform(-40, 40, 12), rng.uniform(-40, 40, 12),
                    rng.uniform(-45.0, -0.5, 12)], axis=-1)
    for depth in (50.0, np.inf):
        k = float(wv.compute_wavenumber(np.array([omega]), depth, 9.81)[0])
        wave = wv.RegularWave(amplitude=amp, omega=omega)
        meta, arr = mdyn.wave_kinematics_arrays(
            wave, None, depth, 9.81, dtype=jnp.float64)
        consts = {**meta, **arr}
        for t in (0.0, 3.7):
            u, a = mdyn._water_kinematics(consts, jnp.asarray(pos), t)
            d_kin = depth if np.isfinite(depth) else 1.0e5
            u_ref = kin.water_velocity_regular(
                jnp.asarray(pos), t, omega, amp, 0.0, k, d_kin)
            a_ref = kin.water_acceleration_regular(
                jnp.asarray(pos), t, omega, amp, 0.0, k, d_kin)
            np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                       rtol=1e-9, atol=1e-12)
            np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref),
                                       rtol=1e-9, atol=1e-12)


def test_line_wave_loading_bounded_and_periodic():
    """Energy sanity of the line wave loading (VERDICT r4 item 6): a line
    with a FIXED fairlead in a regular sea stays bounded over many wave
    periods (drag on the relative flow dissipates — no spurious energy
    pumping), its fairlead tension actually responds at wave scale, and
    the time-mean tension stays near the still-water equilibrium."""
    depth, dt = 50.0, 0.05
    md_w, wave = _wave_consts(depth=depth, dt=dt, amp=1.5, omega=0.7)
    pf = jnp.asarray([[110.0, 0.0, 0.0]])
    nodes = jnp.asarray(mdyn.init_line_nodes(md_w, np.asarray(pf)))
    # settle under waves first (transient rings down via drag + BA)
    nodes = _relax(md_w, nodes, pf, dt, 1200)

    period = 2 * np.pi / 0.7
    nsteps = int(6 * period / dt)
    adv = jax.jit(lambda nd, k: mdyn.advance_lines(
        md_w, nd, pf, pf, dt, t0=1200 * dt + k * dt))
    tens = []
    for k in range(nsteps):
        nodes = adv(nodes, k)
        if k % 4 == 0:
            tens.append(float(mdyn.line_tensions(md_w, nodes)[0][0]))
    tens = np.array(tens)
    assert np.isfinite(np.asarray(nodes)).all()
    assert np.isfinite(tens).all()

    # still-water equilibrium tension for the same geometry
    md0 = _line_consts(110.0, 140.0, depth=depth, dt=dt)
    n0 = _relax(md0, jnp.asarray(mdyn.init_line_nodes(md0, np.asarray(pf))),
                pf, dt, 2500)
    t_still = float(mdyn.line_tensions(md0, n0)[0][0])

    # waves must actually load the line (measured response 0.47% of
    # pretension for this 0.09 m chain at 44.6 kN — drag+inertia on the
    # wave-zone span)...
    assert tens.std() > 0.003 * t_still
    # ...without drifting the mean (measured 4e-5) or blowing the envelope
    assert abs(tens.mean() - t_still) / t_still < 0.02
    assert tens.max() < 1.5 * t_still


def test_oc3_hywind_published_surge_stiffness_and_pretension():
    """External anchor (VERDICT r4 item 6): the OC3-Hywind mooring system
    (Jonkman, NREL/TP-500-47535: depth 320 m, 3 lines at 120 deg, fairlead
    radius 5.2 m / depth 70 m, anchor radius 853.87 m, L=902.2 m,
    w=698.094 N/m, EA=384.243e6 N). The report's linearized surge
    restoring stiffness about the undisplaced position is 41,180 N/m.
    The repo catenary reproduces it to <1% (measured 41,184.7), and the
    dynamic lumped-mass init profile reproduces the same fairlead
    pretension (~911 kN) at full ocean scale."""
    L, w, EA = 902.2, 698.094, 384.243e6
    zf, r_f, r_a = 320.0 - 70.0, 5.2, 853.87

    def surge_force(x):
        F = 0.0
        for th in (0.0, 2 * np.pi / 3, 4 * np.pi / 3):
            dx = x + r_f * np.cos(th) - r_a * np.cos(th)
            dy = r_f * np.sin(th) - r_a * np.sin(th)
            xf = np.hypot(dx, dy)
            H, V = (float(np.asarray(v)[0]) for v in moor.catenary_hv(
                jnp.asarray([xf]), jnp.asarray([zf]), jnp.asarray([L]),
                jnp.asarray([w]), jnp.asarray([EA]), jnp.asarray([True])))
            F += -H * dx / xf
        return F, H, V

    _, H0, V0 = surge_force(0.0)
    t_fair = np.hypot(H0, V0)
    # published linearized surge stiffness: 41,180 N/m
    dx = 0.5
    k = -(surge_force(dx)[0] - surge_force(-dx)[0]) / (2 * dx)
    assert abs(k - 41180.0) / 41180.0 < 0.01

    # dynamic-model init at full scale starts on the same equilibrium:
    # immediate fairlead force within 2% of the catenary pretension
    line = moor.MooringLine(
        body=0, anchor=(r_a - r_f, 0.0, -zf), fairlead=(0.0, 0.0, 0.0),
        length=L, nsegs=40, weight_per_m=w, ea=EA,
        mass_per_m=77.7066, diam=0.09)
    spec = moor.MooringSpec(lines=(line,), dynamics="lumped_mass")
    meta, arrays = mdyn.build_dynamic_consts(
        spec, np.array([[r_a - r_f, 0.0, -zf]]), 0.05,
        mdyn.DynamicLineOptions(water_depth=zf), dtype=jnp.float64)
    md = {**meta, **arrays}
    pf = jnp.zeros((1, 3), jnp.float64)
    nodes = jnp.asarray(mdyn.init_line_nodes(md, np.asarray(pf)))
    f = np.asarray(mdyn.fairlead_force(md, nodes, pf, jnp.zeros_like(pf)))
    t_dyn = np.hypot(f[0, 0], f[0, 2] + 0.5 * w * L / md["N"])
    assert abs(t_dyn - t_fair) / t_fair < 0.02


def test_stepper_attaches_wave_kinematics_to_lines():
    """A moored simulation with a regular wave attaches the component
    tables to the line consts; the coupled run stays finite and the wave
    loading on the lines actually perturbs the body trajectory vs still
    water (the body itself has no hydro here — the lines are the only
    wave-force path)."""
    from hydrochrono_tpu.physics import waves as wv

    spec = _moored_spec("lumped_mass")
    wave = wv.RegularWave(amplitude=1.5, omega=0.7)
    sim_w = Simulation(spec, dt=0.02, wave=wave, dtype=jnp.float64)
    assert sim_w.moor_dyn_meta.get("wave_kin") is True
    sim_0 = Simulation(spec, dt=0.02, dtype=jnp.float64)
    assert "wave_kin" not in sim_0.moor_dyn_meta

    n = 400
    fw, _ = sim_w.run(n)
    f0, _ = sim_0.run(n)
    pw, p0 = np.asarray(fw.pos), np.asarray(f0.pos)
    assert np.isfinite(pw).all() and np.isfinite(np.asarray(fw.moor)).all()
    # wave loading via the lines moved the buoy (cm scale), but kept the
    # response bounded
    dev = np.abs(pw[0] - p0[0]).max()
    assert 1e-4 < dev < 1.0
