"""TPU float32 path vs the reference golden trajectories (the gates so far
ran on CPU float64 — this closes the loop on the production TPU config)."""
import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from hydrochrono_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
from hydrochrono_tpu.io.bemio import load_bemio_h5
from hydrochrono_tpu.physics.system import Body, Joint, TSDA, HydroAttachment, SystemSpec
from hydrochrono_tpu.physics.waves import RegularWave, IrregularWaveParams
from hydrochrono_tpu.stepper import Simulation
from hydrochrono_tpu.parallel.sharding import make_batched_states

H5='/root/reference/demos/sphere/hydroData/sphere.h5'
hydro = load_bemio_h5(H5, 1)

# 1) decay, f32, blocked
spec = SystemSpec(bodies=[Body("body1", 261.8e3, (0,0,-1.0))],
                  hydro=HydroAttachment(hydro, [0]), gravity=(0,0,-9.81))
sim = Simulation(spec, dt=0.015, dtype=jnp.float32, block_size=128)
ref = np.loadtxt('/root/reference/tests/regression/reference_data/sphere/decay/hc_ref_sphere_decay.txt', skiprows=1)
n = ref.shape[0]
_, traj = jax.jit(lambda p: sim.run(2688, params=p))(sim.params)
z = np.asarray(traj["pos"][:n,0,2], dtype=np.float64)
d = z - ref[:,1]
print(f"decay f32 blocked: L2={np.linalg.norm(d)/n:.2e} Linf={np.abs(d).max():.2e} (gates 1e-4 / 0.02)")

# 2) reg waves, 10 cases batched f32
AMPS = [0.177,0.314,0.380,0.491,0.706,0.961,1.256,1.589,1.962,2.374]
OMEGAS = [2.094395102,1.570796327,1.427996661,1.256637061,1.047197551,0.897597901,0.785398163,0.698131701,0.628318531,0.571198664]
DAMP = [398736.034,118149.758,90080.857,161048.558,322292.419,479668.979,633979.761,784083.286,932117.647,1077123.445]
spec2 = SystemSpec(
    bodies=[Body("body1", 261.8e3, (0,0,-2.0)), Body("ground", 999.0, (0,0,-5.0), fixed=True)],
    joints=[Joint("prismatic", 0, 1, location=(0,0,-2.0), axis=(0,0,1))],
    tsdas=[TSDA(0, 1, (0,0,-2.0), (0,0,-5.0))],
    hydro=HydroAttachment(hydro, [0]), gravity=(0,0,-9.81))
sim2 = Simulation(spec2, dt=0.015, dtype=jnp.float32, block_size=128,
                  wave=RegularWave(amplitude=np.asarray(AMPS), omega=np.asarray(OMEGAS)))
batched = {k: sim2.params[k] for k in ("reg_mag","reg_phase","reg_amp","reg_omega")}
batched["tsda_c"] = jnp.asarray(DAMP)[:, None]
n2 = 40064
_, trajs = sim2.run_batch(n2, batched)
zs = np.asarray(trajs["pos"][:, :, 0, 2], dtype=np.float64)
worst = (0,0)
for i in range(10):
    refp = np.loadtxt(f'/root/reference/tests/regression/reference_data/sphere/reg_waves/hc_ref_sphere_reg_waves_{i+1}.txt', skiprows=5)
    m = min(len(refp), n2)
    d = zs[i][:m] - refp[:m,1]
    l2, li = np.linalg.norm(d)/m, np.abs(d).max()
    worst = max(worst, (l2, li))
    status = "PASS" if (l2<=1e-4 and li<=0.02) else "FAIL"
    print(f"reg case {i+1}: L2={l2:.2e} Linf={li:.2e} {status}")

# 3) FUSED Pallas path gates (the bench.py production path)
_, traj_f = jax.jit(lambda s, p: sim.run_blocked_fused(2688, s, params=p))(
    make_batched_states(sim, 2), sim.params)
zf = np.asarray(traj_f["pos"][0, :n, 0, 2], dtype=np.float64)
d = zf - ref[:, 1]
print(f"decay f32 FUSED:   L2={np.linalg.norm(d)/n:.2e} Linf={np.abs(d).max():.2e} (gates 1e-4 / 0.02)")

# all 10 IEA reg-wave cases in ONE fused batched program (per-instance wave
# params + PTO damping ride the kernel's bvec operand)
sim3 = Simulation(spec2, dt=0.015, dtype=jnp.float32, block_size=128,
                  wave=RegularWave(amplitude=np.asarray(AMPS), omega=np.asarray(OMEGAS)))
p3 = dict(sim3.params)
p3["tsda_c"] = jnp.asarray(DAMP, jnp.float32)[:, None]
_, traj3 = jax.jit(lambda s, p: sim3.run_blocked_fused(n2, s, params=p))(
    make_batched_states(sim3, 10), p3)
z3 = np.asarray(traj3["pos"][:, :, 0, 2], dtype=np.float64)
for i in range(10):
    refp = np.loadtxt(f'/root/reference/tests/regression/reference_data/sphere/reg_waves/hc_ref_sphere_reg_waves_{i+1}.txt', skiprows=5)
    m = min(len(refp), n2)
    d = z3[i][:m] - refp[:m, 1]
    l2, li = np.linalg.norm(d)/m, np.abs(d).max()
    print(f"reg case {i+1} FUSED:  L2={l2:.2e} Linf={li:.2e} {'PASS' if (l2<=1e-4 and li<=0.02) else 'FAIL'}")

# 4) fused HHT gate (round 3): the iea_sphere YAML decay (the reference's
# flagship HHT pipeline) driven through the CLI on the TPU fused path,
# compared against the Chrono-generated expected H5
import shutil, subprocess, tempfile
import h5py
case_root = '/root/reference/tests/regression/run_hydrochrono/iea_sphere'
case_src = os.path.join(case_root, 'decay')
if os.path.exists(os.path.join(case_src, 'expected', 'results.still.h5')):
    with tempfile.TemporaryDirectory() as td:
        # the decay case resolves ../assets/hydroData/*.h5 — copy the tree
        shutil.copytree(case_root, os.path.join(td, 'iea_sphere'))
        from hydrochrono_tpu import cli as _cli
        rc = _cli.main([os.path.join(td, 'iea_sphere', 'decay', 'inputs'),
                        '--quiet', '--output-h5', os.path.join(td, 'out')])
        assert rc == 0, f"iea_sphere CLI run failed rc={rc}"
        with h5py.File(os.path.join(td, 'out', 'results.still.h5')) as f:
            z = f['results/model/bodies/body1/position'][:, 2]
        with h5py.File(os.path.join(case_src, 'expected', 'results.still.h5')) as f:
            ze = f['results/model/bodies/body1/position'][:, 2]
        m = min(len(z), len(ze))
        d = z[:m].astype(np.float64) - ze[:m].astype(np.float64)
        l2, li = np.linalg.norm(d) / m, np.abs(d).max()
        print(f"iea_sphere HHT FUSED CLI: L2={l2:.2e} Linf={li:.2e} "
              f"{'PASS' if (l2 <= 1e-4 and li <= 0.02) else 'FAIL'}")

# 5) moored RM3 YAML case (round 3) on the fused path vs its f64 baseline
moored_dir = os.path.join(os.path.dirname(__file__), '..', 'cases', 'rm3', 'moored')
if os.path.exists(os.path.join(moored_dir, 'expected', 'results.still.h5')):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'cases'))
    from gen_assets import ensure_assets
    ensure_assets()
    import tempfile as _tf
    with _tf.TemporaryDirectory() as td:
        from hydrochrono_tpu import cli as _cli
        rc = _cli.main([os.path.join(moored_dir, 'inputs'), '--quiet',
                        '--output-h5', os.path.join(td, 'out')])
        assert rc == 0
        with h5py.File(os.path.join(td, 'out', 'results.still.h5')) as f:
            z = f['results/model/bodies/body1/position'][:, 2]
        with h5py.File(os.path.join(moored_dir, 'expected', 'results.still.h5')) as f:
            ze = f['results/model/bodies/body1/position'][:, 2]
        m = min(len(z), len(ze))
        d = z[:m].astype(np.float64) - ze[:m].astype(np.float64)
        l2, li = np.linalg.norm(d) / m, np.abs(d).max()
        print(f"rm3 moored FUSED CLI:    L2={l2:.2e} Linf={li:.2e} "
              f"{'PASS' if (l2 <= 1e-4 and li <= 0.02) else 'FAIL'}")

# 6) bf16 far-field margins (round 3, VERDICT item 2): quantify the golden
# gate margin with the Hankel far kernel in bfloat16 — the only remaining
# far-field lever (the f32 matmul sits at the f32 MXU roofline, PERF.md).
sim_bf = Simulation(spec, dt=0.015, dtype=jnp.float32, block_size=128,
                    far_dtype=jnp.bfloat16)
_, traj_bf = jax.jit(lambda s, p: sim_bf.run_blocked_fused(2688, s, params=p))(
    make_batched_states(sim_bf, 2), sim_bf.params)
zb = np.asarray(traj_bf["pos"][0, :n, 0, 2], dtype=np.float64)
d = zb - ref[:, 1]
l2, li = np.linalg.norm(d)/n, np.abs(d).max()
print(f"decay f32 FUSED bf16-far: L2={l2:.2e} Linf={li:.2e} "
      f"(gate margin {1e-4/max(l2,1e-300):.0f}x / {0.02/max(li,1e-300):.0f}x) "
      f"{'PASS' if (l2<=1e-4 and li<=0.02) else 'FAIL'}")

# 7) ERA radiation gates (round 3 continuation): the shared-pole realization
# (physics/era.py) on the production fused path — decay + all 10 IEA
# reg-wave cases vs the same reference goldens. ERA is an approximation
# mode (fit error ~1e-4 of the kernel), so the margins quantify fitness.
sim_era = Simulation(spec, dt=0.015, dtype=jnp.float32, block_size=128,
                     radiation="era", era_tol=1e-6)
_, traj_e = jax.jit(lambda s, p: sim_era.run_blocked_fused(2688, s, params=p))(
    make_batched_states(sim_era, 2), sim_era.params)
zev = np.asarray(traj_e["pos"][0, :n, 0, 2], dtype=np.float64)
d = zev - ref[:, 1]
l2, li = np.linalg.norm(d)/n, np.abs(d).max()
print(f"decay f32 FUSED ERA (M={sim_era.era_order}): L2={l2:.2e} Linf={li:.2e} "
      f"(gate margin {1e-4/max(l2,1e-300):.0f}x / {0.02/max(li,1e-300):.0f}x) "
      f"{'PASS' if (l2<=1e-4 and li<=0.02) else 'FAIL'}")

sim3e = Simulation(spec2, dt=0.015, dtype=jnp.float32, block_size=128,
                   radiation="era", era_tol=1e-6,
                   wave=RegularWave(amplitude=np.asarray(AMPS),
                                    omega=np.asarray(OMEGAS)))
p3e = dict(sim3e.params)
p3e["tsda_c"] = jnp.asarray(DAMP, jnp.float32)[:, None]
_, traj3e = jax.jit(lambda s, p: sim3e.run_blocked_fused(n2, s, params=p))(
    make_batched_states(sim3e, 10), p3e)
z3e = np.asarray(traj3e["pos"][:, :, 0, 2], dtype=np.float64)
for i in range(10):
    refp = np.loadtxt(f'/root/reference/tests/regression/reference_data/sphere/reg_waves/hc_ref_sphere_reg_waves_{i+1}.txt', skiprows=5)
    m = min(len(refp), n2)
    d = z3e[i][:m] - refp[:m, 1]
    l2, li = np.linalg.norm(d)/m, np.abs(d).max()
    print(f"reg case {i+1} FUSED ERA:  L2={l2:.2e} Linf={li:.2e} {'PASS' if (l2<=1e-4 and li<=0.02) else 'FAIL'}")

# 8) WHOLE-RUN fused ERA kernel gates (round 4): the entire time loop in
# one pallas_call (stepper.run_fused_era) vs the same reference goldens —
# sphere decay (NoWave, no excitation stream) and IEA reg-wave case 5.
assert sim_era.fused_wholerun_supported()
_, traj_w = jax.jit(lambda s: sim_era.run_fused_era(2688, s))(
    make_batched_states(sim_era, 2))
zw = np.asarray(traj_w["pos"][0, :n, 0, 2], dtype=np.float64)
d = zw - ref[:, 1]
l2, li = np.linalg.norm(d)/n, np.abs(d).max()
print(f"decay f32 WHOLERUN ERA (M={sim_era.era_order}): L2={l2:.2e} "
      f"Linf={li:.2e} (gate margin {1e-4/max(l2,1e-300):.0f}x / "
      f"{0.02/max(li,1e-300):.0f}x) "
      f"{'PASS' if (l2<=1e-4 and li<=0.02) else 'FAIL'}")

i5 = 4  # IEA case 5 (mid-resonance)
sim_w5 = Simulation(spec2, dt=0.015, dtype=jnp.float32,
                    radiation="era", era_tol=1e-6,
                    wave=RegularWave(amplitude=AMPS[i5], omega=OMEGAS[i5]))
p5 = dict(sim_w5.params)
p5["tsda_c"] = jnp.asarray([DAMP[i5]], jnp.float32)
assert sim_w5.fused_wholerun_supported()
_, traj_w5 = jax.jit(lambda s: sim_w5.run_fused_era(n2, s, params=p5))(
    make_batched_states(sim_w5, 2))
zw5 = np.asarray(traj_w5["pos"][0, :, 0, 2], dtype=np.float64)
refp = np.loadtxt(f'/root/reference/tests/regression/reference_data/sphere/reg_waves/hc_ref_sphere_reg_waves_{i5+1}.txt', skiprows=5)
m = min(len(refp), n2)
d = zw5[:m] - refp[:m, 1]
l2, li = np.linalg.norm(d)/m, np.abs(d).max()
print(f"reg case {i5+1} WHOLERUN ERA: L2={l2:.2e} Linf={li:.2e} "
      f"{'PASS' if (l2<=1e-4 and li<=0.02) else 'FAIL'}")

# 9) CLI production wholerun path (round 5): the iea_sphere YAML decay with
# `--era` must EXECUTE the whole-run kernel from cli.run_case (step_path
# recorded in /meta/run) and still match the Chrono-generated expected H5 —
# the user-facing YAML surface takes the fastest gated path (VERDICT r4
# weak 4; replaces run_hydrochrono_from_yaml.cpp:716-764).
if os.path.exists(os.path.join(case_src, 'expected', 'results.still.h5')):
    with tempfile.TemporaryDirectory() as td:
        shutil.copytree(case_root, os.path.join(td, 'iea_sphere'))
        from hydrochrono_tpu import cli as _cli
        rc = _cli.main([os.path.join(td, 'iea_sphere', 'decay', 'inputs'),
                        '--quiet', '--era',
                        '--output-h5', os.path.join(td, 'out')])
        assert rc == 0, f"iea_sphere --era CLI run failed rc={rc}"
        with h5py.File(os.path.join(td, 'out', 'results.still.h5')) as f:
            z = f['results/model/bodies/body1/position'][:, 2]
            sp = f['meta/run'].attrs.get('step_path', '?')
        with h5py.File(os.path.join(case_src, 'expected', 'results.still.h5')) as f:
            ze = f['results/model/bodies/body1/position'][:, 2]
        m = min(len(z), len(ze))
        d = z[:m].astype(np.float64) - ze[:m].astype(np.float64)
        l2, li = np.linalg.norm(d) / m, np.abs(d).max()
        path_ok = sp == 'fused_wholerun_era'
        print(f"iea_sphere CLI --era [{sp}]: L2={l2:.2e} Linf={li:.2e} "
              f"{'PASS' if (l2 <= 1e-4 and li <= 0.02 and path_ok) else 'FAIL'}")
        assert path_ok, f"CLI took step_path={sp}, expected fused_wholerun_era"
