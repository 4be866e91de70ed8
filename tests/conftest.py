"""Test configuration: run JAX on a virtual 8-device CPU mesh with float64.

Accuracy validation against the reference golden trajectories needs float64;
multi-chip sharding tests need several devices. Both are CPU-side concerns —
the TPU path is exercised by bench.py / __graft_entry__.py on real hardware.
"""

import os

# force CPU for tests even if the session points JAX at a TPU platform
# (the environment may pre-import jax via sitecustomize, so set the config
# knob too — it works after import)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE = "/root/reference"

# Quick-tier marking: `pytest -m 'not slow'` targets < 10 measured minutes
# (re-timed round 4: ~9-10 min clean, ~30 min for the full suite).
# Regenerate this list from `pytest --durations=50`; everything >= ~20 s
# clean lands here (interpret-mode fused-kernel equivalence tests,
# subprocess harnesses, long goldens). Run the full tier (no -m filter)
# at least once per round and record the result in DEVNOTES.md.
SLOW_TESTS = {
    # round-5 re-tier (VERDICT r4 item 7): quick tier measured 1020 s at
    # 207 tests; these 21 (mostly interpret-mode fused equivalence +
    # long dynamic-mooring integrations) bring it to ~580 s measured
    # (186 tests). Every demoted feature keeps a cheaper quick
    # representative or a TPU golden gate.
    "test_wholerun_era_decay_nowave",
    "test_checkpoint_roundtrip_with_moor_state",
    "test_moored_body_dynamic_tracks_quasistatic",
    "test_blocked_era_fused_resume_bit_exact",
    "test_dynamic_mooring_gradient_flows",
    "test_farm_fused_era_matches_xla",
    "test_viscous_fused_hht_matches_xla",
    "test_farm_fused_spread_matches_xla",
    "test_blocked_era_golden_and_fused_equivalence",
    "test_fd_mooring_stiffness",
    "test_viscous_farm_kernel_matches_xla",
    "test_hht_guarded_chunks_match_unchunked",
    "test_hht_blocked_matches_per_step",
    "test_farm_fused_rejects_modified_baked_params",
    "test_viscous_gradient_flows",
    "test_blocked_hht_resume_bit_exact",
    "test_moored_body_dynamic_hht_runs",
    "test_fd_matches_td_constrained_sphere",
    "test_fd_constrained_farm",
    "test_viscous_fused_step_matches_xla",
    "test_blocked_matches_plain",
    # round-4 re-tier (VERDICT r3 item 9): measured top offenders
    "test_const_mass_hht_matches_general",
    "test_farm_fused_sharded_matches_unsharded",
    "test_mooring_snap_load_fused_matches_xla",
    "test_const_mass_constrained_matches_general",
    "test_snap_load_warm_core_tracks_polished",
    "test_era_gradient_matches_fd",
    "test_dryrun_multichip_hermetic",
    "test_constraint_drift_monitor",
    "test_farm_fused_constrained_matches_xla",
    "test_farm_fused_matches_xla",
    "test_const_mass_auto_enables_and_matches_general",
    "test_catenary_slack_taut_sweep_converges",
    "test_two_body_coupled_radiation_matches_oracle",
    "test_wholerun_era_irregular_matches_xla",
    "test_wholerun_era_inner_chunks",
    "test_wholerun_era_hht",
    "test_wholerun_era_moored",
    "test_fused_hht_subblock_regular",
    "test_fused_subblock_kernel_matches",
    "test_fused_hht_irregular",
    "test_fused_hht_batched_sweep",
    "test_fused_hht_resume",
    "test_fused_tsda_curves",
    "test_fused_rm3ish_irregular",
    "test_fused_batched_coefficients_and_wave_params",
    "test_fused_batched_eta",
    "test_fused_revolute_fixed_rsda_regular",
    "test_sphere_irreg_waves_matches_reference",
    "test_moored_body_simulation_and_grad",
    "test_slider_crank_yaml_case",
    "test_case_library_end_to_end",
    "test_fused_runner_sharded_matches_unsharded",
    "test_gradient_through_simulation",
    "test_f3of_dt1_locked_flaps",
    "test_f3of_dt3_flap_decay",
    "test_batched_seeds_irregular",
    "test_run_tests_harness",
    "test_mooring_fused_path_matches_xla",
    "test_pto_power_peaks_at_rao_optimum",
    "test_const_mass_constrained_hht_matches_general",
    "test_moordyn_yaml_end_to_end",
    "test_const_mass_constrained_rotating_jacobian",
    "test_remat_gradients_match",
    "test_farm32_era_scale",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if getattr(item, "originalname", item.name) in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def sphere_h5():
    path = os.path.join(REFERENCE, "demos/sphere/hydroData/sphere.h5")
    if not os.path.exists(path):
        pytest.skip("sphere.h5 reference data not available")
    return path


@pytest.fixture(scope="session")
def reference_data_dir():
    d = os.path.join(REFERENCE, "tests/regression/reference_data")
    if not os.path.isdir(d):
        pytest.skip("reference regression data not available")
    return d
