"""Test harness config.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
logic (mesh, NamedSharding, collectives) is exercised without TPU pods —
the SURVEY.md §4 strategy.

Note: this container's sitecustomize imports jax and points it at a remote
TPU tunnel (JAX_PLATFORMS=axon) before any test code runs, so plain env-var
exports are too late — we must override through jax.config before the
backend is initialized. Unit tests over the tunnel are pathologically slow
(every host sync is a network round trip), so forcing CPU here is
mandatory, not cosmetic.
"""

import os
import sys

# XLA reads this at (lazy) backend init, which has not happened yet.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (already in sys.modules via sitecustomize)

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_sessionstart(session):
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"


# ---- fast/slow tiers (VERDICT r3 item 9) -----------------------------------
# Core correctness runs in `pytest -m "not slow"` (~5 min on this box);
# kernel-interpret parity suites, ladders, and multi-iteration integration
# tests are marked slow (measured >=5s each on the dev box). The full
# suite stays the default for `pytest tests/`.

_SLOW = {
    ("test_selfplay_mesh.py", "test_sharded_learner_full_state_resume"),
    ("test_selfplay_mesh.py", "test_selfplay_sharded_learner_end_to_end"),
    ("test_train_dqn.py", "test_bucketed_rotation_reaches_starved_members"),
    ("test_sharded_learner.py", "test_sharded_dqn_matches_emulation"),
    ("test_sharded_learner.py", "test_sharded_drqn_burn_in_runs"),
    ("test_sharded_learner.py", "test_sharded_drqn_matches_emulation"),
    ("test_sharded_learner.py",
     "test_sharded_drqn_ep_count_matches_replicated"),
    ("test_actor_rollout.py", "test_chunk_boundary_rebinding_reaches_pool"),
    ("test_actor_rollout.py", "test_learner_integration_pallas_path"),
    ("test_actor_rollout.py", "test_matches_xla_greedy_before_resets"),
    ("test_distributed.py", "test_two_process_spmd_train_iteration"),
    ("test_dqn_update_kernel.py", "test_block_push_slice_and_sample_parity"),
    ("test_dqn_update_kernel.py", "test_kernel_matches_autodiff"),
    ("test_dqn_update_kernel.py", "test_learner_paths_match"),
    ("test_drqn_mesh.py", "test_sharded_drqn_iteration"),
    ("test_drqn_mesh.py", "test_sharded_drqn_matches_unsharded_numerics"),
    ("test_drqn_mesh.py",
     "test_multichip_fused_drqn_update_matches_single_chip"),
    ("test_drqn_update_kernel.py", "test_kernel_matches_autodiff"),
    ("test_fast_eval.py",
     "test_balanced_win_rate_agrees_with_balanced_match_runner"),
    ("test_fast_eval.py", "test_win_rate_agrees_with_match_runner"),
    ("test_orbax_and_debug.py", "test_full_train_state_roundtrip"),
    ("test_orbax_and_debug.py", "test_sharded_mesh_roundtrip"),
    ("test_recurrent_rollout.py", "test_matches_xla_greedy_before_resets"),
    ("test_recurrent_rollout.py",
     "test_pallas_vs_xla_paths_both_learn_and_count"),
    ("test_recurrent_rollout.py", "test_ring_rows_stay_per_env_under_sorting"),
    ("test_recurrent_rollout.py", "test_stats_and_epsilon_one"),
    ("test_replay.py", "test_push_ring_and_max_priority"),
    ("test_replay.py", "test_sample_respects_fill_level"),
    ("test_replay.py", "test_sampling_two_level_distribution"),
    ("test_retention.py", "test_dqn_soft_target_updates_every_step"),
    ("test_retention.py", "test_drqn_soft_target_matches_manual_polyak"),
    ("test_retention.py", "test_selfplay_retention_wired"),
    ("test_scaling_bench.py", "test_ladder_runs_and_reports"),
    ("test_podrun_recipe.py", "test_podrun_cli_contract"),
    ("test_selfplay.py", "test_fault_path_resets_learner"),
    ("test_selfplay.py", "test_frozen_a_stale_noise_knob"),
    ("test_selfplay.py", "test_promotion_path"),
    ("test_selfplay.py", "test_tier0_full_state_resume_mid_generation"),
    ("test_selfplay.py", "test_warm_start_from_checkpoint"),
    ("test_selfplay_mesh.py", "test_selfplay_runs_sharded_over_mesh"),
    ("test_selfplay_rnn.py", "test_fault_keeps_buffer_and_resets_b"),
    ("test_selfplay_rnn.py", "test_promotion_appends_pool_and_autosaves"),
    ("test_selfplay_rnn.py", "test_tier1_mid_generation_resume_keeps_b"),
    ("test_selfplay_rnn.py", "test_tier1_restore_resumes_counters"),
    ("test_selfplay_rnn.py", "test_tier2_restore_from_init_path"),
    ("test_seq_push_rollout.py", "test_bulk_admission_counting"),
    ("test_seq_push_rollout.py", "test_bulk_equals_stepwise"),
    ("test_seq_push_rollout.py",
     "test_bulk_equals_stepwise_with_episode_directory"),
    ("test_seq_push_rollout.py",
     "test_bulk_equals_stepwise_with_wrap_and_carryover"),
    ("test_sequence_replay.py",
     "test_episode_uniform_matches_reference_distribution"),
    ("test_sequence_replay.py",
     "test_episode_uniform_rejects_stale_directory_records"),
    ("test_sequence_replay.py", "test_inflight_episode_excluded"),
    ("test_sequence_replay.py", "test_ring_wrap_invalidates_stale_windows"),
    ("test_sharding.py", "test_sharded_matches_unsharded_numerics"),
    ("test_sharding.py", "test_multichip_fused_update_matches_single_chip"),
    ("test_tournaments.py", "test_arena_registers_new_models_incrementally"),
    ("test_tournaments.py", "test_arena_resumable"),
    ("test_tournaments.py", "test_arena_save_every_kill_and_resume"),
    ("test_tournaments.py", "test_batched_pairs_bit_identical_to_sequential"),
    ("test_tournaments.py", "test_round_robin_outputs"),
    ("test_train_dqn.py", "test_determinism_same_seed"),
    ("test_train_dqn.py", "test_train_iteration_runs_and_counts"),
    ("test_train_dqn.py", "test_bucketed_binding_mixes_opponents"),
    ("test_train_drqn.py", "test_drqn_burn_in"),
    ("test_train_drqn.py", "test_drqn_determinism"),
    ("test_train_drqn.py", "test_drqn_hidden_resets_on_done"),
    ("test_train_drqn.py", "test_drqn_iteration_runs_and_learns"),
    ("test_train_drqn.py", "test_drqn_rnn_pool_opponents"),
    ("test_train_drqn.py", "test_episode_uniform_sampling_end_to_end"),
    ("test_train_drqn.py", "test_generation_rollover_and_reset"),
    ("test_train_drqn.py", "test_training_start_gate_boundary"),
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: >=5s on the dev box; `pytest -m 'not slow'` is the ~5 min "
        "core-correctness tier",
    )


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        module = item.nodeid.split("::")[0].rsplit("/", 1)[-1]
        name = item.name.split("[", 1)[0]
        if (module, name) in _SLOW:
            item.add_marker(pytest.mark.slow)
