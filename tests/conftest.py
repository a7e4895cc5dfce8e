"""Test environment: run on CPU with 8 virtual devices.

Multi-chip sharding tests run against a virtual 8-device CPU mesh
(``xla_force_host_platform_device_count``) per SURVEY.md §4 — the reference
has no distributed tests; ours simulate the v5e-8 mesh without TPUs.

Note: this environment pins JAX_PLATFORMS=axon (tunneled TPU) from the
shell, and the axon plugin re-inserts itself even when the env var is
overridden — so we must force CPU via jax.config *before* any backend is
initialized. Running tests over the tunnel works but is ~100x slower.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# Fast/slow profiles (round-4 verdict weak #6: the full suite crept past
# 14 minutes and stops being run reflexively). The default inner loop is
#   python -m pytest tests/ -q -m "not slow"      (~3-4 min)
# and CI / pre-commit runs the FULL suite (no -m filter). Tests are
# marked centrally here (measured >8s each on the virtual-mesh CPU
# config) instead of per-file decorators so the set is auditable in one
# place; anything new that grows past ~10s belongs in this list.
SLOW_TESTS = {
    "test_epoch_blocks_trajectory_matches_refs",
    "test_epoch_refs_trajectory_matches_epoch",
    "test_from_files_trains_through_cli",
    "test_from_files_matches_host_prepared_cache",
    "test_with_state_false_same_output",
    "test_need_dx_false_same_weight_grads_zero_dx",
    "test_hoisted_projection_large_D",
    "test_large_hidden_hp256",
    "test_bf16_gradient_close",
    "test_backward_matches_scan",
    "test_lstm_grad_finite_difference",
    "test_text_blocks_trajectory_matches_host_onehot",
    "test_train_batch_block_exact_vs_refs_single_group",
    "test_parallel_multi_step_matches_single_device_blocks",
    "test_clstmocrtrain_and_clstmocr",
    "test_dryrun_multichip_8",
    "test_dryrun_multichip_driver_env",
    "test_sidecar_resume_continues_exact_trajectory",
    "test_mesh_resume_continues_exact_trajectory",
    "test_bidi_grad_finite_difference",
    "test_text_transduction_learns",
    "test_ocr_train_and_roundtrip",
    "test_device_prepare_padding_invariance",
    "test_apply_net_fused_vs_unfused",
    "test_train_step_with_augment_runs",
    "test_clstmfiltertrain_and_filter",
    "test_predict_batch_images_end_to_end",
    "test_clstmocrtrain_mesh_with_device_preprocess",
    "test_clstmocrtrain_mesh_trajectory_matches_single_device",
    "test_clstmocrtrain_mesh_blocks_trajectory_matches_single_device",
    "test_clstmocrtrain_mesh_with_augment_trains",
    "test_forward_matches_scan",
    "test_clstmfilter_batched_matches_single",
    "test_filtertrain_truncation_warning_matches_path",
    "test_train_loss_grads_unchanged_by_input_leaf_skip",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: >8s on the CPU virtual-mesh config; excluded "
        "from the fast inner-loop profile (-m 'not slow')")


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
