"""Test configuration: force an 8-virtual-device CPU platform so sharding /
collective tests run without TPU hardware, before jax is first imported."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin ignores JAX_PLATFORMS from the environment; force the
# platform through the config API before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Path to the read-only PyTorch reference checkout; parity tests are skipped
# when it is absent (e.g. in CI environments that only have this repo).
REFERENCE_ROOT = os.environ.get("DFANERF_REFERENCE", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "NeRFs", "DFANeRF"))


def add_reference_to_path():
    p = os.path.join(REFERENCE_ROOT, "NeRFs", "DFANeRF")
    if p not in sys.path:
        sys.path.insert(0, p)
    return p


# ---------------------------------------------------------------------------
# Slow-test marking: `pytest -m "not slow"` is the fast core suite (<5 min);
# the full suite (~20 min) runs everything. The list below is every test
# measured >10 s on the 1-core CI box (pytest --durations); tests may also
# self-mark with @pytest.mark.slow.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

_SLOW_TESTS = {
    "test_step_landmarks_dense_contract",
    "test_pack2_matches_noskip",
    "test_clamp_lands_on_executed_class",
    "test_flow_on_crops_contract",
    "test_pair_compacted_matches_predicated_fused",
    "test_refresh_carry_staleness_bounded",
    "test_z_latents_never_move",
    "test_shapes_and_jit",
    "test_error_bounded_by_budget",
    "test_budget_monotonic_in_pairs",
    "test_budget_supersedes_contrib",
    "test_per_slot_iterative_refinement",
    "test_full_chain_steps_2_to_9",
    "test_loss_decreases",
    "test_dynamic_speaker_branch_follows_speak_frames",
    "test_export_roundtrip_eye",
    "test_two_objects_converge",
    "test_lr_range_test_runs",
    "test_dryrun_entrypoint",
    "test_skipped_render_error_is_bounded",
    "test_heatmap_head_shapes",
    "test_eye_net_learns_heatmaps",
    "test_sharded_multi_identity",
    "test_sharded_matches_single_device",
    "test_u2net_parity",
    "test_face_mobilenet_drelu_parity",
    "test_train_step_with_deepspeech_windows",
    "test_shapes",  # blazeface/raft/hrnet shape tests are 12-20 s each
    "test_parity_vs_torch",
    "test_val_render_and_metrics",
    "test_encoder_shapes",
    "test_kernel_matches_reference_composite",
    "test_multistep_stability",
    "test_five_step_training_parity",
    "test_feature_extraction_shapes",
    "test_tar_roundtrip_and_render",
    "test_u2net_odd_size_ceil_pools",
    "test_staged_gating",
    "test_cycle_swap_learns_disentanglement",
    "test_decoder_shapes",
    "test_differentiable_wrt_pose",
    "test_mobile_hrnet_parity",
    "test_face_ghostnet_parity",
    "test_zero_flow_for_identical_images",
    "test_real_weight_parity",
    "test_fan_hourglass_parity",
    "test_bg_epilogue_matches_kernel_mode",
    "test_fused_fine_pass_matches_xla_hierarchical",
    "test_async_live_matches_sync_refresh",
    "test_async_off_is_sync_path",
    "test_hist_accumulates_and_jitter_rotates",
    "test_live_keys_derive_matches_noskip",
    # round-5 rebalance (fast tier crept to ~7 min; these measured >10 s)
    "test_step_landmarks_low_score_skips_lms",
    "test_flow_artifacts_and_mask_contract",
    "test_checkpoint_roundtrip",
    "test_eye_encoder_decoder_variants_parity",
    "test_entry_compiles",
    "test_export_nested_list_structure",
    "test_pose_resnet_parity",
    "test_full_pairs_match_fused_kernel",
    "test_eye_ghostnet_regress_parity",
    "test_alternate_corr_equals_pyramid",
    "test_center_mobilenet_parity",
    "test_kernel_padding_rays",
    "test_decoder_jits",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: >10s tests; deselect with -m 'not slow'"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
