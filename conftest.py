"""Root conftest: force JAX onto a virtual 8-device CPU mesh for tests.

The container boot registers an axon/TPU PJRT plugin that overrides
JAX_PLATFORMS, so the env var alone is not enough — we must set the jax
config explicitly before any backend initialization. Real-TPU benchmarking
happens only through bench.py, which does not import this.
"""
import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pytest  # noqa: E402

# Tests measured >= ~5 s on the single-core CI host (mostly XLA compiles of
# full-size models / trained-checkpoint e2e runs). `pytest -m "not slow"`
# is the fast green signal (< 5 min); the full suite runs them all.
_SLOW_TESTS = {
    "test_arunet.py::test_bf16_compute",
    "test_arunet.py::test_channel_progression_full_config",
    "test_arunet.py::test_det_and_att_shared_across_scales",
    "test_arunet.py::test_forward_shapes",
    "test_arunet.py::test_odd_input_sizes",
    "test_arunet.py::test_predict_is_softmax",
    "test_cli.py::test_full_workflow_pipelined_device_swt_matches_sequential",
    "test_cli.py::test_full_workflow_smoke",
    "test_edge_cases.py::test_tiny_image_through_predictor",
    "test_export.py::test_export_cli_from_trained_checkpoint",
    "test_export.py::test_relation_predictor_accepts_frozen",
    "test_export.py::test_segmentation_predictor_accepts_frozen",
    "test_gnn_model.py::test_attention_and_max_aggregation_variants",
    "test_gnn_model.py::test_output_type_variants",
    "test_gnn_model.py::test_padding_invariance",
    "test_gnn_model.py::test_relation_loss_and_training_reduces_loss",
    "test_gnn_stage.py::test_gnn_clustering_for_page_end_to_end",
    "test_heading_stage.py::test_heading_run_batched_matches_run",
    "test_inference.py::test_relation_predictor_feature_masks",
    "test_inference.py::test_segmentation_predict_batch",
    "test_inference.py::test_segmentation_predictor_checkpoint_roundtrip",
    "test_inference.py::test_segmentation_predictor_random",
    "test_jax_geometry.py::test_textblock_postprocessor",
    "test_ops.py::test_connected_components_count_matches_scipy",
    "test_ops.py::test_distance_transform_close_to_cv2",
    "test_ops.py::test_distance_transform_simple",
    "test_ops.py::test_remove_small_components",
    "test_ops.py::test_segment_max_per_component",
    "test_parallel.py::test_graft_dryrun_multichip",
    "test_parallel.py::test_graft_entry_single",
    "test_parallel.py::test_sharded_segmentation_predictor_matches_single_device",
    "test_parallel.py::test_spatial_sharding_arunet_parity_f32",
    "test_seg_training.py::test_seg_trainer_two_epochs",
    "test_separator_stage.py::test_run_batched_pipelined_matches_run",
    "test_synthetic_data.py::test_heading_mode_labels",
    "test_synthetic_data.py::test_synthetic_batch_deterministic_and_varied",
    "test_synthetic_data.py::test_synthetic_batch_shapes_and_classes",
    "test_training.py::test_input_gnn_visual_batches",
    "test_training.py::test_trainer_end_to_end",
    "test_workers.py::test_feature_generation_cli_workers",
    "test_workers.py::test_net_post_processing_cli_batched_sharded",
    "test_workers.py::test_run_sharded_process_pool",
}
# whole files that are slow across the board (trained checkpoints / pallas
# compiles / visual backbones)
_SLOW_FILES = {"test_trained_models.py", "test_visual_gnn.py",
               "test_pallas_kernels.py", "test_fault_isolation.py"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        bare = f"{fname}::{item.name.split('[')[0]}"
        if fname in _SLOW_FILES or bare in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
