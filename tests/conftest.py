"""Test harness: force an 8-virtual-device CPU backend so sharding/mesh tests run
without TPU hardware (SURVEY.md §4 test-strategy note).

Note: the environment's axon TPU plugin force-registers itself at jax import via
sitecustomize, ignoring JAX_PLATFORMS — so the platform is overridden through
jax.config *after* import, before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# NOTE: no persistent compile cache here — XLA:CPU AOT reload warns about machine
# feature mismatches on this host (risk of SIGILL); CPU test graphs are small.

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Smoke tier: `pytest -m "not slow"` must stay fast on a 2-vCPU box.
# Tests measured >≈60 s (full-suite --durations run, 2026-08-20) are marked
# slow here centrally — big-model compiles, training loops, CLI E2E drives.
# The full suite (including these) is the pre-round gate; the smoke tier is
# the inner development loop.
# ---------------------------------------------------------------------------
_SLOW_NODE_PATTERNS = (
    "test_finetune.py::test_classifier_finetune_learns",
    "test_finetune.py::test_unet_finetune_learns",
    "test_cli_train_val.py::test_train_two_steps",
    "test_cli_train_val.py::test_export_saved_model_roundtrip",
    "test_cli_train_val.py::test_export_tflite_v10_and_v8_guard",
    "test_cli_train_val.py::test_export_msgpack",
    "test_cli_train_val.py::test_predict_cmd",
    "test_cli_train_val.py::test_val_runs",
    "test_pipeline.py::test_pipeline_runs_end_to_end",
    "test_apps.py::test_auto_speed_calc_cli",
    "test_apps.py::test_track_video_cli",
    "test_apps.py::test_track_video_cli_batch_propagation",
    "test_apps.py::test_app_yolo_inference_image_mode",
    "test_parallel.py::test_trainer_resume_and_ema",
    "test_predictor.py::test_one_mask_per_box_beyond_max_masks",
    "test_golden.py::test_forward_matches_golden",
    "test_quant.py::test_int8_model_forward_tracks_fp",
    "test_quant.py::test_int8_predictor_end_to_end",
    "test_quant.py::test_calibrated_predictor_end_to_end",
    "test_multivideo.py::test_interleaved_matches_sequential",
    "test_multivideo.py::test_mixed_resolution_falls_back",
    "test_classifiers.py::test_efficientnet_forward_softmax_contract",
    "test_classifiers.py::test_classifier_task_api",
    "test_full_model_parity.py::test_v8n_seg_predict_e2e_parity",
    "test_convert_roundtrip.py::test_full_roundtrip_lossless",
    "test_sam_tools.py::test_dataset_gen",
    "test_track.py::test_windowed_propagation_quality",
    "test_track_training.py::test_propagation_training_improves_iou",
    "test_track_training.py::test_shared_backbone_training_loss_drops",
    # second pass (uncontended --durations run): >25 s compiles
    "test_webui.py::test_analyze_video_mode",
    "test_webui.py::test_analyze_image_mode",
    "test_track.py::test_fused_bench_assembly_cpu",
    "test_track.py::test_quantized_core_step_and_window",
    "test_track_training.py::test_windowed_loss_finite_and_differentiable",
    "test_track_training.py::test_pyramid_channels_match_backbone",
    "test_train.py::test_one_train_step_reduces_loss_or_runs",
    "test_train.py::test_detection_loss_finite_and_positive",
    "test_classifiers.py::test_unet_predict_contract",
    "test_classifiers.py::test_van_forward",
    "test_classifiers.py::test_u2netp_param_count_and_outputs",
    "test_longterm_memory.py::test_step_accumulates_usage_and_reads_longterm",
)


# Pure-logic files with no big-model compiles: `pytest -m smoke` runs these in
# ~2 minutes wall on this 2-vCPU box (measured 2m18s, 147 tests, 2026-08-20) —
# the tightest inner loop.  `-m "not slow"` is the mid tier (~15-25 min); the
# unfiltered suite is the pre-round gate.
_SMOKE_FILES = (
    "test_analytics.py",
    "test_geometry.py",
    "test_signal.py",
    "test_map_crosscheck.py",
    "test_annotation_ui.py",
    "test_gradio_app.py",
    "test_utils_namespace.py",
    "test_compat_shim.py",
    "test_reference_scripts.py",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(p in item.nodeid for p in _SLOW_NODE_PATTERNS):
            item.add_marker(pytest.mark.slow)
        if any(f"{f}::" in item.nodeid or item.nodeid.endswith(f)
               for f in _SMOKE_FILES):
            item.add_marker(pytest.mark.smoke)
