"""Fast/slow test tiers (VERDICT r3 item 9).

The full suite is ~25-40 min; the fast tier (`pytest -m "not slow"`) is the
iteration loop. Slow tests are auto-marked here from one regenerable list
instead of 45 decorators across 12 files — regenerate with:

    python -m pytest tests/ -q --durations=60
    # mark everything >= ~12 s (contended timings; the list below came from
    # the round-4 baseline run)

File-level pytestmark still works (test_convert_fullscale.py) and explicit
@pytest.mark.slow decorators compose with this list.
"""
import pytest

# "file.py::test_name" — parametrized variants match by prefix
SLOW_TESTS = {
    "test_stochastic_parity.py::test_stochastic_distributional_parity",
    "test_ring_attention.py::test_lm_forward_with_ring_attention",
    "test_ring_attention.py::test_ring_attention_matches_single_device",
    "test_ring_attention.py::test_ring_attention_no_bias",
    "test_train_s2s.py::test_s2s_training_and_samples",
    "test_train_step.py::test_train_step_with_bf16_adam_state",
    "test_train_step.py::test_sharded_train_step_matches_single_device",
    "test_train_step.py::test_sharded_train_step_with_remat_runs",
    "test_train_step.py::test_train_step_decreases_loss",
    "test_train_step.py::test_encode_microbatch_matches_full_encode",
    "test_train_step.py::test_remat_matches_unrematted_gradients",
    "test_train_step.py::test_lora_only_training_freezes_base",
    "test_train_step.py::test_gather_form_ce_matches_dense_onehot_formula",
    "test_train_loop.py::test_train_loop_and_resume",
    "test_train_loop.py::test_finetune_lora_only",
    "test_sharded_inference.py::test_vamp_microbatched_grouping_invariance",
    "test_sharded_inference.py::test_pipeline_placement_slices_and_parity",
    "test_sharded_inference.py::test_sp_chunkfree_vamp_matches_unsharded_whole_seq",
    "test_sharded_inference.py::test_vamp_full_path_under_pipeline",
    "test_sharded_inference.py::test_engine_over_pipeline_matches_unplaced",
    "test_sharded_inference.py::test_quantize_under_pipeline_unwinds_placement",
    "test_sharded_inference.py::test_sp_engine_serving_matches_solo",
    "test_sharded_inference.py::test_sharded_vamp_matches_single_device",
    "test_sharded_inference.py::test_engine_data_parallel_over_pipeline",
    "test_sharded_inference.py::test_engine_data_parallel_serving",
    "test_sharded_inference.py::test_sp_rejects_fused_sampler_explicitly",
    "test_sharded_inference.py::test_sp_vamp_public_api_end_to_end",
    "test_sharded_inference.py::test_quantized_interface_shards",
    "test_interface.py::test_vamp_e2e_int16_transfer_matches_fp32",
    "test_interface.py::test_vamp_time_stretch",
    "test_interface.py::test_vamp_full_pipeline",
    "test_interface.py::test_vamp_e2e_single_dispatch",
    "test_interface.py::test_vamp_feedback_steps",
    "test_interface.py::test_interface_quantize_opt_in",
    "test_interface.py::test_codec_overrides_file_ctor",
    "test_serve.py::test_webapp_engine_concurrent",
    "test_serve.py::test_engine_warmup",
    "test_serve.py::test_unloop_bridge_roundtrip",
    "test_serve.py::test_vamp_core",
    "test_serve.py::test_webapp_vamp_json_body",
    "test_serve.py::test_engine_single_request",
    "test_serve.py::test_engine_batches_concurrent_heterogeneous",
    "test_convert_reference_pipeline.py::test_convert_reference_end_to_end",
    "test_convert_reference_pipeline.py::test_hello_quickstart_runs_on_converted_zoo",
    "test_codec.py::test_conv_impl_matmul_full_codec_parity",
    "test_sampling.py::test_generate_fills_and_preserves",
    "test_sampling.py::test_generate_cfg_guidance_with_per_row_params",
    "test_sampling.py::test_generate_schedule_counts_mask_tokens_per_row",
    "test_quantize.py::test_quantized_params_structure",
    "test_bench_emission.py::test_bench_zero_budget_emits_headline_and_skip_record",
    "test_bench_emission.py::test_bench_lines_are_parseable_json_only_on_stdout",
    "test_bench_emission.py::test_bench_default_budget_survives_cold_estimates",
}


def pytest_collection_modifyitems(config, items):
    slow = pytest.mark.slow
    matched = set()
    collected_files = set()
    for item in items:
        # "tests/test_x.py::test_name[param]" -> "test_x.py::test_name"
        fname = item.nodeid.split("/")[-1].split("::")[0]
        collected_files.add(fname)
        short = "::".join([fname, item.nodeid.split("::", 1)[1].split("[")[0]])
        if short in SLOW_TESTS:
            matched.add(short)
            item.add_marker(slow)
    # A renamed/moved test silently stops matching and drops into the fast
    # tier with no signal (advisor r4) — surface stale entries whenever the
    # file they point at was collected (so single-file runs stay quiet
    # about the rest of the list).
    stale = {e for e in SLOW_TESTS - matched if e.split("::")[0] in collected_files}
    for entry in sorted(stale):
        import warnings

        warnings.warn(
            f"SLOW_TESTS entry matched no collected test (renamed?): {entry}",
            stacklevel=1,
        )
