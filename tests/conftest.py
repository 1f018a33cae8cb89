"""Shared test fixtures: one session-scoped local SparkSession."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "4")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    session = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("dve-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config(
            "spark.sql.warehouse.dir",
            __import__("tempfile").mkdtemp(prefix="dve_warehouse_"),
        )
        .getOrCreate()
    )
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


# ---------------------------------------------------------------------------
# Smoke tier (r14, VERDICT r13 Next-round #5): the full suite's wall time
# outgrew the driver's verify budget (r13: cut off at ~93% green). Tests
# measured >=6s on this box (pytest --durations, full-suite run recorded in
# OPTIMIZATION_r14.md) carry the `slow` marker and are excluded from the
# DEFAULT run by pytest.ini; nothing is deleted or weakened — the slow tier
# runs with `-m slow`, the complete suite with `-m ""`.
# ---------------------------------------------------------------------------
_SLOW_TESTS = frozenset((
    "tests/test_advice_r12.py::test_robots_host_col_is_case_folded",
    "tests/test_analytics_ops.py::test_containment_pairs_matches_naive_and_catches_wrapper",
    "tests/test_classifier_eval.py::test_train_eval_filter_compose_as_json_steps",
    "tests/test_corpus_pipeline_e2e.py::test_declared_corpus_pipeline",
    "tests/test_corpus_pipeline_e2e.py::test_declared_round11_curation_pipeline",
    "tests/test_corpus_pipeline_e2e.py::test_warc_to_corpus_compliance_pipeline",
    "tests/test_driver_matrix.py::test_sensitive_rows_green_under_adverse_environment",
    "tests/test_gopher_repetition.py::test_declared_step",
    "tests/test_gopher_repetition.py::test_partitioning_invariance",
    "tests/test_hash_discipline.py::TestHashDisciplineFrames::test_all_query_frames_respect_the_allowlist",
    "tests/test_llmops.py::test_bounded_self_join_exact_on_skewed_buckets",
    "tests/test_llmops.py::test_connected_components_star_fewer_rounds_on_deep_chain",
    "tests/test_llmops.py::test_kmeans_fit_deterministic_and_improving",
    "tests/test_llmops.py::test_minhash_dedup_best_quality_survivor",
    "tests/test_llmops.py::test_minhash_dedup_quality_step_matches_library",
    "tests/test_llmops.py::test_multiprobe_ann_recall_dominates_single_table",
    "tests/test_llmops_steps.py::test_corpus_pipeline_succeeds",
    "tests/test_llmops_steps.py::test_hygiene_steps_match_library",
    "tests/test_llmops_steps.py::test_pair_graph_steps_match_library",
    "tests/test_llmops_steps.py::test_text_analysis_steps_match_library",
    "tests/test_merge.py::TestMergeModelBased::test_against_dict_model",
    "tests/test_merge.py::TestSnapshotDiff::test_roundtrip_law_with_apply_changes",
    "tests/test_opt_r13.py::test_span_paragraph_passthrough_parity",
    "tests/test_opt_r13.py::test_substring_shared_marked_parity",
    "tests/test_pipeline.py::test_process_landing_thread_pool_fan_out",
    "tests/test_recall_pq_steps.py::test_declared_pq_fit_entity_feeds_similarity_topk",
    "tests/test_recall_pq_steps.py::test_pq_fit_codebooks_beat_default_on_recall",
    "tests/test_reference_fixtures.py::test_pipeline_succeeds",
    "tests/test_robots.py::test_longest_match_and_allow_tiebreak",
    "tests/test_round11_ops.py::test_char_ngram_features_end_to_end",
    "tests/test_round11_ops.py::test_classifier_fit_learns_separable_data",
    "tests/test_round11_ops.py::test_compact_preserves_admission_decisions",
    "tests/test_round11_ops.py::test_declared_classifier_fit_then_score",
    "tests/test_round6_dischema.py::test_hygiene_pipeline_succeeds",
    "tests/test_round6_dischema.py::test_profiling_pipeline_succeeds",
    "tests/test_round8_ops.py::TestScd2::test_snapshot_matches_apply_changes",
    "tests/test_round9.py::test_bpe_fold_path_equals_join_path",
    "tests/test_round9.py::test_incremental_embedding_dedup_matches_pair_filter",
    "tests/test_round9.py::test_incremental_minhash_matches_full_pairs_filter",
    "tests/test_round9.py::test_incremental_minhash_prebuilt_index_equivalent",
    "tests/test_round9.py::test_round9_singletons_hash_all_string",
    "tests/test_scale.py::test_no_accidental_cartesian_in_any_query_plan",
    "tests/test_staged_oracles.py::test_staged_rows_green",
    "tests/test_streaming.py::test_streaming_corpus_quality_gates",
    "tests/test_streaming.py::test_streaming_exact_dedup",
    "tests/test_streaming.py::test_streaming_kmv_state_merges_across_batches",
    "tests/test_streaming.py::test_streaming_rolling_counts_carries_state_across_batches",
    "tests/test_streaming.py::test_streaming_sessionize_matches_batch",
    "tests/test_streaming.py::test_streaming_sessionize_multichunk_string_key",
    "tests/test_streaming.py::test_streaming_sync_messages_query_matches_batch",
    "tests/test_streaming.py::test_windowed_counts_with_watermark",
    "tests/test_streaming_cdc.py::test_cdc_stream_maintains_table_across_drains",
    "tests/test_streaming_cdc.py::test_ledger_split_across_batches_matches_one_batch_apply",
    "tests/test_streaming_cdc.py::test_out_of_order_sequences_across_batches_do_not_clobber",
    "tests/test_streaming_quality.py::test_quality_stack_streams_and_matches_batch",
    "tests/test_wordlm_pairrecall.py::test_pair_recall_minhash_vs_exact_on_corpus",
))


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if nodeid in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
