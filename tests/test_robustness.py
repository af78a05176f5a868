"""Degenerate-input robustness: the operator surface must not crash on
zero-row tables (the empty-partition / empty-source case every 100 TB
job hits somewhere), and stateful streaming must run on the RocksDB
state store (the backend a production deployment uses once state
outgrows the executor heap)."""

import pytest
from pyspark.sql import functions as F

from flink_big_query_connector_spark.cache import release_caches
from flink_big_query_connector_spark.plans import REGISTRY

# The degenerate sweeps FEED queries empty/dirty corpora on purpose, so
# bpe_train_batched's documented short-list warning (no adjacent pairs
# on an empty corpus) is EXPECTED here, not suite noise.  The happy-path
# twin (test_llm_operators.py::test_bpe_train_batched_registry_happy_path)
# runs warnings-as-errors and asserts both merges learn.
pytestmark = pytest.mark.filterwarnings(
    "ignore:bpe_train_batched. corpus has no adjacent pairs"
)

# Every batch-family query in the registry, shared by the empty-table
# and partitioning-invariance sweeps below; streaming/connector queries
# replay chunk files and have their own machinery, and b01_compaction's
# >=64-row layout precondition raises loudly by design — both excluded.
BATCH_SWEEP = [
    "b01_scan_count",
    "llm_quality_classifier_trained",
    "llm_quality_cascade_trained",
    "llm_quality_classifier_heldout",
    "llm_dedup_url_incremental",
    "llm_text_gopher_repetition",
    "llm_corpus_domain_contamination",
    "llm_ann_hard_negatives",
    "llm_corpus_shard_tokens",
    "llm_quality_funnel",
    "llm_text_gopher_ablation",
    "llm_decontaminate_bloom",
    "llm_mix_unimax",
    "llm_host_diversity_cap",
    "llm_dedup_soft_weights",
    "llm_quality_cascade",
    "llm_dedup_url_fuzzy",
    "llm_decontaminate_incremental",
    "b01_zorder_layout",
    "b04_dpp_join",
    "b16_group_regression",
    "llm_sample_weighted",
    "b18_percentile_histogram",
    "b22_conversion_latency",
    "llm_text_dsir",
    "llm_text_gopher_rules",
    "llm_corpus_overlap_matrix",
    "llm_text_bm25",
    "llm_hybrid_rrf",
    "llm_ann_sq8_rerank",
    "llm_dedup_containment",
    "b07_point_in_time_join",
    "b02_projection",
    "b03_filter",
    "b04_join_broadcast",
    "b04_salted_join",
    "b04_bloom_join_prune",
    "b18_linear_counting",
    "b18_kmv_intersection",
    "b05_outer_join",
    "b05_merge_upsert",
    "b06_semi_join",
    "b07_range_join",
    "b07_binned_range_join",
    "b08_q1_pricing_summary",
    "b08_pivot",
    "b09_rollup",
    "b10_distinct",
    "b10_snapshot_diff",
    "b11_window_rank",
    "b12_topk",
    "b12_diversified_topk",
    "b13_union",
    "b14_string_funcs",
    "b15_datetime",
    "b15_gap_fill_locf",
    "b16_stats_corr",
    "b16_winsorized_stats",
    "b17_json_extract",
    "b17_bad_records",
    "b18_approx_distinct",
    "b19_q17_subquery",
    "b20_q3_shipping",
    "llm_dedup_exact",
    "llm_dedup_minhash_lsh",
    "llm_dedup_simhash",
    "llm_dedup_semantic",
    "llm_dedup_semantic_trained",
    "llm_dedup_span_removal",
    "llm_dedup_spans",
    "llm_ann_topk",
    "llm_ann_lsh_bucketed",
    "llm_text_stats",
    "llm_text_tfidf",
    "llm_text_novelty",
    "llm_quality_classifier",
    "llm_mix_temperature",
    "llm_corpus_shard",
    "llm_batch_by_length",
    "llm_curation_pipeline",
    "llm_multimodal_segments",
    "b05_scd2_intervals",
    "b06_null_safe_join",
    "b11_ratio_to_report",
    "b13_setops_all",
    "b01_schema_evolution_read",
    "llm_bpe_train", "llm_bpe_train_batched",
    "llm_dedup_incremental",
    "llm_ann_pq_encode",
    "b16_rolling_zscore",
    "llm_heavy_hitters_cms",
    "b10_delete_propagation",
    "llm_corpus_export",
    "llm_multimodal_phash_dedup",
    "llm_ann_pq_adc",
    "b11_last_touch_attribution",
    "b11_multi_touch_attribution",
    "llm_bpe_encode",
    "llm_text_langid_confusion",
    "llm_ann_recall_eval",
    "llm_embedding_drift",
    "llm_embedding_project",
    "b04_skew_profile",
    "llm_bpe_fertility",
    "b01_partitioned_layout",
    "b01_source_formats",
    "b02_nested_projection",
    "b04_bucketed_join",
    "b06_anti_join",
    "b07_asof_join",
    "b07_asof_join_forward",
    "b08_salted_agg",
    "b08_unpivot",
    "b09_cube",
    "b09_grouping_sets",
    "b10_dedup_keep_latest",
    "b10_two_phase_count_distinct",
    "b11_window_lag_lead",
    "b11_window_ntile",
    "b11_window_range_frame",
    "b11_window_running_sum",
    "b13_except",
    "b13_intersect",
    "b14_levenshtein",
    "b15_cohort_retention",
    "b15_datediff",
    "b15_time_bucket_rollup",
    "b16_math",
    "b16_user_entropy",
    "b17_array_setops",
    "b17_explode_outer",
    "b17_explode_tokens",
    "b17_map_functions",
    "b17_variant_json",
    "b18_histogram",
    "b18_median_manual",
    "b19_q4_exists",
    "b20_q2_min_supplier",
    "b20_q5_local_supplier",
    "b20_q6_forecast_revenue",
    "b20_q7_volume_shipping",
    "b20_q8_market_share",
    "b20_q9_product_profit",
    "b20_q10_returned_items",
    "b20_q11_important_parts",
    "b20_q12_late_priority",
    "b20_q13_order_distribution",
    "b20_q14_promo_revenue",
    "b20_q15_top_supplier",
    "b20_q16_part_supplier_count",
    "b20_q18_large_volume",
    "b20_q19_discounted_revenue",
    "b20_q20_dominant_share",
    "b20_q21_waiting_supplier",
    "b20_q22_idle_balance",
    "b22_batch_sessionize",
    "b22_event_transitions",
    "b22_session_funnel",
    "b28_timeseries_similarity",
    "llm_ann_filtered",
    "llm_ann_ivf_multiprobe",
    "llm_ann_ivf_probe",
    "llm_ann_sq8",
    "llm_ann_ivf_kmeans",
    "llm_corpus_audit",
    "llm_decontaminate",
    "llm_dedup_cluster",
    "llm_dedup_embedding",
    "llm_dedup_ngram_jaccard",
    "llm_dedup_simhash_pairs",
    "llm_dedup_survivors",
    "llm_doc_chunking",
    "llm_mix_epochs",
    "llm_mix_token_budget",
    "llm_multimodal_meta",
    "llm_multimodal_features",
    "llm_multimodal_frame_sample",
    "llm_multimodal_resize",
    "llm_pack_nextfit",
    "llm_pack_sequences",
    "llm_quality_percentile",
    "llm_sample_cluster_balanced",
    "llm_sample_stratified",
    "llm_split_leakage_safe",
    "llm_text_bigram_lm",
    "llm_text_fingerprint",
    "llm_text_inverted_index",
    "llm_text_langid",
    "llm_text_logprob",
    "llm_text_pii_scrub",
    "llm_text_quality_filter",
    "llm_text_repetition",
    "llm_text_token_counts",
    "llm_udf_grouped_agg",
    "llm_udf_grouped_map",
    "llm_udf_scalar_pandas",
    "llm_udtf_sentences",
    "llm_vocab_coverage",
    "llm_dedup_lsh_eval",
    "llm_dedup_canonical_centrality",
    "llm_ann_recall_matrix",
    "b14_fuzzy_join",
    # round-7 late additions
    "b15_gaps_islands",
    "b15_gap_fill_interpolate",
    "b16_ab_welch_ttest",
    "b16_benford_audit",
    "b07_asof_join_tolerance",
    "llm_text_ccnet_buckets",
    "llm_text_lm_heldout",
    "llm_dedup_cdc_chunks",
    "llm_ann_range_search",
    "llm_embedding_outliers",
    "b26_stream_dlq_replay",
    "b26_stream_schema_evolution",
    "b18_stream_percentile",
    "b16_mann_whitney",
    "b26_matview_time_travel",
    "llm_ann_ivf_build_report",
    "b11_cumulative_distinct",
    "b19_null_semantics",
    "b21_stream_complete_mode",
    "llm_text_zipf_audit",
    # round-8 additions
    "b26_sink_multi_table",
    "b26_sink_multi_table_eo",
    "b19_recursive_cte",
    "llm_ann_ivfpq",
    "b22_session_dynamic_gap",
    "llm_text_dup_ngrams",
    "b26_dsv2_wildcard_read",
]

EMPTY_SWEEP = BATCH_SWEEP


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_empty")
    for name in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.limit(0).write.mode("overwrite").parquet(
            str(out / f"{name}.parquet")
        )
    return str(out)


@pytest.mark.parametrize("name", EMPTY_SWEEP)
def test_query_survives_empty_tables(spark, empty_dir, name):
    try:
        df = REGISTRY[name].fn(spark, empty_dir)
        assert df.count() >= 0  # must build AND execute without raising
    finally:
        release_caches(spark)


def test_stateful_streaming_on_rocksdb_state_store(spark, sf_dir):
    """The tumbling-window replay produces identical results under the
    RocksDB state store provider — the disk-backed backend that keeps
    100 TB-scale state out of the executor heap."""
    baseline = sorted(
        tuple(r)
        for r in REGISTRY["b21_stream_tumbling_window"].fn(
            spark, sf_dir
        ).collect()
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        rocks = sorted(
            tuple(r)
            for r in REGISTRY["b21_stream_tumbling_window"].fn(
                spark, sf_dir
            ).collect()
        )
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assert rocks == baseline


NULL_SWEEP = [
    "b03_filter",
    "llm_quality_classifier_trained", "llm_quality_cascade_trained",
    "llm_quality_classifier_heldout", "b18_linear_counting", "b18_kmv_intersection", "b08_q1_pricing_summary", "b10_snapshot_diff",
    "b15_gap_fill_locf", "b16_winsorized_stats", "b17_json_extract",
    "b17_bad_records", "b17_explode_tokens",
    "llm_dedup_exact", "llm_dedup_minhash_lsh", "llm_dedup_simhash",
    "llm_quality_cascade", "llm_dedup_url_fuzzy",
    "llm_host_diversity_cap", "llm_dedup_soft_weights",
    "llm_decontaminate_incremental",
    "llm_dedup_url_incremental", "llm_text_gopher_repetition",
    "llm_corpus_domain_contamination",
    "llm_dedup_containment",
    "llm_dedup_span_removal", "llm_text_stats", "llm_text_quality_filter",
    "llm_quality_classifier", "llm_text_tfidf", "llm_text_novelty",
    "llm_mix_temperature", "llm_batch_by_length", "llm_curation_pipeline",
    "llm_multimodal_segments", "llm_corpus_shard",
    "b05_scd2_intervals", "b06_null_safe_join", "b11_ratio_to_report",
    "b07_point_in_time_join",
    "llm_bpe_train", "llm_bpe_train_batched", "b17_explode_outer", "llm_dedup_incremental",
    "b16_rolling_zscore", "llm_multimodal_phash_dedup",
    "b18_percentile_histogram",
    # nulled event `value` rows exercise the CDC NULL-upsert-vs-tombstone
    # distinction: an upsert whose value is NULL must survive as a
    # NULL-valued row, never be confused with a delete.
    "b26_stream_cdc_apply",
    # null props must parse-fail into the DLQ, not crash the router
    "b26_stream_deadletter",
    # NULL text must tokenize to the empty list in the encode fold and
    # to an unknowable-but-consistent langid class on both engines.
    "llm_bpe_encode", "llm_text_langid_confusion", "llm_bpe_fertility",
    # widened text-family coverage: every query below consumes document
    # text and must agree with its oracle when every 7th text is NULL
    "llm_text_langid", "llm_text_token_counts", "llm_text_fingerprint",
    "llm_text_dsir", "llm_text_gopher_rules", "llm_corpus_overlap_matrix",
    "llm_text_bm25",
    "llm_dedup_canonical_centrality",
    "llm_dedup_ngram_jaccard", "llm_text_repetition", "llm_doc_chunking",
    "llm_text_inverted_index", "llm_pack_sequences", "llm_decontaminate",
    "llm_quality_percentile",
    "llm_text_bigram_lm", "llm_text_logprob", "llm_vocab_coverage",
    "llm_text_pii_scrub", "llm_heavy_hitters_cms", "llm_dedup_spans",
    "llm_mix_token_budget", "llm_sample_stratified", "llm_corpus_audit",
    "llm_split_leakage_safe", "llm_dedup_cluster", "llm_dedup_survivors",
    "b15_time_bucket_rollup", "b16_user_entropy", "b22_batch_sessionize",
    "b11_last_touch_attribution", "llm_pack_nextfit", "llm_mix_epochs",
    # NULL embeddings (failed embed jobs) through the similarity family:
    # both engines must agree on how a NULL vector ranks, buckets, and
    # aggregates — or be filtered identically at the shared helpers
    "llm_ann_topk", "llm_ann_sq8", "llm_ann_sq8_rerank", "llm_ann_lsh_bucketed", "llm_dedup_lsh_eval",
    "llm_ann_ivf_probe", "llm_embedding_drift", "llm_embedding_project", "llm_ann_recall_eval",
    "llm_ann_recall_matrix",
    "llm_dedup_semantic", "llm_dedup_semantic_trained",
    "llm_ann_pq_encode", "llm_sample_cluster_balanced",
    "llm_hybrid_rrf",
    # streaming replays over dirty events: NULL value/props rows must
    # aggregate and window identically to the batch oracle
    "b21_stream_tumbling_window", "b21_stream_sliding_window",
    "b22_stream_session_window", "b24_stream_dedup",
    "b25_batch_assign_count", "b26_incremental_matview",
    "b26_stream_backfill", "b24_stream_decontaminate",
    "b25_stream_budget_admission",
    # round-7 late additions: NULL text through the LM/chunking family,
    # NULL value through the moment/interpolation family, NULL props
    # through the DLQ replay (a null payload must stay dead after the
    # backfill, not crash it), NULL embeddings through the outlier screen
    "llm_text_ccnet_buckets", "llm_text_lm_heldout", "llm_dedup_cdc_chunks",
    "b16_ab_welch_ttest", "b16_benford_audit", "b15_gap_fill_interpolate",
    "b07_asof_join_tolerance", "b26_stream_dlq_replay",
    "llm_ann_range_search", "llm_embedding_outliers",
    "llm_ann_ivfpq",
    "b22_session_dynamic_gap",
    "llm_text_dup_ngrams",
    "b15_gaps_islands",
    "b26_stream_schema_evolution",
    "b18_stream_percentile",
    "b16_mann_whitney",
    "b26_matview_time_travel",
    "llm_ann_ivf_build_report",
    "b11_cumulative_distinct",
    "b19_null_semantics",
    "b21_stream_complete_mode",
    "llm_text_zipf_audit",
]


@pytest.fixture(scope="module")
def nulled_dir(spark, sf_dir, tmp_path_factory):
    """Copies of the tables with nulls injected into the dirty-data-prone
    columns: every 7th document text, every 11th event props, every 5th
    event value, every 13th embedding (the failed-embed-job row every
    production corpus contains)."""
    out = tmp_path_factory.mktemp("sf_nulled")
    for name in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "documents":
            df = df.withColumn(
                "text",
                F.when(F.col("doc_id") % 7 == 2, F.lit(None)).otherwise(
                    F.col("text")
                ),
            )
        if name == "events":
            df = df.withColumn(
                "props",
                F.when(F.col("event_id") % 11 == 4, F.lit(None)).otherwise(
                    F.col("props")
                ),
            ).withColumn(
                "value",
                F.when(F.col("event_id") % 5 == 1, F.lit(None)).otherwise(
                    F.col("value")
                ),
            )
        if name == "embeddings":
            df = df.withColumn(
                "embedding",
                F.when(F.col("vec_id") % 13 == 3, F.lit(None)).otherwise(
                    F.col("embedding")
                ),
            )
        df.write.mode("overwrite").parquet(str(out / f"{name}.parquet"))
    return str(out)


def _canon_cell(v):
    import math
    from datetime import date, datetime
    from decimal import Decimal

    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, bytes):
        return f"bytes:{v.hex()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), sorted(
        tuple(_canon_cell(r[i]) for i in order) for r in rows
    )


def _assert_oracle_agreement(spark, data_dir, name):
    """The driver-identical comparison (sorted columns/rows, canonical
    cells) of a registry query against its oracle over a perturbed copy
    of the tables — shared by the null / unicode / negative / pre-epoch
    sweeps."""
    import duckdb

    try:
        df = REGISTRY[name].fn(spark, data_dir)
        scols = df.columns
        srows = [tuple(r) for r in df.collect()]
    finally:
        release_caches(spark)
    oracle = REGISTRY[name].oracle
    if oracle is None:
        assert len(srows) >= 0
        return
    con = duckdb.connect()
    try:
        for t in [
            "region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings",
        ]:
            con.execute(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM '{data_dir}/{t}.parquet/*.parquet'"
            )
        cur = con.execute(oracle)
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
    finally:
        con.close()
    assert _canon(scols, srows) == _canon(ocols, orows)


@pytest.mark.parametrize("name", NULL_SWEEP)
def test_query_survives_null_injection(spark, nulled_dir, name):
    """Dirty-data robustness, oracle-grade: on the NULL-injected tables
    the Spark result must still MATCH the DuckDB oracle bit-for-bit (not
    merely avoid crashing) — this is what catches cross-engine NULL
    divergences like legacy size(NULL) vs len(NULL)."""
    _assert_oracle_agreement(spark, nulled_dir, name)


# Partitioning invariance runs over the same full batch surface: a
# missed decimal-domain sum or unsorted collect_list anywhere would
# surface as a bit difference under the prime shuffle layout.
DETERMINISM_SWEEP = BATCH_SWEEP

# Queries whose result is legitimately EMPTY at the sweep's sf0.001
# scale (nation-pair trade / HAVING-threshold cuts select nothing):
# the invariance assertion still runs; only the vacuity bar is waived.
EMPTY_OK_AT_TEST_SCALE = {
    "b20_q7_volume_shipping", "b20_q11_important_parts",
    # zero phash pairs at sf0.001; exactness is pinned by the pigeonhole test
    "llm_multimodal_phash_dedup",
}


def _canon_rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("name", DETERMINISM_SWEEP)
def test_result_is_partitioning_invariant(spark, sf_dir, name):
    """The 'same answer on any cluster size' claim, executed: tiny input
    splits + a prime shuffle-partition count must reproduce the default
    layout's result bit-for-bit (hash order, decimal sums, fold
    arithmetic are all partitioning-free by construction)."""
    baseline = _canon_rows(REGISTRY[name].fn(spark, sf_dir))
    release_caches(spark)
    # save/restore via get+set: conf.unset would fall back to Spark's
    # HARD default (200), not the session builder's configured value
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    old_bytes = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    try:
        alt = _canon_rows(REGISTRY[name].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_bytes)
        release_caches(spark)
    assert alt == baseline
    assert len(baseline) > 0 or name in EMPTY_OK_AT_TEST_SCALE

# Streaming/connector replays must ALSO be layout-invariant: the chunked
# replay fixes event-time order, so watermarks, session gaps, batch
# triggers, and sink offsets may not depend on shuffle layout.  (The
# exactly-once sinks are additionally replay-idempotent — covered in
# test_sinks.py; here we pin result invariance under the prime layout.)
STREAMING_DETERMINISM_SWEEP = [
    "b21_stream_tumbling_window", "b21_stream_sliding_window",
    "b22_stream_session_window",
    "b21_stream_update_mode", "b21_stream_static_enrich",
    "b21_stream_interval_join", "b21_stream_three_way_join",
    "b23_stream_late_data_drop", "b24_stream_dedup",
    "b24_stream_dedup_within_watermark", "b24_stream_neardup_history",
    "b25_batch_assign_count", "b25_batch_assign_size",
    "b25_stateful_batcher", "b26_incremental_matview",
    "b26_stream_cdc_apply", "b26_stream_scd2_history",
    "b26_stream_state_offsets", "b28_stream_incremental_topk",
    "b28_stream_ann_ingest", "b23_stream_late_side_output",
    "b26_stream_state_native_tws",
    "b26_stream_backfill", "b24_stream_decontaminate",
    "b25_stream_budget_admission", "b26_stream_deadletter",
    "b26_sink_multi_table", "b26_sink_multi_table_eo",
    "b22_session_dynamic_gap",
]


@pytest.mark.parametrize("name", STREAMING_DETERMINISM_SWEEP)
def test_streaming_result_is_partitioning_invariant(spark, sf_dir, name):
    baseline = _canon_rows(REGISTRY[name].fn(spark, sf_dir))
    release_caches(spark)
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        alt = _canon_rows(REGISTRY[name].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
        release_caches(spark)
    assert alt == baseline and len(baseline) > 0


# Unicode robustness: the generated corpus is pure ASCII, production
# corpora are not.  Inject mixed-script text (accents, CJK, emoji,
# NBSP, combining marks) and require oracle-grade agreement for the
# text family — char-vs-byte semantics (length, substr, levenshtein,
# regex classes) is where engines classically diverge.
UNICODE_SWEEP = [
    "llm_text_stats",
    "llm_quality_classifier_trained", "llm_quality_cascade_trained",
    "llm_quality_classifier_heldout", "llm_text_token_counts", "llm_text_fingerprint",
    "llm_text_langid", "llm_text_langid_confusion", "llm_text_tfidf",
    "llm_text_repetition", "llm_text_novelty", "llm_text_pii_scrub",
    "llm_text_inverted_index", "llm_text_bigram_lm", "llm_text_logprob",
    "llm_dedup_exact", "llm_dedup_minhash_lsh", "llm_dedup_simhash",
    "llm_quality_cascade", "llm_dedup_url_fuzzy",
    "llm_host_diversity_cap", "llm_dedup_soft_weights",
    "llm_decontaminate_incremental",
    "llm_dedup_url_incremental", "llm_text_gopher_repetition",
    "llm_corpus_domain_contamination",
    "llm_dedup_ngram_jaccard", "llm_dedup_spans", "llm_dedup_span_removal",
    "llm_bpe_train", "llm_bpe_train_batched", "llm_bpe_encode", "llm_bpe_fertility",
    "llm_doc_chunking", "llm_pack_sequences", "llm_quality_classifier",
    "llm_quality_percentile", "llm_vocab_coverage", "llm_batch_by_length",
    "llm_multimodal_meta", "llm_corpus_shard", "llm_text_quality_filter",
    # char-vs-byte length regressions (the gopher strlen bug's class)
    "llm_text_gopher_rules", "llm_text_bm25", "llm_text_dsir",
    "llm_text_ccnet_buckets", "llm_text_lm_heldout", "llm_dedup_cdc_chunks",
    "llm_text_zipf_audit", "llm_text_dup_ngrams",
]

_UNICODE_SNIPPETS = [
    "héllo wörld nb 中文 處理 🙂🙃 café",
    "ẞharp ß and Ímpact — em—dash\ttab",
    "русский текст și română 한국어 日本語です",
    "é combining vs é precomposed 🧵🪡",
    "  leading  　ideographic space　 trailing  ",
]


@pytest.fixture(scope="module")
def unicode_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_unicode")
    for name in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "documents":
            snip = F.array(*[F.lit(x) for x in _UNICODE_SNIPPETS])
            df = df.withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 5 == 1,
                    F.concat(
                        F.element_at(
                            snip, (F.col("doc_id") % 5 + 1).cast("int")
                        ),
                        F.lit(" "),
                        F.col("text"),
                    ),
                ).otherwise(F.col("text")),
            )
        df.write.mode("overwrite").parquet(str(out / f"{name}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", UNICODE_SWEEP)
def test_query_agrees_on_unicode_text(spark, unicode_dir, name):
    """Oracle-grade agreement on mixed-script text."""
    _assert_oracle_agreement(spark, unicode_dir, name)


# Streaming replays on a zero-row source: the empty-feed case every
# production stream eventually hits (upstream outage, filtered topic).
STREAMING_EMPTY_SWEEP = [
    "b21_stream_tumbling_window", "b22_stream_session_window",
    "b24_stream_dedup", "b25_batch_assign_count",
    "b26_incremental_matview", "b26_stream_cdc_apply",
    "b26_stream_backfill", "b28_stream_incremental_topk",
    "b28_stream_ann_ingest", "b23_stream_late_side_output",
    "b26_stream_state_native_tws",
    "b24_stream_decontaminate", "b25_stream_budget_admission",
    "b26_stream_deadletter",
]


@pytest.mark.parametrize("name", STREAMING_EMPTY_SWEEP)
def test_streaming_query_survives_empty_tables(spark, empty_dir, name):
    try:
        df = REGISTRY[name].fn(spark, empty_dir)
        assert df.count() >= 0
    finally:
        release_caches(spark)


# Negative-numerics sweep: flipping signs exposes floor-vs-truncate
# divergence (DuckDB CAST(double AS INT) rounds, Spark ANSI cast
# truncates toward zero, floor() agrees — bucketing/histogram queries
# must use the agreeing form) and any abs/sign assumptions in stats.
NEGATIVE_SWEEP = [
    "b08_q1_pricing_summary", "b11_ratio_to_report",
    "b15_time_bucket_rollup", "b16_winsorized_stats",
    "b16_rolling_zscore", "b16_user_entropy", "b16_stats_corr",
    "b18_histogram", "b18_median_manual", "b16_math",
    "b26_incremental_matview", "b26_stream_backfill",
    "b21_stream_tumbling_window", "b10_delete_propagation",
]


@pytest.fixture(scope="module")
def negated_dir(spark, sf_dir, tmp_path_factory):
    """Copies with every 3rd event value negated and every 4th lineitem
    quantity negated (returns/corrections — negative measures are
    routine in event and ledger data)."""
    out = tmp_path_factory.mktemp("sf_negated")
    for name in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = df.withColumn(
                "value",
                F.when(F.col("event_id") % 3 == 1, -F.col("value")).otherwise(
                    F.col("value")
                ),
            )
        if name == "lineitem":
            df = df.withColumn(
                "l_quantity",
                F.when(
                    (F.col("l_orderkey") + F.col("l_linenumber")) % 4 == 1,
                    -F.col("l_quantity"),
                ).otherwise(F.col("l_quantity")),
            )
        df.write.mode("overwrite").parquet(str(out / f"{name}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", NEGATIVE_SWEEP)
def test_query_agrees_on_negative_values(spark, negated_dir, name):
    """Oracle-grade agreement with sign-flipped measures."""
    _assert_oracle_agreement(spark, negated_dir, name)


# Pre-epoch timestamps: log data with clock bugs / historical imports
# lands before 1970; date_trunc, windows, sessions, and LOCF must agree
# across engines on negative epochs.
PRE_EPOCH_SWEEP = [
    "b15_datetime", "b15_time_bucket_rollup", "b22_batch_sessionize",
    "b15_gap_fill_locf", "b11_last_touch_attribution",
]


@pytest.fixture(scope="module")
def pre_epoch_dir(spark, sf_dir, tmp_path_factory):
    """Copies with every 37th event shifted 100 years into the past
    (pre-1970 = negative epoch)."""
    out = tmp_path_factory.mktemp("sf_pre_epoch")
    for name in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            # physical-type adaptive, like sources/tables.py's helpers:
            # driver testdata has shipped ts as both timestamp and
            # int64-nanos across rounds
            back = (
                F.col("ts") - F.expr("INTERVAL 100 YEARS")
                if dict(df.dtypes)["ts"] != "bigint"
                else F.col("ts") - F.lit(100 * 365 * 24 * 3600 * 10**9)
            )
            df = df.withColumn(
                "ts",
                F.when(F.col("event_id") % 37 == 5, back).otherwise(
                    F.col("ts")
                ),
            )
        df.write.mode("overwrite").parquet(str(out / f"{name}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", PRE_EPOCH_SWEEP)
def test_query_agrees_on_pre_epoch_timestamps(spark, pre_epoch_dir, name):
    """Oracle-grade agreement on negative-epoch timestamps."""
    _assert_oracle_agreement(spark, pre_epoch_dir, name)
