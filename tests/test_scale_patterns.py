"""Plan-level proofs of the 100 TB layout claims.

These assert on the PHYSICAL PLAN, not just results: partition pruning for
the cell-partitioned ANN layout, bucketed co-located joins eliminating the
shuffle, and filter/column pushdown reaching the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ivf_cell_layout_prunes_partitions(spark, tmp_path):
    from flink_big_query_connector_spark.operators.similarity import ivf_cells

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cells = ivf_cells(emb, "vec_id", "embedding")
    out = str(tmp_path / "ivf_layout")
    cells.write.partitionBy("cell").parquet(out)

    probe = spark.read.parquet(out).filter(F.col("cell") == 3)
    plan = _plan(probe)
    # the cell predicate must become a partition filter on the scan —
    # a probe then reads one directory, not the corpus
    assert "PartitionFilters: [isnotnull(cell" in plan
    assert "(cell" in plan.split("PartitionFilters")[1][:80]
    got_cells = {r.cell for r in probe.select("cell").distinct().collect()}
    assert got_cells <= {3}


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        (
            orders.write.bucketBy(4, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("t_orders_b")
        )
        (
            li.write.bucketBy(4, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable("t_lineitem_b")
        )
        j = spark.table("t_orders_b").join(
            spark.table("t_lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = _plan(j)
        # bucketed layout co-locates both sides: a sort-merge join with NO
        # exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        # and the result is still correct
        n = j.count()
        assert n == li.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_q6_predicates_reach_parquet_scan(spark):
    """TPC-H Q6: all four predicates appear as PushedFilters; only the
    four referenced columns are read (ReadSchema)."""
    from flink_big_query_connector_spark.plans.tpch_full import (
        b20_q6_forecast_revenue,
    )

    plan = _plan(b20_q6_forecast_revenue(spark, SF_DIR))
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"
    read = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_extendedprice" in read
    assert "l_orderkey" not in read  # column pruning


def test_q9_small_dims_broadcast(spark):
    """TPC-H Q9: part and nation join as broadcasts, not shuffles."""
    from flink_big_query_connector_spark.plans.tpch_full import (
        b20_q9_product_profit,
    )

    plan = _plan(b20_q9_product_profit(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2


def test_q21_single_pass_over_lineitem(spark):
    """TPC-H Q21's double-EXISTS rewrite: the plan contains NO correlated
    re-scans — lineitem feeds one aggregate plus the main pass (<= 3 scans
    total), versus 3 correlated subquery scans in the naive form."""
    from flink_big_query_connector_spark.plans.tpch_full import (
        b20_q21_waiting_supplier,
    )

    plan = _plan(b20_q21_waiting_supplier(spark, SF_DIR))
    assert plan.count("lineitem.parquet") <= 3


def test_filter_and_projection_reach_the_scan(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") < 5).select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity," in plan
    # column pruning: the read schema carries only the two projected columns
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def test_doc_chunking_plan_has_no_exchange(spark):
    """Chunking is row-local: scan -> project -> generate, zero shuffles —
    the property that makes a 100 TB chunking pass embarrassingly
    parallel."""
    from flink_big_query_connector_spark.operators.text import chunk_documents

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(chunk_documents(docs, 64, 16))
    assert "Exchange" not in plan


def test_repetition_has_partial_aggregation(spark):
    """The exploded (doc_id, token) aggregation must partial-combine
    map-side so the shuffle carries per-(doc,token) counts, not raw
    tokens."""
    from flink_big_query_connector_spark.operators.text import (
        repetition_features,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(repetition_features(docs))
    assert "partial_count" in plan or "partial" in plan.lower()
    assert "Exchange" in plan  # the per-doc rollup does shuffle (expected)


def test_stream_static_enrich_broadcasts_dimension(spark):
    """The static dimension side of the stream-static join must broadcast:
    the event stream never shuffles for the enrichment."""
    from flink_big_query_connector_spark.sources.tables import load_tables

    t = load_tables(spark, SF_DIR)
    customers = F.broadcast(t["customer"].select("c_custkey", "c_mktsegment"))
    ev = t["events"].select("event_id", "user_id", "value")
    j = ev.join(customers, ev.user_id == customers.c_custkey, "inner")
    plan = _plan(j)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_partitioned_layout_prunes_event_type(spark, tmp_path):
    """b01_partitioned_layout's read must carry the event_type predicate
    as a PartitionFilter on the scan (2 directories read, not the table)."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = str(tmp_path / "by_type")
    events.write.partitionBy("event_type").parquet(out)
    pruned = spark.read.parquet(out).filter(
        F.col("event_type").isin("click", "purchase")
    )
    plan = _plan(pruned)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1][:120]
    assert "event_type" in pf


def test_tfidf_broadcasts_idf_side(spark):
    """llm_text_tfidf's idf join must broadcast the vocabulary-sized side
    so the (doc, term, tf) relation never reshuffles for the join."""
    from flink_big_query_connector_spark.plans.registry import REGISTRY

    df = REGISTRY["llm_text_tfidf"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # |corpus| must be a broadcast 1-row aggregate INSIDE the plan, not a
    # driver-side .count() — i.e. the n_docs column exists and no literal
    # corpus-count constant was folded in at build time.
    assert "BroadcastNestedLoopJoin" in plan or plan.count("BroadcastExchange") >= 2


def test_tfidf_builds_without_running_jobs(spark):
    """Constructing the tfidf plan must trigger ZERO Spark actions beyond
    the parquet-footer schema reads — the |corpus| constant comes from a
    broadcast aggregate in the plan, not a driver-side count() pass."""
    from flink_big_query_connector_spark.plans.registry import REGISTRY
    from flink_big_query_connector_spark.sources.tables import load_tables

    sc = spark.sparkContext

    # Job-group-scoped counting: the global job-id list is bounded by
    # spark.ui.retainedJobs, so absolute counts go backwards once a long
    # suite has run enough jobs — group ids are immune to that.
    def jobs_in(group: str, fn) -> int:
        sc.setJobGroup(group, group)
        try:
            fn()
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    # Every load_tables call costs at most a fixed set of parquet-footer
    # schema jobs; measure that floor, then require fn() to add nothing
    # beyond its own internal load_tables.
    base = jobs_in("tfidf_base", lambda: load_tables(spark, SF_DIR))
    built = jobs_in(
        "tfidf_fn", lambda: REGISTRY["llm_text_tfidf"].fn(spark, SF_DIR)
    )
    assert built <= base


def test_chunking_and_inverted_index_partial_aggregate(spark):
    """Exploded text aggregations must partial-combine before their
    exchange (the shuffle carries counts, not raw tokens)."""
    from flink_big_query_connector_spark.plans.registry import REGISTRY

    plan = _plan(REGISTRY["llm_text_bigram_lm"].fn(spark, SF_DIR))
    assert "partial" in plan.lower()


def test_mix_token_budget_windows_are_bucketized(spark):
    """The token-budget mixer must never window over a whole domain: both
    window operators partition by more than the bare group column, and the
    bucket-offset side joins back via broadcast (no shuffled join for a
    <=64-rows-per-group table)."""
    from flink_big_query_connector_spark.operators.sampling import (
        mix_to_token_budget,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = mix_to_token_budget(docs, "doc_id", "text", "source", 800)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    # every Window's partition spec mentions bucket (never [source] alone)
    for frag in plan.split("Window ")[1:]:
        spec = frag.split("\n")[0]
        if "partitionBy" in spec or "windowspecdefinition" in spec:
            assert "bucket" in spec, spec


def test_sq8_model_is_plan_literal_not_join(spark):
    """SQ8 quantization must inline the (min,max) model as literals: the
    scoring plan contains exactly one broadcast (the queries) and no join
    against a stats table."""
    from flink_big_query_connector_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    mins, maxs = similarity.sq8_train(emb, "embedding")
    out = similarity.sq8_topk(
        emb, "vec_id", "embedding",
        emb.filter(F.col("vec_id") < 5), mins, maxs, 5,
    )
    plan = _plan(out)
    assert plan.count("BroadcastExchange") == 1  # queries only
    assert "SortMergeJoin" not in plan  # no shuffled model join


def test_span_dedup_shuffles_hashes_not_text(spark):
    """duplicated_span_stats joins on 60-bit hashes: no plan operator
    below the aggregation carries the span strings."""
    from flink_big_query_connector_spark.operators.dedup import (
        duplicated_span_stats,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = duplicated_span_stats(docs, "doc_id")
    plan = _plan(out)
    # the group/join key everywhere is the long hash column `h`
    assert "hashpartitioning(h#" in plan
    # no exchange partitions by a string span column
    for frag in plan.split("Exchange hashpartitioning(")[1:]:
        key = frag.split(")")[0]
        assert "span" not in key


def test_vocab_topk_is_take_ordered_not_global_window(spark):
    """The vocabulary top-k must plan as TakeOrderedAndProject (partial
    per-partition top-k merged on the driver), never a single-partition
    global sort or window."""
    from flink_big_query_connector_spark.plans import REGISTRY

    df = REGISTRY["llm_vocab_coverage"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan


def test_classifier_is_single_stage_no_exchange(spark):
    """The hashed linear classifier is a pure map stage: no Exchange
    anywhere.  Since r13 the scoring pass is the Arrow-vectorized doc
    profile (operators/text.py::doc_profile_pandas_expr — the measured
    fast path; the interpreted Catalyst fold hashed every token
    occurrence), so the plan must show ArrowEvalPython and must NOT fall
    back to row-at-a-time BatchEvalPython."""
    from flink_big_query_connector_spark.plans import REGISTRY

    df = REGISTRY["llm_quality_classifier"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan  # Arrow batches, never per-row


def test_semantic_dedup_drop_set_shuffles_ids_only(spark):
    """SemDeDup's drop-set aggregation exchanges only the vector id —
    embeddings never cross the distinct/groupBy shuffles."""
    from flink_big_query_connector_spark.operators.similarity import (
        semantic_dedup,
    )
    from flink_big_query_connector_spark.cache import release_caches

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(semantic_dedup(emb, "vec_id", "embedding"))
    for frag in plan.split("Exchange hashpartitioning(")[1:]:
        key = frag.split(")")[0]
        assert "embedding" not in key and " v#" not in key
    release_caches(spark)


def test_span_removal_no_text_in_exchange_keys(spark):
    """Span removal joins/aggregates on hashes and positions; neither the
    document text nor token strings are exchange keys."""
    from flink_big_query_connector_spark.operators.dedup import (
        remove_duplicated_spans,
    )
    from flink_big_query_connector_spark.cache import release_caches

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(remove_duplicated_spans(docs, "doc_id"))
    for frag in plan.split("Exchange hashpartitioning(")[1:]:
        key = frag.split(")")[0]
        assert "text" not in key and "tok" not in key
    release_caches(spark)


def test_temperature_mix_broadcasts_source_counts(spark):
    """Temperature rebalancing joins the per-source counts as a broadcast:
    the corpus side never reshuffles."""
    from flink_big_query_connector_spark.plans import REGISTRY

    df = REGISTRY["llm_mix_temperature"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan


def test_nested_projection_prunes_to_leaf_paths(spark):
    """b02_nested_projection's scan must read only the meta.lang and
    meta.stats.chars leaves — the wide meta.body column may not appear
    in the parquet ReadSchema."""
    from flink_big_query_connector_spark.plans import REGISTRY

    df = REGISTRY["b02_nested_projection"].fn(spark, SF_DIR)
    plan = _plan(df)
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "lang" in rs and "chars" in rs
    assert "body" not in rs


import pytest as _pytest


@_pytest.mark.parametrize(
    "qname", ["b26_stream_cdc_apply", "b26_stream_scd2_history"]
)
def test_keyed_state_queries_never_collect_keys(spark, monkeypatch, qname):
    """The bucketed-keyed-state consumers (CDC apply, SCD2 history) keep
    state DISTRIBUTED: the only driver-side collect inside the merge loop
    is the touched-bucket list (bounded by the bucket count), never
    per-key rows.  Guards against regressing to a driver-side state
    dict."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from flink_big_query_connector_spark.plans import REGISTRY

    n_buckets_bound = 16
    sizes = []
    orig = CDF.collect

    def tracking_collect(self):
        out = orig(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(CDF, "collect", tracking_collect)
    try:
        df = REGISTRY[qname].fn(spark, SF_DIR)
        # building the result must not have collected per-key state;
        # every recorded collect is a touched-bucket list
        assert sizes, "expected at least one touched-bucket collect"
        assert max(sizes) <= n_buckets_bound, sizes
    finally:
        monkeypatch.undo()
    n = df.count()
    assert n > 0


def test_embedding_neardup_has_no_cartesian_product(spark):
    """llm_dedup_embedding must generate candidates via the banded-LSH
    equi-join — never an all-pairs CartesianProduct / unbounded
    BroadcastNestedLoopJoin over the corpus side."""
    from flink_big_query_connector_spark.plans import REGISTRY

    df = REGISTRY["llm_dedup_embedding"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pq_adc_broadcasts_distance_tables_no_smj(spark):
    """PQ ADC search must broadcast the per-query distance tables and
    keep the corpus side a map stage over code columns — no sort-merge
    join, no shuffle of embedding vectors into the join."""
    from flink_big_query_connector_spark.plans import REGISTRY

    df = REGISTRY["llm_ann_pq_adc"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cms_build_has_partial_aggregation_and_broadcast_estimate(spark):
    """The sketch build must partial-aggregate map-side (shuffle bounded
    by depth x width cells per partition) and the estimate join must
    broadcast the KB-sized sketch."""
    from flink_big_query_connector_spark.plans import REGISTRY

    df = REGISTRY["llm_heavy_hitters_cms"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "partial_count" in plan
    assert "BroadcastHashJoin" in plan


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Runtime bloom-filter join pruning — the shuffle reducer that
    matters at 100 TB: a selective filter on the build side must inject a
    might_contain() pre-filter into the probe side's scan stage, so the
    big table's shuffle carries only keys that can match.  Local test
    data sits under the default 10 GB application-side threshold, so the
    thresholds are pinned to what a production cluster would see."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).groupBy(
            "o_orderpriority"
        ).count()
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt
        assert j.count() > 0  # and it still computes the right thing
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling — the runtime complement to the manual
    salted join (b04_salted_join): a 90%-one-key join must come out of
    adaptive execution with the skewed partition split (skew=true in the
    final SMJ), not one straggler task.  Thresholds are lowered to make
    local data register as skewed; production sizes trip the defaults."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 != 0, F.lit(7))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 50000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 185000
        plan = _plan(j)
        assert "isFinalPlan=true" in plan
        assert plan.count("skew=true") >= 1
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_no_cartesian_or_row_python_across_batch_registry(spark):
    """Registry-wide anti-pattern guard: NO batch query's physical plan
    may contain a CartesianProduct or a row-at-a-time Python eval
    (BatchEvalPython) — Arrow-batched pandas stages (ArrowEvalPython /
    MapInPandas / FlatMapGroupsInPandas) are the only Python allowed in a
    data path.  Streaming families replay real streams on invocation and
    are covered by their own pins."""
    from flink_big_query_connector_spark.cache import release_caches
    from flink_big_query_connector_spark.plans import REGISTRY

    # the UDTF demonstration query IS the row-based-Python feature (B20's
    # lateral-join table function) — the one legitimate appearance
    allow_row_python = {"llm_udtf_sentences"}
    skip_prefixes = ("b21_", "b22_", "b23_", "b24_", "b25_", "b26_")
    violations = []
    for name, qd in sorted(REGISTRY.items()):
        if name.startswith(skip_prefixes):
            continue
        try:
            plan = _plan(qd.fn(spark, SF_DIR))
        finally:
            release_caches(spark)
        if "CartesianProduct" in plan:
            violations.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan and name not in allow_row_python:
            violations.append((name, "BatchEvalPython"))
    assert not violations, violations


def test_incremental_dedup_band_exchanges_carry_keys_not_shingles(spark):
    """llm_dedup_incremental's candidate generation must shuffle on
    (band, key) pairs — no exchange may partition by a shingle-hash ARRAY
    column (the corpus content stays out of the band join)."""
    from flink_big_query_connector_spark.plans import REGISTRY

    df = REGISTRY["llm_dedup_incremental"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    for frag in plan.split("Exchange hashpartitioning(")[1:]:
        key = frag.split(")")[0]
        assert "sh_" not in key, key  # shingle arrays never partition


def test_bpe_encode_is_single_stage_no_exchange(spark):
    """Applying a pretrained BPE merge table is a pure map stage — no
    Exchange anywhere, so a 100 TB encode pass stays embarrassingly
    parallel.  Since r12 the encode projection executes as ONE
    Arrow-batched vectorized-regex node (ArrowEvalPython — 4.2x faster
    at sf10 than the interpreted fold chain, bitwise-equal by
    test_bpe_pandas_encoder_matches_fold_chain); row-at-a-time
    BatchEvalPython must never appear."""
    from flink_big_query_connector_spark.plans import REGISTRY

    df = REGISTRY["llm_bpe_encode"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan  # the 10-100x-slower row path


def test_dynamic_partition_pruning_fires_on_partitioned_fact_join(spark, tmp_path):
    """Dynamic partition pruning: joining a hive-partitioned fact table
    with a filtered broadcast dimension plants a dynamicpruning subquery
    in the fact scan's PartitionFilters — at 100 TB the fact side reads
    only the partitions the dimension selects, decided at runtime.  This
    is the runtime complement to the static pruning pinned in
    test_partitioned_layout_prunes_event_type (and the partition-level
    analogue of the row-level bloom pruning pinned below)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = str(tmp_path / "ev_by_type")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2)], ["event_type", "grp"]
    ).filter(F.col("grp") == 1)
    j = fact.join(dim.hint("broadcast"), "event_type").groupBy(
        "event_type"
    ).count()
    plan = _plan(j)
    assert "dynamicpruning" in plan.lower()


def test_capped_blocked_join_splits_adversarial_hot_block(spark):
    """One degenerate blocking key (every right row in a single block)
    must not pin the quadratic verify on one task: capped_blocked_join
    salts the hot block into ceil(n/cap) slices — the pair set stays
    EXACTLY the plain blocked join's, while right rows spread across
    slices and left rows replicate per slice."""
    from flink_big_query_connector_spark.operators.skew import (
        block_size_profile,
        capped_blocked_join,
    )

    # adversarial: 900 right rows share block 'hot'; 5 sit in 'cold'
    right = spark.range(905).select(
        F.when(F.col("id") < 900, F.lit("hot")).otherwise(F.lit("cold"))
        .alias("blk"),
        F.concat(F.lit("r"), F.col("id")).alias("rval"),
    )
    left = spark.createDataFrame(
        [("hot", "a"), ("hot", "b"), ("cold", "c")], "blk string, lval string"
    )

    capped = capped_blocked_join(left, right, ["blk"], cap=100)
    plain = left.join(right, "blk")
    assert sorted(
        map(tuple, capped.select("blk", "lval", "rval").collect())
    ) == sorted(map(tuple, plain.select("blk", "lval", "rval").collect()))

    # slice evidence: the hot block's right side spreads over ceil(900/100)
    # slices; the cold block keeps exactly one
    sizes = right.groupBy("blk").count().collect()
    assert {r["blk"]: r["count"] for r in sizes} == {"hot": 900, "cold": 5}
    sliced = capped_blocked_join(
        left.limit(1).filter("blk = 'hot'"), right, ["blk"], cap=100
    )
    # re-derive the internal slice from the join output: 9 slices means
    # the single left row matched all 900 right rows via 9 distinct
    # (blk, _slice) keys — count tasks indirectly through the profile
    assert sliced.count() == 900

    prof = {
        r["bucket_log2"]: (r["n_blocks"], r["max_block_rows"])
        for r in block_size_profile(right, ["blk"]).collect()
    }
    assert prof[9] == (1, 900)  # floor(log2(900)) = 9: the hot block
    assert prof[2] == (1, 5)


def test_fuzzy_join_block_plan_has_no_single_task_funnel(spark):
    """The registry fuzzy join's block equi-join must shuffle on the
    (block, slice) composite — no CartesianProduct and no
    single-partition exchange anywhere in the plan."""
    import os

    from flink_big_query_connector_spark.plans import REGISTRY

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    plan = _plan(REGISTRY["b14_fuzzy_join"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_timeseries_similarity_broadcasts_bounded_query_side(spark):
    """b28_timeseries_similarity crossJoins the candidate corpus against
    the query users: the plan must broadcast the QUERY side (the corpus
    never reshuffles) and the query side must carry the structural
    _TS_MAX_QUERIES limit, so the broadcast stays KB-sized even if the
    query predicate is loosened."""
    from flink_big_query_connector_spark.plans import REGISTRY
    from flink_big_query_connector_spark.plans.llm_ops import _TS_MAX_QUERIES

    df = REGISTRY["b28_timeseries_similarity"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # the limit survives into the physical plan on the broadcast side
    assert f"GlobalLimit {_TS_MAX_QUERIES}" in plan or (
        f"Limit {_TS_MAX_QUERIES}" in plan
    )


def test_capped_fuzzy_join_bounds_per_task_pairs_at_scale(spark):
    """sf0.1-sized adversarial skew: ONE block holds 20% of a 50k-row
    corpus.  The uncapped blocked join would evaluate all 20M hot-block
    pairs in a single task; capped_blocked_join must spread them so the
    MEASURED per-task pair count (spark_partition_id on the join output,
    AQE coalescing off so partitions = tasks) stays within a small
    multiple of |left_block| x cap.  The pair SET is proven unchanged by
    a full-column checksum, not row collection."""
    from flink_big_query_connector_spark.operators.skew import (
        capped_blocked_join,
    )

    cap = 200
    n_right, n_hot_right, n_hot_left = 50_000, 10_000, 2_000
    blk = (
        F.when(F.col("id") < n_hot_right, F.lit("hot"))
        .otherwise(F.concat(F.lit("c"), (F.col("id") % 400).cast("string")))
    )
    right = spark.range(n_right).select(
        blk.alias("blk"), F.concat(F.lit("r"), F.col("id")).alias("rval")
    )
    left = spark.range(n_hot_left + 2_000).select(
        F.when(F.col("id") < n_hot_left, F.lit("hot"))
        .otherwise(F.concat(F.lit("c"), (F.col("id") % 400).cast("string")))
        .alias("blk"),
        F.concat(F.lit("l"), F.col("id")).alias("lval"),
    )

    confs = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "64",
        # at 100 TB neither side broadcasts: force the (blk, _slice)
        # shuffle join this test is measuring (a broadcast of the 50k-row
        # right side would execute the join over the left's INPUT
        # partitioning and put every hot pair in one task)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        capped = capped_blocked_join(left, right, ["blk"], cap=cap)
        per_task = (
            capped.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .agg(F.max("count").alias("mx"), F.sum("count").alias("total"))
            .collect()[0]
        )
        hot_pairs = n_hot_left * n_hot_right  # 20M: the uncapped funnel
        assert per_task["total"] >= hot_pairs
        # bound: |left_hot| x cap per slice; x5 slack covers xxhash slice
        # imbalance plus slice->partition collisions (deterministic here:
        # 4 of the 50 slices hash into one of the 64 partitions, measured
        # max task 1.62M pairs).  Still >12x below the single-task funnel.
        assert per_task["mx"] <= n_hot_left * cap * 5
        assert per_task["mx"] < hot_pairs // 5

        # pair-set equality vs the plain blocked join, checksum-only
        def checksum(df):
            return df.agg(
                F.sum(F.xxhash64("blk", "lval", "rval").cast("decimal(38,0)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]

        assert checksum(capped) == checksum(left.join(right, "blk"))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_bloom_prune_filters_before_the_join_no_extra_shuffle(spark):
    """b04_bloom_join_prune: the K bit tests must sit on the fact scan
    side BEFORE the join exchange (that's the whole point — only
    ~matching rows pay the shuffle), the word array must ride as one
    array literal, and the filter must not introduce any extra Exchange
    beyond the join's own."""
    from flink_big_query_connector_spark.plans import REGISTRY

    df = REGISTRY["b04_bloom_join_prune"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "shiftleft" in plan  # the bit tests survived into the plan
    assert "CartesianProduct" not in plan
    # shuffles: at most fact->join + dim->join + final agg exchanges;
    # a regression that reshuffles for the bloom itself would add more
    assert plan.count("Exchange") <= 6


def test_bloom_filter_has_no_false_negatives_and_empty_build_prunes_all(
    spark,
):
    """Every inserted key must survive the prune (false negatives would
    silently DROP join results); an empty build side yields the all-zero
    filter, which prunes everything — matching the empty join."""
    from flink_big_query_connector_spark.operators.bloom import (
        bloom_build,
        bloom_prune,
    )

    keys = spark.range(5000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    words = bloom_build(keys, F.col("k"))
    survivors = bloom_prune(keys, F.col("k"), words)
    assert survivors.count() == 5000  # zero false negatives

    # non-members: deterministic FP rate must stay far below 100%
    probes = spark.range(5000, 10000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    fp = bloom_prune(probes, F.col("k"), words).count()
    assert fp < 500  # m=2^18, n=5k, k=5 -> expected FP << 1%

    empty = keys.filter("k IS NULL")
    zero_words = bloom_build(empty, F.col("k"))
    assert bloom_prune(keys, F.col("k"), zero_words).count() == 0


def test_native_runtime_bloom_injection_fires_at_scale_thresholds(spark):
    """Documents the NATIVE path b04_bloom_join_prune hand-builds: with
    the 10 GB application-side threshold lowered to test scale, Spark's
    own InjectRuntimeFilter plants a might_contain(bloom) filter on the
    fact scan of the same fact-to-filtered-dim join — i.e. at 100 TB the
    engine does this automatically, and our explicit operator matches
    its shape for the sub-threshold / user-controlled cases."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = _plan(j)
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zorder_layout_skips_files_on_2d_box(spark, tmp_path):
    """Z-order layout evidence: (1) the codegen Morton interleave matches
    the Python reference bit-for-bit; (2) after the z-sorted rewrite the
    2-D box query's z-range bound overlaps at most half of the files'
    [min,max] zvalue spans — the footer-stat skipping that makes a 100 TB
    two-column box read a handful of files (neither column alone could
    partition-prune it)."""
    from flink_big_query_connector_spark.plans.relational import (
        _Z_BITS,
        _Z_BOX_CUST,
        _Z_BOX_DAY,
        _Z_EPOCH,
        _zvalue_col,
        _zvalue_py,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    xcode = F.pmod(F.col("o_custkey"), F.lit(1 << _Z_BITS)).cast("int")
    ycode = F.pmod(
        F.datediff(F.col("o_orderdate"), F.lit(_Z_EPOCH)),
        F.lit(1 << _Z_BITS),
    ).cast("int")

    sample = (
        orders.limit(64)
        .select(xcode.alias("x"), ycode.alias("y"))
        .withColumn("z", _zvalue_col(F.col("x"), F.col("y")))
        .collect()
    )
    assert sample
    for r in sample:
        assert r.z == _zvalue_py(r.x, r.y)

    out = str(tmp_path / "orders_z")
    (
        orders.withColumn("zvalue", _zvalue_col(xcode, ycode))
        .repartitionByRange(8, "zvalue")
        .sortWithinPartitions("zvalue")
        .write.parquet(out)
    )
    back = spark.read.parquet(out)
    stats = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("zvalue").alias("lo"), F.max("zvalue").alias("hi"))
        .collect()
    )
    zlo = _zvalue_py(_Z_BOX_CUST[0], _Z_BOX_DAY[0])
    zhi = _zvalue_py(_Z_BOX_CUST[1], _Z_BOX_DAY[1])
    overlapping = [s for s in stats if s.lo <= zhi and s.hi >= zlo]
    assert len(stats) == 8
    # at least one file holds the box, most are skippable from stats alone
    assert 1 <= len(overlapping) <= len(stats) // 2


def test_b04_dpp_join_registry_plan_has_dynamic_pruning(spark):
    """The registry's b04_dpp_join (oracle-gated result) really plans a
    DynamicPruningExpression on the partitioned fact scan — the runtime
    star-schema pruning the docstring claims."""
    from flink_big_query_connector_spark.plans.relational import b04_dpp_join

    df = b04_dpp_join(spark, SF_DIR)
    assert "dynamicpruning" in _plan(df).lower()


def test_sq8_rerank_stays_broadcast_no_vector_shuffle_join(spark):
    """Two-stage rerank plan shape: the exact stage attaches candidates
    and query vectors via BROADCAST joins (candidate list and query set
    are model-sized), so full-precision vectors never sort-merge across
    a shuffle — the property that makes the rerank affordable when the
    corpus is 100 TB of embeddings."""
    from flink_big_query_connector_spark.plans.llm_ops import (
        llm_ann_sq8_rerank,
    )

    df = llm_ann_sq8_rerank(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_point_in_time_join_is_equi_key_with_interval_residual(spark):
    """The PIT join must plan as an equi-join on user_id with the
    validity interval as a residual condition — never a nested-loop
    theta join — and each observation matches at most one history
    version (no fan-out)."""
    from flink_big_query_connector_spark.plans.relational import (
        b07_point_in_time_join,
    )

    df = b07_point_in_time_join(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    n_obs = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter((F.col("event_type") == "click") & (F.col("user_id") < 50))
        .count()
    )
    assert df.count() == n_obs


def test_containment_superset_of_jaccard_pairs(spark):
    """Cross-operator invariant: containment >= Jaccard for every pair,
    so at thresholds (0.6 containment, 0.8 jaccard) every surviving
    Jaccard near-dup pair must also appear in the containment output —
    the containment operator only ADDS the asymmetric-inclusion pairs."""
    from flink_big_query_connector_spark.plans.llm_ops import (
        llm_dedup_containment,
        llm_dedup_minhash_lsh,
    )

    jac = {
        (r.id_a, r.id_b)
        for r in llm_dedup_minhash_lsh(spark, SF_DIR).collect()
    }
    cont = {
        (r.id_a, r.id_b)
        for r in llm_dedup_containment(spark, SF_DIR).collect()
    }
    assert jac, "fixture regression: no jaccard pairs at test scale"
    assert jac <= cont


def test_ivfpq_probe_broadcasts_queries_and_scans_codes_only(spark):
    """IVFPQ plan shape: the probe side (query distance tables + cell)
    broadcasts into the cell equi-join, candidate ranking reads ONLY the
    (cell, code) index columns, and full-precision vectors never cross a
    shuffle — the property that makes IVFPQ the 100 TB serving shape."""
    from flink_big_query_connector_spark.plans import REGISTRY

    df = REGISTRY["llm_ann_ivfpq"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_recursive_cte_plan_is_iterative_equi_join(spark):
    """WITH RECURSIVE must execute as the engine's union-loop with an
    equi-join per level (frontier-sized builds) — never a cartesian
    expansion — and the depth rollup must match the closed form
    floor(log2(custkey + 1)) for the implicit binary referral tree."""
    from flink_big_query_connector_spark.plans import REGISTRY

    df = REGISTRY["b19_recursive_cte"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    import math

    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    expect = {}
    for c in range(n_cust):
        d = int(math.floor(math.log2(c + 1)))
        expect[d] = expect.get(d, 0) + 1
    got = {r["depth"]: r["n_members"] for r in df.collect()}
    assert got == expect
