"""Physical-plan regression tests: the properties that matter at 100 TB.

These assert on the executed plan so a future refactor can't silently turn
a broadcast join into a sort-merge join, lose a parquet filter pushdown, or
replace distributed top-k with a single-partition global window.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_range_scan_pushes_filters_to_parquet(spark):
    df = E.q_link_range_scan(spark, SF)
    plan = plan_of(df)
    assert "PushedFilters: [" in plan
    # the id-range predicates must reach the scan, not sit in a Filter above
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    assert "GreaterThanOrEqual(event_id,100)" in pushed and "LessThan(event_id,500)" in pushed


def test_projection_prunes_columns(spark):
    df = E.q_link_range_scan(spark, SF)
    read_schema = [ln for ln in plan_of(df).splitlines() if "ReadSchema" in ln][0]
    assert "props" not in read_schema  # unused wide column never scanned


def test_revenue_join_broadcasts_dims(spark):
    plan = plan_of(E.q_revenue_by_nation(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pagination_is_take_ordered_not_window(spark):
    df = E.q_top_k_paged(spark, SF)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_search_match_broadcasts_term_weights(spark):
    plan = plan_of(E.q_search_match(spark, SF))
    # the (terms x df) side is broadcast; postings never shuffle for the join
    assert "BroadcastHashJoin" in plan


def test_partial_aggregation_before_shuffle(spark):
    """groupBy must plan partial (map-side) aggregation: two HashAggregate
    nodes around the exchange."""
    df = E.q_pricing_summary(spark, SF)
    plan = plan_of(df)
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan


def test_anti_join_is_join_not_subquery_loop(spark):
    plan = plan_of(E.q_anti_join_stale(spark, SF))
    assert "LeftAnti" in plan


def test_bucketed_postings_aggregate_without_shuffle(spark):
    """The persistent index layout: a term-bucketed postings table must
    aggregate by term with NO Exchange in the plan."""
    from usearch_spark.operators.search import (
        build_postings,
        doc_frequencies,
        load_postings,
        save_postings_bucketed,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    postings = build_postings(docs, id_col="doc_id", text_cols=("text",))
    save_postings_bucketed(postings, "postings_bucketed_test", buckets=4)
    try:
        loaded = load_postings(spark, "postings_bucketed_test")
        dfreq = doc_frequencies(loaded, id_col="doc_id")
        plan = plan_of(dfreq)
        assert "Exchange" not in plan, plan
        assert dfreq.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS postings_bucketed_test")


def test_whole_stage_codegen_active(spark):
    df = E.q_pricing_summary(spark, SF)
    df.collect()  # AQE finalizes the plan only after execution
    plan = plan_of(df)
    assert "isFinalPlan=true" in plan
    # '*(n)' prefixes mark whole-stage-codegen'd operators in toString form
    assert "*(1)" in plan and "*(2)" in plan


def test_asof_single_shuffle_on_key(spark):
    """The as-of union-sort encoding must shuffle exactly once (on the key)
    — no range-explode join, no per-group Python."""
    plan = plan_of(E.q_asof_join(spark, SF))
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_store_edges_fk_checks_are_semi_joins(spark):
    plan = plan_of(E.q_store_edges_lifecycle(spark, SF))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan  # stale-edge removal


def test_highlight_is_jvm_only(spark):
    """X7's query path must stay in whole-stage codegen — no Python eval."""
    plan = plan_of(E.q_search_highlight(spark, SF))
    assert "EvalPython" not in plan
    assert "PushedFilters" in plan  # doc_id < 100 reaches the scan


def test_query_path_uses_persistent_postings_without_shuffle(spark, tmp_path):
    """The entry queries' postings provider must hand back the bucketed
    TABLE (not a rebuilt set): its dfreq aggregation plans with no
    Exchange, and a second call reuses the same catalog table."""
    import __spark_entry__ as E2
    from usearch_spark.operators.search import doc_frequencies

    tbl = f"postings_{E2._sf_token(SF)}"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    try:
        postings = E2._postings_df(spark, SF)
        assert spark.catalog.tableExists(tbl)
        dfreq = doc_frequencies(postings, id_col="doc_id")
        plan = plan_of(dfreq)
        assert "Exchange" not in plan, plan
        # second call = same table, no rebuild
        again = E2._postings_df(spark, SF)
        assert "Exchange" not in plan_of(doc_frequencies(again, id_col="doc_id"))
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_winnow_pairs_evaluates_fingerprints_once(spark):
    # InferFiltersFromGenerate + pushdown can inline the whole winnowing
    # expression into a pre-projection Filter (re-tokenizing per lambda
    # element -> quadratic).  The operator uses explode_outer to defeat it:
    # the tokenizer regex must appear exactly twice in the plan (once per
    # self-join side), never inside a Filter.
    plan = plan_of(E.q_text_winnow(spark, SF))
    assert plan.count("regexp_extract_all") == 2
    for ln in plan.splitlines():
        if "Filter" in ln:
            assert "regexp_extract_all" not in ln


def test_corpus_sample_filters_materialized_features_not_reinlined(spark):
    # the stratum filter must run against the checkpointed feature table;
    # without the barrier, predicate pushdown inlines the whole language-ID
    # expression tree (tokenize regex and all) into a scan-level Filter and
    # every metric is computed twice (measured 5x wall on sf0.1)
    plan = plan_of(E.q_corpus_sample(spark, SF))
    assert "regexp_extract_all" not in plan
    assert "Scan ExistingRDD" in plan  # the materialized feature table


def test_corpus_prep_filters_materialized_features_not_reinlined(spark):
    plan = plan_of(E.q_corpus_prep(spark, SF))
    # the quality/length filter reads checkpointed features; the only
    # tokenize work left in the plan is the minhash shingle side
    assert "Scan ExistingRDD" in plan


def test_q5_join_broadcasts_all_dimensions(spark):
    # six-table Q5 shape: every dimension side is broadcast — the only
    # shuffle exchange belongs to the fact-fact join / final aggregate
    plan = plan_of(E.q_local_supplier_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_cooccurrence_topk_is_take_ordered(spark):
    # top-50 strongest pairs must be TakeOrderedAndProject, not a global
    # sort or a single-partition window
    plan = plan_of(E.q_supplier_cooccurrence(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_doc_keywords_window_is_partitioned(spark):
    # per-doc top-k runs a doc_id-PARTITIONED window — a global (empty
    # partition spec) window would single-task the whole postings set
    df = E.q_doc_keywords(spark, SF)
    plan = plan_of(df)
    win_lines = [ln for ln in plan.splitlines() if "Window" in ln and "windowspecdefinition" in ln]
    assert win_lines, plan
    for ln in win_lines:
        assert "doc_id" in ln.split("windowspecdefinition")[1][:60]


def test_bm25_broadcasts_weights_and_stays_jvm(spark):
    plan = plan_of(E.q_search_bm25(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_events_anomaly_broadcasts_stats_side(spark):
    plan = plan_of(E.q_events_anomaly(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_event_transitions_window_partitioned_by_user(spark):
    plan = plan_of(E.q_event_transitions(spark, SF))
    win_lines = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert win_lines, plan
    for ln in win_lines:
        assert "user_id" in ln.split("windowspecdefinition")[1][:60]


def test_cms_estimate_broadcasts_sketch(spark):
    """The sketch side (<= depth x width rows) must broadcast — probing N
    keys must not shuffle the probe side."""
    plan = plan_of(E.q_sketch_cms_users(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_membership_broadcasts_bits(spark):
    plan = plan_of(E.q_sketch_bloom_prune(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_adamic_adar_topk_is_take_ordered(spark):
    """Top-20 pairs must plan as TakeOrderedAndProject, not a global sort
    or single-partition window."""
    plan = plan_of(E.q_graph_adamic_adar(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_ewma_has_no_python_stage(spark):
    """The EWMA fold is sort_array + aggregate — pure JVM; no Arrow/Python
    evaluation may appear in the plan."""
    plan = plan_of(E.q_events_ewma(spark, SF))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_order_priority_exists_is_semi_join(spark):
    plan = plan_of(E.q_order_priority_late(spark, SF))
    assert "LeftSemi" in plan


def test_bpe_encode_broadcasts_word_map(spark):
    plan = plan_of(E.q_bpe_encode(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_partition_pruned_scan_has_partition_filters(spark):
    """The date-partitioned events rollup must PRUNE: the scan carries a
    PartitionFilters entry binding the day column to the queried literal
    — reading one day of a 100-TB table instead of all of it — and only
    that day's directory is listed."""
    df = E.q_events_partition_pruned(spark, SF)
    plan = plan_of(df)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf, plan
    assert "day" in pf[0] and "=" in pf[0], pf[0]
    # the pruned filter must NOT fall back to a post-scan Filter on day
    assert "PartitionFilters: []" not in pf[0]


def test_langid_profile_join_broadcasts(spark):
    """The |langs|*K profile table must broadcast into the doc-gram side
    (a shuffle join on 'gram' would move the corpus for a kilobyte dim);
    the tiny langs list fans out as a broadcast nested-loop cross.  The
    only sort-merge join allowed is the doc-spine left join, whose both
    sides are corpus-sized by construction."""
    df = E.q_text_langid(spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan  # (lang, gram) -> profile rank
    assert "BroadcastNestedLoopJoin" in plan  # doc-gram x langs fan-out
    assert plan.count("SortMergeJoin") <= 1  # the spine join only


def test_dedup_spans_counts_partial_aggregate(spark):
    """The window-multiplicity count must partial-aggregate map-side: hub
    windows (boilerplate) reduce to one count row per map task instead of
    shuffling every occurrence to one reducer."""
    df = E.q_dedup_spans(spark, SF)
    plan = plan_of(df)
    assert "partial_count" in plan, plan[:2000]


def test_colocated_join_has_no_exchange(spark):
    """The bucketed-by-orderkey layout must join WITHOUT shuffling either
    fact side (the 100-TB point of bucketing).  At bench SFs AQE
    broadcasts the small side — also exchange-free — so the test forces
    the fact-fact SortMergeJoin path by disabling broadcast and asserts
    the bucketed scans feed it with NO Exchange on either join key."""
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = E.q_join_colocated(spark, SF)
        plan = plan_of(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan and "SelectedBucketsCount" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan[:3000]
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan[:3000]
