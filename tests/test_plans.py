"""Physical-plan regression tests: the scale claims in SCALE.md held as
assertions — pushdown reaches scans, dims broadcast, top-k avoids global
sorts, aggregations use map-side partials. If a refactor silently turns
a broadcast join into a shuffle or drops a pushed filter, these fail."""

from __future__ import annotations

import pytest

from postgresimporter_spark.operators.bucketing import (
    count_exchanges,
    physical_plan,
)
from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


def plan_of(spark, reg, name):
    return physical_plan(reg[name].fn(spark, SF))


def test_q01_pushdown_and_pruning(spark, reg):
    df = reg["q01_pricing_summary"].fn(spark, SF)
    plan = physical_plan(df)
    # filter pushed into the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: untouched wide columns never read
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]
    # one shuffle total (partial agg -> exchange -> final agg)
    assert count_exchanges(df) == 1


def test_q05_star_join_broadcasts_dims(spark, reg):
    plan = plan_of(spark, reg, "q05_local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    # region filter reaches its scan
    assert "EqualTo(r_name,ASIA)" in plan


def test_q02_topk_avoids_global_sort(spark, reg):
    plan = plan_of(spark, reg, "q02_topk_orders")
    assert "TakeOrderedAndProject" in plan
    # no full-sort operator
    assert "Sort [" not in plan or "TakeOrderedAndProject" in plan


def test_q06_scalar_agg_single_exchange(spark, reg):
    df = reg["q06_revenue_delta"].fn(spark, SF)
    assert count_exchanges(df) == 0  # partial->final uses single-partition exchange, not hash
    plan = physical_plan(df)
    assert "PushedFilters" in plan and "l_discount" in plan


def test_q28_corpus_never_shuffles(spark, reg):
    df = reg["q28_similarity_topk"].fn(spark, SF)
    plan = physical_plan(df)
    # queries broadcast into a nested-loop join; the only exchange is the
    # final per-query window (partitioned by the tiny query-id key)
    assert "BroadcastNestedLoopJoin" in plan
    assert count_exchanges(df) <= 1


def test_q07_whole_stage_codegen_covers_agg(spark, reg):
    df = reg["q07_segment_stats"].fn(spark, SF)
    # codegen explain mode is the only stringification that reports
    # WholeStageCodegen subtrees under AQE
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "codegen"
    )
    jplan = df._jdf.queryExecution().explainString(mode)
    assert "WholeStageCodegen" in jplan


def test_q19_strip_stays_in_codegen(spark, reg):
    """Function library is pure Catalyst expressions: no Python eval
    operators in the plan."""
    for q in ["q19_strip", "q20_parse_timestamp_roundtrip", "q21_parse_date_roundtrip"]:
        plan = plan_of(spark, reg, q)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_python_paths_are_arrow_batched(spark, reg):
    """The sanctioned Python operators use Arrow-batched map/grouped-map
    (FlatMapGroupsInPandas / MapInPandas), never row-at-a-time eval."""
    for q in ["q47_label_centroids", "q49_pandas_tokenize"]:
        plan = plan_of(spark, reg, q)
        assert "BatchEvalPython" not in plan
        assert ("FlatMapGroupsInPandas" in plan) or ("MapInPandas" in plan)


def unpartitioned_windows(plan: str) -> list[str]:
    """Window operator lines with an empty partition spec (the
    one-reducer global sort Spark warns about). A fully-specified
    Window prints three bracket groups `Window [funcs], [part],
    [order]`. With only two groups the second is EITHER a partition
    spec (partitioned window without ordering — e.g. count() over a
    key partition: fine) or an order spec (global window: flag);
    order specs are distinguishable by their ASC/DESC markers."""
    out = []
    for line in plan.splitlines():
        if "Window [" not in line:
            continue
        if line.count("], [") >= 2:
            continue  # funcs + partition + order: partitioned
        if line.count("], [") == 0:
            out.append(line)  # funcs only: no partition at all
            continue
        tail = line.rsplit("], [", 1)[-1]
        if " ASC" in tail or " DESC" in tail:
            out.append(line)  # second group is an ORDER spec: global
    return out


def test_q41_has_no_unpartitioned_window(spark, reg):
    """VERDICT r01: q41's global NTILE window was a single-reducer
    scale-killer. The exact_ntile rewrite must leave zero unpartitioned
    windows (and no ntile at all) in the physical plan."""
    plan = plan_of(spark, reg, "q41_price_quartiles")
    assert "ntile" not in plan
    assert unpartitioned_windows(plan) == []


def test_q99_has_no_unpartitioned_window(spark, reg):
    """VERDICT r02: q99's vocabulary rank/coverage rode a global window.
    The global_running_sum rewrite must leave zero unpartitioned windows
    in the physical plan (rank + prefix sum are range-partitioned)."""
    plan = plan_of(spark, reg, "q99_vocabulary")
    assert unpartitioned_windows(plan) == []


def test_q55_is_single_lazy_plan(spark, reg):
    """Building q55 must not trigger an eager aggregation job (the old
    .collect() scalar did): beyond the parquet schema-read jobs that any
    load_tables incurs, constructing the plan launches nothing; the
    average-balance scalar joins in as a broadcast 1-row aggregate."""
    from postgresimporter_spark.plans.catalog import load_tables

    tracker = spark.sparkContext.statusTracker()
    n0 = len(tracker.getJobIdsForGroup(None))
    load_tables(spark, SF, ["customer", "orders"])
    baseline = len(tracker.getJobIdsForGroup(None)) - n0

    n1 = len(tracker.getJobIdsForGroup(None))
    df = reg["q55_prospect_segments"].fn(spark, SF)
    spent = len(tracker.getJobIdsForGroup(None)) - n1
    assert spent <= baseline, (spent, baseline)
    assert "BroadcastNestedLoopJoin" in physical_plan(df)


def test_q83_interval_join_is_bucketed_equi_join(spark, reg):
    """The interval join must be a (broadcast) hash equi-join on the
    coarse time bucket — never a cartesian/nested-loop point-x-interval
    comparison."""
    plan = plan_of(spark, reg, "q83_interval_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "BroadcastHashJoin" in plan


def test_q88_repetition_is_shuffle_free(spark, reg):
    """Per-row array math only: zero exchanges in the whole plan."""
    df = reg["q88_repetition_ratio"].fn(spark, SF)
    assert count_exchanges(df) == 0


def test_q87_decontaminate_broadcasts_eval_side(spark, reg):
    """The eval/benchmark shingle set must be the broadcast build side;
    the training corpus is never shuffled for the join itself (its only
    exchanges are the final per-doc aggregation)."""
    plan = plan_of(spark, reg, "q87_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q94_redaction_is_scan_shaped(spark, reg):
    df = reg["q94_pii_redact"].fn(spark, SF)
    assert count_exchanges(df) == 0
    assert "BatchEvalPython" not in physical_plan(df)


def test_q98_zorder_key_is_scan_shaped(spark, reg):
    df = reg["q98_zorder_key"].fn(spark, SF)
    assert count_exchanges(df) == 0
    plan = physical_plan(df)
    # '*(n)' prefixes mark whole-stage-codegen stages in the plan string
    assert "*(1)" in plan


def test_q95_joins_on_shingle_key_only(spark, reg):
    # doc-frequency join-back must be an equi-join, never a cross join
    plan = plan_of(spark, reg, "q95_dup_ngram_fraction")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q100_median_tables_broadcast(spark, reg):
    # both stat tables (median, MAD) join back via broadcast — the
    # events scan is never shuffled for the join
    plan = plan_of(spark, reg, "q100_robust_outliers")
    assert plan.count("BroadcastHashJoin") >= 2


def test_q102_subqueries_decorrelate(spark, reg):
    # Catalyst rewrites the correlated scalar subqueries + EXISTS into
    # joins; no per-row subquery execution survives in the plan
    plan = plan_of(spark, reg, "q102_sql_subqueries")
    assert "Subquery" not in plan
    assert "Join" in plan


def test_q129_probe_broadcasts_batch_never_cartesian(spark, reg):
    """Incremental MinHash: the (band, bucket) probe join must broadcast
    the new-batch side (history — the 100 TB side — never shuffles for
    the probe) and nothing in the plan may be a cartesian product."""
    plan = plan_of(spark, reg, "q129_incremental_minhash")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q130_span_dedup_no_unpartitioned_window(spark, reg):
    """Span removal reassembles text with a groupBy fold, never a
    window; a global window here would serialize the corpus."""
    plan = plan_of(spark, reg, "q130_span_dedup")
    assert unpartitioned_windows(plan) == []
    assert "CartesianProduct" not in plan


def test_q135_semdedup_joins_on_cell_key(spark, reg):
    """SemDeDup's pairwise stage must be a hash equi-join on the cell
    key — never a cartesian/broadcast nested loop over the corpus."""
    plan = plan_of(spark, reg, "q135_semdedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q158_prefix_filter_broadcasts_frequency_table(spark, reg):
    """PPJoin: the shingle-frequency table is vocabulary-sized and must
    broadcast; the candidate join must be a hash join on the shingle
    (equi), never a cartesian."""
    plan = plan_of(spark, reg, "q158_prefix_jaccard")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q163_batched_bm25_broadcasts_query_terms(spark, reg):
    """Batched BM25: df/query-term fan-out joins are broadcast (query
    table and per-term stats are metadata-scale); corpus side shuffles
    only for tf/dl aggregates."""
    plan = plan_of(spark, reg, "q163_rag_retrieval_eval")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
