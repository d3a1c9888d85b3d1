"""Physical-plan assertions: correctness is table stakes — these
tests pin the plan *shape* that survives a 100 TB scale-up
(pushdown at the scan, broadcast for bounded dims, no Python nodes
in relational paths)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from text_grabr_orc_spark.operators import relational
from text_grabr_orc_spark.plans import (
    assert_broadcast_join,
    assert_no_python,
    assert_pushed_filter,
    assert_whole_stage_codegen,
    executed_plan,
    formatted_plan,
)
from text_grabr_orc_spark.sources.orc_io import read_lineitem_orc
from text_grabr_orc_spark.tables import load_table


def test_q6_filters_pushed_to_parquet_scan(spark, sf_dir):
    df = relational.q6_forecast_revenue(spark, sf_dir)
    # quantity and discount predicates must reach the parquet reader
    assert_pushed_filter(df, "l_quantity")
    assert_pushed_filter(df, "l_discount")
    assert_no_python(df)
    assert_whole_stage_codegen(df)


def test_q6_column_pruning(spark, sf_dir):
    plan = formatted_plan(relational.q6_forecast_revenue(spark, sf_dir))
    scan_schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_schemas, plan
    # the scan must not read all 11 lineitem columns for a 4-column query
    assert "l_returnflag" not in scan_schemas[0]
    assert "l_orderkey" not in scan_schemas[0]


def test_q5_broadcasts_bounded_dims(spark, sf_dir):
    df = relational.q5_local_supplier_volume(spark, sf_dir)
    assert_broadcast_join(df)
    assert_no_python(df)


def test_top_parts_uses_broadcast(spark, sf_dir):
    df = relational.top_parts_by_revenue(spark, sf_dir)
    assert_broadcast_join(df)


def test_orc_scan_gets_pushdown_and_partition_pruning(spark, sf_dir):
    df = read_lineitem_orc(spark, sf_dir).filter(
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 30)
    )
    plan = formatted_plan(df)
    # partition-column predicate becomes directory pruning
    assert "PartitionFilters" in plan
    assert any(
        "l_returnflag" in ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ), plan
    # data-column predicate is pushed into the ORC reader
    assert_pushed_filter(df, "l_quantity")


def test_window_top3_uses_group_limit(spark, sf_dir):
    """rank<=k must push a per-partition limit (WindowGroupLimit) so
    executors never sort whole groups at scale."""
    df = relational.window_top3_orders_per_customer(spark, sf_dir)
    assert "WindowGroupLimit" in executed_plan(df)


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    """groupBy must partial-aggregate map-side (HashAggregate appears
    both below and above the exchange)."""
    li = load_table(spark, sf_dir, "lineitem")
    df = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    plan = executed_plan(df)
    assert plan.count("HashAggregate") >= 2, plan


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    """Bucketing is THE co-located-join strategy at 100 TB: both fact
    tables pre-hashed into the same bucket count on the join key means
    the join needs NO Exchange at query time — written once, joined
    many times shuffle-free."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("tgos_b_li", "tgos_b_ord"):
        # in-memory catalog forgets tables between sessions but the
        # warehouse directory survives -> LOCATION_ALREADY_EXISTS
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("tgos_b_li")
    od.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("tgos_b_ord")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a sort-merge path so the assertion is about bucketing,
        # not about the dim being broadcast-small at test scale
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        j = spark.table("tgos_b_li").join(
            spark.table("tgos_b_ord"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = executed_plan(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # and the result is right: every lineitem finds its order
        n_li = spark.table("tgos_b_li").count()
        assert j.count() == n_li
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_q10_broadcasts_nation_and_pushes_filters(spark, sf_dir):
    from text_grabr_orc_spark.operators import relational_ext

    df = relational_ext.q10_returned_item_reporting(spark, sf_dir)
    assert_broadcast_join(df)
    assert_pushed_filter(df, "l_returnflag")
    assert_pushed_filter(df, "o_orderdate")
    assert_no_python(df)


def test_q14_broadcasts_part_and_pushes_date(spark, sf_dir):
    from text_grabr_orc_spark.operators import relational_ext

    df = relational_ext.q14_promo_revenue(spark, sf_dir)
    assert_broadcast_join(df)
    assert_pushed_filter(df, "l_shipdate")
    assert_no_python(df)


def test_runtime_bloom_filter_injects_on_selective_shuffle_join(spark, sf_dir):
    """Spark's runtime bloom filter: a selective filter on the build
    side of a SHUFFLE join gets turned into a might_contain() probe on
    the stream side, skipping rows (and with parquet, row groups)
    before the shuffle. At production scale this activates by itself —
    the default gates are a >10 GB application-side scan and a <10 MB
    creation side; this test lowers the gates to pin the mechanism on
    fixture-sized data, because every fact-fact join in this repo is
    exactly the shape it accelerates at 100 TB."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_dir, "lineitem")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = executed_plan(j)
        assert "might_contain" in plan.lower(), plan
        # and the probe result is still correct
        assert j.count() > 0
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_sorted_layout_produces_disjoint_file_ranges(spark, sf_dir):
    """Proof from the parquet footers that repartitionByRange +
    sortWithinPartitions produced a zone-map-prunable layout: each
    file's l_shipdate min/max span is a narrow slice, and file ranges
    barely overlap — so a month-filter scan can skip most files on
    statistics alone."""
    import glob

    import pyarrow.parquet as pq

    from text_grabr_orc_spark.operators.relational_ext import (
        sorted_layout_zone_maps,
    )

    sorted_layout_zone_maps(spark, sf_dir).collect()  # materialize the cache
    import tempfile as _tf

    from text_grabr_orc_spark.tables import cache_tag

    out = os.path.join(_tf.gettempdir(), "tgos_sorted_cache", cache_tag(sf_dir))
    spans = []
    for f in glob.glob(os.path.join(out, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo = min(
            md.row_group(g).column(idx["l_shipdate"]).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx["l_shipdate"]).statistics.max
            for g in range(md.num_row_groups)
        )
        spans.append((lo, hi))
    assert len(spans) >= 4
    spans.sort()
    global_span = (
        max(hi for _, hi in spans) - min(lo for lo, _ in spans)
    ).total_seconds()
    # each file covers a narrow slice of the full range
    for lo, hi in spans:
        assert (hi - lo).total_seconds() <= global_span / 2
    # consecutive files are (near-)disjoint: ranges ordered by min must
    # not nest — each next file starts at or after the previous start,
    # and overlaps only at the boundary sliver
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert lo2 >= lo1
        overlap = (min(hi1, _hi2) - max(lo1, lo2)).total_seconds()
        assert overlap <= global_span / 8, (lo1, hi1, lo2, _hi2)


def test_nested_schema_pruning_reads_only_leaves(spark, sf_dir):
    from text_grabr_orc_spark.operators.relational_ext import (
        nested_struct_pruning,
    )

    df = nested_struct_pruning(spark, sf_dir)
    plan = formatted_plan(df)
    # the scan's ReadSchema must contain the referenced leaves...
    assert "priority" in plan and "total" in plan
    # ...and must NOT read the unreferenced leaves of the same structs
    for dropped in ("tax_estimate", "month", "status"):
        assert f"{dropped}" not in plan.split("ReadSchema")[1][:400], plan
    df.collect()


def test_filtered_topk_equi_join_and_group_limit(spark, sf_dir):
    """The metadata filter must plan as a broadcast EQUI-join on the
    label (hash-routed candidates, not a nested loop) and per-query
    ranking must push WindowGroupLimit."""
    from text_grabr_orc_spark.operators.similarity import (
        similarity_filtered_topk,
    )

    plan = executed_plan(similarity_filtered_topk(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_bloom_filter_table_is_broadcast(spark, sf_dir):
    """Both probe joins against the 512-word filter must broadcast —
    the whole point of the sketch is that only 2 KB ships."""
    from text_grabr_orc_spark.operators.curation import decontaminate_bloom

    plan = executed_plan(decontaminate_bloom(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_sparse_cosine_has_no_cartesian_and_partial_aggs(spark, sf_dir):
    """Pair generation must be the posting-list equi-join (term key),
    with partial aggregation before the pair shuffle and no cross
    product anywhere."""
    from text_grabr_orc_spark.operators.text_analysis import (
        docs_tfidf_cosine_pairs,
    )

    plan = executed_plan(docs_tfidf_cosine_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_" in plan  # map-side combine on the aggregates


def test_cdc_compaction_is_single_aggregate_no_window(spark, sf_dir):
    """Last-write-wins must be the max_by aggregate (map-side
    combinable), never a window rank that sorts whole per-key
    histories."""
    from text_grabr_orc_spark.operators.events_batch import (
        cdc_last_write_wins,
    )

    plan = executed_plan(cdc_last_write_wins(spark, sf_dir))
    assert "Window" not in plan
    assert "partial_" in plan


def test_cohort_retention_broadcasts_sizes(spark, sf_dir):
    """The cohort-size table is day-cardinality-bounded and must
    broadcast back into the final join."""
    from text_grabr_orc_spark.operators.timeseries import (
        events_cohort_retention,
    )

    plan = executed_plan(events_cohort_retention(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dynamic_partition_pruning_expression_in_scan(spark, sf_dir):
    """The join-driven partition filter must appear as a runtime
    DynamicPruning subquery on the partitioned scan — directory-level
    pruning decided by the dim side's result, not a literal."""
    from text_grabr_orc_spark.operators.sampling import (
        dynamic_partition_pruning_join,
    )

    df = dynamic_partition_pruning_join(spark, sf_dir)
    plan = formatted_plan(df)
    assert "dynamicpruning" in plan.lower(), plan
    # and the result itself stays correct
    rows = {r.lang: r.n_docs for r in df.collect()}
    assert len(rows) == 2 and all(n > 0 for n in rows.values())


def test_incremental_state_scan_is_partition_pruned(spark, sf_dir):
    """Cross-run dedup must read the persisted band table through a
    partition-pruned scan: the batch's band indices arrive as
    PartitionFilters on band_idx (directory-level pruning of the
    history state), and the probe is an equi-join, never a cartesian."""
    from text_grabr_orc_spark.operators.dedup import (
        dedup_incremental_minhash_state,
    )

    df = dedup_incremental_minhash_state(spark, sf_dir)
    plan = formatted_plan(df)
    part_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    assert any("band_idx" in ln and " IN " in ln for ln in part_lines), plan
    assert "CartesianProduct" not in plan
    # cross-run reuse: a second invocation matches against the SAME
    # persisted state (no rebuild) and returns identical pairs
    again = dedup_incremental_minhash_state(spark, sf_dir)
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_persisted_ivf_index_scan_is_partition_pruned(spark, sf_dir):
    """The stored IVF index must be read through a centroid_id
    partition-pruned scan (only the probed cells' directories open),
    and the probe side must broadcast."""
    from text_grabr_orc_spark.operators.similarity import (
        similarity_index_persisted,
        similarity_topk_ivf,
    )

    df = similarity_index_persisted(spark, sf_dir)
    plan = formatted_plan(df)
    part_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    assert any(
        "centroid_id" in ln and " IN " in ln for ln in part_lines
    ), plan
    assert "BroadcastHashJoin" in plan
    # persistence changes I/O, never answers: identical to in-session IVF
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, similarity_topk_ivf(spark, sf_dir).collect())
    )


def test_fuzzy_join_is_keyed_no_cartesian(spark, sf_dir):
    """FastSS blocking must plan as an equi-join on the variant hash
    — never a cartesian/nested-loop over the corpus — and the exact
    Levenshtein verify stays JVM-side (no Python nodes)."""
    from text_grabr_orc_spark.operators.linkage import fuzzy_join_blocked

    df = fuzzy_join_blocked(spark, sf_dir)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert any(
        "Join" in ln and "variant" in ln for ln in plan.splitlines()
    ), "variant equi-join missing"
    assert_no_python(df)


def test_quantile_sketch_broadcasts_bounds_no_python(spark, sf_dir):
    """Pass-1 bounds are broadcast back onto the fact scan; the whole
    sketch is expression-only."""
    from text_grabr_orc_spark.operators.sketches import (
        quantile_sketch_histogram,
    )

    df = quantile_sketch_histogram(spark, sf_dir)
    assert_broadcast_join(df)
    assert_no_python(df)
    assert "CartesianProduct" not in executed_plan(df)


def test_logreg_feature_pass_is_aggregate_only(spark, sf_dir):
    """Inference over the trained model is a map-only scan: no join,
    no window, no Python in the scoring plan."""
    from text_grabr_orc_spark.operators.curation import (
        predict_logreg_quality,
    )

    df = predict_logreg_quality(spark, sf_dir)
    plan = executed_plan(df)
    assert_no_python(df)
    for node in ("Join", "Window", "CartesianProduct"):
        assert node not in plan, node


def test_global_and_grouped_topk_rewrite_to_window_group_limit(spark, sf_dir):
    """Every row_number+filter top-k in the repo must hit Spark's
    WindowGroupLimit rewrite (per-partition pruning to k rows BEFORE
    the final exchange) — without it an unpartitioned Window.orderBy
    is a single-task global sort over the full relation, the classic
    100 TB scale-killer. Pinned as a plan-shape contract so a Spark
    version bump or an innocent pattern edit (e.g. rank -> a
    non-rank-function expression) can't silently reintroduce it.
    Covers the unpartitioned global top-k paths (BM25 ranked
    retrieval, vocabulary head, BPE pair counts) and the grouped
    per-query ranking paths (brute-force / IVFPQ similarity)."""
    from text_grabr_orc_spark.operators import curation, similarity, text_analysis

    cases = {
        "search_bm25_topk": text_analysis.search_bm25_topk,
        "vocab_top_tokens": curation.vocab_top_tokens,
        "bpe_merge_pairs": curation.bpe_merge_pairs,
        "similarity_topk_bruteforce": similarity.similarity_topk_bruteforce,
        "similarity_topk_ivf_pq": similarity.similarity_topk_ivf_pq,
    }
    for name, fn in cases.items():
        plan = formatted_plan(fn(spark, sf_dir))
        # two acceptable rewrites: WindowGroupLimit (grouped rank
        # pruning) or LimitPushDownThroughWindow, which materializes
        # as TakeOrderedAndProject under the Window (per-partition
        # global top-N + driver merge — strictly better for the
        # unpartitioned case). Either way the Window never sees the
        # full relation through a single-task sort.
        assert "WindowGroupLimit" in plan or "TakeOrderedAndProject" in plan, (
            f"{name} lost the top-k rewrite:\n{plan}"
        )


def test_round5_operators_plan_shapes(spark, sf_dir):
    """New round-5 operators keep scale-correct plans: the span scan
    joins on the gram key (no cartesian anywhere); DSIR's weight
    table and the waterfill level arrive as broadcasts; the EWMA fold
    is one aggregation (no window, no Python)."""
    from text_grabr_orc_spark.operators.curation import (
        dsir_importance_topk,
        token_budget_waterfill,
    )
    from text_grabr_orc_spark.operators.dedup import (
        dedup_longest_common_span,
    )
    from text_grabr_orc_spark.operators.timeseries import events_ewma_by_user

    lcs = formatted_plan(dedup_longest_common_span(spark, sf_dir))
    assert "CartesianProduct" not in lcs
    assert "BroadcastNestedLoopJoin" not in lcs

    dsir = formatted_plan(dsir_importance_topk(spark, sf_dir))
    assert "BroadcastHashJoin" in dsir
    assert "CartesianProduct" not in dsir

    wf = formatted_plan(token_budget_waterfill(spark, sf_dir))
    assert "CartesianProduct" not in wf

    ewma = formatted_plan(events_ewma_by_user(spark, sf_dir))
    assert "Window" not in ewma
    assert "Python" not in ewma and "ArrowEval" not in ewma


def test_sql_variable_and_parameter_fold_into_scan_pushdown(spark, sf_dir):
    """The session variable and the named parameter must behave as
    true literals: both predicates reach the parquet reader as
    PushedFilters — the property string-built SQL can't promise."""
    from text_grabr_orc_spark.operators.spark4_surface import (
        sql_variables_param_query,
    )

    df = sql_variables_param_query(spark, sf_dir)
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, plan
    assert any("o_totalprice" in ln and "GreaterThan" in ln for ln in pushed)
    assert any("o_orderstatus" in ln for ln in pushed)


def test_funnel_pre_collect_plans_are_clean(spark, sf_dir):
    """The corpus funnels' REGISTERED plans are LocalRelation
    projections by design (the wide row is collected once); the real
    probe/decon/packing lineage is the pre-collect wide frame — pin
    its hygiene here so the zero-cartesian / no-Python-node invariant
    does not depend on PLANS.md regeneration alone (round-9 verdict
    "What's missing" #4)."""
    from text_grabr_orc_spark import registry

    registry.load_all()
    from text_grabr_orc_spark.operators import flagship, incremental

    for fn in (flagship._flagship_wide, incremental.inc_wide_plan_frame):
        plan = formatted_plan(fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BatchEvalPython" not in plan, fn.__name__
