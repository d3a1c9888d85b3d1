"""Physical-plan assertions: correctness is table stakes — these
tests pin the plan *shape* that survives a 100 TB scale-up
(pushdown at the scan, broadcast for bounded dims, no Python nodes
in relational paths)."""

from __future__ import annotations

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
