"""Streaming/batch parity: the availableNow streaming runs must
reproduce the batch answers through real incremental execution."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_grabr_orc_spark.sources.events import load_events
from text_grabr_orc_spark.streaming import events as se


def test_streaming_distinct_users_equals_batch(spark, sf_dir):
    got = {r["user_id"] for r in se.streaming_distinct_users(spark, sf_dir).collect()}
    want = {
        r["user_id"]
        for r in load_events(spark, sf_dir).select("user_id").distinct().collect()
    }
    assert got == want


def test_streaming_hourly_equals_batch_groupby(spark, sf_dir):
    got = {
        (r["hour_start"], r["event_type"]): r["n"]
        for r in se.streaming_hourly_counts(spark, sf_dir).collect()
    }
    ev = load_events(spark, sf_dir)
    batch = (
        ev.withColumn("hour_start", F.date_format(F.date_trunc("hour", "ts"),
                                                  "yyyy-MM-dd HH:00:00"))
        .groupBy("hour_start", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {(r["hour_start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want


def test_session_window_total_events_conserved(spark, sf_dir):
    out = se.streaming_session_windows(spark, sf_dir)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == load_events(spark, sf_dir).count()


def test_foreachbatch_upsert_stable_across_runs(spark, sf_dir):
    """Two full runs (fresh sink dirs) must agree exactly — the
    foreachBatch partial-state merge is deterministic; and per-batch
    partitions must carry mergeable (n, sum) state."""
    from text_grabr_orc_spark.streaming.events import (
        streaming_foreachbatch_upsert,
    )

    a = {(r.event_type, r.n, r.sum_value)
         for r in streaming_foreachbatch_upsert(spark, sf_dir).collect()}
    b = {(r.event_type, r.n, r.sum_value)
         for r in streaming_foreachbatch_upsert(spark, sf_dir).collect()}
    assert a == b and a


def test_stream_stream_join_equals_batch_interval_join(spark, sf_dir):
    """The AvailableNow stream-stream interval join must equal the
    batch non-equi join on the same data."""
    from text_grabr_orc_spark.sources.events import load_events
    from text_grabr_orc_spark.streaming.events import (
        streaming_stream_stream_join,
    )

    got = {
        (r.click_id, r.purchase_id, r.user_id, r.click_us, r.purchase_us)
        for r in streaming_stream_stream_join(spark, sf_dir).collect()
    }
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "ts_ns"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts_ns").alias("c_ns"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts_ns").alias("p_ns"),
    )
    want = {
        (r.click_id, r.purchase_id, r.user_id, r.c_ns // 1000, r.p_ns // 1000)
        for r in c.join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("p_ns") >= F.col("c_ns"))
            & (F.col("p_ns") <= F.col("c_ns") + 30 * 60 * 1_000_000_000),
        ).collect()
    }
    assert got == want and got
