"""M4 — Structured Streaming over the events table.

The reference has no streaming (each HTTP request is independent,
``/root/reference/main.go:41-97``); this module supplies the
streaming operator surface of SURVEY.md §2b: watermarks, tumbling /
sliding / session windows, and streaming deduplication.

Driver-contract adaptation: each registered query runs the stream
with ``Trigger.AvailableNow`` into an in-memory sink and returns the
final table — a real incremental execution (state store, watermarks,
micro-batches) whose RESULT equals the batch semantics, which is
exactly what makes a DuckDB oracle possible. On a live cluster the
same builders run with a real source/sink and a continuous trigger.

Timestamps: the parquet carries TIMESTAMP(MICROS) read as NTZ; we
derive epoch integers with tz-free arithmetic (see sources/events.py)
and set the session timezone to UTC for the streaming run, because
streaming ``window()`` state keys are zone-sensitive; outputs are
formatted strings, so results stay environment-independent.
"""

from __future__ import annotations

import itertools
import os
import tempfile

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_grabr_orc_spark.registry import register
from text_grabr_orc_spark.sources.events import EPOCH_US_EXPR
from text_grabr_orc_spark.tables import table_path

_COUNTER = itertools.count()


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the same tz-free
    timestamp normalization as the batch loader."""
    path = table_path(sf_dir, "events")
    schema = spark.read.parquet(path).schema
    # the file streaming source wants a DIRECTORY; stream the sf dir
    # with a glob pinned to the events table
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return _normalize_events(raw)


def _normalize_events(raw: DataFrame) -> DataFrame:
    return raw.select(
        "event_id",
        F.expr(f"({EPOCH_US_EXPR}) * 1000").alias("ts_ns"),
        "ts",
        # watermarks/windows demand TIMESTAMP (not NTZ): build the
        # instant straight from epoch micros — timezone-free
        F.expr(f"timestamp_micros({EPOCH_US_EXPR})").alias("ts_utc"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


#: (fixture content tag, n_files) -> split directory. Same staleness
#: convention as multimodal.synthesize_scan_dir.
_EVENTS_SPLIT_CACHE: dict = {}


def time_split_events_dir(
    spark: SparkSession, sf_dir: str, n_files: int = 16
) -> str:
    """The events table rewritten as ``n_files`` time-ordered parquet
    files with staggered mtimes, so FileStreamSource with
    ``maxFilesPerTrigger=1`` replays them as an in-order micro-batch
    sequence — the bounded stand-in for a live trigger, used by the
    UPDATE-mode queries whose whole point is cross-batch watermark
    eviction (a single-file source is one batch: nothing ever
    evicts). Range partitioning on ts gives file k strictly earlier
    data than file k+1, so event time is monotone across batches and
    the watermark can never drop a window that still has rows
    in flight."""
    from text_grabr_orc_spark.tables import cache_tag

    key = (cache_tag(sf_dir), int(n_files))
    cached = _EVENTS_SPLIT_CACHE.get(key)
    if cached is not None and os.path.isdir(cached):
        return cached
    ev = spark.read.parquet(table_path(sf_dir, "events"))
    out = tempfile.mkdtemp(prefix="tgos_evsplit_")
    (
        ev.repartitionByRange(n_files, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(out)
    )
    parts = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    base = os.path.getmtime(os.path.join(out, parts[0]))
    for i, f in enumerate(parts):
        os.utime(os.path.join(out, f), (base + i, base + i))
    _EVENTS_SPLIT_CACHE[key] = out
    return out


def events_stream_split(
    spark: SparkSession, sf_dir: str, n_files: int = 16
) -> DataFrame:
    """events_stream over the time-split multi-batch fixture."""
    path = table_path(sf_dir, "events")
    schema = spark.read.parquet(path).schema
    split = time_split_events_dir(spark, sf_dir, n_files)
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(split)
    )
    return _normalize_events(raw)


def _fmt_instant(col: str, fmt: str):
    """Format a TIMESTAMP instant as its UTC wall clock, independent
    of the session timezone: epoch seconds -> NTZ -> date_format
    (date_format on NTZ ignores the zone)."""
    return F.date_format(
        F.expr(
            f"timestampadd(SECOND, unix_timestamp({col}), "
            "TIMESTAMP_NTZ'1970-01-01 00:00:00')"
        ),
        fmt,
    )


def run_to_memory(
    df: DataFrame, mode: str = "complete", state_partitions: int | None = 8
) -> DataFrame:
    """Execute a streaming DataFrame with AvailableNow into a memory
    sink; block until done; return the materialized result.

    ``state_partitions`` sizes the state store for the run (the
    shuffle-partition count a stateful query freezes into its
    checkpoint at first start — see run_update_to_parquet): every
    registered streaming query here carries sketch- or
    window-bounded state, so 8 stores beat the batch-tuned 32; a
    larger keyspace deployment raises it before first start. Pass
    None to keep the session setting — required for the
    applyInPandasWithState operators, where the state partition
    count is ALSO the Python-worker parallelism (8 stores would
    halve their throughput on 32 cores: measured 19.7 s -> 34.7 s
    on the streaming MinHash query)."""
    spark = df.sparkSession
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if state_partitions is not None:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(state_partitions)
        )
    name = f"tgos_stream_{next(_COUNTER)}"
    checkpoint = tempfile.mkdtemp(prefix="tgos_ckpt_")
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", os.path.join(checkpoint, "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    return df.sparkSession.table(name)


def run_update_to_parquet(
    df: DataFrame, state_partitions: int = 8
) -> tuple[DataFrame, list[int]]:
    """Execute a streaming aggregate in UPDATE output mode with
    AvailableNow: each micro-batch's update rows land in a parquet
    sink partitioned by batch id with dynamic partition overwrite
    (the idempotent foreachBatch recipe — a retried batch overwrites
    its own partition). Returns the raw update-row table (with a
    ``batch_id`` column) plus the per-batch state-store row counts
    from the progress events, so callers — and the state-bound test —
    can see the watermark actually evicting.

    This is the live-trigger deployment shape: state holds only open
    windows (the watermark evicts closed ones), and the final table
    is ASSEMBLED from update rows — for each key, the last batch to
    touch it emitted its final cumulative value, so max_by(batch_id)
    reconstructs the complete result without ever holding it in
    state.

    ``state_partitions`` sizes the state store: a stateful query
    freezes ``spark.sql.shuffle.partitions`` into its checkpoint at
    the first batch, so this is the one knob a streaming deployment
    MUST size to its keyspace up front (it cannot be changed on
    restart without rebuilding state). Sketch-bounded state here is
    a few thousand cells, so 8 stores beat the batch-tuned 32 — at a
    larger keyspace a deployment raises it BEFORE first start. The
    conf is set for the duration of the (blocking) run and restored;
    each batch's update rows are likewise sketch-sized, so the sink
    coalesces to one file per batch instead of one per shuffle task."""
    spark = df.sparkSession
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    prev_pom = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    out_dir = tempfile.mkdtemp(prefix="tgos_updsink_")
    data_dir = os.path.join(out_dir, "data")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.coalesce(1)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(data_dir)
        )

    try:
        q = (
            df.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(out_dir, "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        state_rows = [
            p["stateOperators"][0]["numRowsTotal"]
            for p in (q.recentProgress or [])
            if p.get("stateOperators")
        ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_pom)
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    return spark.read.parquet(data_dir), state_rows


@register(
    "streaming_hourly_counts",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour_start,
           event_type,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregate with a watermark — the
    canonical streaming rollup. AvailableNow + complete mode emits
    every window, so the result equals the batch group-by (the
    oracle); with a live trigger the same plan emits incrementally,
    state bounded by the 10-minute watermark."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts_utc", "10 minutes")
        .groupBy(F.window("ts_utc", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.expr("CAST(value AS DECIMAL(18,2))")).cast("double"), 2
            ).alias("sum_value"),
        )
    )
    out = run_to_memory(agg, "complete")
    return out.select(
        _fmt_instant("w.start", "yyyy-MM-dd HH:00:00").alias("hour_start"),
        "event_type",
        "n",
        "sum_value",
    )


@register(
    "streaming_sliding_windows",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 15 MINUTE, ts)
                    - (j * INTERVAL 15 MINUTE), '%Y-%m-%d %H:%M:00') AS window_start,
           event_type,
           count(*) AS n
    FROM events CROSS JOIN (SELECT unnest(range(4)) AS j)
    GROUP BY 1, 2
    """,
)
def streaming_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour long, 15-minute slide): each event
    lands in 4 overlapping windows. The oracle replicates with the
    window-start identity start in {floor15(ts) - j*15m, j=0..3}."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts_utc", "10 minutes")
        .groupBy(
            F.window("ts_utc", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = run_to_memory(agg, "complete")
    return out.select(
        _fmt_instant("w.start", "yyyy-MM-dd HH:mm:00").alias("window_start"),
        "event_type",
        "n",
    )


@register(
    "streaming_session_windows",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts,
               sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM ordered
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(ts, 30 minutes) per user — Spark's native
    stateful sessionization. The oracle is batch gap-sessionization
    (lag + prefix sum), which session-window semantics reduce to for
    a static dataset: same sessions, same counts, same start times
    (truncated to seconds for cross-engine string stability)."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts_utc", "10 minutes")
        .groupBy(F.session_window("ts_utc", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts_utc").alias("first_ts"))
    )
    out = run_to_memory(agg, "complete")
    return out.select(
        "user_id",
        _fmt_instant("first_ts", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
    )


@register(
    "streaming_distinct_users",
    oracle="SELECT DISTINCT user_id FROM events",
)
def streaming_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: dropDuplicates on the key column.
    Projected to just the key, so the result is order-insensitive and
    exactly the batch DISTINCT — while executing through the
    streaming dedup state store. (dropDuplicatesWithinWatermark is
    the bounded-state variant for true infinite streams; over a
    finite replay both keep exactly one row per key.)"""
    ev = events_stream(spark, sf_dir)
    dedup = ev.select("user_id").dropDuplicates(["user_id"])
    return run_to_memory(dedup, "append")


@register(
    "streaming_stateful_user_stats",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def streaming_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM stateful streaming operator via applyInPandasWithState:
    per-user running (count, sum) kept in explicit group state across
    micro-batches, emitted after the final batch. The oracle is the
    batch group-by — the stateful replay must converge to it exactly
    (sum carried in integer cents so cross-batch accumulation is
    exact).

    This is the extension point for operators Spark lacks natively
    (custom sessionization, decaying counters, online sketches):
    state is an arbitrary tuple per key, updates are pandas-vectorized
    per micro-batch."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = events_stream(spark, sf_dir)

    def update(key, pdfs, state: GroupState):
        rows, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            rows += len(pdf)
            # exact accumulation: values are 2-decimal doubles -> cents
            cents += int(round(float(pdf["value"].sum()) * 100))
        state.update((rows, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [rows], "total_cents": [cents]}
        )

    out = ev.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, total_cents bigint",
        stateStructType="n bigint, cents bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # state_partitions=None: applyInPandasWithState parallelism IS
    # the state partition count — keep the session's core-sized value
    final = run_to_memory(out, "update", state_partitions=None)
    # multiple micro-batches emit one row per user per batch in update
    # mode; the LAST emission per user carries the converged totals
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        final.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "n_events",
            F.round(F.col("total_cents") / 100.0, 2).alias("total_value"),
        )
    )


@register(
    "streaming_static_join_segments",
    oracle="""
    SELECT c.c_mktsegment,
           e.event_type,
           count(*) AS n,
           round(CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def streaming_static_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC JOIN: the event stream enriched against the
    static customer dimension (user_id = c_custkey in the fixtures),
    then aggregated by market segment. Spark broadcasts/rereads the
    static side per micro-batch — the standard streaming-enrichment
    plan; no state is kept for the static side, so it scales with the
    stream, not the dimension."""
    from text_grabr_orc_spark.tables import load_table

    ev = events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = ev.join(cust, ev.user_id == cust.c_custkey)
    agg = joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.expr("CAST(value AS DECIMAL(18,2))")).cast("double"), 2
        ).alias("sum_value"),
    )
    return run_to_memory(agg, "complete")


@register(
    "streaming_file_sink_purchases",
    oracle="""
    SELECT user_id,
           count(*) AS n_purchases,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total_value
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
)
def streaming_file_sink_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PARQUET FILE SINK with checkpointing: filter the
    stream to purchases, write exactly-once to a parquet directory
    (the sink's commit log is what makes re-runs idempotent), then
    read the directory back batch-side and aggregate. The oracle is
    the batch filter+group-by — equality proves the sink lost and
    duplicated nothing."""
    ev = events_stream(spark, sf_dir)
    out_dir = tempfile.mkdtemp(prefix="tgos_fsink_")
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        q = (
            ev.filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "value")
            .writeStream.format("parquet")
            .option("path", os.path.join(out_dir, "data"))
            .option("checkpointLocation", os.path.join(out_dir, "cp"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    back = spark.read.parquet(os.path.join(out_dir, "data"))
    return back.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(
            F.sum(F.expr("CAST(value AS DECIMAL(18,2))")).cast("double"), 2
        ).alias("total_value"),
    )


@register(
    "streaming_dedup_within_watermark",
    oracle="""
    WITH fp AS (
        SELECT user_id, event_type,
               min(epoch_us(ts)) AS first_us
        FROM events
        GROUP BY user_id, event_type
    )
    SELECT user_id, event_type, first_us FROM fp
    """,
)
def streaming_dedup_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dropDuplicatesWithinWatermark on (user_id, event_type): unlike
    plain dropDuplicates, state for a key is EVICTED once the
    watermark passes it — the only dedup that survives an unbounded
    stream. Within one availableNow replay of a month of events with
    a 90-day watermark nothing is evicted, so the kept row per key is
    the first-arrival (files stream in order) and the result equals
    the batch min-per-key oracle."""
    ev = events_stream(spark, sf_dir)
    dedup = (
        ev.withWatermark("ts_utc", "90 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select(
            "user_id",
            "event_type",
            F.expr("ts_ns div 1000").alias("first_us"),
        )
    )
    return run_to_memory(dedup, "append")


@register(
    "streaming_foreachbatch_upsert",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def streaming_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch UPSERT sink: each micro-batch writes its partial
    per-type aggregate into a parquet directory PARTITIONED BY the
    batch id with dynamic partition overwrite — the standard
    idempotent foreachBatch recipe (a retried batch overwrites its own
    partition instead of appending duplicates, giving exactly-once
    output on at-least-once execution). The final result re-merges the
    mergeable partial states across batches; the oracle is the batch
    group-by over all events, so equality proves no batch was lost,
    duplicated, or double-merged.

    Scale: this is how streaming pipelines maintain warehouse tables
    without a transactional table format — partial aggregates are
    bounded by (keys x batches), the merge is a tiny re-aggregation,
    and per-batch work stays O(batch). With a lakehouse format the
    sink body becomes a MERGE INTO keyed on event_type instead."""
    ev = events_stream(spark, sf_dir)
    out_dir = tempfile.mkdtemp(prefix="tgos_febsink_")
    data_dir = os.path.join(out_dir, "data")
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    prev_pom = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.expr("CAST(value AS DECIMAL(18,2))")).alias("sum_dec"),
            )
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(data_dir)
        )

    try:
        q = (
            ev.select("event_type", "value")
            .writeStream.foreachBatch(upsert_batch)
            .option("checkpointLocation", os.path.join(out_dir, "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_pom)
    back = spark.read.parquet(data_dir)
    return back.groupBy("event_type").agg(
        F.coalesce(F.sum("n"), F.lit(-1)).cast("bigint").alias("n"),
        F.round(F.sum("sum_dec").cast("double"), 2).alias("sum_value"),
    )


@register(
    "streaming_stream_stream_join",
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           epoch_us(c.ts) AS click_us,
           epoch_us(p.ts) AS purchase_us
    FROM events c
    JOIN events p
      ON c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.user_id = c.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join — the last big piece of the streaming
    operator surface: clicks joined to the same user's purchases
    arriving within 30 minutes, both sides unbounded streams. The
    time-range condition plus both watermarks is what makes the state
    bounded: Spark keeps click state only until its watermark passes
    click_ts + 30 minutes and purchase state until the range can no
    longer match, then evicts — the standard interval-join state
    contract. Inner-join rows emit as soon as both sides arrive (no
    watermark wait on output), so AvailableNow produces exactly the
    batch interval-join result, which is the oracle.

    Scale: state is hash-partitioned by user_id (the equi half of the
    condition); the range half prunes within each key's state. Output
    timestamps are epoch microseconds — integer, timezone-free."""
    ev = events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts_utc").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts_utc").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            """
            user_id = p_user_id AND
            purchase_ts >= click_ts AND
            purchase_ts <= click_ts + interval 30 minutes
            """
        ),
    )
    out = run_to_memory(joined, "append")
    return out.select(
        "click_id",
        "purchase_id",
        "user_id",
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
    )


@register(
    "streaming_stream_stream_left_join",
    oracle="""
    WITH c AS (
        SELECT event_id AS click_id, user_id, ts FROM events
        WHERE event_type = 'click'
    ), p AS (
        SELECT event_id AS purchase_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    ), wm AS (
        -- the final global watermark of the AvailableNow run:
        -- min over both streams of (max event time - 1h delay)
        SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
               - INTERVAL 1 HOUR AS w
    ), matched AS (
        SELECT c.click_id, p.purchase_id, c.user_id,
               epoch_us(c.ts) AS click_us, epoch_us(p.ts) AS purchase_us
        FROM c JOIN p
          ON p.user_id = c.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    ), unmatched AS (
        -- a click emits its null-side row only once the watermark
        -- passes the end of its join window; clicks newer than that
        -- are still in state when the query stops and never emit
        SELECT c.click_id, CAST(-1 AS BIGINT) AS purchase_id, c.user_id,
               epoch_us(c.ts) AS click_us, CAST(-1 AS BIGINT) AS purchase_us
        FROM c CROSS JOIN wm
        WHERE c.ts + INTERVAL 30 MINUTE < wm.w
          AND NOT EXISTS (
              SELECT 1 FROM p
              WHERE p.user_id = c.user_id
                AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
          )
    )
    SELECT * FROM matched UNION ALL SELECT * FROM unmatched
    """,
)
def streaming_stream_stream_left_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the semantically
    hardest streaming operator surface: matches emit immediately, but
    a click's null-side row can only emit once the global watermark
    proves no matching purchase can still arrive (watermark >
    click_ts + 30 min), and clicks younger than that are STILL IN
    STATE when an AvailableNow run stops — they never emit. The
    oracle models exactly that: batch interval join for matches,
    plus null-side rows only for clicks whose join window closed
    under the final watermark min(max(click ts), max(purchase ts)) -
    1 hour. A green hash check here means the engine's watermark
    eviction semantics, not just its join results, are pinned.

    Null-side ids emit as -1 (nullable BIGINT degrades to float64 in
    pandas-based comparators — the repo-wide convention).

    Scale: same bounded-state contract as the inner variant; the
    outer semantics add the deferred null-side emission driven by
    watermark advancement (Spark's no-data final micro-batch is what
    flushes the closable windows at end of input)."""
    ev = events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts_utc").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts_utc").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            """
            user_id = p_user_id AND
            purchase_ts >= click_ts AND
            purchase_ts <= click_ts + interval 30 minutes
            """
        ),
        "leftOuter",
    )
    out = run_to_memory(joined, "append")
    return out.select(
        "click_id",
        F.coalesce("purchase_id", F.lit(-1)).cast("bigint").alias("purchase_id"),
        "user_id",
        F.unix_micros("click_ts").alias("click_us"),
        F.coalesce(F.unix_micros("purchase_ts"), F.lit(-1)).alias("purchase_us"),
    )


_HIST_P90_ORACLE = """
    WITH bounds AS (
        SELECT event_type, min(value) AS vmin, max(value) AS vmax
        FROM events GROUP BY 1
    ), binned AS (
        SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:00:00')
                   AS hour_start,
               e.event_type,
               CASE WHEN b.vmax = b.vmin THEN 0
                    ELSE least(255,
                               CAST(floor((e.value - b.vmin)
                                          / (b.vmax - b.vmin) * 256)
                                    AS BIGINT))
               END AS bin
        FROM events e JOIN bounds b USING (event_type)
    ), hist AS (
        SELECT hour_start, event_type, bin, count(*) AS n
        FROM binned GROUP BY 1, 2, 3
    ), cum AS (
        SELECT hour_start, event_type, bin,
               sum(n) OVER (PARTITION BY hour_start, event_type
                            ORDER BY bin ROWS UNBOUNDED PRECEDING) AS c,
               sum(n) OVER (PARTITION BY hour_start, event_type) AS total
        FROM hist
    ), hit AS (
        SELECT hour_start, event_type, total, min(bin) AS qbin
        FROM cum WHERE c >= ceil(0.9 * total)
        GROUP BY 1, 2, 3
    )
    SELECT h.hour_start, h.event_type, CAST(h.qbin AS BIGINT) AS qbin,
           round(b.vmin + (h.qbin + 1) * ((b.vmax - b.vmin) / 256), 6)
               AS est_p90,
           CAST(h.total AS BIGINT) AS n
    FROM hit h JOIN bounds b USING (event_type)
    """


def _hist_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type (vmin, vmax) calibration for the equi-width sketch —
    a batch pass, broadcast into the stream as a stream-static join."""
    batch = spark.read.parquet(table_path(sf_dir, "events"))
    return F.broadcast(
        batch.groupBy("event_type").agg(
            F.min("value").alias("vmin"), F.max("value").alias("vmax")
        )
    )


def _hist_bin_col() -> "F.Column":
    return F.when(
        F.col("vmax") == F.col("vmin"), F.lit(0).cast("bigint")
    ).otherwise(
        F.least(
            F.lit(255).cast("bigint"),
            F.floor(
                (F.col("value") - F.col("vmin"))
                / (F.col("vmax") - F.col("vmin"))
                * 256
            ),
        )
    )


def _p90_from_sketch(sketch: DataFrame, bounds: DataFrame) -> DataFrame:
    """p90 extraction off a materialized (hour_start, event_type,
    bin, n) histogram sketch — shared by the complete-mode and
    update-mode streaming variants (same sketch, different state
    lifecycle)."""
    from pyspark.sql import Window as W

    wcum = (
        W.partitionBy("hour_start", "event_type")
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wtot = W.partitionBy("hour_start", "event_type")
    cum = sketch.select(
        "hour_start",
        "event_type",
        "bin",
        F.sum("n").over(wcum).alias("c"),
        F.sum("n").over(wtot).alias("total"),
    )
    hit = (
        cum.filter(F.col("c") >= F.ceil(0.9 * F.col("total")))
        .groupBy("hour_start", "event_type")
        .agg(F.min("bin").alias("qbin"), F.first("total").alias("n"))
    )
    return hit.join(bounds, "event_type").select(
        "hour_start",
        "event_type",
        F.col("qbin").cast("bigint"),
        F.round(
            F.col("vmin")
            + (F.col("qbin") + 1) * ((F.col("vmax") - F.col("vmin")) / 256),
            6,
        ).alias("est_p90"),
        F.col("n").cast("bigint"),
    )


@register("streaming_histogram_p90", oracle=_HIST_P90_ORACLE)
def streaming_histogram_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable histogram quantile sketch
    (``quantile_sketch_histogram``) as a STREAM: per tumbling hour and
    event type, maintain 256 equi-width bin counters in streaming
    state and read the p90 estimate off the final counts. Bin bounds
    come from a batch calibration pass (per-type min/max — the
    standard fixed-calibration trick, since a stream cannot two-pass),
    broadcast into the stream as a stream-static join; the streaming
    aggregate state is exactly the sketch (#windows x #types x <=256
    counters per window), which is what makes the sketch the RIGHT
    quantile shape for unbounded data — counts merge associatively
    across micro-batches by construction.

    This registered shape runs COMPLETE output mode (AvailableNow +
    one in-memory table) — the bounded-replay convenience where the
    watermark never evicts. The live-trigger deployment shape, with
    UPDATE mode and real watermark eviction capping state at the
    open-window count x #types x 256, is the REGISTERED sibling
    ``streaming_histogram_p90_update`` (same oracle; its per-batch
    state bound is asserted in tests/test_streaming.py). Result
    equals the batch computation; the oracle replicates calibration,
    binning, hourly windows and extraction."""
    bounds = _hist_bounds(spark, sf_dir)
    ev = events_stream(spark, sf_dir)
    hist = (
        ev.withWatermark("ts_utc", "10 minutes")
        .join(bounds, "event_type")
        .select("ts_utc", "event_type", _hist_bin_col().alias("bin"))
        .groupBy(
            F.window("ts_utc", "1 hour").alias("w"), "event_type", "bin"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sketch = run_to_memory(hist, "complete").select(
        _fmt_instant("w.start", "yyyy-MM-dd HH:00:00").alias("hour_start"),
        "event_type",
        "bin",
        "n",
    )
    return _p90_from_sketch(sketch, bounds)


def _histogram_p90_update_run(
    spark: SparkSession, sf_dir: str, n_files: int = 8
) -> tuple[DataFrame, list[int]]:
    """Core of streaming_histogram_p90_update, returning the result
    plus the per-batch state-store row counts so the state-bound test
    asserts against the registered query's own code path."""
    bounds = _hist_bounds(spark, sf_dir)
    ev = events_stream_split(spark, sf_dir, n_files)
    hist = (
        ev.withWatermark("ts_utc", "10 minutes")
        .join(bounds, "event_type")
        .select("ts_utc", "event_type", _hist_bin_col().alias("bin"))
        .groupBy(
            F.window("ts_utc", "1 hour").alias("w"), "event_type", "bin"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        # post-aggregation projection keeps the update rows flat for
        # the parquet sink; formatting is tz-free (_fmt_instant)
        .select(
            _fmt_instant("w.start", "yyyy-MM-dd HH:00:00").alias(
                "hour_start"
            ),
            "event_type",
            "bin",
            "n",
        )
    )
    updates, state_rows = run_update_to_parquet(hist)
    # last-writer-wins per sketch cell: update rows carry the CURRENT
    # cumulative count, so the latest batch to touch a cell holds its
    # final value. The shuffle is sketch-sized (windows x types x
    # <=256), never event-sized.
    sketch = updates.groupBy("hour_start", "event_type", "bin").agg(
        F.max_by("n", "batch_id").alias("n")
    )
    return _p90_from_sketch(sketch, bounds), state_rows


@register("streaming_histogram_p90_update", oracle=_HIST_P90_ORACLE)
def streaming_histogram_p90_update(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The LIVE-TRIGGER deployment shape of the streamed histogram
    quantile sketch: UPDATE output mode over an 8-file time-ordered
    replay (maxFilesPerTrigger=1), where the 10-minute watermark
    EVICTS closed hour windows from the state store — per-batch state
    is capped at open_windows x #types x 256 counters regardless of
    how many hours the stream has ever seen (the bound is asserted in
    tests/test_streaming.py against this code path). Each micro-batch
    emits the updated cells to an idempotent batch-partitioned
    parquet sink (dynamic partition overwrite); the final sketch is
    assembled with max_by(batch_id) — valid because time-ordered
    arrival means the last update to a cell carries its final
    cumulative count — and the p90 extraction is the same batch
    computation the complete-mode sibling uses. Same oracle: the
    result provably equals the unbounded-replay shape."""
    return _histogram_p90_update_run(spark, sf_dir)[0]


# ---------------------------------------------------------------------------
# Streamed count-min sketch: windowed heavy hitters
# ---------------------------------------------------------------------------


def _cms_stream_oracle() -> str:
    from text_grabr_orc_spark.operators.sketches import _CMS_D, _CMS_W

    return f"""
    WITH cells AS (
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00')
                   AS hour_start,
               j,
               ('0x' || substr(md5(j::VARCHAR || ':' || event_type),
                               1, 8))::BIGINT % {_CMS_W} AS bucket,
               count(*) AS n
        FROM events CROSS JOIN (SELECT unnest(range({_CMS_D})) AS j)
        GROUP BY 1, 2, 3
    ), keys AS (
        SELECT DISTINCT strftime(date_trunc('hour', ts),
                                 '%Y-%m-%d %H:00:00') AS hour_start,
               event_type
        FROM events
    ), probes AS (
        SELECT k.hour_start, k.event_type, c.n
        FROM keys k
        CROSS JOIN (SELECT unnest(range({_CMS_D})) AS jj) r
        JOIN cells c
          ON c.hour_start = k.hour_start
         AND c.j = r.jj
         AND c.bucket = ('0x' || substr(md5(r.jj::VARCHAR || ':'
                                            || k.event_type), 1, 8))::BIGINT
                        % {_CMS_W}
    ), est AS (
        SELECT hour_start, event_type, CAST(min(n) AS BIGINT) AS cms_n
        FROM probes GROUP BY 1, 2
    ), exact AS (
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00')
                   AS hour_start,
               event_type, count(*) AS exact_n
        FROM events GROUP BY 1, 2
    )
    SELECT e.hour_start, e.event_type, e.exact_n, est.cms_n,
           CAST(est.cms_n - e.exact_n AS BIGINT) AS overcount
    FROM exact e JOIN est USING (hour_start, event_type)
    """


def _cms_cells_stream(ev: DataFrame) -> DataFrame:
    """Streaming d x w counter-cell aggregate per tumbling hour —
    each event increments d cells (explode before the windowed
    aggregate); cell counts merge associatively across batches."""
    from text_grabr_orc_spark.operators.sketches import _CMS_D, _bucket

    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    _bucket(j, F.col("event_type")).alias("bucket"),
                )
                for j in range(_CMS_D)
            ]
        )
    ).alias("r")
    return (
        ev.withWatermark("ts_utc", "10 minutes")
        .select("ts_utc", rows)
        .select("ts_utc", "r.j", "r.bucket")
        .groupBy(F.window("ts_utc", "1 hour").alias("w"), "j", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _cms_probe_result(
    spark: SparkSession, sf_dir: str, cells: DataFrame
) -> DataFrame:
    """Probe the materialized (hour_start, j, bucket, n) sketch for
    every (hour, event_type) key and join the exact counts — the
    batch tail shared by the complete- and update-mode variants."""
    from text_grabr_orc_spark.operators.sketches import _CMS_D, _bucket

    batch = spark.read.parquet(table_path(sf_dir, "events")).select(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias(
            "hour_start"
        ),
        "event_type",
    )
    keys = batch.distinct()
    probes = keys.select(
        "hour_start",
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(j, F.col("event_type")).alias("bucket"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("p"),
    ).select("hour_start", "event_type", "p.j", "p.bucket")
    est = (
        probes.join(cells, ["hour_start", "j", "bucket"])
        .groupBy("hour_start", "event_type")
        .agg(F.min("n").cast("bigint").alias("cms_n"))
    )
    exact = batch.groupBy("hour_start", "event_type").agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    return exact.join(est, ["hour_start", "event_type"]).select(
        "hour_start",
        "event_type",
        "exact_n",
        "cms_n",
        (F.col("cms_n") - F.col("exact_n")).cast("bigint").alias("overcount"),
    )


@register("streaming_cms_heavy_hitters", oracle=_cms_stream_oracle())
def streaming_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min sketch as a STREAM: per tumbling hour, maintain
    the d x w counter cells in streaming state (each event increments
    d cells — an explode before the windowed aggregate) and probe the
    materialized sketch for every (hour, event_type) key. The
    streaming state per window is EXACTLY the sketch (d*w counters),
    independent of the key cardinality — the whole point of CMS when
    the hot-key space is unbounded; counts merge associatively across
    micro-batches because cell increments are sums.

    This registered shape is AvailableNow + complete mode into a
    memory sink (bounded replay, nothing evicts); the live-trigger
    shape with UPDATE mode and watermark eviction capping state at
    open_windows x d x w is the REGISTERED sibling
    ``streaming_cms_heavy_hitters_update`` (same oracle). The probe
    (min over d cells) runs on the materialized sketch. Overcount
    >= 0 by construction; the oracle replicates cells, probe and
    exact counts per hour."""
    ev = events_stream(spark, sf_dir)
    cells = run_to_memory(_cms_cells_stream(ev), "complete").select(
        _fmt_instant("w.start", "yyyy-MM-dd HH:00:00").alias("hour_start"),
        "j",
        "bucket",
        "n",
    )
    return _cms_probe_result(spark, sf_dir, cells)


def _cms_update_run(
    spark: SparkSession, sf_dir: str, n_files: int = 8
) -> tuple[DataFrame, list[int]]:
    """Core of streaming_cms_heavy_hitters_update; returns (result,
    per-batch state rows) so the state-bound test runs against the
    registered code path."""
    ev = events_stream_split(spark, sf_dir, n_files)
    cells_stream = _cms_cells_stream(ev).select(
        _fmt_instant("w.start", "yyyy-MM-dd HH:00:00").alias("hour_start"),
        "j",
        "bucket",
        "n",
    )
    updates, state_rows = run_update_to_parquet(cells_stream)
    # last write wins per cell: the final cumulative count of a cell
    # is whatever the last batch touching it emitted
    cells = updates.groupBy("hour_start", "j", "bucket").agg(
        F.max_by("n", "batch_id").alias("n")
    )
    return _cms_probe_result(spark, sf_dir, cells), state_rows


@register("streaming_cms_heavy_hitters_update", oracle=_cms_stream_oracle())
def streaming_cms_heavy_hitters_update(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The LIVE-TRIGGER deployment shape of the streamed count-min
    sketch: UPDATE output mode over an 8-file time-ordered replay
    where the 10-minute watermark EVICTS closed hour windows — state
    is capped at open_windows x d x w cells no matter how long the
    stream runs (bound asserted in tests/test_streaming.py against
    this code path). Updated cells land in an idempotent
    batch-partitioned parquet sink; max_by(batch_id) reassembles the
    final sketch (time-ordered arrival makes the last update to a
    cell its final cumulative count) and the probe is the shared
    batch tail. Same oracle as the complete-mode sibling — the two
    state lifecycles provably produce the same sketch."""
    return _cms_update_run(spark, sf_dir)[0]


# ---------------------------------------------------------------------------
# Streaming near-dup dedup: MinHash LSH with band-bucket state
# ---------------------------------------------------------------------------


def _minhash_stream_oracle() -> str:
    # the streamed bucket-collision candidate set equals the batch
    # band self-join's (collisions don't depend on arrival order), and
    # verification is the same exact Jaccard — so the oracle is the
    # batch operator's brute-force SQL, verbatim
    from text_grabr_orc_spark.operators import dedup  # noqa: F401
    from text_grabr_orc_spark.registry import ORACLES

    return ORACLES["dedup_minhash_lsh"]


@register("streaming_minhash_neardup", oracle=_minhash_stream_oracle())
def streaming_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-DUP DEDUP AT INGEST — the MinHash LSH pipeline run as a
    STREAM with custom band-bucket state: each arriving document's
    signature is banded, and per (band, hash) bucket the state stores
    the doc ids seen so far; a new arrival emits a candidate pair
    against every resident. This is the operator a 100 TB pipeline
    runs on the ingest path so duplicates are caught when they ARRIVE
    instead of in a nightly batch; state is bounded by bucket
    occupancy (duplicate mass), and emitted candidates are verified
    with the exact Jaccard downstream (on the materialized candidate
    set — the same verify the batch operator uses).

    The streamed result provably equals the registered batch operator
    (bucket collisions are arrival-order-independent; the oracle IS
    the batch brute-force SQL), and the multi-batch incremental run
    is pinned in tests on a split fixture.

    Engine notes: signatures on the stream come from per-row
    higher-order expressions (a pre-stateful streaming AGGREGATE
    would chain two stateful operators); the batch path keeps its
    codegen'd aggregate shape. Candidate emission is append-mode
    ``applyInPandasWithState`` keyed by (band_idx, band_hash)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from text_grabr_orc_spark.operators.dedup import (
        _BAND_ROWS,
        _MERSENNE,
        _N_HASHES,
        _PERM,
        hashed_shingle_table,
    )
    path = table_path(sf_dir, "documents")
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        # table materialized as a directory of part files (e.g. the
        # multi-batch split fixture): stream the directory itself
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(path)
        )
    else:
        # single-file fixture: the file source wants a directory, so
        # stream the sf dir with a glob pinned to the table file
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
        )
    nonblank = raw.filter(F.col("text").rlike(r"(?U)\S"))
    # map-only signature: shingles -> xxhash64 -> 64 affine mins via
    # higher-order functions (no pre-stateful streaming aggregate)
    from text_grabr_orc_spark.functions.text import (
        shingles_from_tokens,
        tokens,
    )

    sh = nonblank.select("doc_id", tokens("text").alias("t")).select(
        "doc_id", shingles_from_tokens(F.col("t")).alias("shingles")
    )
    hs = sh.select(
        "doc_id",
        F.transform(
            "shingles", lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE))
        ).alias("h"),
    )
    sig_cols = F.array(
        *[
            F.array_min(
                F.transform(
                    "h", lambda x: (F.lit(a) * x + F.lit(b)) % _MERSENNE
                )
            )
            for (a, b) in _PERM[:_N_HASHES]
        ]
    )
    sigs = hs.filter(F.size("h") > 0).select("doc_id", sig_cols.alias("sig"))
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_N_HASHES // _BAND_ROWS - 1)),
                lambda j: F.struct(
                    j.alias("band_idx"),
                    F.xxhash64(
                        F.slice(F.col("sig"), j * _BAND_ROWS + 1, _BAND_ROWS),
                        j,
                    ).alias("band_hash"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "b.band_idx", "b.band_hash")

    def update(key, pdfs, state: GroupState):
        ids = list(state.get[0]) if state.exists else []
        out_a, out_b = [], []
        for pdf in pdfs:
            for d in pdf["doc_id"]:
                d = int(d)
                for prev in ids:
                    out_a.append(min(prev, d))
                    out_b.append(max(prev, d))
                ids.append(d)
        state.update((ids,))
        if out_a:
            yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    cand_stream = bands.groupBy("band_idx", "band_hash").applyInPandasWithState(
        update,
        outputStructType="doc_a bigint, doc_b bigint",
        stateStructType="ids array<bigint>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # state_partitions=None: see streaming_stateful_user_stats
    cand = run_to_memory(
        cand_stream, "append", state_partitions=None
    ).distinct()
    # exact verification on the materialized candidate set (batch)
    docs = spark.read.parquet(path).filter(F.col("text").rlike(r"(?U)\S"))
    shx = hashed_shingle_table(docs)
    sha = shx.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("sh_a"))
    shb = shx.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    return (
        cand.join(sha, "doc_a")
        .join(shb, "doc_b")
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@register(
    "streaming_stream_stream_full_join",
    oracle="""
    WITH c AS (
        SELECT event_id AS click_id, user_id, ts FROM events
        WHERE event_type = 'click'
    ), p AS (
        SELECT event_id AS purchase_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    ), wm AS (
        SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
               - INTERVAL 1 HOUR AS w
    ), matched AS (
        SELECT c.click_id, p.purchase_id, c.user_id,
               epoch_us(c.ts) AS click_us, epoch_us(p.ts) AS purchase_us
        FROM c JOIN p
          ON p.user_id = c.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    ), unmatched_c AS (
        -- left null side: emits once the watermark closes the
        -- click's join window (same rule as the LEFT OUTER oracle)
        SELECT c.click_id, CAST(-1 AS BIGINT) AS purchase_id, c.user_id,
               epoch_us(c.ts) AS click_us, CAST(-1 AS BIGINT) AS purchase_us
        FROM c CROSS JOIN wm
        WHERE c.ts + INTERVAL 30 MINUTE < wm.w
          AND NOT EXISTS (
              SELECT 1 FROM p
              WHERE p.user_id = c.user_id
                AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
          )
    ), unmatched_p AS (
        -- right null side: a purchase can only match clicks with
        -- click_ts in [purchase_ts - 30 min, purchase_ts], so its
        -- window closes as soon as the watermark passes purchase_ts
        SELECT CAST(-1 AS BIGINT) AS click_id, p.purchase_id, p.user_id,
               CAST(-1 AS BIGINT) AS click_us, epoch_us(p.ts) AS purchase_us
        FROM p CROSS JOIN wm
        WHERE p.ts < wm.w
          AND NOT EXISTS (
              SELECT 1 FROM c
              WHERE c.user_id = p.user_id
                AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
          )
    )
    SELECT * FROM matched
    UNION ALL SELECT * FROM unmatched_c
    UNION ALL SELECT * FROM unmatched_p
    """,
)
def streaming_stream_stream_full_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-stream FULL OUTER interval join — completes the
    streaming join-mode matrix (inner / left outer registered above).
    Matches emit immediately; EACH side's null row emits only when
    the global watermark proves no partner can still arrive — for a
    click that is click_ts + 30 min (its window extends forward),
    for a purchase just purchase_ts (its window extends backward
    only), and rows younger than that are still in state when the
    AvailableNow run stops and never emit. The oracle models both
    eviction rules in batch SQL, so a green hash check pins the
    asymmetric watermark semantics, not just the join results.

    Null-side ids emit as -1 (repo-wide nullable-BIGINT convention).

    Scale: identical bounded-state contract to the inner/left
    variants — per-key state holds only rows inside the watermark
    horizon; the outer modes add deferred null-side emission flushed
    by the no-data final micro-batch."""
    ev = events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts_utc").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts_utc").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            """
            user_id = p_user_id AND
            purchase_ts >= click_ts AND
            purchase_ts <= click_ts + interval 30 minutes
            """
        ),
        "fullOuter",
    )
    out = run_to_memory(joined, "append")
    return out.select(
        F.coalesce("click_id", F.lit(-1)).cast("bigint").alias("click_id"),
        F.coalesce("purchase_id", F.lit(-1)).cast("bigint").alias("purchase_id"),
        F.coalesce("user_id", "p_user_id").alias("user_id"),
        F.coalesce(F.unix_micros("click_ts"), F.lit(-1)).alias("click_us"),
        F.coalesce(F.unix_micros("purchase_ts"), F.lit(-1)).alias("purchase_us"),
    )
