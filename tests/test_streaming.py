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


def test_streaming_checkpoint_recovery_exactly_once(spark, sf_dir, tmp_path):
    """Kill-and-restart recovery: a windowed aggregate processes the
    events table split into 4 files one-per-trigger; the query stops
    after the FIRST micro-batch, then a fresh query object restarts
    from the same checkpoint and drains the rest. The recovered
    result must equal the batch group-by exactly — Spark's
    checkpoint (offsets + state store) is what makes the rerun
    exactly-once instead of double-counting batch 1."""
    import os

    from text_grabr_orc_spark.sources.events import EPOCH_US_EXPR

    src = str(tmp_path / "events_split")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ev.repartition(4).write.mode("overwrite").parquet(src)
    schema = ev.schema
    ckpt = str(tmp_path / "ckpt")
    out_name = "tgos_recovery_test"

    def build():
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        return (
            raw.select(
                F.expr(f"timestamp_micros({EPOCH_US_EXPR})").alias("ts_utc"),
                "event_type",
            )
            .withWatermark("ts_utc", "10 minutes")
            .groupBy(F.window("ts_utc", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        # phase 1: exactly one micro-batch, then stop mid-stream
        q1 = (
            build()
            .writeStream.format("memory")
            .queryName(out_name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        import time as _t

        while not q1.recentProgress:
            _t.sleep(0.1)
        q1.stop()
        q1.awaitTermination()
        assert len(q1.recentProgress) < 5, "stopped before draining all files"
        # phase 2: new query object, same checkpoint — resumes, drains
        q2 = (
            build()
            .writeStream.format("memory")
            .queryName(out_name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    got = {
        (str(r.w.start), r.event_type): r.n
        for r in spark.table(out_name).collect()
    }
    want = {
        (str(r.w.start), r.event_type): r.n
        for r in (
            spark.read.parquet(src)
            .select(
                F.expr(f"timestamp_micros({EPOCH_US_EXPR})").alias("ts_utc"),
                "event_type",
            )
            .groupBy(F.window("ts_utc", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    assert got == want and got


def test_streaming_histogram_p90_brackets_exact_quantile(spark, sf_dir):
    """The streamed sketch keeps the batch sketch's guarantee: per
    (hour, type) the estimate brackets the ceil(0.9n)-th order
    statistic from above within one bin width."""
    import math

    import duckdb

    from text_grabr_orc_spark.streaming.events import streaming_histogram_p90

    rows = streaming_histogram_p90(spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    vals: dict = {}
    for h, t, v in con.execute(
        "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00'),"
        " event_type, value FROM events ORDER BY 1, 2, 3"
    ).fetchall():
        vals.setdefault((h, t), []).append(v)
    bounds = {
        t: (lo, hi)
        for t, lo, hi in con.execute(
            "SELECT event_type, min(value), max(value) FROM events GROUP BY 1"
        ).fetchall()
    }
    for r in rows:
        xs = vals[(r.hour_start, r.event_type)]
        assert len(xs) == r.n
        lo, hi = bounds[r.event_type]
        width = (hi - lo) / 256
        x = xs[math.ceil(0.9 * len(xs)) - 1]
        assert x - 1e-6 <= r.est_p90 <= x + width + 1e-6, (r, x, width)


def test_update_mode_watermark_keeps_state_bounded(spark, sf_dir, tmp_path):
    """The live-trigger deployment shape streaming_histogram_p90's
    docstring promises: under UPDATE output mode the watermark evicts
    closed hour windows from the state store, so per-batch state stays
    at the open-window bound instead of accumulating every hour ever
    seen (which is what COMPLETE mode — the bounded-replay shape —
    retains by design). Time-ordered files, maxFilesPerTrigger=1,
    state rows read from each micro-batch's progress event. The file
    count is derived from the fixture (span / group density) so the
    eviction margin holds at any sf the suite runs against."""
    import math
    import os

    from text_grabr_orc_spark.sources.events import EPOCH_US_EXPR

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # ground truth up front: it sizes the split. Total (hour, type)
    # groups, type count, and the time span in hours.
    g_total = (
        ev.select(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .distinct()
        .count()
    )
    n_types = ev.select("event_type").distinct().count()
    lo, hi = ev.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    span_hours = (hi - lo).total_seconds() / 3600
    # choose n_files so 3 * per_batch_bound fits under g_total with
    # ~17% slack: per_batch_bound = (2*span/n + 3) * n_types
    denom = g_total / (3.5 * n_types) - 3
    assert denom > 0, "fixture too small to demonstrate eviction"
    n_files = max(16, math.ceil(2 * span_hours / denom))
    split = str(tmp_path / "ev_split")
    (
        ev.repartitionByRange(n_files, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(split)
    )
    # deterministic arrival order: FileStreamSource takes oldest
    # mtime first; range partition k holds the k-th time slice
    parts = sorted(
        f for f in os.listdir(split) if f.startswith("part-")
    )
    assert len(parts) == n_files
    base = os.path.getmtime(os.path.join(split, parts[0]))
    for i, f in enumerate(parts):
        os.utime(os.path.join(split, f), (base + i, base + i))

    schema = ev.schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(split)
    )
    agg = (
        raw.select(
            F.expr(f"timestamp_micros({EPOCH_US_EXPR})").alias("ts_utc"),
            "event_type",
        )
        .withWatermark("ts_utc", "10 minutes")
        .groupBy(F.window("ts_utc", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName("tgos_state_bound")
            .outputMode("update")
            .option(
                "checkpointLocation", str(tmp_path / "ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = [
            p
            for p in (q.recentProgress or [])
            if p.get("stateOperators")
        ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)

    assert len(progress) >= n_files
    state_rows = [p["stateOperators"][0]["numRowsTotal"] for p in progress]

    # a batch spans ~1/n_files of the time range; at its end the state
    # holds that slice's windows plus the watermark lag (eviction
    # uses the PREVIOUS batch's watermark, hence +1 slice slack)
    per_batch_bound = (2 * (span_hours / n_files) + 3) * n_types
    assert max(state_rows) <= per_batch_bound, (
        max(state_rows),
        per_batch_bound,
    )
    # the bound must be a real statement: without eviction the final
    # batch would hold every group ever seen
    assert g_total >= 3 * per_batch_bound
    # and state growth is flat, not monotone: the last batch holds no
    # more than ~the per-slice working set, far below the total
    assert state_rows[-1] <= per_batch_bound


def test_histogram_p90_update_state_bounded_and_equals_complete(
    spark, sf_dir
):
    """The REGISTERED update-mode histogram query's own code path:
    (a) per-batch state stays at the open-window working set — far
    below the total sketch size the complete-mode sibling would hold
    — proving the watermark evicts; (b) the assembled result equals
    the complete-mode registered query row for row."""
    from text_grabr_orc_spark.streaming.events import (
        _histogram_p90_update_run,
        streaming_histogram_p90,
    )

    upd, state_rows = _histogram_p90_update_run(spark, sf_dir)
    upd_rows = sorted(map(tuple, upd.collect()))
    # eviction bound: without it the final batches would hold every
    # (window, type, bin) cell ever created; the total sketch cell
    # count (what COMPLETE mode retains) must dwarf per-batch state
    total_cells = (
        upd.sparkSession.read.parquet(f"{sf_dir}/events.parquet")
        .select(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .distinct()
        .count()
    )  # >= one bin per (hour, type) group; real cell count is larger
    assert max(state_rows) * 3 <= total_cells, (max(state_rows), total_cells)
    assert state_rows[-1] <= max(state_rows)
    comp_rows = sorted(
        map(tuple, streaming_histogram_p90(spark, sf_dir).collect())
    )
    assert upd_rows == comp_rows


def test_cms_update_state_bounded_and_equals_complete(spark, sf_dir):
    """Same two contracts for the registered update-mode CMS query:
    watermark-evicted per-batch state far below the all-windows cell
    count, and result identity with the complete-mode sibling."""
    from text_grabr_orc_spark.streaming.events import (
        _cms_update_run,
        streaming_cms_heavy_hitters,
    )

    upd, state_rows = _cms_update_run(spark, sf_dir)
    upd_rows = sorted(map(tuple, upd.collect()))
    comp = streaming_cms_heavy_hitters(spark, sf_dir)
    comp_rows = sorted(map(tuple, comp.collect()))
    assert upd_rows == comp_rows
    # total cells ever created (hours x d x occupied buckets) is what
    # complete mode holds; update-mode state must stay well below it
    n_hours = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(F.date_trunc("hour", "ts"))
        .distinct()
        .count()
    )
    from text_grabr_orc_spark.operators.sketches import _CMS_D

    total_cells = n_hours * _CMS_D  # >= 1 occupied bucket per (hour, j)
    assert max(state_rows) * 3 <= total_cells, (max(state_rows), total_cells)


def test_streaming_cms_overcounts_only_and_covers_all_keys(spark, sf_dir):
    """CMS can only overcount (collisions add); every (hour, type)
    key present in the batch table gets a probed estimate."""
    from text_grabr_orc_spark.streaming.events import (
        streaming_cms_heavy_hitters,
    )

    rows = streaming_cms_heavy_hitters(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["overcount"] >= 0
        assert r["cms_n"] >= r["exact_n"] >= 1
    ev = load_events(spark, sf_dir)
    n_keys = (
        ev.select(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00"),
            "event_type",
        )
        .distinct()
        .count()
    )
    assert len(rows) == n_keys


def test_streaming_minhash_incremental_equals_batch(spark, sf_dir, tmp_path):
    """Multi-batch replay: documents split into 4 files arriving one
    per micro-batch — cross-batch pairs are only found through the
    band-bucket STATE — must equal the registered batch LSH output."""
    import os

    from text_grabr_orc_spark.operators.dedup import dedup_minhash_lsh
    from text_grabr_orc_spark.streaming.events import (
        streaming_minhash_neardup,
    )

    d = str(tmp_path / "sf_split")
    os.makedirs(d, exist_ok=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    (
        docs.repartition(4)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "documents.parquet"))
    )
    # deterministic arrival order across the 4 part files
    pdir = os.path.join(d, "documents.parquet")
    parts = sorted(f for f in os.listdir(pdir) if f.startswith("part-"))
    base = os.path.getmtime(os.path.join(pdir, parts[0]))
    for i, f in enumerate(parts):
        os.utime(os.path.join(pdir, f), (base + i, base + i))

    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in streaming_minhash_neardup(spark, d).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup_minhash_lsh(spark, d).collect()
    }
    assert got == want and len(want) > 0
