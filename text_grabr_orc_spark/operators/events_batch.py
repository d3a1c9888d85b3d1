"""Batch analytics over the events table: JSON extraction, time
bucketing, sessionization — the batch twins of the streaming operators
(streaming/events.py runs the same logic incrementally).

Time buckets are derived from the raw int64 nanoseconds with integer
division, so bucketing is exact, timezone-free, and — at 100 TB —
a narrow map-side expression (no shuffle until the aggregate).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from text_grabr_orc_spark.functions.windows import bounded_window
from text_grabr_orc_spark.registry import register
from text_grabr_orc_spark.sources.events import load_events

_NS_PER_HOUR = 3_600 * 1_000_000_000


@register(
    "events_json_props",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(coalesce(sum(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1)
                                  AS BIGINT)), -1) AS BIGINT) AS sum_k,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json over the ``props`` JSON-string column (FIXTURES.md:
    `{"k": 87}`) + aggregate by event type. The oracle uses a regex
    because DuckDB-side JSON is an extension; Spark side is real
    ``from_json`` with an explicit schema as SURVEY §7 requires.
    sum_k is coalesced non-null and CAST BIGINT on both sides —
    DuckDB's sum(BIGINT) returns HUGEINT, which pandas-based
    comparators render as float64 (the round-1 driver hash miss)."""
    ev = load_events(spark, sf_dir)
    parsed = ev.withColumn("k", F.from_json("props", "k BIGINT").getField("k"))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("k"), F.lit(-1)).cast("bigint").alias("sum_k"),
        F.round(
            F.sum(F.expr("CAST(value AS DECIMAL(18,2))")).cast("double"), 2
        ).alias("sum_value"),
    )


@register(
    "events_hourly_rollup",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:00:00') AS hour_start,
           event_type,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value,
           count(DISTINCT user_id) AS uniq_users
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour aggregate by event type — the batch twin of the
    streaming windowed count. Bucket = integer div on raw nanos;
    rendered as a string so hashes are tz-proof."""
    ev = load_events(spark, sf_dir)
    hour_ts = F.expr(
        f"timestampadd(HOUR, ts_ns div {_NS_PER_HOUR}, TIMESTAMP_NTZ'1970-01-01 00:00:00')"
    )
    return (
        ev.withColumn("hour_start", F.date_format(hour_ts, "yyyy-MM-dd HH:00:00"))
        .groupBy("hour_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.expr("CAST(value AS DECIMAL(18,2))")).cast("double"), 2
            ).alias("sum_value"),
            F.countDistinct("user_id").alias("uniq_users"),
        )
    )


@register(
    "events_user_sessions",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id,
               sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM ordered
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def events_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via the classic
    lag + prefix-sum-of-new-session-flags pattern. Scale: exactly one
    shuffle on user_id; both window passes reuse the same partitioning
    (Spark plans a single exchange)."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_ns = 30 * 60 * 1_000_000_000
    is_new = F.when(
        F.lag("ts_ns").over(w).isNull()
        | ((F.col("ts_ns") - F.lag("ts_ns").over(w)) > gap_ns),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(run).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "map_type_roundtrip",
    oracle="""
    SELECT user_id, event_type, count(*) AS cnt
    FROM events
    GROUP BY user_id, event_type
    """,
)
def map_type_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction + explosion round trip: per-user event
    counts folded into a MAP<event_type, count> (the per-entity
    feature-map shape profile stores use), then exploded back to
    rows. collect_list is order-nondeterministic under parallel
    aggregation, so the entry array is array_sort'ed BEFORE
    map_from_entries — without it the map's internal order (and any
    downstream serialization of it) varies run to run. Exploding back
    must reproduce exactly the flat group-by the oracle computes —
    the map layer adds structure, never data."""
    ev = load_events(spark, sf_dir)
    per = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    maps = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    return maps.select(
        "user_id", F.explode("m").alias("event_type", "cnt")
    )


@register(
    "events_key_skew_profile",
    oracle="""
    WITH counts AS (
        SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ), tot AS (SELECT count(*) AS total FROM events),
    ranked AS (
        SELECT user_id, n,
               row_number() OVER (ORDER BY n DESC, user_id) AS rk,
               sum(n) OVER (ORDER BY n DESC, user_id
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM counts
    )
    SELECT rk, user_id, n,
           round(n::DOUBLE / total, 6) AS share,
           round(CAST(cum AS BIGINT)::DOUBLE / total, 6) AS cum_share
    FROM ranked CROSS JOIN tot
    WHERE rk <= 10
    """,
)
def events_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 hottest shuffle keys with their share and cumulative
    share of all events — the diagnostic you run BEFORE a big keyed
    join/agg to decide whether salting or AQE skew-split is needed
    (a key holding >1% of a 100 TB shuffle is the task that never
    finishes). Exact by construction, so it doubles as the oracle
    check for the ranking machinery.

    Scale shape: per-key counts are one partial-aggregated shuffle;
    the top-10 is orderBy+limit — Spark plans TakeOrderedAndProject
    (per-partition heaps + driver merge of 10-row tops), NOT a global
    window over the full key table. The running cumulative share is a
    window over the 10 surviving rows only (constant-size relation —
    the same argument as the packing operator's offset vector), and
    the total arrives as a 1-row broadcast."""
    ev = load_events(spark, sf_dir).select("user_id")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.col("n").desc(), "user_id").limit(10)
    tot = ev.agg(F.count(F.lit(1)).alias("total"))
    w = bounded_window("user_id", F.col("n").desc(), "user_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.crossJoin(F.broadcast(tot))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .withColumn("cum", F.sum("n").over(run))
        .select(
            "rk",
            "user_id",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
            F.round(F.col("cum").cast("double") / F.col("total"), 6)
            .alias("cum_share"),
        )
    )


# ---------------------------------------------------------------------------
# Grouped-aggregate pandas UDF (the UDAF flavor of the Python surface)
# ---------------------------------------------------------------------------


@register(
    "pandas_udaf_trimmed_mean",
    oracle="""
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY value, event_id
               ) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           CAST(any_value(n) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(avg(value), 6) AS trimmed_mean
    FROM ranked
    WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY event_type
    """,
)
def pandas_udaf_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG ``pandas_udf`` — the user-defined-AGGREGATE flavor
    of the Python surface (next to scalar Arrow UDFs, mapInPandas,
    applyInPandas and UDTFs): a 10%-trimmed mean of ``value`` per
    event type, a statistic Spark has no builtin for. The UDAF
    receives each group's values as ONE pandas Series and returns a
    scalar, so the Python boundary is crossed once per (group,
    partition) with Arrow-batched columns — never per row.

    Trim semantics: drop the floor(n/10) smallest and largest values,
    average the rest. Equal values are interchangeable for a mean, so
    sorting by value alone is deterministic cross-engine; the mean of
    ~thousands of O(100) doubles differs between numpy's pairwise and
    DuckDB's sequential summation far below the 6dp rounding.

    Scale note (the honest UDAF caveat): GROUPED_AGG is whole-group —
    it cannot partial-aggregate map-side, so the shuffle carries every
    row of skewed groups to one task. For bounded statistics
    (mean/max) prefer native partial aggregates; trimmed/rank-based
    statistics genuinely need the whole group (or a distributed
    selection algorithm), which is exactly when this surface earns
    its shuffle."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        s = np.sort(v.to_numpy(dtype=np.float64))
        k = len(s) // 10
        kept = s[k : len(s) - k] if k else s
        return float(kept.mean())

    ev = load_events(spark, sf_dir).select("event_type", "value")
    # Spark disallows mixing GROUPED_AGG pandas UDFs with native
    # aggregates in one agg(); the native counts run in their own
    # (partial-aggregating) pass and meet the UDAF on the tiny
    # per-type key set
    means = ev.groupBy("event_type").agg(
        F.round(trimmed_mean("value"), 6).alias("trimmed_mean")
    )
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (
            F.count(F.lit(1)) - 2 * F.floor(F.count(F.lit(1)) / 10)
        ).cast("bigint").alias("n_kept"),
    )
    return counts.join(means, "event_type").select(
        "event_type", "n_events", "n_kept", "trimmed_mean"
    )


# ---------------------------------------------------------------------------
# CDC log compaction (last-write-wins state reconstruction)
# ---------------------------------------------------------------------------


@register(
    "cdc_last_write_wins",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_type, value, event_id,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC
               ) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_events
        FROM events
    )
    SELECT user_id,
           event_type AS last_type,
           round(value, 6) AS last_value,
           CAST(event_id AS BIGINT) AS last_event_id,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END AS BIGINT)
               AS alive
    FROM ranked WHERE rn = 1
    """,
)
def cdc_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction: reconstruct the latest state per key from
    an append-only change log — last-write-wins on (ts, event_id),
    with the terminal event type deciding liveness (an 'error' as the
    final event plays the tombstone role). This is the compaction
    pass every log-structured ingest (Kafka compacted topics, CDC
    into a lakehouse MERGE) runs before serving state.

    Plan shape: max_by over a lexicographic (ts_ns, event_id) struct
    — ONE aggregation with map-side partial combine (each mapper
    keeps one candidate row per key), not a window rank, which would
    shuffle every log row to sort full per-key histories. The oracle
    is the window formulation — same fixpoint, different algorithm.

    Scale: shuffle volume is one row per (mapper, key), independent
    of per-key history length — the property that makes compaction
    feasible when hot keys have millions of updates."""
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", "value", "event_id", "ts_ns"
    )
    ord_key = F.struct(F.col("ts_ns"), F.col("event_id"))
    last = ev.groupBy("user_id").agg(
        F.max_by("event_type", ord_key).alias("last_type"),
        F.max_by("value", ord_key).alias("last_value"),
        F.max_by("event_id", ord_key).alias("last_event_id"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return last.select(
        "user_id",
        "last_type",
        F.round("last_value", 6).alias("last_value"),
        F.col("last_event_id").cast("bigint"),
        F.col("n_events").cast("bigint"),
        (F.col("last_type") != "error").cast("bigint").alias("alive"),
    )


# ---------------------------------------------------------------------------
# Z-score anomaly detection (exact-moment profile per key)
# ---------------------------------------------------------------------------

_Z_THRESHOLD = 3.0


@register(
    "events_zscore_anomalies",
    oracle=f"""
    WITH moments AS (
        SELECT user_id,
               count(*) AS n,
               sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS s1,
               sum(CAST(round(value, 6) AS DECIMAL(18,6))
                   * CAST(round(value, 6) AS DECIMAL(18,6))) AS s2
        FROM events GROUP BY user_id HAVING count(*) >= 2
    ), stats AS (
        SELECT user_id, n,
               CAST(s1 AS DOUBLE) / n AS mean,
               sqrt((CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                    / (n - 1)) AS sd
        FROM moments
    )
    SELECT e.user_id,
           CAST(any_value(s.n) AS BIGINT) AS n_events,
           round(any_value(s.mean), 6) AS mean_value,
           round(any_value(s.sd), 6) AS stddev_value,
           CAST(coalesce(sum(CASE WHEN s.sd > 0 AND
                     abs((e.value - s.mean) / s.sd) > {_Z_THRESHOLD}
                     THEN 1 ELSE 0 END), -1) AS BIGINT) AS n_anomalies,
           round(max(CASE WHEN s.sd > 0
                          THEN abs((e.value - s.mean) / s.sd)
                          ELSE 0.0 END), 6) AS max_abs_z
    FROM events e JOIN stats s USING (user_id)
    GROUP BY e.user_id
    """,
)
def events_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key z-score anomaly profile: each user's value
    distribution summarized by exact moments, every event scored
    against its own key's mean/stddev, |z| > 3 counted as anomalous —
    the memory-bounded per-entity outlier pass monitoring pipelines
    run (per-key moments, not per-key histories).

    Determinism: first and second moments accumulate as exact
    DECIMAL sums of 6dp-quantized values (order-proof on both
    engines); mean/stddev derive from those exact sums in double with
    identical expressions; the z comparison uses the derived doubles
    on both sides, so the >3 branch can't disagree.

    Scale: the moments pass is one map-side-combinable aggregate (3
    numbers per key, independent of history length); the scoring pass
    re-joins the tiny stats table to the fact on the same key — two
    shuffles total, the second co-partitioned with the first."""
    ev = load_events(spark, sf_dir).select("user_id", "value")
    v = F.round("value", 6).cast("decimal(18,6)")
    moments = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v).alias("s1"),
            F.sum(v * v).alias("s2"),
        )
        .filter(F.col("n") >= 2)
    )
    stats = moments.select(
        "user_id",
        "n",
        (F.col("s1").cast("double") / F.col("n")).alias("mean"),
        F.sqrt(
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double")
                * F.col("s1").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    z = F.abs((F.col("value") - F.col("mean")) / F.col("sd"))
    return (
        ev.join(F.broadcast(stats), "user_id")
        .groupBy("user_id")
        .agg(
            F.first("n").cast("bigint").alias("n_events"),
            F.round(F.first("mean"), 6).alias("mean_value"),
            F.round(F.first("sd"), 6).alias("stddev_value"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("sd") > 0) & (z > _Z_THRESHOLD), 1
                    ).otherwise(0)
                ),
                F.lit(-1),
            )
            .cast("bigint")
            .alias("n_anomalies"),
            F.round(
                F.max(F.when(F.col("sd") > 0, z).otherwise(F.lit(0.0))), 6
            ).alias("max_abs_z"),
        )
    )


# ---------------------------------------------------------------------------
# Event-type transition matrix (first-order user journey model)
# ---------------------------------------------------------------------------


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY epoch_ns(ts), event_id)
                   AS next_type
        FROM events
    ), t AS (
        SELECT event_type AS from_type, next_type AS to_type,
               count(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ), tot AS (
        SELECT from_type, sum(n) AS row_n FROM t GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, CAST(t.n AS BIGINT) AS n,
           round(t.n::DOUBLE / tot.row_n, 6) AS p
    FROM t JOIN tot USING (from_type)
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), the standard user-journey
    model behind funnel diagnostics and next-action baselines. Row
    normalization is an exact integer ratio, so the whole matrix is
    hash-checked.

    Scale: ONE keyed shuffle (user_id) for the lead() window —
    per-user partitions, never global — then aggregation on the
    (type x type)-bounded transition table; the row totals join is
    broadcast-sized by construction."""
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    t = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = t.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return t.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n").cast("double") / F.col("row_n"), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# Robust anomaly statistics (median/MAD, outlier-proof)
# ---------------------------------------------------------------------------

#: the classical consistency constant sigma ~= 1.4826 * MAD, and the
#: 3-sigma flag threshold.
_MAD_C = 1.4826
_MAD_SIGMAS = 3.0


@register(
    "events_robust_zscore_mad",
    oracle=f"""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ), dev AS (
        SELECT e.event_type, e.value, med.med,
               abs(e.value - med.med) AS ad
        FROM events e JOIN med USING (event_type)
    ), mad AS (
        SELECT event_type, quantile_cont(ad, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT dev.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(any_value(dev.med), 6) AS median,
           round(any_value(mad.mad), 6) AS mad,
           CAST(sum(CASE WHEN dev.ad > {_MAD_SIGMAS} * {_MAD_C} * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM dev JOIN mad USING (event_type)
    GROUP BY dev.event_type
    """,
)
def events_robust_zscore_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly statistics per event type: median and MAD
    (median absolute deviation) instead of mean/stddev — the
    outlier-proof twin of ``events_zscore_anomalies`` (a single wild
    value shifts a mean-based threshold toward the outliers it should
    catch; the median/MAD breakdown point is 50%). Values beyond
    3 * 1.4826 * MAD (the normal-consistency scaling) are counted as
    anomalies.

    Cross-engine: exact interpolating percentiles on both engines
    (Spark ``percentile`` / DuckDB ``quantile_cont`` both average the
    two middle order statistics with identical float arithmetic), so
    median, MAD and the flag counts are all hash-checked.

    Scale: two grouped exact percentiles (each one keyed shuffle of
    (type, value) pairs — at 100 TB swap for the registered histogram
    sketch quantiles at one-bin-width error) plus a broadcast join of
    the per-type statistics back onto the fact rows."""
    ev = load_events(spark, sf_dir).select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.any_value("med"), 6).alias("median"),
            F.round(F.any_value("mad"), 6).alias("mad"),
            F.sum(
                (F.col("ad") > _MAD_SIGMAS * _MAD_C * F.col("mad")).cast(
                    "int"
                )
            )
            .cast("bigint")
            .alias("n_anomalies"),
        )
    )


# ---------------------------------------------------------------------------
# Windowed funnel: ordered multi-step conversion with a step deadline
# ---------------------------------------------------------------------------

#: funnel step sequence over the fixture's event types.
_FUNNEL_STEPS = ("view", "click", "purchase")
#: max gap between consecutive steps (nanoseconds): 24 hours.
_FUNNEL_WINDOW_NS = 24 * 3600 * 10**9


@register(
    "events_funnel_windowed",
    oracle=f"""
    WITH t1 AS (
        SELECT user_id, min(epoch_ns(ts)) AS t FROM events
        WHERE event_type = 'view' GROUP BY 1
    ), t2 AS (
        SELECT e.user_id, min(epoch_ns(e.ts)) AS t
        FROM events e JOIN t1 ON e.user_id = t1.user_id
         AND epoch_ns(e.ts) > t1.t
         AND epoch_ns(e.ts) <= t1.t + {_FUNNEL_WINDOW_NS}
        WHERE e.event_type = 'click' GROUP BY 1
    ), t3 AS (
        SELECT e.user_id, min(epoch_ns(e.ts)) AS t
        FROM events e JOIN t2 ON e.user_id = t2.user_id
         AND epoch_ns(e.ts) > t2.t
         AND epoch_ns(e.ts) <= t2.t + {_FUNNEL_WINDOW_NS}
        WHERE e.event_type = 'purchase' GROUP BY 1
    ), n AS (
        SELECT (SELECT count(*) FROM t1) AS n1,
               (SELECT count(*) FROM t2) AS n2,
               (SELECT count(*) FROM t3) AS n3
    )
    SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
               CAST(n1 AS BIGINT) AS n_users,
               CAST(1.0 AS DOUBLE) AS conv_from_start,
               CAST(1.0 AS DOUBLE) AS conv_from_prev
        FROM n
        UNION ALL
        SELECT 2, 'click', CAST(n2 AS BIGINT),
               round(CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE), 6),
               round(CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE), 6)
        FROM n
        UNION ALL
        SELECT 3, 'purchase', CAST(n3 AS BIGINT),
               round(CAST(n3 AS DOUBLE) / CAST(n1 AS DOUBLE), 6),
               round(CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE), 6)
        FROM n
    )
    """,
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINDOWED funnel conversion (view -> click -> purchase, each
    step within 24 h of the previous): the deadline-constrained
    variant of ``funnel_signup_click_purchase`` — a click three weeks
    after the view is NOT a conversion. This is the form product
    funnels actually ship (attribution windows), and it changes the
    answer: the unconstrained funnel overcounts whenever activity is
    sparse relative to the window.

    Earliest-qualifying-sequence semantics per user, stepwise minimal
    times; per-step output adds conversion rates from the funnel
    start and from the previous step (exact integer ratios).

    Scale: identical plan family to the unconstrained funnel — k
    user-keyed min-aggregates of strictly shrinking cardinality, the
    deadline an extra band predicate on the step join (still
    equi-keyed on user_id, so the band never degrades the join into
    a cartesian); comparisons ride the int64 epoch column."""
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts_ns")

    def step_times(etype: str, prev: DataFrame | None) -> DataFrame:
        cur = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            cur = cur.join(prev, "user_id").filter(
                (F.col("ts_ns") > F.col("prev_t"))
                & (F.col("ts_ns") <= F.col("prev_t") + _FUNNEL_WINDOW_NS)
            )
        return cur.groupBy("user_id").agg(
            F.min("ts_ns").alias("prev_t")
        )

    t1 = step_times(_FUNNEL_STEPS[0], None)
    t2 = step_times(_FUNNEL_STEPS[1], t1)
    t3 = step_times(_FUNNEL_STEPS[2], t2)
    n1 = t1.agg(F.count(F.lit(1)).alias("n1"))
    n2 = t2.agg(F.count(F.lit(1)).alias("n2"))
    n3 = t3.agg(F.count(F.lit(1)).alias("n3"))
    n = n1.crossJoin(F.broadcast(n2)).crossJoin(F.broadcast(n3))
    d = lambda a, b: F.round(  # noqa: E731 - local ratio shorthand
        F.col(a).cast("double") / F.col(b).cast("double"), 6
    )
    one = F.lit(1.0).cast("double")
    rows = [
        n.select(
            F.lit(1).cast("bigint").alias("step"),
            F.lit(_FUNNEL_STEPS[0]).alias("event_type"),
            F.col("n1").cast("bigint").alias("n_users"),
            one.alias("conv_from_start"),
            one.alias("conv_from_prev"),
        ),
        n.select(
            F.lit(2).cast("bigint"),
            F.lit(_FUNNEL_STEPS[1]),
            F.col("n2").cast("bigint"),
            d("n2", "n1"),
            d("n2", "n1"),
        ),
        n.select(
            F.lit(3).cast("bigint"),
            F.lit(_FUNNEL_STEPS[2]),
            F.col("n3").cast("bigint"),
            d("n3", "n1"),
            d("n3", "n2"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# ---------------------------------------------------------------------------
# Per-type hourly trend slope (drift detection)
# ---------------------------------------------------------------------------


@register(
    "events_trend_slope_by_type",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
               count(*) AS y
        FROM events GROUP BY 1, 2
    ), centered AS (
        SELECT event_type,
               h - min(h) OVER (PARTITION BY event_type) AS x,
               y
        FROM hourly
    ), s AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS m,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM centered GROUP BY 1
    )
    SELECT event_type, m AS n_hours,
           round(CAST(sy AS DOUBLE) / m, 6) AS mean_per_hour,
           round(CAST(m * sxy - sx * sy AS DOUBLE)
                 / CAST(m * sxx - sx * sx AS DOUBLE), 6) AS slope_per_hour
    FROM s
    """,
)
def events_trend_slope_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Traffic drift detector: per event type, the least-squares
    slope of hourly event counts over time (events/hour per hour) —
    the one-number answer to "is this stream growing, decaying, or
    flat", which is what capacity planning and anomaly baselining
    actually consume downstream of the hourly rollup. Hours with no
    events for a type are absent points, not zeros (the rollup's
    support set), stated so the semantics are unambiguous.

    Exactness device: hour indexes are CENTERED per type (slope is
    shift-invariant), so every regression sum (Sx, Sy, Sxy, Sxx) is
    a small exact int64 — no floating accumulation anywhere, and the
    closed-form slope (m*Sxy - Sx*Sy)/(m*Sxx - Sx^2) is ONE double
    division of exact integers, identical on both engines.

    Scale: one corpus pass into the (type, hour) rollup (map-side
    combine), then a #types-row aggregate; the centering min is a
    per-type scalar over the bounded hourly table."""
    ev = load_events(spark, sf_dir)
    hourly = (
        ev.select(
            "event_type",
            F.floor(F.col("ts_ns") / F.lit(3_600_000_000_000)).alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = Window.partitionBy("event_type")
    centered = hourly.select(
        "event_type",
        (F.col("h") - F.min("h").over(w)).alias("x"),
        "y",
    )
    s = centered.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return s.select(
        "event_type",
        F.col("m").cast("bigint").alias("n_hours"),
        F.round(F.col("sy").cast("double") / F.col("m"), 6).alias(
            "mean_per_hour"
        ),
        F.round(
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            ),
            6,
        ).alias("slope_per_hour"),
    )


@register(
    "events_top_paths",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), paths AS (
        SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path,
               count(*) AS n
        FROM ordered WHERE e3 IS NOT NULL
        GROUP BY 1
    )
    SELECT path, n, CAST(rk AS BIGINT) AS rk FROM (
        SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rk
        FROM paths
    ) WHERE rk <= 10
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the 10 most common 3-step user journeys
    (consecutive event-type trigrams per user, ordered by time with
    event_id tie-break) — the k-step extension of the first-order
    ``events_transition_matrix``, and the standard product-analytics
    artifact for finding dominant flows before funnel definitions
    exist. Paths render as 'a > b > c' strings so the table reads
    directly.

    Scale: ONE shuffle partitions events by user (each user's
    history sorts within its partition — per-user state is session
    activity, never corpus-sized); trigram formation is two lead()
    windows over that partitioning; the count aggregate is bounded
    by #event_types^3 with map-side combine, and the final ranking
    is TakeOrdered over that bounded table + a bounded re-rank."""
    from text_grabr_orc_spark.functions.windows import bounded_window

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    ordered = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    paths = (
        ordered.filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(" > ", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = paths.orderBy(F.col("n").desc(), "path").limit(10)
    rw = bounded_window("path", F.col("n").desc(), "path")
    return top.withColumn("rk", F.row_number().over(rw).cast("bigint"))
