"""Time-series operators Spark has no single primitive for: as-of
join, bounded range join, and hypertable-style multi-resolution
rollups — each expressed as a composition of DataFrame ops (SURVEY.md
§2b "custom operators": composition first, never a cross join).

All time arithmetic is on the raw int64 nanoseconds (``ts_ns`` from
sources.events), so results are exact and timezone-free regardless of
the driver session's zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from text_grabr_orc_spark.registry import register
from text_grabr_orc_spark.sources.events import load_events

_NS_PER_SEC = 1_000_000_000
_NS_PER_MIN = 60 * _NS_PER_SEC
#: gap-fill resample bucket: 15 minutes
_NS_PER_BUCKET = 15 * _NS_PER_MIN
_NS_PER_DAY = 86_400 * _NS_PER_SEC


@register(
    "asof_purchase_last_click",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT p.event_id,
           p.user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           coalesce(epoch_us(c.ts), -1) AS click_ts_us,
           coalesce(epoch_us(p.ts) - epoch_us(c.ts), -1) AS gap_us
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN: for every purchase, the user's most recent click at
    or before the purchase instant (the canonical trades↔quotes shape;
    oracle is DuckDB's native ASOF LEFT JOIN).

    Spark lacks the operator, and the naive translation — non-equi
    join then max() — explodes to every (purchase, earlier-click)
    pair. This is instead the MERGE-style plan: union the two tagged
    event sets, ONE shuffle by user, and a running
    ``last(click_ts, ignorenulls)`` window carries the latest click
    forward into each purchase row. Cost is sort-shuffle of
    |p|+|c| rows — linear, skew-tolerant, the right plan at 100 TB.
    Ties (click exactly at purchase ts) sort clicks first so the
    boundary matches ASOF's ``c.ts <= p.ts``."""
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "ts_ns"
    )
    tagged = ev.filter(F.col("event_type").isin("purchase", "click")).withColumn(
        "is_p", (F.col("event_type") == "purchase").cast("int")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "is_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.last(
        F.when(F.col("is_p") == 0, F.col("ts_ns")), ignorenulls=True
    ).over(w)
    # emitted at MICROsecond precision: DuckDB truncates parquet
    # TIMESTAMP_NS to its native us TIMESTAMP on read, so the oracle
    # can only see us. div-then-subtract mirrors truncate-then-diff.
    # no-click rows emit -1, not NULL: a nullable BIGINT degrades to
    # float64 in pandas-based comparators, corrupting 16-digit values.
    return (
        tagged.withColumn("click_ts_ns", last_click)
        .filter(F.col("is_p") == 1)
        .select(
            "event_id",
            "user_id",
            F.expr("ts_ns div 1000").alias("purchase_ts_us"),
            F.expr("coalesce(click_ts_ns div 1000, -1)").alias("click_ts_us"),
            F.expr(
                "coalesce((ts_ns div 1000) - (click_ts_ns div 1000), -1)"
            ).alias("gap_us"),
        )
    )


@register(
    "range_join_clicks_before_purchase",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT p.event_id,
           p.user_id,
           count(c.event_id) AS n_clicks_5m
    FROM p LEFT JOIN c
      ON p.user_id = c.user_id
     AND epoch_ns(c.ts) BETWEEN epoch_ns(p.ts) - 300000000000
                            AND epoch_ns(p.ts)
    GROUP BY 1, 2
    """,
)
def range_join_clicks_before_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bounded RANGE JOIN: clicks within the 5 minutes before each
    purchase, per user. The equi-key (user_id) carries the shuffle;
    the range predicate is evaluated post-join inside codegen, so the
    plan is a plain shuffled hash join, not a cross product. At scale
    the per-user fan-out is bounded by activity rate x window — the
    range join stays linear in matched pairs."""
    ev = load_events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts_ns").alias("p_ns")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts_ns").alias("c_ns"),
    )
    j = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ns") >= F.col("p_ns") - 300 * _NS_PER_SEC)
        & (F.col("c_ns") <= F.col("p_ns")),
        "left",
    )
    return j.groupBy("event_id", "user_id").agg(
        F.count("c_id").alias("n_clicks_5m")
    )


@register(
    "multires_rollup_daily",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
           event_type,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS sum_value,
           count(DISTINCT time_bucket(INTERVAL 1 MINUTE, ts))
               AS n_active_minutes
    FROM events
    GROUP BY 1, 2
    """,
)
def multires_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: a minute-grain rollup is
    computed ONCE and the day grain is derived from it (minute div
    1440), never from raw events. At 100 TB this is the materialized-
    rollup pattern — the day pass reads |distinct minutes| rows, and
    `n_active_minutes` (count of minute buckets) is only derivable
    from the finer grain, which is exactly why hypertables keep it.
    Sums ride in DECIMAL cents so re-aggregation is exact."""
    ev = load_events(spark, sf_dir)
    minute = ev.groupBy(
        # integer div: ts_ns ~1.7e18 exceeds float64's exact range, so
        # `/` (double division) would corrupt bucket boundaries
        F.expr(f"ts_ns div {_NS_PER_MIN}").alias("minute_b"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(value AS DECIMAL(18,2))")).alias("sum_dec"),
    )
    day_start = F.expr(
        "timestampadd(DAY, CAST(day_b AS INT), TIMESTAMP_NTZ'1970-01-01 00:00:00')"
    )
    return (
        minute.groupBy(
            F.expr("minute_b div 1440").alias("day_b"), "event_type"
        )
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("sum_dec").cast("double"), 2).alias("sum_value"),
            F.count(F.lit(1)).alias("n_active_minutes"),
        )
        .select(
            F.date_format(day_start, "yyyy-MM-dd").alias("day"),
            "event_type",
            "n",
            "sum_value",
            "n_active_minutes",
        )
    )


@register(
    "events_gapfill_locf",
    oracle=f"""
    WITH m AS (
        SELECT event_type,
               epoch_us(ts) * 1000 // {_NS_PER_BUCKET} AS minute_b,
               count(*) AS n,
               sum(CAST(value AS DECIMAL(18,2))) AS sum_dec
        FROM events
        GROUP BY 1, 2
    ), bounds AS (
        SELECT min(minute_b) AS lo, max(minute_b) AS hi FROM m
    ), grid AS (
        SELECT t.event_type, g.minute_b
        FROM (SELECT DISTINCT event_type FROM m) t
        CROSS JOIN (SELECT unnest(range((SELECT lo FROM bounds),
                                        (SELECT hi FROM bounds) + 1))
                        AS minute_b) g
    )
    SELECT strftime(to_timestamp(grid.minute_b * 900)::TIMESTAMP,
                    '%Y-%m-%d %H:%M:00') AS bucket_start,
           grid.event_type,
           CAST(coalesce(m.n, 0) AS BIGINT) AS n_events,
           round(CAST(coalesce(
               last_value(m.sum_dec IGNORE NULLS) OVER (
                   PARTITION BY grid.event_type ORDER BY grid.minute_b
                   ROWS UNBOUNDED PRECEDING
               ), 0) AS DOUBLE), 2) AS filled_sum,
           CAST(CASE WHEN m.n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
    FROM grid LEFT JOIN m
      ON grid.event_type = m.event_type AND grid.minute_b = m.minute_b
    """,
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward fill: project events onto the
    full per-minute grid between the corpus's first and last minute,
    one row per (event_type, minute), with empty minutes flagged and
    their running sum carried forward from the last active minute —
    the gap-fill/LOCF operator every monitoring/feature pipeline needs
    and SQL engines ship as ``time_bucket_gapfill``/``interpolate``.

    Scale: the minute rollup partial-aggregates before one shuffle
    (bounded by distinct minutes x types, not events); the grid is
    GENERATED (sequence + explode) not stored, and joins the rollup on
    (type, minute) — at 100 TB the grid side is negligible (minutes in
    a decade ~ 5M rows). The forward fill is a window PARTITIONED by
    event_type ordered by minute — bounded partitions, never a global
    unpartitioned window. Sums ride DECIMAL cents; the double cast
    happens once at output."""
    ev = load_events(spark, sf_dir)
    m = ev.groupBy(
        F.expr(f"ts_ns div {_NS_PER_BUCKET}").alias("minute_b"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(value AS DECIMAL(18,2))")).alias("sum_dec"),
    )
    bounds = m.agg(
        F.min("minute_b").alias("lo"), F.max("minute_b").alias("hi")
    )
    types = m.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("minute_b"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("minute_b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    minute_start = F.expr(
        "timestampadd(MINUTE, CAST(minute_b AS INT) * 15, "
        "TIMESTAMP_NTZ'1970-01-01 00:00:00')"
    )
    return (
        grid.join(m, ["event_type", "minute_b"], "left")
        .withColumn(
            "filled_dec", F.last("sum_dec", ignorenulls=True).over(w)
        )
        .select(
            F.date_format(minute_start, "yyyy-MM-dd HH:mm:00").alias(
                "bucket_start"
            ),
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
            F.round(
                F.coalesce(F.col("filled_dec"), F.lit(0)).cast("double"), 2
            ).alias("filled_sum"),
            F.when(F.col("n").isNull(), 1).otherwise(0).cast("bigint").alias(
                "is_gap"
            ),
        )
    )


@register(
    "percentiles_by_event_type",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def percentiles_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median/p90/p99) per event type.
    Spark's ``percentile`` and DuckDB's ``quantile_cont`` both use
    linear interpolation (R type-7), so they agree bit-for-bit on the
    same doubles. At 100 TB the exact form sorts per group; the
    drop-in scale escape is ``approx_percentile`` (KLL-sketch-style
    mergeable summaries, no global sort) at a declared error bound."""
    ev = load_events(spark, sf_dir)
    pct = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.element_at(pct, 1), 6).alias("p50"),
        F.round(F.element_at(pct, 2), 6).alias("p90"),
        F.round(F.element_at(pct, 3), 6).alias("p99"),
    )


@register(
    "range_frame_moving_value",
    oracle="""
    SELECT event_id,
           user_id,
           epoch_us(ts) AS ts_us,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS DOUBLE), 2) AS moving_1h_value,
           count(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS n_events_1h
    FROM events
    """,
)
def range_frame_moving_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed moving window: per user, the trailing-1-hour sum
    and count at every event — a true value-range frame (variable row
    count), not a ROWS frame. Ordering on the raw microsecond epoch
    keeps the frame arithmetic integer-exact and tz-free; DECIMAL
    cents make the running sum order-independent.

    Scale: one shuffle on user_id, then a per-partition sort — the
    same cost envelope as any per-entity window at 100 TB."""
    ev = load_events(spark, sf_dir)
    base = ev.select(
        "event_id",
        "user_id",
        F.expr("ts_ns div 1000").alias("ts_us"),
        F.expr("CAST(value AS DECIMAL(18,2))").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)  # 1h in us
    )
    return base.select(
        "event_id",
        "user_id",
        "ts_us",
        F.round(F.sum("v").over(w).cast("double"), 2).alias("moving_1h_value"),
        F.count(F.lit(1)).over(w).alias("n_events_1h"),
    )


@register(
    "funnel_signup_click_purchase",
    oracle="""
    WITH s AS (
        SELECT user_id, min(ts) AS t FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t
        FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.t
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT 'signup' AS stage, 1 AS stage_idx, (SELECT count(*) FROM s) AS n_users
    UNION ALL
    SELECT 'click', 2, (SELECT count(*) FROM c)
    UNION ALL
    SELECT 'purchase', 3, (SELECT count(*) FROM p)
    """,
)
def funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: users who signed up, then clicked
    AFTER signup, then purchased AFTER that click — strict event-order
    semantics, not mere set membership.

    Plan: one min-aggregation per stage keyed by user, each stage's
    frontier joined to the next (all equi-joins on user_id, the same
    shuffle key throughout, so Spark reuses the partitioning). At
    100 TB each stage is one keyed agg over a filtered slice — linear,
    and the frontier shrinks monotonically."""
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts_ns")

    def stage_after(etype: str, prev: DataFrame | None) -> DataFrame:
        base = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            base = base.join(
                prev.select("user_id", F.col("t").alias("prev_t")), "user_id"
            ).filter(F.col("ts_ns") > F.col("prev_t"))
        return base.groupBy("user_id").agg(F.min("ts_ns").alias("t"))

    s = stage_after("signup", None)
    c = stage_after("click", s)
    p = stage_after("purchase", c)
    counts = [
        df.agg(F.count(F.lit(1)).alias("n_users")).withColumn(
            "stage", F.lit(name)
        ).withColumn("stage_idx", F.lit(i + 1))
        for i, (name, df) in enumerate([("signup", s), ("click", c), ("purchase", p)])
    ]
    out = counts[0]
    for df in counts[1:]:
        out = out.unionByName(df)
    return out.select("stage", F.col("stage_idx").cast("int"), "n_users")


@register(
    "events_cohort_retention",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        FROM events
    ), coh AS (
        SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id
    ), sizes AS (
        SELECT cohort_day, count(*) AS cohort_n FROM coh GROUP BY cohort_day
    )
    SELECT c.cohort_day,
           a.day - c.cohort_day AS day_offset,
           count(*) AS n_users,
           round(count(*)::DOUBLE / any_value(s.cohort_n), 6) AS retention
    FROM act a
    JOIN coh c USING (user_id)
    JOIN sizes s ON s.cohort_day = c.cohort_day
    WHERE a.day - c.cohort_day BETWEEN 0 AND 7
    GROUP BY 1, 2
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by their first-active
    day, then counted on each of the following 7 days they return —
    the standard product-analytics retention triangle (day_offset 0 is
    the cohort itself, so retention there is 1.0 by construction).

    Day bucketing is integer floor-division on epoch nanoseconds —
    timezone-free and identical on both engines. Retention divides two
    exact integers, rounded once at the end.

    Scale: the (user, day) activity set is ONE distinct shuffle; the
    per-user cohort min rides the same user-keyed partitioning; cohort
    sizes are a day-cardinality-bounded aggregate broadcast back into
    the final join, so the big fact table is shuffled exactly once."""
    ev = load_events(spark, sf_dir).select(
        "user_id", F.expr(f"ts_ns div {_NS_PER_DAY}").alias("day")
    )
    act = ev.distinct()
    coh = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = coh.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_n")
    )
    off = F.col("day") - F.col("cohort_day")
    return (
        act.join(coh, "user_id")
        .filter((off >= 0) & (off <= 7))
        .groupBy("cohort_day", off.alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("cohort_n"), 6
            ).alias("retention"),
        )
    )


#: incremental-maintenance split instant: events before 2024-01-01
#: 12:00 UTC are the "already materialized" history, the rest is the
#: arriving delta (the fixture starts 2024-01-01, so both slices are
#: non-empty at every sf)
_INC_SPLIT_NS = 1_704_110_400 * _NS_PER_SEC


@register(
    "rollup_incremental_merge",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
           event_type,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup maintenance: the daily rollup
    of the HISTORICAL slice is materialized once (localCheckpoint
    stands in for the stored table), the arriving delta is aggregated
    alone, and the two partial states MERGE by algebraic
    re-aggregation (counts add, DECIMAL sums add) — never touching
    historical raw events again. The oracle is the full recompute
    over all events: passing proves merge(old_state, delta) ==
    recompute, i.e. the aggregate state is genuinely mergeable (the
    property that makes incremental view maintenance sound).

    Scale: this is THE pattern for continuously-maintained rollups at
    100 TB — per-refresh cost is O(delta) + O(|rollup|), not
    O(history). Counts and DECIMAL sums are trivially mergeable;
    avg/stddev ride as (sum, count[, m2]) pairs; percentiles need
    mergeable sketches instead."""
    ev = load_events(spark, sf_dir).select("event_type", "ts_ns", "value")
    day_b = F.expr(f"ts_ns div {_NS_PER_DAY}").alias("day_b")
    sum_dec = F.sum(F.expr("CAST(value AS DECIMAL(18,2))")).alias("sum_dec")
    n = F.count(F.lit(1)).alias("n")
    old_state = (
        ev.filter(F.col("ts_ns") < _INC_SPLIT_NS)
        .groupBy(day_b, "event_type")
        .agg(n, sum_dec)
        .localCheckpoint()  # the "stored" rollup table
    )
    delta = (
        ev.filter(F.col("ts_ns") >= _INC_SPLIT_NS)
        .groupBy(day_b, "event_type")
        .agg(n, sum_dec)
    )
    day_start = F.expr(
        "timestampadd(DAY, CAST(day_b AS INT), TIMESTAMP_NTZ'1970-01-01 00:00:00')"
    )
    return (
        old_state.union(delta)
        .groupBy("day_b", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("sum_dec").cast("double"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(day_start, "yyyy-MM-dd").alias("day"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "events_time_weighted_avg",
    oracle="""
    WITH seq AS (
        SELECT user_id, value, epoch_ns(ts) AS t,
               lead(epoch_ns(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS t_next
        FROM events
    ), seg AS (
        SELECT user_id,
               CAST(round(value, 6) AS DECIMAL(18,6)) AS v,
               (t_next - t) AS dt
        FROM seq WHERE t_next IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(dt) AS BIGINT) AS span_ns,
           round(CAST(sum(v * dt) AS DOUBLE) / CAST(sum(dt) AS DOUBLE), 6)
               AS twap
    FROM seg GROUP BY user_id
    """,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) of ``value`` per user: each
    event's value holds until the user's next event (step-function /
    last-write-wins semantics), so the average weights every value by
    how LONG it was current, not how often it was reported — the
    correct aggregate for irregularly sampled gauges (position value,
    sensor readings, account balance), where a plain avg() is biased
    toward bursty reporting periods.

    Exactness: durations are int64 nanosecond differences; values
    quantize to DECIMAL(18,6) so every value*dt product and both sums
    are exact decimals on both engines — the one division happens
    last, on identical inputs, rounded once.

    Scale: one window (partitioned by user — never global) to pair
    each event with its successor, then one keyed aggregate with
    map-side partial sums. Same shuffle count as a plain per-user
    rollup."""
    ev = load_events(spark, sf_dir).select(
        "user_id", "value", "ts_ns", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    seg = (
        ev.withColumn("t_next", F.lead("ts_ns").over(w))
        .filter(F.col("t_next").isNotNull())
        .select(
            "user_id",
            F.round("value", 6).cast("decimal(18,6)").alias("v"),
            (F.col("t_next") - F.col("ts_ns")).alias("dt"),
        )
    )
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum("dt").cast("bigint").alias("span_ns"),
        F.round(
            F.sum(F.col("v") * F.col("dt")).cast("double")
            / F.sum("dt").cast("double"),
            6,
        ).alias("twap"),
    )


# ---------------------------------------------------------------------------
# Exponentially weighted moving average (per-key stateful recurrence)
# ---------------------------------------------------------------------------

#: EWMA smoothing factor (exact binary fraction: 1/4).
_EWMA_ALPHA = 0.25


@register(
    "events_ewma_by_user",
    oracle=f"""
    WITH g AS (
        SELECT user_id,
               count(*) AS n_events,
               list(value::DOUBLE ORDER BY epoch_ns(ts), event_id) AS vals
        FROM events
        GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_events AS BIGINT) AS n_events,
           round(vals[-1], 6) AS last_value,
           round(list_reduce(vals,
                 (acc, x) -> round({_EWMA_ALPHA} * x
                                   + {1 - _EWMA_ALPHA} * acc, 9)), 6)
               AS ewma
    FROM g
    """,
)
def events_ewma_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of the event
    value — the classic stateful recurrence (s_1 = x_1,
    s_t = alpha*x_t + (1-alpha)*s_t-1) that has no direct window
    primitive: the weight of x_i decays with DISTANCE from the frame
    end, which RANGE/ROWS frames cannot parametrize. Expressed as an
    ordered fold over the per-key value sequence
    (``aggregate``/``list_reduce``) — each key's state is one scalar,
    the same per-key-bounded shape as sessionization.

    Cross-engine float discipline: every fold step is rounded to 9 dp
    (one identically-ordered fma-free expression), so both engines
    walk the identical quantized state trajectory; ordering ties
    break on event_id.

    Scale: one keyed shuffle; per-key memory is the user's event list
    (bounded by per-entity activity, not corpus size — the identical
    bound sessionization and applyInPandasWithState already carry).
    On a key whose history can't fit, the same fold runs as a
    streaming update-mode aggregate with the scalar state in the
    state store."""
    ev = load_events(spark, sf_dir)
    g = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts_ns", "event_id", "value"))
            ),
            lambda s: s["value"].cast("double"),
        ).alias("vals"),
    )
    fold = F.aggregate(
        F.slice(F.col("vals"), 2, F.size("vals") - 1),
        F.element_at("vals", 1),
        lambda acc, x: F.round(
            F.lit(_EWMA_ALPHA) * x + F.lit(1 - _EWMA_ALPHA) * acc, 9
        ),
    )
    return g.select(
        "user_id",
        "n_events",
        F.round(F.element_at("vals", -1), 6).alias("last_value"),
        F.round(fold, 6).alias("ewma"),
    )
