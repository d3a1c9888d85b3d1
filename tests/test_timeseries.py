"""Time-series operators: semantics on hand-built corners the driver
fixtures can't hit (boundary ties, empty sides), plus plan-shape
assertions — the as-of/range compositions must never degenerate into
nested-loop/cartesian plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_grabr_orc_spark.operators import timeseries
from text_grabr_orc_spark.plans import assert_no_python, executed_plan


def test_asof_plan_is_linear(spark, sf_dir):
    df = timeseries.asof_purchase_last_click(spark, sf_dir)
    plan = executed_plan(df)
    # the whole point of the union+window shape: NO join at all
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in plan, plan
    assert_no_python(df)


def test_range_join_plan_is_keyed(spark, sf_dir):
    df = timeseries.range_join_clicks_before_purchase(spark, sf_dir)
    plan = executed_plan(df)
    # range predicate must ride an equi-join on user_id, not a
    # nested-loop over all pairs
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert_no_python(df)


def test_asof_boundary_and_missing_click(spark):
    # user 1: click at t=100 exactly equal to purchase ts -> matched
    #         (ASOF is <=); later purchase reuses the same click
    # user 2: purchase with no click ever -> null click, null gap
    rows = [
        (1, 1, "click", 100_000),
        (2, 1, "purchase", 100_000),
        (3, 1, "purchase", 250_000),
        (4, 2, "purchase", 50_000),
        (5, 2, "click", 60_000),  # AFTER the purchase -> must not match
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_ns long"
    )
    import text_grabr_orc_spark.operators.timeseries as ts
    import text_grabr_orc_spark.sources.events as src

    orig = src.load_events
    try:
        src.load_events = lambda _spark, _sf: ev
        ts_load = ts.load_events  # module-level import binding
        ts.load_events = lambda _spark, _sf: ev
        out = {
            r["event_id"]: r.asDict()
            for r in ts.asof_purchase_last_click(spark, "unused").collect()
        }
    finally:
        src.load_events = orig
        ts.load_events = ts_load
    assert out[2]["click_ts_us"] == 100 and out[2]["gap_us"] == 0
    assert out[3]["click_ts_us"] == 100 and out[3]["gap_us"] == 150
    assert out[4]["click_ts_us"] == -1 and out[4]["gap_us"] == -1


def test_multires_rollup_matches_direct_daily(spark, sf_dir):
    """The minute->day two-level rollup must equal a direct daily agg
    (n and sum; n_active_minutes is checked for sanity bounds)."""
    from text_grabr_orc_spark.sources.events import load_events

    direct = (
        load_events(spark, sf_dir)
        .groupBy(
            F.date_format(
                F.expr(
                    "timestampadd(DAY, CAST(ts_ns div 86400000000000 AS INT), "
                    "TIMESTAMP_NTZ'1970-01-01 00:00:00')"
                ),
                "yyyy-MM-dd",
            ).alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rolled = timeseries.multires_rollup_daily(spark, sf_dir).select(
        "day", "event_type", "n", "n_active_minutes"
    )
    d = {(r["day"], r["event_type"]): r["n"] for r in direct.collect()}
    for r in rolled.collect():
        key = (r["day"], r["event_type"])
        assert d[key] == r["n"], key
        assert 1 <= r["n_active_minutes"] <= r["n"]


def test_gapfill_grid_complete_and_locf_monotone(spark, sf_dir):
    """Every (event_type, bucket) cell of the global grid appears
    exactly once; gap rows carry the previous bucket's filled_sum."""
    rows = timeseries.events_gapfill_locf(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    sizes = {len(v) for v in by_type.values()}
    assert len(sizes) == 1  # same grid length for every type
    for rs in by_type.values():
        rs.sort(key=lambda r: r.bucket_start)
        assert len({r.bucket_start for r in rs}) == len(rs)  # no dup cells
        prev = 0.0
        for r in rs:
            assert (r.n_events == 0) == (r.is_gap == 1)
            if r.is_gap:
                assert r.filled_sum == prev  # LOCF carries forward
            prev = r.filled_sum


def test_cohort_retention_day0_is_full(spark, sf_dir):
    """day_offset 0 is the cohort itself: retention must be exactly
    1.0 and n_users must equal the cohort size; every retention is in
    (0, 1]; offsets stay in the 0..7 window."""
    from text_grabr_orc_spark.operators.timeseries import (
        events_cohort_retention,
    )

    rows = events_cohort_retention(spark, sf_dir).collect()
    assert rows
    day0 = {r.cohort_day: r for r in rows if r.day_offset == 0}
    assert day0, "every cohort must have its day-0 row"
    for r in rows:
        assert 0 <= r.day_offset <= 7
        assert 0.0 < r.retention <= 1.0
        assert r.n_users <= day0[r.cohort_day].n_users
    for r in day0.values():
        assert r.retention == 1.0


def test_cdc_last_write_wins_matches_window_rank(spark, sf_dir):
    """The max_by compaction must agree with the window-rank
    formulation computed independently in the test."""
    from pyspark.sql import Window

    from text_grabr_orc_spark.operators.events_batch import (
        cdc_last_write_wins,
    )
    from text_grabr_orc_spark.sources.events import load_events

    got = {
        r.user_id: (r.last_type, r.last_value, r.last_event_id, r.n_events, r.alive)
        for r in cdc_last_write_wins(spark, sf_dir).collect()
    }
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_ns").desc(), F.col("event_id").desc()
    )
    ranked = (
        load_events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_events",
            F.count(F.lit(1)).over(Window.partitionBy("user_id")),
        )
        .filter(F.col("rn") == 1)
        .collect()
    )
    want = {
        r.user_id: (
            r.event_type,
            round(r.value, 6),
            r.event_id,
            r.n_events,
            1 if r.event_type != "error" else 0,
        )
        for r in ranked
    }
    assert got == want and got


def test_twap_within_value_bounds(spark, sf_dir):
    """A time-weighted average must lie within the user's observed
    value range, and span_ns must equal last-first event time."""
    from text_grabr_orc_spark.operators.timeseries import (
        events_time_weighted_avg,
    )
    from text_grabr_orc_spark.sources.events import load_events

    ev = load_events(spark, sf_dir).select("user_id", "value", "ts_ns").collect()
    lo, hi, first, last = {}, {}, {}, {}
    for r in ev:
        lo[r.user_id] = min(lo.get(r.user_id, r.value), r.value)
        hi[r.user_id] = max(hi.get(r.user_id, r.value), r.value)
        first[r.user_id] = min(first.get(r.user_id, r.ts_ns), r.ts_ns)
        last[r.user_id] = max(last.get(r.user_id, r.ts_ns), r.ts_ns)
    rows = events_time_weighted_avg(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert lo[r.user_id] - 1e-6 <= r.twap <= hi[r.user_id] + 1e-6
        assert r.span_ns == last[r.user_id] - first[r.user_id]


def test_ewma_matches_python_reference_fold(spark, sf_dir):
    """The relational fold must equal a plain-Python EWMA with the
    same 9-dp step quantization over identically ordered events."""
    from text_grabr_orc_spark.operators.timeseries import (
        _EWMA_ALPHA,
        events_ewma_by_user,
    )
    from text_grabr_orc_spark.sources.events import load_events

    got = {
        r["user_id"]: (r["n_events"], r["last_value"], r["ewma"])
        for r in events_ewma_by_user(spark, sf_dir).collect()
    }
    ev = load_events(spark, sf_dir).select(
        "user_id", "ts_ns", "event_id", "value"
    ).collect()
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts_ns"], r["event_id"], float(r["value"]))
        )
    assert set(got) == set(by_user)
    for u, rows in by_user.items():
        rows.sort()
        vals = [v for _, _, v in rows]
        acc = vals[0]
        for x in vals[1:]:
            acc = round(_EWMA_ALPHA * x + (1 - _EWMA_ALPHA) * acc, 9)
        n, last, ewma = got[u]
        assert n == len(vals)
        assert last == round(vals[-1], 6)
        assert ewma == round(acc, 6), (u, ewma, acc)


def test_transition_matrix_rows_are_distributions(spark, sf_dir):
    """Each from_type's probabilities sum to 1 (within 6-dp rounding
    slack) and transition counts conserve: total transitions =
    total events - number of users (one fewer transition than
    events per user)."""
    from text_grabr_orc_spark.operators.events_batch import (
        events_transition_matrix,
    )
    from text_grabr_orc_spark.sources.events import load_events

    rows = events_transition_matrix(spark, sf_dir).collect()
    from collections import defaultdict

    by_from = defaultdict(float)
    total = 0
    for r in rows:
        by_from[r["from_type"]] += r["p"]
        total += r["n"]
    for ft, s in by_from.items():
        assert abs(s - 1.0) < 1e-4, (ft, s)
    ev = load_events(spark, sf_dir)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total == n_events - n_users


def test_mad_robust_to_planted_outlier(spark, sf_dir, tmp_path):
    """Breakdown-point property: planting one enormous outlier per
    type must leave median/MAD (computed on the polluted data)
    essentially unchanged while the outlier itself is flagged —
    the reason this operator exists next to the mean/stddev z-score."""
    import os

    from pyspark.sql import functions as F  # noqa: F401

    from text_grabr_orc_spark.operators.events_batch import (
        events_robust_zscore_mad,
    )

    base = {
        r["event_type"]: r
        for r in events_robust_zscore_mad(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    one = ev.limit(1).withColumn("value", F.lit(1e9)).withColumn(
        "event_id", F.lit(10**12)
    )
    d = str(tmp_path / "sf_mad")
    os.makedirs(d, exist_ok=True)
    ev.unionByName(one).coalesce(2).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    polluted = {
        r["event_type"]: r
        for r in events_robust_zscore_mad(spark, d).collect()
    }
    for t, b in base.items():
        p = polluted[t]
        assert abs(p["median"] - b["median"]) <= 0.05 * max(abs(b["median"]), 1)
        assert abs(p["mad"] - b["mad"]) <= 0.05 * max(b["mad"], 1)
        assert p["n_anomalies"] >= b["n_anomalies"]
    assert sum(p["n_anomalies"] for p in polluted.values()) == sum(
        b["n_anomalies"] for b in base.values()
    ) + 1


def test_trend_slope_matches_numpy_polyfit(spark, sf_dir):
    """The integer-exact closed-form slope equals numpy's lstsq fit
    over the same (hour, count) support set, per event type."""
    import numpy as np

    from text_grabr_orc_spark.operators.events_batch import (
        events_trend_slope_by_type,
    )

    rows = {r["event_type"]: r for r in events_trend_slope_by_type(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = (
        ev.select(
            "event_type", F.date_trunc("hour", "ts").alias("h")
        )
        .groupBy("event_type", "h")
        .count()
        .collect()
    )
    pts: dict[str, list] = {}
    for r in hourly:
        pts.setdefault(r["event_type"], []).append(
            (r["h"].timestamp() / 3600, r["count"])
        )
    assert set(rows) == set(pts)
    for t, xy in pts.items():
        x = np.array([a for a, _ in xy]); y = np.array([b for _, b in xy])
        slope = np.polyfit(x - x.min(), y, 1)[0]
        assert rows[t]["n_hours"] == len(xy)
        assert abs(rows[t]["slope_per_hour"] - slope) < 1e-4
        assert abs(rows[t]["mean_per_hour"] - y.mean()) < 1e-4
