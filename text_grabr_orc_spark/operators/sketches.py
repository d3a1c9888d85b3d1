"""Mergeable sketch operators with FULL oracle checks.

approx_count_distinct (HyperLogLog++) is engine-specific, so its query
(`events_user_reach_approx`) can only be rows-only checked. This
module shows the stronger property: a sketch built from hashes BOTH
engines compute identically (32-bit md5 slices, the same device the
SimHash oracle uses) is bit-for-bit reproducible in DuckDB, so the
whole approximate data structure — not just its accuracy envelope —
sits behind the driver's hash gate.

Count-min sketch (Cormode & Muthukrishnan 2005, public): d hash rows
by w buckets of counters; estimate(key) = min over rows of the keyed
cell. Estimates only ever OVERcount (collisions add), never under —
asserted in tests and observable in the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from text_grabr_orc_spark.registry import register
from text_grabr_orc_spark.sources.events import load_events

#: sketch geometry: 4 hash rows x 64 buckets = 256 counters total —
#: deliberately tiny so collisions (and the overcount they cause) are
#: visible in fixture-sized data instead of theoretical.
_CMS_D = 4
_CMS_W = 64


def _bucket(i: int, key):
    """Row-i CMS bucket of a string key: 32-bit md5 slice of "i:key"
    mod w — plain enough for any engine to replicate."""
    digest = F.md5(F.concat(F.lit(f"{i}:"), key))
    return (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint") % _CMS_W
    )


@register(
    "events_heavy_hitters_cms",
    oracle=f"""
    WITH cells AS (
        SELECT j,
               ('0x' || substr(md5(j::VARCHAR || ':' || event_type), 1, 8))::BIGINT
                   % {_CMS_W} AS bucket,
               count(*) AS n
        FROM events CROSS JOIN (SELECT unnest(range({_CMS_D})) AS j)
        GROUP BY 1, 2
    ), keys AS (
        SELECT DISTINCT event_type FROM events
    ), probes AS (
        SELECT k.event_type, c.n
        FROM keys k
        CROSS JOIN (SELECT unnest(range({_CMS_D})) AS jj) r
        JOIN cells c
          ON c.j = r.jj
         AND c.bucket = ('0x' || substr(md5(r.jj::VARCHAR || ':' || k.event_type),
                                        1, 8))::BIGINT % {_CMS_W}
    ), est AS (
        SELECT event_type, CAST(min(n) AS BIGINT) AS cms_n
        FROM probes GROUP BY event_type
    ), exact AS (
        SELECT event_type, count(*) AS exact_n FROM events GROUP BY event_type
    )
    SELECT e.event_type, e.exact_n, est.cms_n,
           CAST(est.cms_n - e.exact_n AS BIGINT) AS overcount
    FROM exact e JOIN est USING (event_type)
    """,
)
def events_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for every event type next
    to the exact counts — the mergeable fixed-memory structure that
    replaces exact per-key counting when the key space (not the data)
    is what's huge at 100 TB.

    The sketch is built as a relational aggregation: each event
    contributes one increment per hash row (a {_CMS_D}-way explode),
    and the 256-cell table IS the sketch — partial aggregation makes
    the shuffle carry at most 256 rows per mapper regardless of input
    size, and two sketches merge by adding cells (the property that
    makes CMS distributable). Probing is a broadcast-sized join of the
    distinct keys against their {_CMS_D} cells; min over rows is the
    estimate. md5-slice bucket hashes make the whole thing
    engine-portable, so unlike HLL the driver hash-checks every cell
    boundary effect, not just row counts.

    CMS guarantees estimate >= exact (collisions only add); the
    `overcount` column exposes the error the tiny 4x64 geometry
    produces on purpose."""
    ev = load_events(spark, sf_dir).select("event_type")
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("j"), _bucket(i, F.col("event_type")).alias("bucket")
                )
                for i in range(_CMS_D)
            ]
        )
    ).alias("r")
    cells = (
        ev.select(rows)
        .select("r.j", "r.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    keys = ev.distinct()
    probes = keys.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("j"),
                        _bucket(i, F.col("event_type")).alias("bucket"),
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("p"),
    ).select("event_type", "p.j", "p.bucket")
    est = (
        probes.join(cells, ["j", "bucket"])
        .groupBy("event_type")
        .agg(F.coalesce(F.min("n"), F.lit(-1)).cast("bigint").alias("cms_n"))
    )
    exact = (
        ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_n"))
    )
    return exact.join(est, "event_type").select(
        "event_type",
        "exact_n",
        "cms_n",
        (F.col("cms_n") - F.col("exact_n")).cast("bigint").alias("overcount"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog (oracle-checked registers, not just an accuracy envelope)
# ---------------------------------------------------------------------------

#: HLL geometry: 64 registers (6 index bits), 26-bit rank suffix from
#: a 32-bit md5 slice; alpha for m=64 per Flajolet et al. 2007.
_HLL_M = 64
_HLL_ALPHA = 0.709
_HLL_MAX_RANK = 27


def _hll_rank_case(suffix: str) -> str:
    """CASE chain computing trailing-zeros+1 of ``suffix`` (the HLL
    rank) in the Spark-SQL ∩ DuckDB operator dialect — generated once
    and used VERBATIM on both engines, so there is no float log2 to
    disagree about."""
    whens = " ".join(
        f"WHEN (({suffix}) & {1 << k}) <> 0 THEN {k + 1}"
        for k in range(_HLL_MAX_RANK - 1)
    )
    return f"CASE {whens} ELSE {_HLL_MAX_RANK} END"


@register(
    "hll_distinct_users",
    oracle=f"""
    WITH h AS (
        SELECT ('0x' || substr(md5('hll:' || user_id::VARCHAR), 1, 8))::BIGINT
                   AS h
        FROM events
    ), regs AS (
        SELECT h % {_HLL_M} AS idx,
               max({_hll_rank_case(f"h // {_HLL_M}")}) AS r
        FROM h GROUP BY idx
    ), full_regs AS (
        SELECT i.idx, coalesce(regs.r, 0) AS r
        FROM (SELECT unnest(range({_HLL_M}))::BIGINT AS idx) i
        LEFT JOIN regs USING (idx)
    ), est AS (
        SELECT {_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
                   / sum(power(2.0, -r)) AS raw_est,
               CAST(sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS empty_registers,
               CAST(sum(r) AS BIGINT) AS register_sum
        FROM full_regs
    )
    SELECT CAST({_HLL_M} AS BIGINT) AS m,
           (SELECT count(DISTINCT user_id) FROM events) AS n_exact,
           round(CASE WHEN raw_est <= 2.5 * {_HLL_M} AND empty_registers > 0
                      THEN {_HLL_M} * ln({_HLL_M}
                                         / CAST(empty_registers AS DOUBLE))
                      ELSE raw_est END, 6) AS estimate,
           round(raw_est, 6) AS raw_estimate,
           empty_registers, register_sum
    FROM est
    """,
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate with ORACLE-CHECKED
    registers — the companion to the count-min sketch above: because
    register updates are max() over hashes both engines compute
    identically (32-bit md5 slices, trailing-zero rank via a shared
    CASE chain — no float log anywhere), the entire sketch state and
    the raw Flajolet estimate are bit-reproducible in DuckDB. The
    estimate's float arithmetic is deterministic too: every 2^-r term
    is an exact power of two within 2^27 of each other, so the 64-term
    sum is EXACT in doubles regardless of order.

    This is the mergeable-state shape that matters at 100 TB:
    registers partial-aggregate map-side (max is commutative), shuffle
    64 rows total, and two corpora's sketches merge with elementwise
    max — the distributed-distinct-count contract
    (approx_count_distinct runs the same structure with an opaque
    private hash, which is why it can only be rows-only checked).

    Small-range correction included (raw <= 2.5m with empty registers
    switches to linear counting m*ln(m/V), Flajolet et al.'s standard
    branch — the single scalar ln rounds at 6dp, far above engine ulp
    noise); the uncorrected raw estimate rides along, and n_exact
    makes the error visible."""
    ev = load_events(spark, sf_dir).select("user_id")
    h = ev.select(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("hll:"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h")
    )
    regs = h.select(
        (F.col("h") % _HLL_M).alias("idx"),
        F.expr(_hll_rank_case(f"h div {_HLL_M}")).alias("rank"),
    ).groupBy("idx").agg(F.max("rank").alias("r"))
    full_regs = (
        spark.range(_HLL_M)
        .select(F.col("id").alias("idx"))
        .join(regs, "idx", "left")
        .select(F.coalesce("r", F.lit(0)).alias("r"))
    )
    est = full_regs.agg(
        (
            F.lit(_HLL_ALPHA * _HLL_M * _HLL_M)
            / F.sum(F.pow(F.lit(2.0), -F.col("r")))
        ).alias("raw_est"),
        F.sum((F.col("r") == 0).cast("int")).cast("bigint").alias(
            "empty_registers"
        ),
        F.sum("r").cast("bigint").alias("register_sum"),
    )
    n_exact = ev.distinct().count()
    corrected = F.when(
        (F.col("raw_est") <= 2.5 * _HLL_M) & (F.col("empty_registers") > 0),
        F.lit(float(_HLL_M))
        * F.log(F.lit(float(_HLL_M)) / F.col("empty_registers").cast("double")),
    ).otherwise(F.col("raw_est"))
    return est.select(
        F.lit(_HLL_M).cast("bigint").alias("m"),
        F.lit(n_exact).cast("bigint").alias("n_exact"),
        F.round(corrected, 6).alias("estimate"),
        F.round("raw_est", 6).alias("raw_estimate"),
        "empty_registers",
        "register_sum",
    )


# ---------------------------------------------------------------------------
# Equi-width histogram quantile sketch (mergeable approximate quantiles)
# ---------------------------------------------------------------------------

#: 256 bins: error bound = one bin width = (max-min)/256 per group.
_HQ_BINS = 256
#: quantiles reported per group.
_HQ_QS = (0.5, 0.9, 0.99)


@register(
    "quantile_sketch_histogram",
    oracle=f"""
    WITH bounds AS (
        SELECT event_type, min(value) AS vmin, max(value) AS vmax
        FROM events GROUP BY 1
    ), binned AS (
        SELECT e.event_type,
               CASE WHEN b.vmax = b.vmin THEN 0
                    ELSE least({_HQ_BINS} - 1,
                               CAST(floor((e.value - b.vmin)
                                          / (b.vmax - b.vmin)
                                          * {_HQ_BINS}) AS BIGINT))
               END AS bin
        FROM events e JOIN bounds b USING (event_type)
    ), hist AS (
        SELECT event_type, bin, count(*) AS n FROM binned GROUP BY 1, 2
    ), cum AS (
        SELECT event_type, bin, n,
               sum(n) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS c,
               sum(n) OVER (PARTITION BY event_type) AS total
        FROM hist
    ), hits AS (
        SELECT q.q, cum.event_type, cum.total,
               min(cum.bin) AS qbin
        FROM cum CROSS JOIN (VALUES (CAST(0.5 AS DOUBLE)),
                                    (CAST(0.9 AS DOUBLE)),
                                    (CAST(0.99 AS DOUBLE))) AS q(q)
        WHERE cum.c >= ceil(q.q * cum.total)
        GROUP BY 1, 2, 3
    )
    SELECT h.event_type, h.q, CAST(h.qbin AS BIGINT) AS qbin,
           round(b.vmin + (h.qbin + 1)
                 * ((b.vmax - b.vmin) / {_HQ_BINS}), 6) AS est,
           CAST(h.total AS BIGINT) AS n
    FROM hits h JOIN bounds b USING (event_type)
    """,
)
def quantile_sketch_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-group quantiles from a two-pass equi-width
    histogram — the mergeable shape for quantiles over 100 TB, where
    a global sort (exact percentiles) costs a full-data exchange:
    pass 1 is a per-group min/max (map-side combinable, broadcastable
    result); pass 2 bins every value and counts — the histogram is
    #groups x 256 rows, merges associatively across partitions,
    shards, or days (sum the bins), and any quantile reads off the
    cumulative counts. The estimate returned is the UPPER edge of the
    first bin whose cumulative count reaches ceil(q*n); the ceil(q*n)-th
    order statistic lies inside that bin, so the estimate brackets it
    from above within one bin width ((max-min)/256 per group — both
    properties asserted in tests).

    Unlike ``approx_percentile`` (engine-private GK sketch), every
    step here is elementary arithmetic both engines execute
    identically — bin ids come from the same IEEE double expression —
    so the driver hash-checks the whole sketch, not an accuracy
    envelope. Exact counterpart: ``percentiles_by_event_type``.
    """
    ev = load_events(spark, sf_dir).select("event_type", "value")
    bounds = F.broadcast(
        ev.groupBy("event_type").agg(
            F.min("value").alias("vmin"), F.max("value").alias("vmax")
        )
    )
    width = (F.col("vmax") - F.col("vmin")) / _HQ_BINS
    bin_col = F.when(F.col("vmax") == F.col("vmin"), F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.lit(_HQ_BINS - 1).cast("bigint"),
            F.floor(
                (F.col("value") - F.col("vmin"))
                / (F.col("vmax") - F.col("vmin"))
                * _HQ_BINS
            ),
        )
    )
    hist = (
        ev.join(bounds, "event_type")
        .select("event_type", bin_col.alias("bin"))
        .groupBy("event_type", "bin")
        .count()
        .withColumnRenamed("count", "n")
    )
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "bin",
        F.sum("n").over(wcum).alias("c"),
        F.sum("n").over(wtot).alias("total"),
    )
    qs = F.explode(
        F.array(*[F.lit(q) for q in _HQ_QS])
    ).alias("q")
    hits = (
        cum.select("event_type", "bin", "c", "total", qs)
        .filter(F.col("c") >= F.ceil(F.col("q") * F.col("total")))
        .groupBy("event_type", "q")
        .agg(F.min("bin").alias("qbin"), F.first("total").alias("n"))
    )
    return hits.join(bounds, "event_type").select(
        "event_type",
        "q",
        F.col("qbin").cast("bigint"),
        F.round(F.col("vmin") + (F.col("qbin") + 1) * width, 6).alias("est"),
        "n",
    )


# ---------------------------------------------------------------------------
# Sliding-window HLL: sketch algebra over a time window
# ---------------------------------------------------------------------------

_NS_PER_DAY = 86_400 * 1_000_000_000
#: trailing window width in days (current day + 6 preceding).
_HLL_WIN_DAYS = 7


@register(
    "hll_sliding_window_users",
    oracle=f"""
    WITH e AS (
        SELECT epoch_ns(ts) // {_NS_PER_DAY} AS day,
               ('0x' || substr(md5('hll:' || user_id::VARCHAR), 1, 8))::BIGINT
                   AS h,
               user_id
        FROM events
    ), daily AS (
        SELECT day, h % {_HLL_M} AS idx,
               max({_hll_rank_case(f"h // {_HLL_M}")}) AS r
        FROM e GROUP BY 1, 2
    ), days AS (SELECT DISTINCT day FROM e),
    grid AS (
        SELECT d.day, i.idx
        FROM days d
        CROSS JOIN (SELECT unnest(range({_HLL_M}))::BIGINT AS idx) i
    ), dense AS (
        SELECT g.day, g.idx, coalesce(daily.r, 0) AS r
        FROM grid g LEFT JOIN daily USING (day, idx)
    ), merged AS (
        SELECT day, idx,
               max(r) OVER (PARTITION BY idx ORDER BY day
                            RANGE BETWEEN {_HLL_WIN_DAYS - 1} PRECEDING
                                      AND CURRENT ROW) AS r
        FROM dense
    ), est AS (
        SELECT day,
               {_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
                   / sum(power(2.0, -r)) AS raw_est,
               CAST(sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS empty_registers,
               CAST(sum(r) AS BIGINT) AS register_sum
        FROM merged GROUP BY day
    ), exact AS (
        SELECT d.day, count(DISTINCT e.user_id) AS n_exact
        FROM days d JOIN e ON e.day BETWEEN d.day - {_HLL_WIN_DAYS - 1}
                                        AND d.day
        GROUP BY d.day
    )
    SELECT CAST(est.day AS BIGINT) AS day,
           CAST(exact.n_exact AS BIGINT) AS n_exact,
           round(CASE WHEN raw_est <= 2.5 * {_HLL_M} AND empty_registers > 0
                      THEN {_HLL_M} * ln({_HLL_M}
                                         / CAST(empty_registers AS DOUBLE))
                      ELSE raw_est END, 6) AS estimate,
           empty_registers, register_sum
    FROM est JOIN exact USING (day)
    """,
)
def hll_sliding_window_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day via HLL REGISTER ALGEBRA
    — the sketch-merge capability ``hll_distinct_users`` claims,
    exercised as an actual window computation: per-day registers are
    built once (max over identically-hashed md5 slices), and every
    day's 7-day estimate is an elementwise-max MERGE of the daily
    sketches expressed as a RANGE window over the register table.
    This is the production shape for "rolling distinct" at 100 TB:
    raw events are touched ONCE (one keyed shuffle to day x 64
    registers); the sliding merge runs on #days x 64 rows of sketch
    state — re-counting each overlapping window from raw events would
    read every event ~7 times.

    Registers, merged registers and the raw Flajolet estimate are
    exactly reproduced in DuckDB (same CASE-chain ranks, exact
    power-of-two sums); the linear-counting small-range branch and
    the exact trailing distinct count ride along per day (the exact
    column is the accuracy meter, diagnostic-only at scale — same
    stance as ``hll_distinct_users``'s n_exact)."""
    ev = load_events(spark, sf_dir).select(
        F.expr(f"ts_ns div {_NS_PER_DAY}").alias("day"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("hll:"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
        "user_id",
    )
    daily = (
        ev.select(
            "day",
            (F.col("h") % _HLL_M).alias("idx"),
            F.expr(_hll_rank_case(f"h div {_HLL_M}")).alias("rank"),
        )
        .groupBy("day", "idx")
        .agg(F.max("rank").alias("r"))
    )
    days = ev.select("day").distinct()
    grid = days.crossJoin(
        F.broadcast(spark.range(_HLL_M).select(F.col("id").alias("idx")))
    )
    dense = grid.join(daily, ["day", "idx"], "left").select(
        "day", "idx", F.coalesce("r", F.lit(0)).alias("r")
    )
    w = (
        Window.partitionBy("idx")
        .orderBy("day")
        .rangeBetween(-(_HLL_WIN_DAYS - 1), 0)
    )
    merged = dense.select("day", "idx", F.max("r").over(w).alias("r"))
    est = merged.groupBy("day").agg(
        (
            F.lit(_HLL_ALPHA * _HLL_M * _HLL_M)
            / F.sum(F.pow(F.lit(2.0), -F.col("r")))
        ).alias("raw_est"),
        F.sum((F.col("r") == 0).cast("int"))
        .cast("bigint")
        .alias("empty_registers"),
        F.sum("r").cast("bigint").alias("register_sum"),
    )
    d2 = days.select(F.col("day").alias("d"))
    exact = (
        d2.join(
            ev.select("day", "user_id"),
            (F.col("day") >= F.col("d") - (_HLL_WIN_DAYS - 1))
            & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_exact"))
        .select(F.col("d").alias("day"), "n_exact")
    )
    corrected = F.when(
        (F.col("raw_est") <= 2.5 * _HLL_M) & (F.col("empty_registers") > 0),
        F.lit(float(_HLL_M))
        * F.log(F.lit(float(_HLL_M)) / F.col("empty_registers").cast("double")),
    ).otherwise(F.col("raw_est"))
    return est.join(exact, "day").select(
        F.col("day").cast("bigint"),
        "n_exact",
        F.round(corrected, 6).alias("estimate"),
        "empty_registers",
        "register_sum",
    )
