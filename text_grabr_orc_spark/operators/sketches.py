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

from pyspark.sql import DataFrame, SparkSession
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
