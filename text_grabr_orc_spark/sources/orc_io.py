"""ORC read/write with predicate pushdown — the BASELINE.json
north-star format ("Spark DataFrame read/write ORC with predicate
pushdown").

The registered query materializes lineitem as ORC (partitioned by
``l_returnflag`` so partition pruning is also exercised), reads it
back with a selective filter, and aggregates. The oracle runs the
same filter+aggregate on the original parquet — equality proves the
round-trip is lossless; the plan test in tests/test_plans.py proves
the filter actually reaches the ORC scan (PushedFilters) instead of
being applied post-read.

Scale: writing partitioned ORC is the canonical layout step for a
100 TB corpus — downstream queries on the partition key prune entire
directories, and min/max stripe statistics prune within files.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_grabr_orc_spark.registry import register
from text_grabr_orc_spark.tables import load_table

_CACHE_DIR = os.path.join(tempfile.gettempdir(), "tgos_orc_cache")


def write_lineitem_orc(spark: SparkSession, sf_dir: str) -> str:
    """Write lineitem as ORC partitioned by return flag; cached per
    fixture CONTENT (tables.cache_tag) so a regenerated testdata dir
    invalidates the cache instead of silently serving stale rows —
    the same guard every other derived /tmp cache uses."""
    from text_grabr_orc_spark.tables import cache_tag

    out = os.path.join(_CACHE_DIR, cache_tag(sf_dir))
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        (
            load_table(spark, sf_dir, "lineitem")
            .write.mode("overwrite")
            .partitionBy("l_returnflag")
            .orc(out)
        )
    return out


def read_lineitem_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.orc(write_lineitem_orc(spark, sf_dir))


@register(
    "orc_roundtrip_pushdown",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity >= 30
    GROUP BY l_returnflag, l_linestatus
    """,
)
def orc_roundtrip_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet -> ORC(partitioned) -> filtered read-back -> aggregate.

    ``l_returnflag = 'R'`` prunes partitions (directory-level);
    ``l_quantity >= 30`` is pushed into the ORC reader (stripe-level
    min/max)."""
    df = read_lineitem_orc(spark, sf_dir)
    return (
        df.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 30))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.expr("CAST(l_quantity AS DECIMAL(18,2))")).cast("double"), 2
            ).alias("sum_qty"),
        )
    )
