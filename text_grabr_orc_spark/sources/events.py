"""Events-table source: nanosecond-timestamp parquet.

The fixture's ``ts`` column is parquet TIMESTAMP(NANOS) which Spark's
vectorized reader refuses outright (PARQUET_TYPE_ILLEGAL). We read the
raw int64 via ``spark.sql.legacy.parquet.nanosAsLong`` and rebuild a
TIMESTAMP_NTZ with pure integer arithmetic — timezone-free by
construction, so results cannot depend on the driver session's zone.

All arithmetic is integer (``div``): ns -> us is exact, and
``timestampadd(MICROSECOND, us, NTZ epoch)`` is exact; this matches
DuckDB's naive TIMESTAMP_NS down to microsecond truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_grabr_orc_spark.tables import table_path


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as TIMESTAMP_NTZ and ``ts_ns`` as raw int64."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(table_path(sf_dir, "events"))
    return raw.select(
        "event_id",
        F.col("ts").alias("ts_ns"),
        F.expr(
            "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ'1970-01-01 00:00:00')"
        ).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
