"""Events-table source: normalizes the fixture timestamp.

The fixture's ``ts`` column is parquet TIMESTAMP(MICROS,
isAdjustedToUTC=false), which Spark reads as TIMESTAMP_NTZ. Every
downstream operator consumes the pair this loader emits:

- ``ts``     TIMESTAMP_NTZ — the wall-clock value as stored
- ``ts_ns``  int64 epoch nanoseconds — pure integer time arithmetic
             (bucketing, session gaps, as-of windows) that cannot
             depend on the driver session's timezone

``ts_ns`` is derived with ``timestampdiff(MICROSECOND, NTZ epoch,
ts) * 1000`` — NTZ-to-NTZ difference is timezone-free by
construction and exact (us -> ns multiplication), matching DuckDB's
``epoch_ns(ts)`` on the same parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_grabr_orc_spark.tables import table_path

# epoch microseconds from the NTZ column, timezone-free
EPOCH_US_EXPR = (
    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as TIMESTAMP_NTZ and ``ts_ns`` as int64 epoch ns."""
    raw = spark.read.parquet(table_path(sf_dir, "events"))
    return raw.select(
        "event_id",
        F.expr(f"({EPOCH_US_EXPR}) * 1000").alias("ts_ns"),
        "ts",
        "user_id",
        "event_type",
        "value",
        "props",
    )
