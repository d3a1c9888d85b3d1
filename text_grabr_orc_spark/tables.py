"""Loaders for the driver fixture tables (see FIXTURES.md / TESTDATA.md).

Ten parquet tables per scale-factor directory. Loading goes straight
through ``spark.read.parquet`` so Catalyst gets native scans with
predicate pushdown and column pruning — no custom source needed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at ANY scale factor —
#: region/nation are bounded by geography (5/25 rows at every sf).
BROADCAST_TABLES = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (native parquet scan)."""
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all fixture tables keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def cache_tag(sf_dir: str) -> str:
    """Cache-directory tag for derived /tmp artifacts: the sf path
    plus a fingerprint of every source table's (mtime, size). Derived
    caches (CSV/JSON/XML round-trips, sorted layouts, ...) are guarded
    by a does-it-exist check — keying them by fixture CONTENT means a
    regenerated testdata directory invalidates them automatically
    instead of silently serving rows from the previous fixture
    generation."""
    import hashlib

    base = sf_dir.strip("/").replace("/", "_")
    h = hashlib.sha256()
    for name in TABLE_NAMES:
        p = table_path(sf_dir, name)
        try:
            st = os.stat(p)
            h.update(f"{name}:{st.st_mtime_ns}:{st.st_size};".encode())
        except OSError:
            h.update(f"{name}:absent;".encode())
    return f"{base}-{h.hexdigest()[:12]}"
