"""Central query registry.

Every operator module registers its queries here; ``__spark_entry__``
re-exports the collected dicts for the driver. Each query is a
callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
a DuckDB oracle string over the same parquet tables.

Contract gotcha handled here by convention: the driver compares after
sorting columns BY NAME, so every computed column is aliased to the
same name in both the Spark builder and the oracle SQL, and integer
results are cast to bigint on the Spark side (DuckDB count/len/sum
return BIGINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_LOADED = False


def load_all() -> None:
    """Import every operator module for its registration side effects."""
    global _LOADED
    if _LOADED:
        return
    # Imports deferred so `import text_grabr_orc_spark` stays cheap.
    from text_grabr_orc_spark.operators import (  # noqa: F401
        corpus_filters,
        curation,
        dedup,
        events_batch,
        linkage,
        multimodal,
        ocr,
        pipeline,
        relational,
        relational_ext,
        sampling,
        similarity,
        sketches,
        spark4_surface,
        text_analysis,
        text_stats,
        timeseries,
        tpch_more,
        unigram_lm,
    )
    # flagship + incremental compose other modules' REGISTERED
    # oracles, so they must import after every stage module above
    from text_grabr_orc_spark.operators import flagship  # noqa: F401
    from text_grabr_orc_spark.operators import incremental  # noqa: F401
    from text_grabr_orc_spark.streaming import ingest  # noqa: F401
    from text_grabr_orc_spark.sources import avro_io  # noqa: F401
    from text_grabr_orc_spark.sources import orc_io  # noqa: F401
    from text_grabr_orc_spark.streaming import events  # noqa: F401

    _LOADED = True
