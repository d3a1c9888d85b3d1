"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``text_grabr_orc_spark.registry``: every operator
module registers its ``(spark, sf_dir) -> DataFrame`` builder and
(when SQL-expressible) its DuckDB oracle there.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from text_grabr_orc_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the end-to-end corpus BUILD funnel —
    clean -> keep-best near-dup dedup -> holdout removal -> n-gram /
    Bloom / semantic decontamination -> cluster-aware train split ->
    sequence packing -> shard manifest, one attrition row per stage
    (the reference's per-document pipeline, main.go:41-97, lifted to
    a corpus-scale training-data build)."""
    registry.load_all()
    return registry.QUERIES["corpus_build_flagship"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return dict(registry.ORACLES)
