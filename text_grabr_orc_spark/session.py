"""SparkSession factory tuned for this engine.

The reference scales by running 10 stateless replicas behind nginx
(``/root/reference/.github/workflows/aws-deploy.yml:37``); the Spark
equivalent is partition parallelism. These settings are the local-mode
development defaults — on a real cluster the same code runs unchanged,
with AQE re-planning shuffles at runtime.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "text-grabr-orc-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    - AQE on: runtime shuffle coalescing + skew-join splitting, which is
      what makes the LSH self-join and big aggregations survive skew.
    - shuffle.partitions defaults to 2x cores locally; on a cluster AQE
      coalesces from a high initial number, so over-provisioning is safe.
    - UTC session timezone so timestamp semantics are stable across
      driver environments.
    - ORC filter pushdown explicitly on (it is the BASELINE.json
      north-star format).
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or 2 * cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.orc.filterPushdown", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # InferFiltersFromGenerate copies the generator's WHOLE child
        # expression into an inferred size(..)>0 filter below every
        # explode. For computed arrays (regex tokenize -> shingle, the
        # hot path of every n-gram/dedup operator here) that
        # re-evaluates the most expensive projection in the engine 2-3x
        # per row per side — measured ~4x wall on
        # decontaminate_ngram_overlap — while explode already skips
        # empty arrays. The filter only ever helps when the generator
        # input is a stored column that can prune a scan, which never
        # holds for this engine's computed-shingle pipelines.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        # saveAsTable (bucketed tables) must never write ./spark-warehouse
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "tgos_warehouse"),
        )
        .config(
            "spark.driver.memory",
            # 8g is the LIBRARY default — a 16g -Xmx baked in here
            # would assume a large host for every get_spark() caller
            # (round-7 advice). The long bench/sweep workloads that
            # measured 8g GC-thrashing (mid-list queries 4-9x slower
            # once ~70 heavy queries accumulated persist blocks) set
            # SPARK_GRAFT_DRIVER_MEM=16g themselves (bench.py,
            # tools/check.py).
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        # long-lived local JVMs accumulate dropped RDD blocks until a
        # full GC happens to run; reclaim them on a bounded cadence
        .config("spark.cleaner.periodicGC.interval", "5min")
        # The unrolled fixed-dim vector kernels (functions/vectors.py)
        # can push a fused join stage's whole-stage-codegen method
        # past HotSpot's 8000-bytecode JIT ceiling, where it runs
        # INTERPRETED forever (measured 18.7 vs 0.7 us per 64-dim
        # pair). Cap the WSCG method size at that ceiling — the value
        # the Spark SQL tuning docs themselves recommend on HotSpot —
        # so an oversized stage falls back to per-operator codegen
        # (small, split, JIT-able methods; measured 0.88 s vs 2.4 s on
        # similarity_topk_ivf) instead of un-JIT-able fused code.
        # Scale-honest: a JVM property, not a core-count constant.
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
    )
    return builder.getOrCreate()
