"""Skew stress for the dedup/graph family (round-6 verdict item 3).

The reference scales by 10 stateless replicas behind nginx
(aws-deploy.yml:37) — a model that cannot handle data skew at all; the
100 TB story here rests on three mechanisms, each pinned below:

1. BANDING SPREADS SKEW BY CONSTRUCTION: a giant duplicate cluster
   (half the corpus identical) produces a giant bucket in EVERY band,
   but the band join's key is (band_idx, band_hash) — 32 distinct hot
   keys that hash to DIFFERENT shuffle partitions, so no single
   partition concentrates the skew. The oracle-green test on the
   planted-cluster fixture exercises exactly this shape, including the
   quadratic pair OUTPUT a half-corpus clique implies.
2. SMALL SIDES ARE BROADCAST: probe/centroid/benchmark joins are
   broadcast by hint — a broadcast join has no shuffle on the big side,
   so per-key skew cannot concentrate anywhere.
3. RESIDUAL SINGLE-HOT-KEY JOINS ARE AQE'S CASE: when a shuffled join
   really does see one key holding most of a table (the shape neither
   1 nor 2 absorbs), the session's AQE config must split the skewed
   partition at runtime. The first test plants that key and asserts
   ``skew=true`` appears in the executed (adaptive-final) plan, with
   results unchanged.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_confs(spark):
    """Temporarily shrink AQE's skew thresholds so the planted skew
    (MBs, not the production GBs) is detectable, and disable auto
    broadcast so the join actually shuffles."""
    keys = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {}
    for k, v in keys.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        if v is not None:
            spark.conf.set(k, v)
        else:
            spark.conf.unset(k)


def test_aqe_splits_planted_single_hot_key_join(spark, tmp_path, skew_confs):
    """One key holds ~80% of the fact side (the giant-duplicate-
    cluster shape after a cluster id becomes a join key). The session
    config must make AQE split the skewed partition — ``skew=true``
    in the adaptive-final SortMergeJoin — and the join result must be
    exactly the expected multiplicity."""
    hot, cold_keys, per_cold = 40_000, 64, 150
    fact = spark.range(hot).select(
        F.lit(0).alias("k"), F.col("id").alias("payload")
    ).unionByName(
        spark.range(cold_keys * per_cold).select(
            (F.col("id") % cold_keys + 1).alias("k"),
            F.col("id").alias("payload"),
        )
    )
    dim = spark.range(cold_keys + 1).select(
        F.col("id").alias("k"), F.lit("x").alias("tag")
    )
    d = str(tmp_path / "skew_fixture")
    fact.write.mode("overwrite").parquet(d + "/fact.parquet")
    dim.write.mode("overwrite").parquet(d + "/dim.parquet")

    f = spark.read.parquet(d + "/fact.parquet")
    m = spark.read.parquet(d + "/dim.parquet")
    joined = f.join(m, "k")
    # materialize THIS df (count() would execute a different plan and
    # leave joined's adaptive plan non-final)
    assert len(joined.collect()) == hot + cold_keys * per_cold
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]


def _giant_cluster_fixture(spark, tmp_path, n_dup=400, n_uniq=300):
    """documents + embeddings with a planted giant duplicate cluster:
    n_dup identical docs / near-identical vectors (every band bucket
    holds the cluster; the pair set is a clique) plus n_uniq genuinely
    unique rows."""
    base_text = " ".join(f"boiler{i} plate{i}" for i in range(30))
    rows = [(i, base_text) for i in range(n_dup)]
    rows += [
        (n_dup + j, " ".join(f"u{n_dup + j}w{i}" for i in range(25)))
        for j in range(n_uniq)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("s").alias("source"),
        F.length("text").alias("n_chars"),
    )
    rng = np.random.default_rng(7)
    basev = rng.standard_normal(64)
    basev /= np.linalg.norm(basev)
    vecs = []
    for i in range(n_dup):
        v = basev + 0.01 * rng.standard_normal(64)
        vecs.append((i, [float(np.float32(x)) for x in v], 0))
    for j in range(n_uniq):
        v = rng.standard_normal(64)
        v /= np.linalg.norm(v)
        vecs.append((n_dup + j, [float(np.float32(x)) for x in v], 1))
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    d = str(tmp_path / "giant_cluster")
    docs.coalesce(2).write.mode("overwrite").parquet(d + "/documents.parquet")
    emb.coalesce(2).write.mode("overwrite").parquet(d + "/embeddings.parquet")
    return d, n_dup, n_uniq


def test_minhash_oracle_green_on_giant_cluster(spark, tmp_path):
    """dedup_minhash_lsh on the planted half-corpus clique stays
    driver-faithfully oracle-green (value hash vs DuckDB on the SAME
    fixture): banding spreads the 32 hot buckets across partitions,
    the verify join survives the clique's quadratic candidate mass,
    and every pair of the n_dup-clique is found."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check import value_hash

    import __spark_entry__ as entrymod

    d, n_dup, _ = _giant_cluster_fixture(spark, tmp_path)
    sdf = entrymod.queries()["dedup_minhash_lsh"](spark, d)
    srows = [tuple(r) for r in sdf.collect()]
    assert len(srows) == n_dup * (n_dup - 1) // 2

    con = duckdb.connect()
    # Spark wrote a directory; DuckDB needs the part-file glob
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    rel = con.execute(entrymod.oracle_sql()["dedup_minhash_lsh"])
    ocols = [c[0] for c in rel.description]
    orows = rel.fetchall()
    assert len(orows) == len(srows)
    assert value_hash(sdf.columns, srows) == value_hash(ocols, orows)


def test_twophase_collapses_giant_cluster(spark, tmp_path):
    """dedup_clusters_twophase on the planted giant embedding cluster:
    all n_dup members land in ONE component labeled by the minimum id,
    and the output matches the propagation variant row-for-row (two
    independent algorithms, same fixpoint — both individually
    oracle-proven on the standard fixture every round)."""
    from text_grabr_orc_spark.operators.dedup import (
        dedup_clusters,
        dedup_clusters_twophase,
    )

    d, n_dup, _ = _giant_cluster_fixture(spark, tmp_path)
    two = dedup_clusters_twophase(spark, d)
    got = {(r[0], r[1]) for r in two.select("node_id", "cluster_id").collect()}
    clique = {(i, 0) for i in range(n_dup)}
    assert clique <= got
    prop = {
        (r[0], r[1])
        for r in dedup_clusters(spark, d).select("node_id", "cluster_id").collect()
    }
    assert got == prop
