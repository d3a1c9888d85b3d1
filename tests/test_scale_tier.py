"""The synthetic scale tier must multiply WORK faithfully: token
vocabularies are disjoint across replicas (no cross-replica shingle
collisions — lexical candidate mass scales exactly ×mult),
within-replica geometry is preserved (token bijection / signed
permutation), and row counts are exactly ×mult. For embeddings,
cross-replica cosines follow the data's BACKGROUND distribution —
the honest fixed-dimension limit; the quadratic background pair
mass this implies at tail thresholds is documented in
scale_tier.py and priced into bench.SCALE_FAMILIES bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_grabr_orc_spark.scale_tier import (
    _replicated_documents,
    _replicated_embeddings,
    _replicated_events,
)


def test_documents_replication(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = _replicated_documents(docs, 3)
    n = docs.count()
    assert rep.count() == 3 * n
    # doc_id spaces disjoint per replica
    assert rep.select("doc_id").distinct().count() == 3 * n
    # token vocabularies DISJOINT across replicas: every token carries
    # its replica suffix, so no shingle can collide across replicas
    toks = rep.select(
        (F.col("doc_id") / 1_000_000).cast("long").alias("r"),
        F.explode(F.split("text", r"\s+")).alias("t"),
    ).filter(F.col("t") != "")
    overlap = (
        toks.filter("r = 0")
        .select("t")
        .intersect(toks.filter("r = 1").select("t"))
        .count()
    )
    assert overlap == 0
    # bijection: per-doc token COUNT is preserved exactly, so
    # within-replica Jaccard/shingle structure replicates the base
    base_counts = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("k")
    )
    rep_counts = rep.filter(F.col("doc_id") >= 2_000_000).select(
        (F.col("doc_id") - 2_000_000).alias("doc_id"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("k"),
    )
    assert base_counts.exceptAll(rep_counts).count() == 0
    # n_chars recomputed from the mutated text
    assert rep.filter(F.length("text") != F.col("n_chars")).count() == 0


def test_embeddings_replication_preserves_geometry(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rep = _replicated_embeddings(emb, 2)
    n = emb.count()
    assert rep.count() == 2 * n
    assert rep.schema["embedding"].dataType.simpleString() == "array<float>"
    # signed permutation is an isometry: every replica vector has the
    # SAME norm as its source (sum re-association only, tolerance for
    # float order)
    norm = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    base = {r["vec_id"]: r["nn"] for r in emb.select("vec_id", norm.alias("nn")).collect()}
    moved = rep.filter(F.col("vec_id") >= 1_000_000).select(
        (F.col("vec_id") - 1_000_000).alias("vec_id"), norm.alias("nn")
    )
    for row in moved.collect():
        assert abs(row["nn"] - base[row["vec_id"]]) <= 1e-3 * max(
            1.0, abs(base[row["vec_id"]])
        )


def test_events_replication_extends_time_range(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rep = _replicated_events(ev, 2)
    assert rep.count() == 2 * ev.count()
    # replica 1 shifted wholly past replica 0: the hour-window
    # keyspace grows with the tier (longer-retention shape)
    r0_max = rep.filter("event_id < 100000000").agg(F.max("ts")).first()[0]
    r1_min = rep.filter("event_id >= 100000000").agg(F.min("ts")).first()[0]
    assert r1_min > r0_max
    assert rep.select("event_id").distinct().count() == 2 * ev.count()
