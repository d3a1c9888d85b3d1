"""Tests for operators/spark4_surface.py (Variant, UDTF, Python
DataSource). Oracle equivalence is covered by tools/check.py; these
pin cross-implementation agreement and partition behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_grabr_orc_spark.functions.text import tokens
from text_grabr_orc_spark.operators.spark4_surface import (
    _SEQ_PARTS,
    _SEQ_ROWS,
    _UDTF_MOD,
    _make_sequence_datasource,
    events_props_variant,
    python_datasource_sequence,
    udtf_tokenize_positions,
)
from text_grabr_orc_spark.tables import load_table


def test_variant_agrees_with_typed_from_json(spark, sf_dir):
    """variant_get('$.k') must see exactly what a typed from_json
    schema sees — same totals per event type."""
    from text_grabr_orc_spark.sources.events import load_events

    variant = {r.event_type: r for r in events_props_variant(spark, sf_dir).collect()}
    typed = {
        r.event_type: r
        for r in (
            load_events(spark, sf_dir)
            .select("event_type", F.from_json("props", "k INT").getField("k").alias("k"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
            .collect()
        )
    }
    assert set(variant) == set(typed)
    for et, v in variant.items():
        assert v.n == typed[et].n
        assert v.sum_k == typed[et].sum_k


def test_udtf_agrees_with_native_posexplode(spark, sf_dir):
    """The row-at-a-time UDTF and the codegen posexplode path must
    produce identical (doc_id, pos, tok) sets — py_fields parity."""
    got = {
        (r.doc_id, r.pos, r.tok)
        for r in udtf_tokenize_positions(spark, sf_dir).collect()
    }
    native = {
        (r.doc_id, r.pos, r.tok)
        for r in (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % _UDTF_MOD == 0)
            .select("doc_id", F.posexplode(tokens("text")).alias("pos", "tok"))
            .select("doc_id", F.col("pos").cast("bigint").alias("pos"), "tok")
            .collect()
        )
    }
    assert got == native and got


def test_rsql_clusters_fixpoint(spark, sf_dir):
    """Post-hoc fixpoint assertion for the depth-bounded recursive-CTE
    clustering: after labeling, NO node may still have a neighbor with
    a smaller cluster label — if the _RCTE_DEPTH bound ever truncated
    a real component, this join would surface the un-propagated edge
    instead of silently splitting the cluster."""
    from text_grabr_orc_spark.operators.dedup import dedup_embedding_gemm
    from text_grabr_orc_spark.operators.spark4_surface import (
        dedup_clusters_rsql,
    )

    labels = dedup_clusters_rsql(spark, sf_dir).localCheckpoint()
    pairs = dedup_embedding_gemm(spark, sf_dir).select("vec_a", "vec_b")
    edges = pairs.union(
        pairs.select(F.col("vec_b").alias("vec_a"), F.col("vec_a").alias("vec_b"))
    )
    la = labels.select(
        F.col("node_id").alias("vec_a"), F.col("cluster_id").alias("ca")
    )
    lb = labels.select(
        F.col("node_id").alias("vec_b"), F.col("cluster_id").alias("cb")
    )
    violations = (
        edges.join(la, "vec_a").join(lb, "vec_b").filter(F.col("cb") < F.col("ca"))
    )
    assert violations.count() == 0
    assert labels.count() > 0


def test_python_datasource_partitions_reassemble_exactly(spark, sf_dir):
    """Raw read: every id exactly once across the planned partitions,
    and the scan actually uses the requested partition count."""
    src = _make_sequence_datasource()
    try:
        spark.dataSource.register(src)
    except Exception:
        pass
    df = (
        spark.read.format("tgos_sequence")
        .option("n", str(_SEQ_ROWS))
        .option("parts", str(_SEQ_PARTS))
        .load()
    )
    assert df.rdd.getNumPartitions() == _SEQ_PARTS
    ids = [r.id for r in df.collect()]
    assert sorted(ids) == list(range(_SEQ_ROWS))
    agg = {r.bucket: r.n for r in python_datasource_sequence(spark, sf_dir).collect()}
    assert sum(agg.values()) == _SEQ_ROWS


def test_python_datasource_writer_manifest_consistent(spark, sf_dir):
    """The sink's manifest must agree with the data both ways: shard
    entries sum to the totals, and the registered query's round-trip
    row equals a direct recount of documents."""
    from text_grabr_orc_spark.operators.spark4_surface import (
        _PDW_KNUTH,
        _PDW_MOD,
        _PDW_PARTS,
        python_datasource_writer,
    )

    row = python_datasource_writer(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    ks = sum(
        r["doc_id"] * _PDW_KNUTH % _PDW_MOD
        for r in docs.select("doc_id").collect()
    )
    assert row["n_tasks"] == _PDW_PARTS
    assert row["n_rows"] == n == row["jsonl_rows"]
    assert row["key_checksum"] == ks
