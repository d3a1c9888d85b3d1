"""Flagship corpus-build funnel invariants (the per-stage attrition
contract); the value-level gate is the nested-oracle hash check."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from text_grabr_orc_spark.operators import flagship, pipeline


def test_funnel_stage_invariants(spark, sf_dir):
    rows = {
        r["stage_ord"]: r
        for r in flagship.corpus_build_flagship(spark, sf_dir).collect()
    }
    assert [rows[i]["stage"] for i in range(8)] == list(flagship._STAGES)
    assert rows[8]["stage"] == "pack_sequences"
    assert rows[9]["stage"] == "shard_manifest"
    for i, r in rows.items():
        assert r["docs_out"] <= r["docs_in"]
        assert r["docs_removed"] == r["docs_in"] - r["docs_out"]
        if i >= 1:
            # the funnel chains: stage i consumes stage i-1's survivors
            assert r["docs_in"] == rows[i - 1]["docs_out"]
            assert r["tokens_out"] <= rows[i - 1]["tokens_out"]
    assert rows[0]["docs_removed"] == 0
    # packing/manifest transform, never drop
    assert rows[8]["docs_removed"] == 0 and rows[9]["docs_removed"] == 0
    assert rows[8]["artifacts"] >= 1  # at least one packed sequence
    assert 1 <= rows[9]["artifacts"] <= 16  # shard count
    assert rows[9]["checksum"] >= 0  # real checksum, not the -1 sentinel


def test_funnel_clean_stage_matches_report(spark, sf_dir):
    """Stage 1 of the funnel must agree with the standalone
    corpus_clean_pipeline attrition report: same kept-doc count and
    kept token mass (both derive from clean_doc_decisions, but this
    pins the funnel's predicate to the report's outcome buckets)."""
    report = pipeline.corpus_clean_pipeline(spark, sf_dir)
    kept = (
        report.filter(F.col("outcome").startswith("kept_"))
        .agg(
            F.sum("n_docs").alias("docs"), F.sum("total_tokens").alias("toks")
        )
        .collect()[0]
    )
    clean_row = (
        flagship.corpus_build_flagship(spark, sf_dir)
        .filter(F.col("stage") == "clean")
        .collect()[0]
    )
    assert clean_row["docs_out"] == kept["docs"]
    assert clean_row["tokens_out"] == kept["toks"]
