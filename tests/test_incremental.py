"""Incremental corpus build (operators/incremental.py): the two-shard
consistency contract — processing the corpus as successive shards
against persisted state must reproduce the batch decisions exactly,
and an APPENDED state generation must equal a batch-built one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from text_grabr_orc_spark.operators.incremental import (
    _empty_state,
    _inc_decisions,
    ensure_state,
    inc_shard_funnel,
)

_LO1, _LO2, _HI = 400, 450, 500  # sf0.001 has doc_id 0..499


def _rows(df):
    return {r.stage_ord: r for r in df.collect()}


@pytest.fixture(scope="module")
def states(spark, sf_dir):
    """History state at lo=400 (batch-built), the lo=450 generation
    built by APPENDING shard [400,450), and the lo=450 generation
    built batch from scratch — published once per fixture content."""
    s400 = ensure_state(spark, sf_dir, _LO1, 0, ns="tA")
    s450_app = ensure_state(spark, sf_dir, _LO2, prev_lo=_LO1, ns="tA")
    s450_bat = ensure_state(spark, sf_dir, _LO2, 0, ns="tB")
    return s400, s450_app, s450_bat


def test_appended_state_equals_batch_state(states):
    _, app, bat = states
    for name in ("hashes", "shardids", "summary"):
        a = sorted(map(tuple, app[name].collect()))
        b = sorted(map(tuple, bat[name].collect()))
        assert a == b, f"state table {name} diverged: {a} vs {b}"
    a = sorted(map(tuple, app["bands"].select(
        "band_idx", "band_hash", "corpus_doc").collect()))
    b = sorted(map(tuple, bat["bands"].select(
        "band_idx", "band_hash", "corpus_doc").collect()))
    assert a == b
    a = sorted((r.corpus_doc, tuple(r.hs)) for r in app["shingles"].collect())
    b = sorted((r.corpus_doc, tuple(r.hs)) for r in bat["shingles"].collect())
    assert a == b


def test_two_shards_match_single_shot(spark, sf_dir, states):
    s400, s450_app, _ = states
    f1 = _rows(inc_shard_funnel(spark, sf_dir, _LO1, _LO2, s400))
    f2 = _rows(inc_shard_funnel(spark, sf_dir, _LO2, _HI, s450_app))
    fs = _rows(inc_shard_funnel(spark, sf_dir, _LO1, _HI, s400))
    # per-stage attrition is additive across the two shards
    assert f1[0].docs_in + f2[0].docs_in == fs[0].docs_in > 0
    for i in range(1, 8):
        assert (
            f1[i].docs_removed + f2[i].docs_removed == fs[i].docs_removed
        ), f"stage {i}"
        assert f1[i].docs_out + f2[i].docs_out == fs[i].docs_out
        assert f1[i].tokens_out + f2[i].tokens_out == fs[i].tokens_out
    # cumulative artifacts after the SECOND shard equal the single
    # shot's (both have seen history+shardA+shardB)
    assert f2[8].artifacts == fs[8].artifacts  # total packed sequences
    assert f2[9].artifacts == fs[9].artifacts  # union shard count
    assert f2[9].checksum == fs[9].checksum  # additive id checksum


def test_incremental_clean_matches_batch_window(spark, sf_dir):
    """Probe-based clean (hash state + within-shard window) must equal
    the batch corpus-wide window (clean_doc_decisions) doc for doc —
    a different mechanism computing the same contract."""
    from text_grabr_orc_spark.operators.pipeline import (
        _MIN_QUALITY,
        clean_doc_decisions,
    )

    state = ensure_state(spark, sf_dir, _LO1, 0, ns="tA")
    dec = _inc_decisions(spark, sf_dir, _LO1, None, state)
    inc_ok1 = {r.doc_id for r in dec.filter("ok1").collect()}
    batch = clean_doc_decisions(spark, sf_dir).filter(
        (F.col("doc_id") >= _LO1)
        & (F.col("copy_rank") == 1)
        & (F.col("q") >= _MIN_QUALITY)
        & (F.col("pred_lang") != "und")
    )
    assert inc_ok1 == {r.doc_id for r in batch.collect()}


def test_incremental_band_probe_is_partition_pruned(spark, sf_dir):
    """The history band probe must read the persisted band state
    through a band_idx partition-pruned scan (only the band
    directories the shard can collide with), with no cartesian
    product anywhere in the decision plan. Asserted on the DECISION
    frame — the funnel query itself returns stage rows projected from
    a collected one-row LocalRelation, so the probe subtree lives in
    the decision lineage, not the returned plan."""
    from text_grabr_orc_spark.plans import formatted_plan

    state = ensure_state(spark, sf_dir, _LO1, 0, ns="tA")
    plan = formatted_plan(
        _inc_decisions(spark, sf_dir, _LO1, None, state)
    )
    part_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    assert any("band_idx" in ln and " IN " in ln for ln in part_lines), plan
    assert "CartesianProduct" not in plan


def test_empty_history_processes_whole_corpus(spark, sf_dir):
    """Day-0 path: an empty state and the whole corpus as the first
    shard — the funnel runs, stage 0 covers every doc, and the
    cumulative artifacts are self-consistent."""
    f = _rows(
        inc_shard_funnel(spark, sf_dir, 0, None, _empty_state(spark))
    )
    assert f[0].docs_in == f[0].docs_out > 0
    for i in range(1, 8):
        assert f[i].docs_in == f[i - 1].docs_out
        assert f[i].docs_removed == f[i].docs_in - f[i].docs_out >= 0
    assert f[8].artifacts > 0 and f[9].artifacts > 0
    assert 0 <= f[9].checksum < 2**32


def test_streaming_ingest_batches_cover_shard(spark, sf_dir):
    """The streamed per-batch attrition rows cover the whole shard
    exactly once (ntile buckets partition it, batch ids are the
    contiguous replay order) and every batch's funnel chain is
    monotone non-increasing."""
    from text_grabr_orc_spark.operators.incremental import _inc_lo
    from text_grabr_orc_spark.streaming.ingest import (
        streaming_corpus_ingest,
    )
    from text_grabr_orc_spark.tables import load_table
    from pyspark.sql import functions as F

    rows = sorted(
        streaming_corpus_ingest(spark, sf_dir).collect(),
        key=lambda r: r.batch_id,
    )
    lo = _inc_lo(spark, sf_dir)
    shard_n = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") >= lo)
        .count()
    )
    assert [r.batch_id for r in rows] == list(range(len(rows)))
    assert sum(r.docs_in for r in rows) == shard_n > 0
    for r in rows:
        assert (
            r.docs_in
            >= r.clean_kept
            >= r.neardup_kept
            >= r.holdout_kept
            >= r.decon_kept
            >= r.kept_docs
            >= 0
        )
        assert r.kept_tokens >= 0
