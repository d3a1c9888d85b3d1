"""Behavioral invariants for the round-2 training-pipeline additions:
deterministic splits, bigram LM scoring, oracle-checked CMS."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_grabr_orc_spark.operators.sampling import split_train_val_test
from text_grabr_orc_spark.operators.sketches import events_heavy_hitters_cms
from text_grabr_orc_spark.operators.text_analysis import text_bigram_logprob
from text_grabr_orc_spark.tables import load_table


def test_split_partitions_whole_corpus(spark, sf_dir):
    out = {r["split"]: r for r in split_train_val_test(spark, sf_dir).collect()}
    total = load_table(spark, sf_dir, "documents").count()
    assert set(out) == {"train", "val", "test"}
    assert sum(r["n_docs"] for r in out.values()) == total
    # hash split: ratios approximate 80/10/10 (binomial noise at n=500)
    assert 0.7 < out["train"]["n_docs"] / total < 0.9
    # deterministic: re-running yields identical rows
    again = {r["split"]: r for r in split_train_val_test(spark, sf_dir).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_bigram_logprob_invariants(spark, sf_dir):
    from text_grabr_orc_spark.functions.text import token_count

    scores = text_bigram_logprob(spark, sf_dir)
    rows = scores.collect()
    assert rows
    # every bigram occurrence implies a first-word occurrence, so
    # C(w1 w2) <= C(w1) and each log term (hence the mean) is <= 0
    assert all(r["avg_logprob"] <= 0 for r in rows)
    # n_bigrams == token_count - 1 for every scored (>= 2-token) doc
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", token_count("text").alias("tc"))
    )
    joined = scores.join(toks, "doc_id").collect()
    assert all(r["n_bigrams"] == r["tc"] - 1 for r in joined)


def test_cms_never_undercounts(spark, sf_dir):
    rows = events_heavy_hitters_cms(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cms_n"] >= r["exact_n"]
        assert r["overcount"] == r["cms_n"] - r["exact_n"]
