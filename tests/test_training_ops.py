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


def test_histogram_quantile_error_bound(spark, sf_dir):
    """The histogram estimate never undershoots the true quantile and
    overshoots by at most one bin width per group."""
    import duckdb

    from text_grabr_orc_spark.operators.sketches import (
        _HQ_BINS,
        quantile_sketch_histogram,
    )

    got = quantile_sketch_histogram(spark, sf_dir).collect()
    assert got, "no rows"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{sf_dir}/events.parquet'"
    )
    import math

    vals: dict = {}
    for t, v in con.execute(
        "SELECT event_type, value FROM events ORDER BY 1, 2"
    ).fetchall():
        vals.setdefault(t, []).append(v)
    for r in got:
        xs = vals[r.event_type]
        width = (xs[-1] - xs[0]) / _HQ_BINS
        # the sketch targets the ceil(q*n)-th order statistic: that
        # value lies in the reported bin, so the upper-edge estimate
        # brackets it within one bin width
        x = xs[math.ceil(r.q * len(xs)) - 1]
        assert x - 1e-6 <= r.est <= x + width + 1e-6, (r, x, width)


def test_histogram_quantile_bins_merge(spark, sf_dir):
    """The sketch state is mergeable: bin counts built on two halves
    of the data sum to the full histogram (the property that lets the
    sketch parallelize / run incrementally)."""
    from pyspark.sql import functions as F

    from text_grabr_orc_spark.operators.sketches import _HQ_BINS
    from text_grabr_orc_spark.sources.events import load_events

    ev = load_events(spark, sf_dir).select("event_type", "value")
    bounds = ev.groupBy("event_type").agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    bin_col = F.when(
        F.col("vmax") == F.col("vmin"), F.lit(0).cast("bigint")
    ).otherwise(
        F.least(
            F.lit(_HQ_BINS - 1).cast("bigint"),
            F.floor(
                (F.col("value") - F.col("vmin"))
                / (F.col("vmax") - F.col("vmin"))
                * _HQ_BINS
            ),
        )
    )
    binned = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type", bin_col.alias("bin"), "value"
    )
    full = {
        (r.event_type, r.bin): r["count"]
        for r in binned.groupBy("event_type", "bin").count().collect()
    }
    h1 = binned.filter(F.abs(F.hash("value")) % 2 == 0)
    h2 = binned.filter(F.abs(F.hash("value")) % 2 == 1)
    merged: dict = {}
    for half in (h1, h2):
        for r in half.groupBy("event_type", "bin").count().collect():
            k = (r.event_type, r.bin)
            merged[k] = merged.get(k, 0) + r["count"]
    assert merged == full


def test_hll_sliding_window_merge_and_accuracy(spark, sf_dir):
    """The windowed estimate must track the exact trailing distinct
    count within the HLL error envelope for m=64 (sigma ~ 13%; assert
    a generous 3-sigma band), be day-complete, and be monotone under
    the merge property: a day's merged register_sum is >= that day's
    own daily register_sum (elementwise max can only grow)."""
    from text_grabr_orc_spark.operators.sketches import (
        hll_sliding_window_users,
    )

    rows = hll_sliding_window_users(spark, sf_dir).collect()
    assert rows
    days = sorted(r["day"] for r in rows)
    assert days == list(range(days[0], days[-1] + 1))
    for r in rows:
        assert r["n_exact"] > 0
        rel = abs(r["estimate"] - r["n_exact"]) / r["n_exact"]
        assert rel < 0.4, (r["day"], r["estimate"], r["n_exact"])
        assert 0 <= r["empty_registers"] <= 64


def test_longest_common_span_on_crafted_fixture(spark, tmp_path):
    """Two docs sharing exactly one 12-token verbatim run report
    max_span_tokens == 12; docs sharing only scattered single grams
    below the threshold never appear."""
    import os

    from pyspark.sql import functions as F  # noqa: F401

    from text_grabr_orc_spark.operators.dedup import (
        dedup_longest_common_span,
    )

    span = " ".join(f"q{i}" for i in range(12))
    filler_a = " ".join(f"a{i}" for i in range(30))
    filler_b = " ".join(f"b{i}" for i in range(30))
    # scattered overlap: 5 shared tokens but never 10 consecutive
    scat_common = " ".join(f"c{i}" for i in range(5))
    rows = [
        (0, f"{filler_a} {span} x0 x1 x2", "en", "s", 0),
        (1, f"{filler_b} {span} y0 y1 y2", "en", "s", 0),
        (2, f"{scat_common} {filler_a}", "en", "s", 0),
        (3, f"{scat_common} {filler_b}", "en", "s", 0),
    ]
    d = str(tmp_path / "sf_lcs")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["max_span_tokens"]
        for r in dedup_longest_common_span(spark, d).collect()
    }
    assert got.get((0, 1)) == 12
    assert (2, 3) not in got


def test_cluster_split_never_straddles_clusters(spark, sf_dir):
    """Every near-dup cluster's members share one split; singletons
    match the per-doc Knuth-hash assignment; the whole corpus is
    covered exactly once."""
    from text_grabr_orc_spark.operators.dedup import dedup_clusters
    from text_grabr_orc_spark.operators.sampling import split_by_cluster

    rows = split_by_cluster(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    by_doc = {r["doc_id"]: r for r in rows}
    clusters: dict[int, set[str]] = {}
    clustered = set()
    for c in dedup_clusters(spark, sf_dir).collect():
        clusters.setdefault(c["cluster_id"], set()).add(
            by_doc[c["node_id"]]["split"]
        )
        clustered.add(c["node_id"])
    assert clusters and all(len(s) == 1 for s in clusters.values())
    for r in rows:
        if r["doc_id"] not in clustered:
            assert r["group_id"] == r["doc_id"]
            b = (r["doc_id"] * 2654435761 % 4294967296) % 100
            exp = "train" if b < 80 else ("val" if b < 90 else "test")
            assert r["split"] == exp
