"""Fuzzy blocked join: FastSS full-recall and guard edge cases."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from text_grabr_orc_spark.operators import linkage
from text_grabr_orc_spark.operators.linkage import fuzzy_join_blocked


def _brute_pairs(rows, max_dist=2):
    """Ground truth: all-pairs Levenshtein via a tiny local DP."""

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    out = set()
    for (ia, ka), (ib, kb) in itertools.combinations(rows, 2):
        d = lev(ka, kb)
        if d <= max_dist:
            a, b = (ia, ib) if ia < ib else (ib, ia)
            out.add((a, b, d))
    return out


def _run_on_keys(spark, tmp_path, keys):
    """Route crafted keys through the registered operator by writing a
    documents.parquet whose text IS the key (first-3-token head == the
    whole string for <=3-token keys)."""
    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.length("text").alias("n_chars"),
    )
    d = str(tmp_path / "linkage_fixture")
    df.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    got = {
        (r.doc_id_a, r.doc_id_b, r.dist)
        for r in fuzzy_join_blocked(spark, d).collect()
    }
    return got, _brute_pairs(rows)


def test_full_recall_including_first_char_edits(spark, tmp_path):
    """Distance-2 pairs that DIFFER IN THE FIRST CHARACTER and in
    length must be found — the cases prefix- or length-blocking
    schemes drop, and exactly what deletion neighborhoods keep."""
    keys = [
        "gamma ray burst",   # 0
        "gamma ray bursts",  # 1: +1 insert (dist 1)
        "lamma ray burst",   # 2: first-char substitution (dist 1 to 0)
        "amma ray burstXY",  # 3: first-char delete + 2 inserts (dist 3 to 0)
        "zz unrelated key",  # 4
        "a b",               # 5: short key
        "a",                 # 6: single char (L=1 guard tier)
        "ab",                # 7: dist 1 to "a"
    ]
    got, want = _run_on_keys(spark, tmp_path, keys)
    assert got == want
    # the first-char pair actually exercised the claim
    assert (0, 2, 1) in got


def test_identical_keys_distance_zero(spark, tmp_path):
    got, want = _run_on_keys(spark, tmp_path, ["same key here", "same key here"])
    assert got == want == {(0, 1, 0)}


def test_empty_and_tiny_keys_no_descending_sequence(spark, tmp_path):
    """L=0 and L=1 hit the guarded sequence() tiers; without the
    guards Spark's sequence(1, 0) yields [1, 0] and the variant
    expression corrupts."""
    got, want = _run_on_keys(spark, tmp_path, ["", "a", "b", "ab", "abcd"])
    assert got == want
    # empty vs 1-char vs 2-char are all within distance 2 of each other
    assert (0, 1, 1) in got and (0, 3, 2) in got


def test_variant_count_is_bounded(spark):
    """Fan-out stays O(L^2/2): a 22-char key yields <= 1 + 22 + 231
    variants (fewer after array_distinct)."""
    df = spark.createDataFrame(
        [("abcdefghijklmnopqrstuv",)], "key string"
    ).withColumn("L", F.length("key"))
    n = df.select(
        F.size(F.expr(linkage._variants_expr())).alias("n")
    ).collect()[0]["n"]
    assert n <= 1 + 22 + 231


def test_sorted_neighborhood_subset_of_fastss_with_bounded_candidates(
    spark, sf_dir
):
    """SN pairs are a subset of the full-recall FastSS result (same
    verify), candidate volume is exactly n*(w-1) before verify, and
    the measured recall documents the first-char-edit blind spot."""
    from text_grabr_orc_spark.operators.linkage import (
        _SN_WINDOW,
        fuzzy_join_blocked,
        fuzzy_join_sorted_neighborhood,
    )
    from text_grabr_orc_spark.tables import load_table

    fast_rows = fuzzy_join_blocked(spark, sf_dir).collect()
    full = {
        (min(r.doc_id_a, r.doc_id_b), max(r.doc_id_a, r.doc_id_b), r.dist)
        for r in fast_rows
    }
    sn_rows = fuzzy_join_sorted_neighborhood(spark, sf_dir).collect()
    # SN orders pairs by RANK (a = sort-order predecessor), FastSS by
    # doc_id — normalize before comparing
    sn = {
        (min(r.doc_id_a, r.doc_id_b), max(r.doc_id_a, r.doc_id_b), r.dist)
        for r in sn_rows
    }
    assert sn <= full
    assert len(sn) >= 0.5 * len(full), (len(sn), len(full))
    n = load_table(spark, sf_dir, "documents").count()
    for r in sn_rows:
        assert 1 <= r.rank_gap <= _SN_WINDOW - 1
    # identical keys always sort adjacent: every dist==0 pair from the
    # full-recall FastSS result whose identical-key GROUP fits inside
    # the window (group size <= w => rank gap <= w-1 for any two
    # members) must also be found by sorted-neighborhood
    key_of = {}
    for r in fast_rows:
        key_of[r.doc_id_a] = r.key_a
        key_of[r.doc_id_b] = r.key_b
    sn_pairs = {(a, b) for (a, b, _) in sn}
    exact_checked = 0
    for r in fast_rows:
        if r.dist != 0:
            continue
        group = sum(1 for k in key_of.values() if k == r.key_a)
        if group <= _SN_WINDOW:
            pair = (min(r.doc_id_a, r.doc_id_b), max(r.doc_id_a, r.doc_id_b))
            assert pair in sn_pairs, (pair, r.key_a, group)
            exact_checked += 1
    # the fixture must actually exercise the claim
    assert exact_checked > 0
