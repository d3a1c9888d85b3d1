"""Tests for operators/corpus_filters.py (span dedup, boilerplate,
stratified sampling, quality classifier).

Correctness against DuckDB is covered by the oracle gate
(tools/check.py); these pin semantic invariants the oracle cannot see.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from text_grabr_orc_spark.operators.corpus_filters import (
    _BP_MIN_DOCS,
    _BP_TOP_K,
    _QC_PHASES,
    _SPAN_W,
    _span_postings,
    boilerplate_spans_by_source,
    dedup_keep_best_canonical,
    dedup_repeated_spans,
    quality_classifier_filter,
    sample_stratified_hash,
)
from text_grabr_orc_spark.tables import load_table


def test_span_postings_tile_geometry(spark, sf_dir):
    """Every doc contributes floor(n_tokens / W) spans of exactly W
    tokens, indexed contiguously from 0."""
    sp = _span_postings(spark, sf_dir)
    per_doc = (
        sp.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("span_idx").alias("mx"))
        .collect()
    )
    from text_grabr_orc_spark.functions.text import py_field_count

    docs = {
        r["doc_id"]: py_field_count(r["text"])
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    seen = set()
    for r in per_doc:
        seen.add(r.doc_id)
        assert r.n == docs[r.doc_id] // _SPAN_W
        assert r.mx == r.n - 1
    for doc_id, n_tok in docs.items():
        if n_tok >= _SPAN_W:
            assert doc_id in seen
    for r in sp.select("g").collect():
        assert len(r.g.split(" ")) == _SPAN_W


def test_spans_short_doc_yields_empty_array(spark):
    """Docs shorter than one _SPAN_W tile must tile to an EMPTY array,
    not the descending-[0,-1] sequence(0,-1) artifact (two bogus spans
    where the oracle emits none). Exercises 0..W+1 token lengths."""
    from text_grabr_orc_spark.functions.text import tokens
    from text_grabr_orc_spark.operators.corpus_filters import _spans

    rows = [
        (n, " ".join(f"w{i}" for i in range(n)))
        for n in range(0, _SPAN_W + 2)
    ]
    df = spark.createDataFrame(rows, "n int, text string")
    got = {
        r.n: r.spans
        for r in df.select(
            "n", _spans(tokens("text")).alias("spans")
        ).collect()
    }
    for n in range(0, _SPAN_W + 2):
        expected = n // _SPAN_W
        assert len(got[n]) == expected, (n, got[n])
        for g in got[n]:
            assert len(g.split(" ")) == _SPAN_W


def test_repeated_spans_ratio_bounds(spark, sf_dir):
    rows = dedup_repeated_spans(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dup_spans <= r.n_spans
        assert math.isclose(
            r.dup_ratio, round(r.n_dup_spans / r.n_spans, 6), abs_tol=1e-9
        )


def test_boilerplate_rank_and_threshold(spark, sf_dir):
    rows = boilerplate_spans_by_source(spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        assert r.n_docs >= _BP_MIN_DOCS
        by_source.setdefault(r.source, []).append(r)
    for rs in by_source.values():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _BP_TOP_K
        # ranked by n_docs desc with span tie-break
        for a, b in zip(rs, rs[1:]):
            assert (a.n_docs, b.span) >= (b.n_docs, a.span)


def test_stratified_sample_hits_smallest_source(spark, sf_dir):
    rows = sample_stratified_hash(spark, sf_dir).collect()
    assert rows
    target = min(r.n_docs for r in rows)
    for r in rows:
        assert 0 <= r.n_kept <= r.n_docs
    # acceptance is u32*n < target*2^32, i.e. rate target/n: the kept
    # count concentrates near the target (binomial, not exact)
    for r in rows:
        assert abs(r.n_kept - target) <= 4 * math.sqrt(target) + 1


def test_keep_best_one_canonical_per_cluster(spark, sf_dir):
    from text_grabr_orc_spark.operators.dedup import dedup_minhash_lsh

    rows = dedup_keep_best_canonical(spark, sf_dir).collect()
    pairs = dedup_minhash_lsh(spark, sf_dir).collect()
    clustered = {r.doc_id for r in rows}
    # every paired doc is clustered, and vice versa
    assert clustered == {p.doc_a for p in pairs} | {p.doc_b for p in pairs}
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        # label propagation converges to the component's min doc id
        assert cid == min(m.doc_id for m in members)
        canon = [m for m in members if m.is_canonical == 1]
        assert len(canon) == 1
        best = max(members, key=lambda m: (m.quality_prob, -m.doc_id))
        assert canon[0].doc_id == best.doc_id


def test_quality_classifier_flag_and_phase_consistency(spark, sf_dir):
    rows = quality_classifier_filter(spark, sf_dir).collect()
    assert rows
    seen_phases = set()
    for r in rows:
        assert 0.0 <= r.quality_prob <= 1.0
        assert r.keep == int(r.quality_prob >= 0.5)
        if r.quality_prob < _QC_PHASES[0]:
            expect = 0
        elif r.quality_prob < _QC_PHASES[1]:
            expect = 1
        elif r.quality_prob < _QC_PHASES[2]:
            expect = 2
        else:
            expect = 3
        assert r.curriculum_phase == expect
        seen_phases.add(expect)
    # the fixed weights must actually split the fixture, not collapse
    # every document into one bucket
    assert len(seen_phases) >= 2


def test_weighted_ares_matches_python_reference(spark, sf_dir):
    """The selected set must equal a plain-Python Efraimidis-Spirakis
    draw with the identical md5 uniforms, ln quantization and
    (key, doc_id) ordering."""
    import hashlib
    import math

    from text_grabr_orc_spark.functions.text import py_fields
    from text_grabr_orc_spark.operators.sampling import (
        _ARES_K,
        sample_weighted_ares,
    )
    from text_grabr_orc_spark.tables import load_table

    got = [
        (r["rank"], r["doc_id"], r["weight"], r["sort_key"])
        for r in sample_weighted_ares(spark, sf_dir).collect()
    ]
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    keyed = []
    for r in docs:
        wt = len(py_fields(r["text"]))
        if wt == 0:
            continue
        u32 = int(hashlib.md5(f"ares:{r['doc_id']}".encode()).hexdigest()[:8], 16)
        k = round(-math.log((u32 + 1) / 4294967297.0) / wt, 9)
        keyed.append((k, r["doc_id"], wt))
    keyed.sort()
    want = [
        (i + 1, d, w, k) for i, (k, d, w) in enumerate(keyed[:_ARES_K])
    ]
    assert sorted(got) == want


def test_split_leakage_report_consistent_with_components(spark, sf_dir):
    """The audit's pair total equals the MinHash operator's, split
    tags are re-derived identically to the registered split, and
    cross-split leakage detected here matches a direct recomputation."""
    from text_grabr_orc_spark.operators.dedup import dedup_minhash_lsh
    from text_grabr_orc_spark.operators.sampling import split_leakage_report

    rows = split_leakage_report(spark, sf_dir).collect()
    pairs = dedup_minhash_lsh(spark, sf_dir).collect()
    assert sum(r["n_pairs"] for r in rows) == len(pairs)

    def tag(d):
        return (
            "train"
            if ((d * 2654435761) % 4294967296) % 100 < 80
            else "val"
            if ((d * 2654435761) % 4294967296) % 100 < 90
            else "test"
        )

    from collections import Counter

    want = Counter(
        tuple(sorted((tag(p["doc_a"]), tag(p["doc_b"])))) for p in pairs
    )
    got = {(r["split_lo"], r["split_hi"]): r["n_pairs"] for r in rows}
    assert got == dict(want)


def test_boilerplate_scrub_removes_planted_template(spark, tmp_path):
    """A planted per-source header appearing in every doc must be
    mined and REMOVED: scrubbed docs shrink by at least the header
    length, and a Python replay of the ordered replace fold yields
    the same md5."""
    import hashlib
    import os

    from text_grabr_orc_spark.operators.corpus_filters import (
        boilerplate_scrub,
        boilerplate_spans_by_source,
    )

    header = " ".join(f"hdr{i}" for i in range(8))  # one full 8-token tile
    rows = []
    for i in range(6):
        body = " ".join(f"u{i}w{j}" for j in range(24))
        text = f"{header} {body}"
        rows.append((i, text, "en", "srcX", len(text)))
    d = str(tmp_path / "sf_bp")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    spans = {
        r["rank"]: r["span"]
        for r in boilerplate_spans_by_source(spark, d).collect()
    }
    assert header in spans.values()
    got = {r["doc_id"]: r for r in boilerplate_scrub(spark, d).collect()}
    ordered = [spans[k] for k in sorted(spans)]
    for doc_id, text in [(r[0], r[1]) for r in rows]:
        acc = text
        for s in ordered:
            acc = acc.replace(s, " ")
        g = got[doc_id]
        assert g["chars_after"] == len(acc)
        assert g["chars_after"] <= g["chars_before"] - len(header) + 1
        assert g["scrubbed_md5"] == hashlib.md5(acc.encode()).hexdigest()
