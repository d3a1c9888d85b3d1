"""Tests for the curation operators (operators/curation.py).

Correctness against DuckDB is covered by the oracle gate
(tools/check.py); these tests pin the semantic invariants and the
physical plan shapes that the oracle cannot see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from text_grabr_orc_spark.operators.curation import (
    _N_SHARDS,
    _REP_DISTINCT_MIN,
    _REP_TOP_BIGRAM_MAX,
    _SEM_THRESHOLD,
    dedup_semantic_clusters,
    decontaminate_ngram_overlap,
    global_shuffle_order,
    source_mixing_weights,
    text_pii_scrub,
    text_repetition_stats,
    vocab_top_tokens,
)


def test_repetition_stats_invariants(spark, sf_dir):
    rows = text_repetition_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_tokens >= 0
        assert 0.0 <= r.distinct_ratio <= 1.0
        assert 0.0 <= r.top_bigram_frac <= 1.0
        # a bigram occurs at most n_tokens-1 times
        assert r.top_bigram_n <= max(r.n_tokens - 1, 0)
        expected_flag = int(
            r.distinct_ratio < _REP_DISTINCT_MIN
            or r.top_bigram_frac > _REP_TOP_BIGRAM_MAX
        )
        assert r.repetitive == expected_flag


def test_pii_scrub_finds_all_planted_pii(spark, sf_dir):
    """The operator plants exactly 2 emails, 1 IPv4 and 1 phone per
    document; the counters must see precisely those (the word-soup
    corpus contains no digits or @, so there are no accidental
    matches), and phone counting runs post-email/IP-scrub."""
    rows = text_pii_scrub(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_emails == 2
        assert r.n_ips == 1
        assert r.n_phones_pre_scrub == 1
        assert r.clean_len > 0


def test_global_shuffle_is_a_permutation(spark, sf_dir):
    rows = global_shuffle_order(spark, sf_dir).collect()
    docs = {r.doc_id for r in rows}
    assert len(docs) == len(rows)  # every doc exactly once
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard_id < _N_SHARDS
        by_shard.setdefault(r.shard_id, []).append(r.pos_in_shard)
    # positions in each shard are dense 1..len
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_global_shuffle_deterministic(spark, sf_dir):
    a = sorted(map(tuple, global_shuffle_order(spark, sf_dir).collect()))
    b = sorted(map(tuple, global_shuffle_order(spark, sf_dir).collect()))
    assert a == b


def test_vocab_ranks_are_dense_and_sorted(spark, sf_dir):
    rows = sorted(vocab_top_tokens(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert rows
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for prev, cur in zip(rows, rows[1:]):
        assert (prev.n, cur.token) > (cur.n, prev.token) or prev.n > cur.n or (
            prev.n == cur.n and prev.token < cur.token
        )


def test_source_mixing_weights_shares_sum_to_one(spark, sf_dir):
    rows = source_mixing_weights(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        # weight * actual share == uniform share (up to rounding)
        assert abs(r.mix_weight * r.n_tokens * len(rows) - sum(
            x.n_tokens for x in rows
        )) / sum(x.n_tokens for x in rows) < 1e-3


def test_semantic_dedup_pairs_subset_of_exact(spark, sf_dir):
    """Every SemDeDup pair must appear in the exact all-pairs result
    with the identical cosine — clustering prunes, never invents."""
    from text_grabr_orc_spark.registry import QUERIES, load_all

    load_all()
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in QUERIES["dedup_embedding_cosine"](spark, sf_dir).collect()
    }
    sem = dedup_semantic_clusters(spark, sf_dir).collect()
    assert sem
    for r in sem:
        assert r.cosine >= _SEM_THRESHOLD
        assert exact.get((r.vec_a, r.vec_b)) == r.cosine


def test_decontaminate_excludes_benchmark_docs(spark, sf_dir):
    from text_grabr_orc_spark.operators.curation import _DECON_MOD

    rows = decontaminate_ngram_overlap(spark, sf_dir).collect()
    for r in rows:
        assert r.doc_id % _DECON_MOD != 0
        assert r.n_shared_grams >= 1
        assert r.n_benchmark_docs >= 1


def test_curation_plans_have_no_cartesian(spark, sf_dir):
    """The decontamination join and the semantic-cluster pair join are
    equi-joins on derived keys — neither may plan as a cartesian
    product (the centroid assignment's broadcast nested loop against
    the tiny centroid set is the one legitimate product and carries a
    broadcast hint)."""
    for fn in (decontaminate_ngram_overlap,):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan


def test_bpe_merge_pairs_matches_python_count(spark, sf_dir):
    """Pair counts must equal a direct Python recount of adjacent
    character pairs weighted by word frequency."""
    from collections import Counter

    from text_grabr_orc_spark.functions.text import py_fields
    from text_grabr_orc_spark.operators.curation import bpe_merge_pairs
    from text_grabr_orc_spark.tables import load_table

    words = Counter()
    for r in load_table(spark, sf_dir, "documents").collect():
        for t in py_fields(r["text"]):
            words[t.lower()] += 1
    pairs = Counter()
    for w, n in words.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += n
    expect = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:32]
    got = [
        (r.pair, r.n_pair)
        for r in sorted(bpe_merge_pairs(spark, sf_dir).collect(),
                        key=lambda r: r.rank)
    ]
    assert got == expect


def test_feature_hashing_unit_norm_and_range(spark, sf_dir):
    import math

    from text_grabr_orc_spark.operators.curation import (
        _FH_DIM,
        text_feature_hashing,
    )

    by_doc: dict[int, float] = {}
    for r in text_feature_hashing(spark, sf_dir).collect():
        assert 0 <= r.bucket < _FH_DIM and r.n >= 1
        by_doc[r.doc_id] = by_doc.get(r.doc_id, 0.0) + r.weight**2
    assert by_doc
    for sq in by_doc.values():
        assert math.isclose(sq, 1.0, rel_tol=1e-4)


def test_inverted_index_postings_sorted_and_df_floor(spark, sf_dir):
    from text_grabr_orc_spark.operators.curation import (
        _INV_HEAD,
        _INV_MIN_DF,
        text_inverted_index,
    )

    rows = text_inverted_index(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.df >= _INV_MIN_DF
        ids = [int(x) for x in r.head_postings.split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(r.df, _INV_HEAD)


def test_bloom_decontamination_no_false_negatives(spark, sf_dir):
    """The Bloom guarantee: every doc the EXACT overlap operator flags
    must also be bloom-flagged (no false negatives); per doc, bloom
    hits >= exact shared grams; and the false-positive mass stays a
    small fraction of all grams (16384 bits / 2 hashes over the
    fixture's benchmark set)."""
    from text_grabr_orc_spark.operators.curation import (
        decontaminate_bloom,
        decontaminate_ngram_overlap,
    )

    exact = {
        r.doc_id: r.n_shared_grams
        for r in decontaminate_ngram_overlap(spark, sf_dir).collect()
    }
    bloom = {r.doc_id: r for r in decontaminate_bloom(spark, sf_dir).collect()}
    for doc_id, n_shared in exact.items():
        assert doc_id in bloom and bloom[doc_id].flagged == 1
        assert bloom[doc_id].n_bloom_hits >= n_shared
    total_grams = sum(r.n_grams for r in bloom.values())
    false_pos = sum(
        r.n_bloom_hits for d, r in bloom.items() if d not in exact
    )
    assert false_pos <= 0.05 * total_grams


def test_logreg_training_learns_the_length_signal(spark, sf_dir):
    """Three GD steps on the 'long document' label must (a) be
    deterministic run-to-run, (b) push the len_scaled weight positive
    and dominant — the label IS a threshold on that feature — and
    (c) reduce training log-loss below the w=0 starting point (ln 2):
    three half-step iterations genuinely descend, even though they
    are far from convergence."""
    import numpy as np
    import pyarrow.parquet as pq

    from text_grabr_orc_spark.operators.curation import train_logreg_quality

    w1 = {r.feature: r.weight for r in train_logreg_quality(spark, sf_dir).collect()}
    w2 = {r.feature: r.weight for r in train_logreg_quality(spark, sf_dir).collect()}
    assert w1 == w2
    assert w1["len_scaled"] > 0
    assert abs(w1["len_scaled"]) == max(
        abs(w1[f]) for f in ("len_scaled", "distinct_ratio", "mean_tok_len")
    )

    t = pq.read_table(f"{sf_dir}/documents.parquet").to_pydict()
    texts, n_chars = t["text"], np.asarray(t["n_chars"], dtype=np.float64)
    toks = [s.split() for s in texts]
    x1 = n_chars / 500.0
    x2 = np.asarray([len(set(ts)) / len(ts) for ts in toks])
    x3 = np.asarray([sum(len(w) for w in ts) / (10.0 * len(ts)) for ts in toks])
    y = (n_chars >= 250).astype(float)
    z = (
        w1["bias"]
        + w1["len_scaled"] * x1
        + w1["distinct_ratio"] * x2
        + w1["mean_tok_len"] * x3
    )
    p = 1.0 / (1.0 + np.exp(-z))
    loss = -(y * np.log(p) + (1 - y) * np.log(1 - p)).mean()
    assert loss < np.log(2.0), loss


def test_logreg_predict_consistent_with_trainer(spark, sf_dir):
    """Scores are the sigmoid of the trained weights' margin; the
    decision boundary is score >= 0.5; every token-bearing doc is
    scored exactly once."""
    from text_grabr_orc_spark.operators.curation import (
        predict_logreg_quality,
    )

    rows = predict_logreg_quality(spark, sf_dir).collect()
    assert len(rows) == len({r.doc_id for r in rows})
    for r in rows:
        assert 0.0 <= r.score <= 1.0
        assert r.predicted == (r.score >= 0.5)


def test_bpe_train_merges_is_real_bpe(spark, sf_dir):
    """The learned merge table must equal a reference pure-Python BPE
    trainer run on the same word-frequency table (greedy
    left-to-right application, count-then-merge rounds, (count desc,
    pair asc) tie-break) — pinning that the relational loop is real
    BPE, not merely deterministic."""
    import re
    from collections import Counter

    from text_grabr_orc_spark.functions.text import py_fields
    from text_grabr_orc_spark.operators.curation import (
        _BPE_N_MERGES,
        bpe_train_merges,
    )
    from text_grabr_orc_spark.tables import load_table

    rows = bpe_train_merges(spark, sf_dir).collect()
    assert [r["rank"] for r in rows] == list(range(1, _BPE_N_MERGES + 1))

    texts = [
        r["text"]
        for r in load_table(spark, sf_dir, "documents").select("text").collect()
    ]
    words = Counter()
    for t in texts:
        for tok in py_fields(t):
            w = tok.lower()
            if re.fullmatch(r"[a-z0-9]+", w):
                words[w] += 1
    seqs = {tuple(w): n for w, n in words.items()}

    def merge_seq(seq, a, b):
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        return tuple(out)

    expected = []
    for _ in range(_BPE_N_MERGES):
        pc = Counter()
        for seq, n in seqs.items():
            for i in range(len(seq) - 1):
                pc[(seq[i], seq[i + 1])] += n
        (a, b), np_ = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((a, b, a + b, np_))
        merged = {}
        for seq, n in seqs.items():
            ns = merge_seq(seq, a, b)
            merged[ns] = merged.get(ns, 0) + n
        seqs = merged

    got = [(r["lhs"], r["rhs"], r["merged"], r["n_pair"]) for r in rows]
    assert got == expected


def test_temperature_sampling_properties(spark, sf_dir):
    """Temperature shares form a distribution; alpha=0.5 pulls every
    source toward uniform (small sources upsampled, big ones
    downsampled relative to natural share); epochs = ceil(factor)."""
    import math

    from text_grabr_orc_spark.operators.curation import (
        source_temperature_sampling,
    )

    rows = source_temperature_sampling(spark, sf_dir).collect()
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-4
    mean_share = 1.0 / len(rows)
    for r in rows:
        if r["share"] > mean_share:
            assert r["temp_share"] <= r["share"] + 1e-9
        if r["share"] < mean_share:
            assert r["temp_share"] >= r["share"] - 1e-9
        assert r["epochs"] == math.ceil(r["upsample_factor"] - 1e-12)


def test_dsir_topk_prefers_target_lang(spark, sf_dir):
    """The importance ranking must enrich the target domain: the
    top-k is overwhelmingly the target language, and every selected
    doc scores >= any non-selected doc (verified by rank contiguity
    and weight monotonicity)."""
    from text_grabr_orc_spark.operators.curation import (
        _DSIR_TARGET_LANG,
        dsir_importance_topk,
    )

    rows = dsir_importance_topk(spark, sf_dir).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    ws = [r["dsir_logratio"] for r in rows]
    assert ws == sorted(ws, reverse=True)
    frac_target = sum(r["lang"] == _DSIR_TARGET_LANG for r in rows) / len(rows)
    # the fixture's languages share ONE vocabulary (differences are
    # distributional only), so the honest claim is enrichment over
    # the base rate, not dominance — dominance is pinned on the
    # disjoint-vocabulary crafted fixture below
    from text_grabr_orc_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = (
        docs.filter(F.col("lang") == _DSIR_TARGET_LANG).count() / docs.count()
    )
    assert frac_target > base, (frac_target, base)


def test_dsir_dominates_on_disjoint_vocabulary(spark, tmp_path):
    """When the target domain has its OWN vocabulary (the real DSIR
    setting: curated target vs crawl), the top-k must be entirely
    target-language docs."""
    import os

    from text_grabr_orc_spark.operators.curation import (
        _DSIR_TARGET_LANG,
        dsir_importance_topk,
    )

    rows = []
    for i in range(200):
        if i % 2 == 0:
            text = " ".join(f"enword{j % 17}" for j in range(40))
            rows.append((i, text, _DSIR_TARGET_LANG, "srcA", len(text)))
        else:
            text = " ".join(f"othertok{j % 23}" for j in range(40))
            rows.append((i, text, "xx", "srcB", len(text)))
    d = str(tmp_path / "sf_dsir")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    top = dsir_importance_topk(spark, d).collect()
    assert len(top) == 100
    assert all(r["lang"] == _DSIR_TARGET_LANG for r in top)


def test_embedding_sq8_error_within_quantization_bound(spark, sf_dir):
    """Per-vector MSE must respect the uniform-quantizer bound: every
    dimension's reconstruction error is at most half a bin width, so
    mse <= max_k (range_k/256)^2 / 4; saturation only at the range
    endpoints; codes hash-checked upstream, sanity here."""
    import numpy as np
    import pyarrow.parquet as pq

    from text_grabr_orc_spark.operators.similarity import (
        embedding_sq8_error,
    )

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    m = np.asarray([np.asarray(v, np.float64) for v in t["embedding"]])
    widths = (m.max(axis=0) - m.min(axis=0)) / 256.0
    bound = (widths.max() ** 2) / 4.0 + 1e-9
    rows = embedding_sq8_error(spark, sf_dir).collect()
    assert len(rows) == m.shape[0]
    for r in rows:
        assert 0.0 <= r["mse"] <= bound, (r, bound)
        assert 0 <= r["n_saturated"] <= 64
    # per-dimension max/min rows ARE saturated somewhere: total
    # saturation count >= number of dimensions (arg-max per dim)
    assert sum(r["n_saturated"] for r in rows) >= 64


def test_waterfill_allocation_invariants(spark, sf_dir):
    """Waterfilling correctness: exhausted sources are taken in full
    and sit below the water level; capped sources all get
    floor(level); total allocation hits the budget within the
    per-source floor rounding slack."""
    from text_grabr_orc_spark.operators.curation import (
        _WF_BUDGET_FRAC,
        token_budget_waterfill,
    )

    rows = token_budget_waterfill(spark, sf_dir).collect()
    total = sum(r["n_tokens"] for r in rows)
    budget = int(_WF_BUDGET_FRAC * total)
    level = rows[0]["fill_level"]
    for r in rows:
        assert r["fill_level"] == level
        if r["exhausted"]:
            assert r["alloc_tokens"] == r["n_tokens"]
            assert r["n_tokens"] <= level + 1e-6
        else:
            assert r["alloc_tokens"] == int(level)
            assert r["alloc_tokens"] <= r["n_tokens"]
    alloc = sum(r["alloc_tokens"] for r in rows)
    n_capped = sum(1 - r["exhausted"] for r in rows)
    assert budget - n_capped <= alloc <= budget


def test_calibration_bins_account_for_every_doc(spark, sf_dir):
    """Bin counts sum to the scored-doc total; per-bin mean scores
    sit inside their bin's range; the count-weighted mean of
    obs_rate equals the corpus positive rate exactly."""
    from text_grabr_orc_spark.operators.curation import (
        logreg_calibration_bins,
        predict_logreg_quality,
    )

    pred = predict_logreg_quality(spark, sf_dir).collect()
    rows = logreg_calibration_bins(spark, sf_dir).collect()
    assert sum(r["n"] for r in rows) == len(pred)
    for r in rows:
        assert r["bin"] / 100 - 1e-9 <= r["mean_score"] < (r["bin"] + 1) / 100 + 1e-9
        assert r["gap"] == round(r["mean_score"] - r["obs_rate"], 6)
    n_pos = sum(1 for p in pred if p["label"])
    weighted = sum(r["obs_rate"] * r["n"] for r in rows)
    assert abs(weighted - n_pos) < 0.01 * len(rows) + 1e-6


def test_bpe_encode_composition_invariants(spark, sf_dir):
    """Applying the learned merges can only shrink: char-token count
    >= bpe-token count per doc, with strict shrinkage wherever a doc
    contains a merged pair; eligible+skipped covers every token; the
    corpus-level compression is strictly > 1 (the merges were learned
    FROM this corpus, so they must fire)."""
    from text_grabr_orc_spark.functions.text import py_fields
    from text_grabr_orc_spark.operators.curation import bpe_encode_corpus
    from text_grabr_orc_spark.tables import load_table

    rows = bpe_encode_corpus(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    assert {r["doc_id"] for r in rows} == set(docs)
    tot_chr = tot_bpe = 0
    for r in rows:
        assert r["n_char_tokens"] >= r["n_bpe_tokens"] >= 0
        assert r["n_words"] + r["n_skipped"] == len(py_fields(docs[r["doc_id"]]))
        if r["n_bpe_tokens"]:
            assert r["compression"] >= 1.0
        tot_chr += r["n_char_tokens"]
        tot_bpe += r["n_bpe_tokens"]
    assert tot_chr > tot_bpe


def test_curation_report_covers_all_sources_consistently(spark, sf_dir):
    """One row per source; shares form distributions; the near-dup
    exposure and quality means stay in range; allocation never
    exceeds the source's own tokens."""
    from text_grabr_orc_spark.operators.curation import (
        corpus_curation_report,
    )
    from text_grabr_orc_spark.tables import load_table

    rows = corpus_curation_report(spark, sf_dir).collect()
    n_sources = (
        load_table(spark, sf_dir, "documents")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_sources
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 0.0 <= r["neardup_rate"] <= 1.0
        assert 0.0 < r["mean_quality"] <= 1.0
        assert r["alloc_tokens"] <= r["n_tokens"]
        assert r["epochs"] >= 1


def test_chunk_dedup_profile_conserves_chunks(spark, sf_dir):
    from text_grabr_orc_spark.operators.pipeline import (
        chunk_dedup_profile,
        chunk_documents_overlap,
    )

    rows = chunk_dedup_profile(spark, sf_dir).collect()
    total_chunks = chunk_documents_overlap(spark, sf_dir).count()
    assert sum(r["n_chunks"] for r in rows) == total_chunks
    for r in rows:
        assert r["n_chunks"] == r["n_copies"] * r["n_chunk_groups"]
        assert 0 <= r["n_cross_doc_groups"] <= r["n_chunk_groups"]


def test_negative_sampling_table_is_a_cdf(spark, sf_dir):
    """p_neg sums to ~1 over the head, cum_p is nondecreasing ending
    at ~1, and the 3/4 power compresses: head share under p_neg is
    strictly below its natural-frequency share."""
    from text_grabr_orc_spark.operators.curation import (
        unigram_sampling_table,
    )

    rows = unigram_sampling_table(spark, sf_dir).collect()
    rows.sort(key=lambda r: (-r["n"], r["token"]))
    assert abs(sum(r["p_neg"] for r in rows) - 1.0) < 1e-3
    cums = [r["cum_p"] for r in rows]
    assert cums == sorted(cums)
    assert abs(cums[-1] - 1.0) < 1e-3
    tot_n = sum(r["n"] for r in rows)
    head = rows[0]
    assert head["p_neg"] < head["n"] / tot_n


def test_shard_manifest_detects_a_dropped_doc(spark, sf_dir, tmp_path):
    """Conservation + sensitivity: shard totals cover the corpus and
    agree with global_shuffle_order's assignment; removing ONE doc
    changes exactly its shard's row (count down 1, checksum moved) —
    the integrity property counts alone don't give."""
    import os

    from text_grabr_orc_spark.operators.curation import (
        global_shuffle_order,
        shard_export_manifest,
    )
    from text_grabr_orc_spark.tables import load_table

    base = {r["shard_id"]: r for r in shard_export_manifest(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in base.values()) == docs.count()
    shards = {
        r["doc_id"]: r["shard_id"]
        for r in global_shuffle_order(spark, sf_dir).collect()
    }
    from collections import Counter

    per = Counter(shards.values())
    assert {k: v["n_docs"] for k, v in base.items()} == dict(per)

    victim = docs.select("doc_id").orderBy("doc_id").limit(1).collect()[0][0]
    d = str(tmp_path / "sf_drop")
    os.makedirs(d, exist_ok=True)
    docs.filter(F.col("doc_id") != victim).coalesce(2).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    after = {r["shard_id"]: r for r in shard_export_manifest(spark, d).collect()}
    hit = shards[victim]
    for sid, b in base.items():
        a = after[sid]
        if sid == hit:
            assert a["n_docs"] == b["n_docs"] - 1
            assert a["id_checksum"] != b["id_checksum"]
        else:
            assert (a["n_docs"], a["id_checksum"]) == (
                b["n_docs"],
                b["id_checksum"],
            )


def test_interleave_order_is_a_round_robin_permutation(spark, sf_dir):
    """global_pos is a permutation of 0..n-1; the first #sources
    positions hold one doc from EACH source (round 1 of the round
    robin); within any source, positions increase with within_rank."""
    from collections import defaultdict

    from text_grabr_orc_spark.operators.curation import (
        interleave_sources_order,
    )

    rows = interleave_sources_order(spark, sf_dir).collect()
    n = len(rows)
    pos = sorted(r["global_pos"] for r in rows)
    assert pos == list(range(n))
    srcs = {r["source"] for r in rows}
    first_round = sorted(rows, key=lambda r: r["global_pos"])[: len(srcs)]
    assert {r["source"] for r in first_round} == srcs
    assert all(r["within_rank"] == 1 for r in first_round)
    per = defaultdict(list)
    for r in rows:
        per[r["source"]].append((r["within_rank"], r["global_pos"]))
    for s, lst in per.items():
        lst.sort()
        gp = [g for _, g in lst]
        assert gp == sorted(gp)


def test_oov_rate_consistent_with_vocab(spark, sf_dir):
    """n_oov/n_tokens arithmetic holds per row; corpus-wide token
    totals match an independent count; a token INSIDE the vocabulary
    is never counted OOV (checked by recomputing one source's OOV
    count from the raw tokens and the vocab set)."""
    from text_grabr_orc_spark.operators.curation import (
        vocab_oov_rate_by_source,
        vocab_top_tokens,
    )
    from text_grabr_orc_spark.functions.text import tokens

    rows = vocab_oov_rate_by_source(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert abs(r["oov_rate"] - round(r["n_oov"] / r["n_tokens"], 6)) < 1e-9
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = (
        docs.select(F.explode(tokens("text")).alias("t")).count()
    )
    assert sum(r["n_tokens"] for r in rows) == total
    vocab = {r["token"] for r in vocab_top_tokens(spark, sf_dir).collect()}
    src = rows[0]["source"]
    toks = [
        t["t"].lower()
        for t in docs.filter(F.col("source") == src)
        .select(F.explode(tokens("text")).alias("t"))
        .collect()
    ]
    exp_oov = sum(1 for t in toks if t not in vocab)
    got = next(r for r in rows if r["source"] == src)
    assert (got["n_tokens"], got["n_oov"]) == (len(toks), exp_oov)


def test_canary_decontamination_plants_and_finds(spark, tmp_path):
    """A planted corpus: doc 23 quotes benchmark doc 0's opening
    verbatim mid-text, doc 24 paraphrases it (no exact substring) —
    only the verbatim quote is flagged, with the right source."""
    from text_grabr_orc_spark.operators.curation import (
        _CANARY_LEN,
        decontaminate_canary,
    )

    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    snippet = bench_text[:_CANARY_LEN]
    rows = [
        (0, bench_text, "en", "web", len(bench_text)),
        (5, f"intro words then {snippet} and a tail", "en", "web", 40),
        (7, "the quickest brown foxes jump over lazy dogs", "en", "web", 45),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    got = {r["doc_id"]: r for r in decontaminate_canary(spark, d).collect()}
    assert set(got) == {5}
    assert got[5]["n_canaries"] == 1
    assert got[5]["first_bench_id"] == 0
    # the Aho-Corasick scale variant must agree row for row
    from text_grabr_orc_spark.operators.curation import (
        decontaminate_canary_ac,
    )

    ac = sorted(map(tuple, decontaminate_canary_ac(spark, d).collect()))
    assert ac == sorted(map(tuple, got.values()))


def test_fertility_consistent_with_encode(spark, sf_dir):
    """Per-lang fertility totals must equal the per-doc encode
    operator's sums joined through the documents' lang column, and
    fertility >= 1 wherever any word is eligible (a BPE segmentation
    never emits fewer symbols than words)."""
    from text_grabr_orc_spark.operators.curation import (
        bpe_encode_corpus,
        tokenizer_fertility_by_lang,
    )

    fert = {r["lang"]: r for r in tokenizer_fertility_by_lang(spark, sf_dir).collect()}
    enc = bpe_encode_corpus(spark, sf_dir).collect()
    lang_of = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    agg: dict[str, list[int]] = {}
    for r in enc:
        a = agg.setdefault(lang_of[r["doc_id"]], [0, 0, 0])
        a[0] += r["n_words"]
        a[1] += r["n_skipped"]
        a[2] += r["n_bpe_tokens"]
    assert set(fert) == set(agg)
    for lang, (nw, nskip, nbpe) in agg.items():
        f = fert[lang]
        assert (f["n_words"], f["n_oov_words"], f["n_bpe_tokens"]) == (
            nw, nskip, nbpe,
        )
        if nw:
            assert f["fertility"] >= 1.0
