"""Behavioral dedup tests on the FIXTURES.md §B.5 golden corpus:
exact dups collapse, near-dups are found by every near-dup family,
unrelated docs are never flagged."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from text_grabr_orc_spark.operators import dedup
from text_grabr_orc_spark.tables import load_table

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
NEAR = "the quick brown fox jumps over the lazy cat near the river bank today"
UNIQUE = [
    "spark executes declarative plans with catalyst and tungsten runtimes",
    "minhash signatures approximate jaccard similarity between shingle sets",
    "structured streaming applies watermarks to bound state for late data",
    "columnar parquet files carry min max statistics for row group pruning",
    "broadcast joins avoid shuffling the large fact table across the network",
]
#: doc_id -> text: 0/1/2 exact dups (0 kept), 3/4 near-dups, 5..9 unique
CORPUS = [(0, BASE), (1, BASE), (2, "  " + BASE.upper() + " "), (3, BASE + " again"),
          (4, NEAR + " again"), *[(5 + i, t) for i, t in enumerate(UNIQUE)]]


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dedup_corpus")
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in CORPUS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_exact_dedup_collapses_normalized_dups(spark, corpus_dir):
    out = dedup.dedup_exact(spark, corpus_dir).collect()
    # 0,1,2 collapse (case/whitespace normalize), rest unique -> 8 hashes
    assert len(out) == 8
    collapsed = [r for r in out if r["n_copies"] == 3]
    assert len(collapsed) == 1 and collapsed[0]["keep_doc_id"] == 0


def test_deduplicated_documents_keep_first(spark, corpus_dir):
    kept = sorted(
        r["doc_id"] for r in dedup.deduplicated_documents(spark, corpus_dir).collect()
    )
    assert kept == [0, 3, 4, 5, 6, 7, 8, 9]


def _pairs(df):
    return {(r[0], r[1]) for r in df.collect()}


def test_ngram_jaccard_finds_near_dup_pair(spark, corpus_dir):
    pairs = _pairs(dedup.dedup_ngram_jaccard(spark, corpus_dir, threshold=0.5))
    assert (3, 4) in pairs        # one-word edit
    assert (0, 1) in pairs        # exact dup (J=1 on shingles)
    # doc 2 is the UPPERCASED dup: shingles are case-sensitive by design
    # (case-insensitive dedup is dedup_exact's normalize_text job)
    assert (0, 2) not in pairs
    for p in pairs:               # no unique doc ever flagged
        assert p[0] < 5 and p[1] < 5


def test_minhash_lsh_matches_exact_jaccard(spark, corpus_dir):
    exact = _pairs(dedup.dedup_ngram_jaccard(spark, corpus_dir, threshold=0.5))
    lsh = _pairs(dedup.dedup_minhash_lsh(spark, corpus_dir, threshold=0.5))
    assert lsh == exact  # banded candidates + exact verify == brute force


def test_minhash_deterministic_across_runs(spark, corpus_dir):
    a = dedup.dedup_minhash_lsh(spark, corpus_dir).collect()
    b = dedup.dedup_minhash_lsh(spark, corpus_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_simhash_near_dups_close_unique_far(spark, corpus_dir):
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(
        spark.read.parquet(f"{corpus_dir}/documents.parquet")).collect()}
    ham = lambda a, b: bin(sigs[a] ^ sigs[b]).count("1")  # noqa: E731
    assert ham(0, 1) == 0          # identical text -> identical signature
    assert ham(3, 4) <= 5          # one-word edit -> tiny distance
    assert ham(5, 6) > 10          # unrelated docs -> far apart


def test_simhash_pairs_exact_verification(spark, corpus_dir):
    pairs = _pairs(dedup.dedup_simhash(spark, corpus_dir, max_distance=5))
    assert (3, 4) in pairs
    assert all(p[0] < 5 and p[1] < 5 for p in pairs)


def test_dedup_clusters_invariants(spark, sf_dir):
    from text_grabr_orc_spark.operators.dedup import (
        dedup_clusters,
        dedup_embedding_cosine,
    )

    labels = {
        r.node_id: r.cluster_id
        for r in dedup_clusters(spark, sf_dir).collect()
    }
    pairs = dedup_embedding_cosine(spark, sf_dir).collect()
    assert labels  # the pair graph is non-empty at every sf
    # 1. both endpoints of every near-dup pair share a cluster
    for p in pairs:
        assert labels[p.vec_a] == labels[p.vec_b], (p.vec_a, p.vec_b)
    # 2. the cluster id IS the minimum member id (canonical-keep rule)
    import collections

    members = collections.defaultdict(list)
    for n, c in labels.items():
        members[c].append(n)
    for c, ns in members.items():
        assert c == min(ns)
    # 3. exactly the nodes that appear in some pair are labeled
    in_pairs = {p.vec_a for p in pairs} | {p.vec_b for p in pairs}
    assert set(labels) == in_pairs


def test_embedding_rhp_matches_exact_allpairs(spark, sf_dir):
    # full-recall contract: the bucketed LSH variant must produce the
    # IDENTICAL row set as the exact all-pairs operator (banding is
    # sized so a miss at the 0.4 threshold has p < 1e-7)
    exact = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in dedup.dedup_embedding_cosine(spark, sf_dir).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in dedup.dedup_embedding_rhp(spark, sf_dir).collect()
    }
    assert lsh == exact and len(exact) > 0


def test_embedding_rhp_plan_has_no_allpairs_join(spark, sf_dir):
    from text_grabr_orc_spark.plans import executed_plan

    plan = executed_plan(dedup.dedup_embedding_rhp(spark, sf_dir))
    # candidate generation must be a keyed equi-join on the band keys —
    # an all-pairs plan would show a CartesianProduct or a nested-loop
    # join between two full-corpus relations instead
    assert "CartesianProduct" not in plan
    assert any(
        "Join" in line and "band_idx" in line and "band_val" in line
        for line in plan.splitlines()
    ), "band self-join is not a keyed equi-join"
    # every nested-loop node must be the tiny hyperplane broadcast
    # (IdentityBroadcastMode over the vec_id < 64 slice), never a
    # corpus-by-corpus cross
    assert plan.count("BroadcastNestedLoopJoin") == plan.count(
        "IdentityBroadcastMode"
    )
    # signatures are computed once and reused via the cache
    assert "InMemoryTableScan" in plan


def test_gemm_dense_tiles_on_sparse_vec_ids(spark, sf_dir, tmp_path):
    """A gappy vec_id space must still pack into even block-sized
    tiles (dense-rank repack), and the GEMM pair output must be
    identical to the same corpus under dense ids (pair semantics
    depend on ids only through ordering/identity)."""
    dense = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in dedup.dedup_embedding_gemm(spark, sf_dir).collect()
    }
    # sparsify: vec_id -> vec_id * 977 + 13 (order-preserving, gappy)
    emb = load_table(spark, sf_dir, "embeddings")
    sparse_dir = str(tmp_path / "sparse_sf")
    import os

    os.makedirs(sparse_dir, exist_ok=True)
    emb.withColumn(
        "vec_id", (F.col("vec_id") * 977 + 13).cast("bigint")
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sparse_dir, "embeddings.parquet")
    )
    sparse = {
        (
            (r["vec_a"] - 13) // 977,
            (r["vec_b"] - 13) // 977,
            r["cosine"],
        )
        for r in dedup.dedup_embedding_gemm(spark, sparse_dir).collect()
    }
    assert sparse == dense and len(dense) > 0
    # tile evenness: with a small block every tile except the last is
    # exactly block-sized even though raw ids are 977 apart
    block = 64
    sizes = {
        r["blk"]: r["n"]
        for r in dedup._dense_tile_ids(
            load_table(spark, sparse_dir, "embeddings"), block
        )
        .groupBy("blk")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_vec = emb.count()
    assert sorted(sizes) == list(range((n_vec + block - 1) // block))
    for blk, n in sizes.items():
        if blk < max(sizes):
            assert n == block, (blk, n)


def test_dense_tile_ids_fast_path_is_map_only(spark, sf_dir):
    """On a dense id space (the fixture's consecutive vec_ids) the
    tile assignment must take the probe-then-map fast path: a single
    projection with NO shuffle and NO window — the r04 prefix-sum tax
    (range Exchange + collect + window per invocation) must not
    reappear for the common case."""
    from text_grabr_orc_spark.plans import formatted_plan

    tids = dedup._dense_tile_ids(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        64,
    )
    plan = formatted_plan(tids)
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan
    # and it still matches the prefix-sum assignment exactly
    n = tids.count()
    by_blk = {
        r["blk"]: r["n"]
        for r in tids.groupBy("blk").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sorted(by_blk) == list(range((n + 63) // 64))
    assert all(v == 64 for k, v in by_blk.items() if k < max(by_blk))


def test_two_phase_cc_logarithmic_on_chain(spark):
    """The pathological topology for min-label propagation: a single
    chain 0-1-2-...-63 (diameter 63, so propagation needs ~63 rounds).
    Two-phase star CC must collapse it to one cluster rooted at 0 in
    O(log n) rounds."""
    n = 64
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "vec_a bigint, vec_b bigint"
    )
    labels, rounds = dedup.two_phase_cc(chain)
    got = {r.node_id: r.cluster_id for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 12, f"expected O(log n) rounds on the chain, got {rounds}"


def test_two_phase_cc_matches_propagation_clusters(spark, sf_dir):
    """Same fixpoint as the diameter-bounded propagation operator on
    the real near-dup graph — identical (node_id, cluster_id) sets."""
    prop = {
        (r.node_id, r.cluster_id)
        for r in dedup.dedup_clusters(spark, sf_dir).collect()
    }
    star = {
        (r.node_id, r.cluster_id)
        for r in dedup.dedup_clusters_twophase(spark, sf_dir).collect()
    }
    assert star == prop and len(star) > 0


def test_two_phase_cc_random_graph_matches_bruteforce(spark):
    """Property check on a deterministic pseudo-random graph: labels
    must equal a driver-side union-find ground truth."""
    import random

    rng = random.Random(7)
    n = 200
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(n), rng.randrange(n)) for _ in range(150)
            )
            if a != b
        }
    )
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    in_graph = {x for e in edges for x in e}
    truth = {x: find(x) for x in in_graph}
    df = spark.createDataFrame(edges, "vec_a bigint, vec_b bigint")
    labels, _ = dedup.two_phase_cc(df)
    got = {r.node_id: r.cluster_id for r in labels.collect()}
    assert got == truth


def test_embedding_cosine_scale_guard_routes_to_gemm(spark, sf_dir, monkeypatch):
    """Past _ALLPAIRS_MAX_VECTORS the registered exact operator must
    hand off to the tiled-GEMM plan (identical contract + oracle) —
    verified by shrinking the ceiling below the fixture size and
    checking (a) the result is still the exact pair set and (b) the
    executed plan carries the GEMM mapInPandas stage, not the
    all-pairs theta join."""
    from text_grabr_orc_spark.plans import executed_plan

    exact = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in dedup.dedup_embedding_cosine(spark, sf_dir).collect()
    }
    monkeypatch.setattr(dedup, "_ALLPAIRS_MAX_VECTORS", 10)
    guarded_df = dedup.dedup_embedding_cosine(spark, sf_dir)
    guarded = {
        (r["vec_a"], r["vec_b"], r["cosine"]) for r in guarded_df.collect()
    }
    assert guarded == exact and len(exact) > 0
    plan = executed_plan(guarded_df)
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan


def test_pagerank_mass_conservation_and_bounds(spark, sf_dir):
    """Every node distributes its full rank (undirected graph, all
    nodes have out-edges), so total rank stays at N through damped
    iterations (up to 12dp rounding); every rank >= the teleport
    floor 0.15."""
    from text_grabr_orc_spark.operators.dedup import graph_pagerank_neardup

    rows = graph_pagerank_neardup(spark, sf_dir).collect()
    assert rows
    total = sum(r.rank for r in rows)
    assert abs(total - len(rows)) < 1e-3 * len(rows)
    for r in rows:
        assert r.rank >= 0.15 and r.degree >= 1


def test_triangle_participation_on_known_graph(spark, tmp_path):
    """Driver-side triangle enumeration over the exact pair set is
    the ground truth. The synthetic fixture guarantees triangles: a
    4-clique (ids 0-3), a 3-clique (4-6), and isolated vectors."""
    import os

    import numpy as np

    rng = np.random.default_rng(11)
    base1 = rng.normal(size=64).astype("float32")
    base2 = rng.normal(size=64).astype("float32")
    rows = []
    for i in range(4):  # 4-clique: tiny perturbations of base1
        rows.append((i, (base1 + 0.01 * rng.normal(size=64).astype("float32")).tolist(), 0))
    for i in range(4, 7):  # 3-clique around base2
        rows.append((i, (base2 + 0.01 * rng.normal(size=64).astype("float32")).tolist(), 1))
    for i in range(7, 10):  # isolated
        rows.append((i, rng.normal(size=64).astype("float32").tolist(), 2))
    sf = str(tmp_path / "tri_sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "embeddings.parquet")
    )
    sf_dir = sf
    pairs = {
        (r.vec_a, r.vec_b)
        for r in dedup.dedup_embedding_gemm(spark, sf_dir)
        .select("vec_a", "vec_b")
        .collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = {
        tuple(sorted((a, b, c)))
        for a, b in pairs
        for c in (adj[a] & adj[b])
    }
    want: dict[int, int] = {}
    for t in tris:
        for n in t:
            want[n] = want.get(n, 0) + 1
    got = {
        r.node_id: r.n_triangles
        for r in dedup.graph_triangle_participation(spark, sf_dir).collect()
    }
    assert got == want and got


def test_jl_prefilter_recall_and_pruning(spark, sf_dir):
    """The JL-prefiltered generator must (a) return a subset of the
    exact GEMM pairs — verify is exact, so no false positives are
    possible — (b) keep recall high, and (c) actually prune: the
    candidate count must be well under the all-pairs total."""
    from pyspark.sql import functions as F

    from text_grabr_orc_spark.operators.dedup import (
        _JL_PREFILTER_MIN,
        dedup_embedding_jl,
        dedup_embedding_gemm,
        gemm_cosine_pairs,
    )
    from text_grabr_orc_spark.operators.similarity import _jl_project
    from text_grabr_orc_spark.tables import load_table

    exact = {
        (r.vec_a, r.vec_b)
        for r in dedup_embedding_gemm(spark, sf_dir).collect()
    }
    got = {
        (r.vec_a, r.vec_b) for r in dedup_embedding_jl(spark, sf_dir).collect()
    }
    assert got <= exact
    # ~0.9 on the adversarial uniform fixture (see _JL_PREFILTER_MIN)
    assert len(got) >= 0.85 * len(exact), (len(got), len(exact))

    proj = _jl_project(spark, sf_dir).select(
        "vec_id", F.col("proj").alias("embedding")
    )
    n_cand = gemm_cosine_pairs(proj, _JL_PREFILTER_MIN).count()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert n_cand < 0.5 * n * (n - 1) / 2, (n_cand, n)


def test_containment_catches_subset_jaccard_misses(spark, tmp_path):
    """A short doc fully embedded in a long one: containment 1.0 even
    when Jaccard falls below its threshold — the operator's reason to
    exist, pinned on a crafted fixture."""
    from pyspark.sql import functions as F

    from text_grabr_orc_spark.operators.dedup import (
        dedup_ngram_containment,
        dedup_ngram_jaccard,
    )

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    rows = [(0, short), (1, short + " " + filler)]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", "text",
        F.lit("en").alias("lang"), F.lit("s").alias("source"),
        F.length("text").alias("n_chars"),
    )
    d = str(tmp_path / "contain_fixture")
    df.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in dedup_ngram_containment(spark, d).collect()
    }
    assert cont.get((0, 1)) == 1.0
    jac = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, d).collect()
    }
    assert (0, 1) not in jac


def test_kcore_crafted_graph_and_fixpoint(spark, sf_dir):
    """Crafted graph: a triangle survives the 2-core with degree 2
    everywhere; a pendant chain hanging off it peels away entirely
    (each chain tip has degree 1, exposing the next). Plus the
    operator contract: one more peeling round past the bound changes
    nothing on the real fixture (fixpoint within _KCORE_ROUNDS)."""
    # triangle 0-1-2, chain 2-10-11-12
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 10), (10, 11), (11, 12)],
        "vec_a bigint, vec_b bigint",
    )
    got = {
        r["node_id"]: r["core_degree"]
        for r in dedup.kcore_peel(pairs, 2, 6).collect()
    }
    assert got == {0: 2, 1: 2, 2: 2}

    base = {
        (r["node_id"], r["core_degree"])
        for r in dedup.graph_kcore_membership(spark, sf_dir).collect()
    }
    from text_grabr_orc_spark.operators.dedup import (
        _KCORE_K,
        _KCORE_ROUNDS,
        _gemm_pairs_cached,
    )

    extra = {
        (r["node_id"], r["core_degree"])
        for r in dedup.kcore_peel(
            _gemm_pairs_cached(spark, sf_dir), _KCORE_K, _KCORE_ROUNDS + 1
        ).collect()
    }
    assert base == extra


def test_kcore_matches_reference_on_random_graphs(spark):
    """Property test: fixed-round peeling equals a pure-Python k-core
    computed to fixpoint, on random graphs small enough that 6 rounds
    always converge (n <= 12 => at most 10 peel rounds but density
    makes real cases converge in <= 3; the generator keeps n small
    and we assert convergence explicitly via the reference)."""
    import random

    rng = random.Random(0xC0DE)
    for trial in range(8):
        n = rng.randint(4, 12)
        edges = set()
        for _ in range(rng.randint(n, 2 * n)):
            a, b = rng.sample(range(n), 2)
            edges.add((min(a, b), max(a, b)))
        # python reference: peel to fixpoint
        adj = {i: set() for i in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        nodes = {i for i in range(n) if adj[i]}
        rounds = 0
        while True:
            drop = {v for v in nodes if sum(1 for u in adj[v] if u in nodes) < 2}
            if not drop:
                break
            nodes -= drop
            rounds += 1
        want = {
            v: sum(1 for u in adj[v] if u in nodes) for v in nodes
        }
        if rounds > 6:
            continue  # outside the operator's fixed-round contract
        pairs = spark.createDataFrame(
            [(a, b) for a, b in sorted(edges)], "vec_a bigint, vec_b bigint"
        )
        got = {
            r["node_id"]: r["core_degree"]
            for r in dedup.kcore_peel(pairs, 2, 6).collect()
        }
        assert got == want, (trial, sorted(edges), got, want)


def test_exact_substr_spans_cap_free_and_reference(spark, tmp_path, sf_dir):
    """The cap-free ExactSubstr mask (round-6 verdict item 4).

    Crafted fixture: 150 docs share a verbatim 20-token span — every
    gram inside it has df=150, past _LCS_DF_CAP=100, so the capped
    per-pair operator drops the span ENTIRELY; the cap-free
    corpus-level operator must flag it in all 150 docs with the exact
    start/length. Then the whole operator is checked against an
    independent pure-Python reference (duplicated-L-gram mask +
    interval union) on the crafted fixture AND the real one."""
    from pyspark.sql import functions as F

    from text_grabr_orc_spark.operators.dedup import (
        _LCS_DF_CAP,
        _XS_L,
        dedup_exact_substr_spans,
        dedup_longest_common_span,
    )

    span = " ".join(f"shared{i}" for i in range(20))  # 20-token span
    rows = []
    for d_id in range(150):
        prefix = " ".join(f"u{d_id}p{i}" for i in range(5))
        suffix = " ".join(f"u{d_id}s{i}" for i in range(7))
        rows.append((d_id, f"{prefix} {span} {suffix}"))
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", "text",
        F.lit("en").alias("lang"), F.lit("s").alias("source"),
        F.length("text").alias("n_chars"),
    )
    d = str(tmp_path / "xs_fixture")
    df.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")

    assert 150 > _LCS_DF_CAP
    # capped pair view: every gram of the span is past the cap -> gone
    assert dedup_longest_common_span(spark, d).count() == 0

    got = {
        r.doc_id: (r.span_start, r.span_len_tokens)
        for r in dedup_exact_substr_spans(spark, d).collect()
    }
    # all 150 docs flagged, exactly tokens 6..25 (1-based), length 20
    assert len(got) == 150
    assert set(got.values()) == {(6, 20)}

    def reference(texts: dict[int, str]) -> set[tuple[int, int, int]]:
        toks = {i: t.split() for i, t in texts.items()}
        counts: dict[tuple, int] = {}
        for tk in toks.values():
            for p in range(len(tk) - _XS_L + 1):
                gram = tuple(tk[p : p + _XS_L])
                counts[gram] = counts.get(gram, 0) + 1
        out = set()
        for i, tk in toks.items():
            ps = [
                p
                for p in range(len(tk) - _XS_L + 1)
                if counts[tuple(tk[p : p + _XS_L])] >= 2
            ]
            run: list[int] = []
            for p in ps:
                if run and p - run[-1] > _XS_L:
                    out.add((i, run[0] + 1, run[-1] - run[0] + _XS_L))
                    run = []
                run.append(p)
            if run:
                out.add((i, run[0] + 1, run[-1] - run[0] + _XS_L))
        return out

    assert {
        (r.doc_id, r.span_start, r.span_len_tokens) for r in
        dedup_exact_substr_spans(spark, d).collect()
    } == reference({i: t for i, t in rows})

    real = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    assert {
        (r.doc_id, r.span_start, r.span_len_tokens)
        for r in dedup_exact_substr_spans(spark, sf_dir).collect()
    } == reference({r.doc_id: r.text for r in real})


def test_exact_substr_scrub_removes_exact_spans(spark, tmp_path):
    """Scrub action on a crafted corpus: every affected doc loses
    exactly the shared 20-token span; the md5 bit-check equals the
    hand-built expected text; a fully-duplicated doc scrubs to the
    empty string rather than vanishing."""
    import hashlib

    from pyspark.sql import functions as F

    from text_grabr_orc_spark.operators.dedup import (
        dedup_exact_substr_scrub,
    )

    span = " ".join(f"shared{i}" for i in range(20))
    rows = []
    expected = {}
    for d_id in range(3):
        prefix = " ".join(f"u{d_id}p{i}" for i in range(5))
        suffix = " ".join(f"u{d_id}s{i}" for i in range(7))
        rows.append((d_id, f"{prefix} {span} {suffix}"))
        expected[d_id] = f"{prefix} {suffix}"
    # docs 3 and 4: the bare span only -> fully masked, empty scrub
    rows += [(3, span), (4, span)]
    expected[3] = expected[4] = ""
    # doc 5: unique text, never emitted
    rows.append((5, " ".join(f"solo{i}" for i in range(30))))
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", "text",
        F.lit("en").alias("lang"), F.lit("s").alias("source"),
        F.length("text").alias("n_chars"),
    )
    d = str(tmp_path / "xs_scrub")
    df.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")

    got = {r.doc_id: r for r in dedup_exact_substr_scrub(spark, d).collect()}
    assert set(got) == {0, 1, 2, 3, 4}
    for i, r in got.items():
        assert r.n_removed == 20
        assert r.n_kept == len(expected[i].split()) if expected[i] else r.n_kept == 0
        assert r.scrub_md5 == hashlib.md5(expected[i].encode()).hexdigest()


def test_embedding_rhp_highsim_matches_exact_on_augmented(spark, sf_dir):
    """The θ=0.85 banded operating point must report EXACTLY the
    all-pairs ≥0.85 set over the planted-dup augmented table (recall
    1 on the fixture: planted pairs sit at cosine ≥0.9989 by the
    Kantorovich bound, where the banding's miss probability is
    <1e-10 and deterministic hyperplanes make it exactly 0 here)."""
    import numpy as np

    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    scale = np.ones(vecs.shape[1])
    scale[1::2] = 1.1  # even elements 1-based == odd indices 0-based
    planted = ids % dedup._HS_DUP_STRIDE == 0
    aug_ids = np.concatenate([ids, ids[planted] + dedup._HS_DUP_OFFSET])
    aug = np.vstack([vecs, vecs[planted] * scale])
    nrm = np.linalg.norm(aug, axis=1)
    cos = (aug @ aug.T) / np.outer(nrm, nrm)
    iu = np.triu_indices(len(aug_ids), k=1)
    # id order, not row order: vec_a < vec_b by ID
    exact = set()
    for i, j in zip(*iu):
        if cos[i, j] >= dedup._HS_THRESHOLD:
            a, b = sorted((int(aug_ids[i]), int(aug_ids[j])))
            exact.add((a, b))
    got = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.dedup_embedding_rhp_highsim(spark, sf_dir).collect()
    }
    assert got == exact and len(exact) > 0
    # every reported pair is a planted (original, copy) pair — the
    # fixture's background tops out ~0.6, far under the threshold
    assert all(b - a == dedup._HS_DUP_OFFSET for a, b in exact)


def test_embedding_rhp_highsim_plan_is_banded(spark, sf_dir):
    from text_grabr_orc_spark.plans import executed_plan

    plan = executed_plan(dedup.dedup_embedding_rhp_highsim(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert any(
        "Join" in line and "band_idx" in line and "band_val" in line
        for line in plan.splitlines()
    ), "band self-join is not a keyed equi-join"
    # the only nested-loop joins are the tiny broadcast hyperplane
    # slice (IdentityBroadcastMode), never corpus x corpus
    assert plan.count("BroadcastNestedLoopJoin") == plan.count(
        "IdentityBroadcastMode"
    )


def test_hs_band_bits_grows_with_corpus():
    """r ~ log2(n): fixed r would re-quadratize the band join; the
    sizing keeps ≥2n buckets per band at every size."""
    assert dedup._hs_band_bits(500) == 10
    assert dedup._hs_band_bits(2040) == 12
    assert dedup._hs_band_bits(61200) == 17
    for n in (100, 1000, 60000, 10**7):
        assert 2 ** dedup._hs_band_bits(n) >= 2 * n
