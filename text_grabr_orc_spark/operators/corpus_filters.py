"""Corpus-filtering operators: span-level dedup, boilerplate mining,
stratified sampling, and model-based quality filtering.

These fill out the curation surface of ``curation.py`` with the four
remaining filters a 100 TB pretraining pipeline runs between raw crawl
and tokenized shards (C4/RefinedWeb-style recipes):

- ``dedup_repeated_spans``       span-level (line-level) dedup: fixed
  8-token tiles repeated across documents, per-doc duplication ratio
- ``boilerplate_spans_by_source``  per-source boilerplate mining: the
  most document-frequent spans inside each source (header/footer
  detection when documents have no newlines)
- ``sample_stratified_hash``     deterministic hash-based stratified
  downsampling to the smallest source, with EXACT integer acceptance
  (no float thresholds anywhere)
- ``quality_classifier_filter``  linear quality classifier (fixed
  public-recipe-style weights over repetition/stopword/length
  features), sigmoid score, keep flag and curriculum phase

The documents fixture is single-line word soup, so the "line" unit of
classic line-dedup is re-expressed as fixed-width token tiles — the
same unit RefinedWeb-style span dedup uses; with newline-bearing text
the tiling expression would swap for ``split(text, '\\n')`` and every
plan below is unchanged.

Scale themes (same as dedup.py/curation.py): span postings meet in ONE
equi-join on the span key (inverted index, never doc×doc); per-source
statistics are tiny aggregates broadcast back to the fact; every
map-only classifier feature is a rounded exact ratio so the comparator
can never flip on a last-ulp difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark.storagelevel import StorageLevel

from text_grabr_orc_spark.functions.text import ORACLE_WS_RUN, tokens
from text_grabr_orc_spark.operators.dedup import (
    _ORACLE_SHINGLES,
    minhash_pairs_cached,
)
from text_grabr_orc_spark.registry import register
from text_grabr_orc_spark.tables import load_table

#: DuckDB fragment: Go strings.Fields-parity token array of ``text``.
_ORACLE_TOKS = (
    "list_filter(regexp_split_to_array(text, "
    f"'{ORACLE_WS_RUN}'), t -> t <> '')"
)

#: tokens per span tile ("line" substitute for single-line documents)
_SPAN_W = 8

#: DuckDB fragment: full 8-token tiles of ``toks`` (stride = width;
#: docs shorter than one tile yield an empty list).
_ORACLE_SPANS = f"""
    [list_aggregate(toks[(i-1)*{_SPAN_W}+1:(i-1)*{_SPAN_W}+{_SPAN_W}],
                    'string_agg', ' ')
     for i in range(1, len(toks)//{_SPAN_W} + 1)]
"""


def _spans(toks) -> F.Column:
    """Array of space-joined full _SPAN_W-token tiles of ``toks``.

    Docs shorter than one tile (n_full = 0) must yield an EMPTY array:
    unguarded ``sequence(0, -1)`` would generate a DESCENDING [0, -1]
    (Spark's default step is -1 when start > stop) and emit two bogus
    span rows where the DuckDB oracle emits none — the same trap
    bpe_merge_pairs guards for 1-char words.
    """
    n_full = F.floor(F.size(toks) / _SPAN_W).cast("int")
    return F.when(
        n_full >= 1,
        F.transform(
            F.sequence(F.lit(0), n_full - 1),
            lambda i: F.array_join(
                F.slice(toks, i * _SPAN_W + 1, _SPAN_W), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _span_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, span_idx, g): one row per span slot. The
    two-step select keeps the tokenize->tile expression evaluated
    once (the repo-wide CollapseProject defence)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "source", tokens("text").alias("toks"))
        .select("doc_id", "source", _spans(F.col("toks")).alias("spans"))
        .select(
            "doc_id",
            "source",
            F.posexplode("spans").alias("span_idx", "g"),
        )
    )


# ---------------------------------------------------------------------------
# Span-level (line-level) dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_repeated_spans",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents
    ), sp AS (
        SELECT doc_id, unnest({_ORACLE_SPANS}) AS g
        FROM tok
    ), df AS (
        SELECT g, count(DISTINCT doc_id) AS nd FROM sp GROUP BY g
    )
    SELECT sp.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(coalesce(sum(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END), -1)
                AS BIGINT) AS n_dup_spans,
           round(sum(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS dup_ratio
    FROM sp JOIN df USING (g)
    GROUP BY sp.doc_id
    """,
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup statistics: tile every document into fixed
    8-token spans and count, per document, how many of its span slots
    also occur in at least one OTHER document — the span/line analogue
    of exact dedup that catches template reuse whole-doc hashing
    misses.

    Scale: inverted-index shape. Span document-frequencies are one
    hash aggregate on the span key (partial map-side combine bounds
    the shuffle by distinct spans, not span slots); the postings join
    back on the same key rides the same partitioning; the per-doc
    rollup is a second small shuffle on doc_id. No document ever
    compares against another document directly."""
    sp = _span_postings(spark, sf_dir)
    df_counts = sp.groupBy("g").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    dup = F.when(F.col("nd") >= 2, 1).otherwise(0)
    return (
        sp.join(df_counts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.coalesce(F.sum(dup), F.lit(-1)).cast("bigint").alias("n_dup_spans"),
            F.round(
                F.sum(dup).cast("double") / F.count(F.lit(1)), 6
            ).alias("dup_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Boilerplate mining
# ---------------------------------------------------------------------------

#: a span is boilerplate inside a source when at least this many
#: distinct documents of that source contain it (2 on the synthetic
#: word-soup fixture, where any repeat is already rare; a real crawl
#: uses a percentage of the domain's documents)
_BP_MIN_DOCS = 2
#: top boilerplate spans reported per source
_BP_TOP_K = 3


@register(
    "boilerplate_spans_by_source",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source, {_ORACLE_TOKS} AS toks FROM documents
    ), sp AS (
        SELECT DISTINCT doc_id, source, unnest({_ORACLE_SPANS}) AS g
        FROM tok
    ), df AS (
        SELECT source, g, count(*) AS n_docs
        FROM sp GROUP BY source, g
        HAVING count(*) >= {_BP_MIN_DOCS}
    )
    SELECT source, g AS span, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(rk AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY source ORDER BY n_docs DESC, g
        ) AS rk FROM df
    ) WHERE rk <= {_BP_TOP_K}
    """,
)
def boilerplate_spans_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate mining: for each source, the top-3 spans by
    document frequency among spans appearing in >= 2 distinct docs of
    that source — the header/footer/navigation detector a crawl
    pipeline runs per domain before content extraction.

    Scale: (source, span) document frequency is one partial-combined
    hash aggregate (distinct doc-per-span first, same exchange); the
    HAVING prunes the long tail BEFORE the window, so the per-source
    top-k window ranks only already-frequent spans — partitioned by
    source, never global."""
    sp = _span_postings(spark, sf_dir).select("doc_id", "source", "g").distinct()
    df_counts = (
        sp.groupBy("source", "g")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= _BP_MIN_DOCS)
    )
    w = Window.partitionBy("source").orderBy(F.col("n_docs").desc(), F.col("g"))
    return (
        df_counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _BP_TOP_K)
        .select(
            "source",
            F.col("g").alias("span"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Stratified sampling
# ---------------------------------------------------------------------------


@register(
    "sample_stratified_hash",
    oracle="""
    WITH u AS (
        SELECT doc_id, source,
               ('0x' || substr(md5('strat:' || doc_id::VARCHAR), 1, 8))::BIGINT
                   AS u32
        FROM documents
    ), cnt AS (
        SELECT source, count(*) AS n FROM u GROUP BY source
    ), m AS (SELECT min(n) AS target FROM cnt)
    SELECT u.source,
           CAST(cnt.n AS BIGINT) AS n_docs,
           CAST(coalesce(sum(CASE WHEN u.u32 * cnt.n < m.target * 4294967296
                                  THEN 1 ELSE 0 END), -1) AS BIGINT) AS n_kept
    FROM u JOIN cnt USING (source) CROSS JOIN m
    GROUP BY u.source, cnt.n
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: every source is sampled
    toward the SMALLEST source's document count by an md5-derived
    uniform u32 per document — accept iff u32 * count(source) <
    target * 2^32, which is exact 64-bit integer arithmetic (the
    acceptance fraction target/count is never materialized as a
    float, so both engines agree on every single document). Reported
    per source: population and kept counts.

    Scale: per-source counts are a bounded aggregate (one row per
    source) joined back broadcast; acceptance is then map-only on the
    fact — the standard two-pass shape for any sampling that needs
    corpus statistics. Swapping the uniform for xxhash64 is the
    production choice; md5 is used so the oracle computes the SAME
    stream (the repo-wide cross-engine hash device)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    u = docs.withColumn(
        "u32",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint"),
    )
    cnt = u.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    target = cnt.agg(F.min("n").alias("target"))
    kept = F.when(
        F.col("u32") * F.col("n") < F.col("target") * F.lit(4294967296),
        1,
    ).otherwise(0)
    return (
        u.join(F.broadcast(cnt), "source")
        .crossJoin(F.broadcast(target))
        .groupBy("source", "n")
        .agg(F.coalesce(F.sum(kept), F.lit(-1)).cast("bigint").alias("n_kept"))
        .select(
            "source",
            F.col("n").cast("bigint").alias("n_docs"),
            "n_kept",
        )
    )


# ---------------------------------------------------------------------------
# Quality classifier
# ---------------------------------------------------------------------------

#: fixed classifier weights (a fastText-style linear model distilled
#: to its decision function; constants chosen to exercise both sides
#: of the keep boundary on the fixture)
_QC_BIAS = -2.0
_QC_W_DISTINCT = 3.5  # distinct-token ratio: higher -> less repetitive
_QC_W_STOP = 2.0  # stopword ratio: natural text has function words
_QC_W_LEN = 1.0  # saturating length feature
_QC_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for", "on", "it")

#: curriculum phase boundaries over the rounded sigmoid score
_QC_PHASES = (0.45, 0.55, 0.65)

#: shared oracle fragments (single source for every operator that
#: joins the classifier score): tok -> feat -> scored CTE bodies
_QC_FEAT_SQL = f"""
        SELECT doc_id,
               len(toks) AS n_tokens,
               round(CASE WHEN len(toks) > 0
                          THEN len(list_distinct(toks))::DOUBLE / len(toks)
                          ELSE 0.0 END, 6) AS distinct_ratio,
               round(CASE WHEN len(toks) > 0
                          THEN len(list_filter(toks, t -> t IN
                               {_QC_STOPWORDS!r}))::DOUBLE / len(toks)
                          ELSE 0.0 END, 6) AS stop_ratio,
               round(least(len(toks), 100)::DOUBLE / 100, 6) AS len_feat
        FROM tok
"""
_QC_SCORED_SQL = f"""
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               distinct_ratio, stop_ratio, len_feat,
               round(1.0 / (1.0 + exp(-(({_QC_BIAS} +
                     {_QC_W_DISTINCT} * distinct_ratio) +
                     {_QC_W_STOP} * stop_ratio +
                     {_QC_W_LEN} * len_feat))), 6) AS quality_prob
        FROM feat
"""


@register(
    "quality_classifier_filter",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents
    ), feat AS ({_QC_FEAT_SQL}
    ), scored AS ({_QC_SCORED_SQL}
    )
    SELECT *,
           CAST(CASE WHEN quality_prob >= 0.5 THEN 1 ELSE 0 END AS BIGINT)
               AS keep,
           CAST(CASE WHEN quality_prob < {_QC_PHASES[0]} THEN 0
                     WHEN quality_prob < {_QC_PHASES[1]} THEN 1
                     WHEN quality_prob < {_QC_PHASES[2]} THEN 2
                     ELSE 3 END AS BIGINT) AS curriculum_phase
    FROM scored
    """,
)
def quality_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering: a linear classifier (fixed
    weights over distinct-token ratio, stopword ratio and a saturating
    length feature) scored with a sigmoid, thresholded into a 0/1
    ``keep`` flag, and bucketed into a curriculum phase by fixed score
    boundaries — the shape of fastText-quality/ DCLM-style filtering
    with the learned weights frozen as constants.

    Scale: entirely map-only — every feature is a per-row expression,
    no shuffle anywhere; at 100 TB this runs at scan speed and is the
    cheapest filter in the pipeline, which is why real recipes run it
    before any join-bearing dedup. Determinism: each feature is a
    ROUNDED exact ratio, the linear combination is parenthesized
    identically on both engines, and the flag/phase compare the
    ROUNDED sigmoid so a last-ulp exp() difference cannot flip a
    boundary."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens("text").alias("toks"))
    n_tok = F.size("toks")
    feat = base.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        F.round(
            F.when(
                n_tok > 0,
                F.size(F.array_distinct("toks")).cast("double") / n_tok,
            ).otherwise(0.0),
            6,
        ).alias("distinct_ratio"),
        F.round(
            F.when(
                n_tok > 0,
                F.size(
                    F.filter(F.col("toks"), lambda t: t.isin(*_QC_STOPWORDS))
                ).cast("double")
                / n_tok,
            ).otherwise(0.0),
            6,
        ).alias("stop_ratio"),
        F.round(F.least(n_tok, F.lit(100)).cast("double") / 100, 6).alias(
            "len_feat"
        ),
    )
    z = (
        (F.lit(_QC_BIAS) + F.lit(_QC_W_DISTINCT) * F.col("distinct_ratio"))
        + F.lit(_QC_W_STOP) * F.col("stop_ratio")
        + F.lit(_QC_W_LEN) * F.col("len_feat")
    )
    scored = feat.withColumn(
        "quality_prob", F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    )
    phase = (
        F.when(F.col("quality_prob") < _QC_PHASES[0], 0)
        .when(F.col("quality_prob") < _QC_PHASES[1], 1)
        .when(F.col("quality_prob") < _QC_PHASES[2], 2)
        .otherwise(3)
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "distinct_ratio",
        "stop_ratio",
        "len_feat",
        "quality_prob",
        F.when(F.col("quality_prob") >= 0.5, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("keep"),
        phase.cast("bigint").alias("curriculum_phase"),
    )


# ---------------------------------------------------------------------------
# Keep-best canonical selection over near-dup clusters
# ---------------------------------------------------------------------------


#: DuckDB fragment: exact 3-gram-shingle Jaccard of a pair (a, b)
_KB_J = """len(list_intersect(a.shingles, b.shingles))::DOUBLE /
           (len(a.shingles) + len(b.shingles)
            - len(list_intersect(a.shingles, b.shingles)))"""

_KB_ORACLE = f"""
    WITH RECURSIVE tok AS (
        SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents
    ), sh AS MATERIALIZED (
        -- MATERIALIZED: DuckDB otherwise re-inlines the shingle
        -- build per reference (the deep-chain device documented for
        -- the unigram oracles) — 21.6s -> 7.9s, identical rows
        SELECT doc_id, {_ORACLE_SHINGLES} AS shingles FROM tok
    ), p AS MATERIALIZED (
        SELECT a.doc_id AS pa, b.doc_id AS pb
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE {_KB_J} >= 0.5
    ), e AS (
        SELECT pa AS s, pb AS d FROM p
        UNION
        SELECT pb, pa FROM p
    ), r(n, l) AS (
        SELECT DISTINCT s, s FROM e
        UNION
        SELECT e.s, r.l FROM e JOIN r ON r.n = e.d
    ), cc AS (
        SELECT n AS doc_id, min(l) AS cluster_id FROM r GROUP BY n
    ), feat AS ({_QC_FEAT_SQL}
    ), scored AS ({_QC_SCORED_SQL}
    )
    SELECT cc.doc_id,
           CAST(cc.cluster_id AS BIGINT) AS cluster_id,
           s.quality_prob,
           CAST(CASE WHEN row_number() OVER (
                    PARTITION BY cc.cluster_id
                    ORDER BY s.quality_prob DESC, cc.doc_id
                ) = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
    FROM cc JOIN scored s USING (doc_id)
    """


@register("dedup_keep_best_canonical", oracle=_KB_ORACLE)
def dedup_keep_best_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION operator: group textual near-duplicates
    (MinHash-verified Jaccard >= 0.5 pairs) into connected components
    and keep the highest-quality member of each cluster — real
    cleaning runs keep the best representative, not the arbitrary
    first. Emits every clustered doc with its cluster id, classifier
    score and a 0/1 ``is_canonical`` flag (singletons pass through
    untouched upstream and are not re-listed).

    Composition: pairs come from ``dedup_minhash_lsh`` (banded LSH +
    exact verify), labels from the same iterative min-label
    propagation as ``dedup_clusters`` (diameter-bounded rounds, one
    keyed shuffle each, localCheckpointed lineage), scores from
    ``quality_classifier_filter`` (map-only). The canonical pick is a
    per-cluster window over clusters only — cluster count is bounded
    by duplicate mass, orders of magnitude below corpus size, so the
    window's shuffle is tiny.

    Oracle: recursive-CTE transitive closure over the brute-force
    exact-Jaccard pair graph joined to the shared classifier-score
    SQL — different algorithm, same fixpoint."""
    pairs = minhash_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
        .union(pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("s").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(25):
        # the label table is bounded by CLUSTERED-doc count (duplicate
        # mass), orders of magnitude under corpus size — broadcast it
        # so each round's neighbor join is exchange-free; at extreme
        # duplicate mass flip to the shuffle join of dedup_clusters
        nbr = edges.join(F.broadcast(labels), edges.d == F.col("doc_id")).select(
            F.col("s").alias("doc_id"), "label"
        )
        new_labels = (
            labels.union(nbr)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "doc_id")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError("label propagation did not converge in 25 rounds")
    edges.unpersist()
    quality = quality_classifier_filter(spark, sf_dir).select(
        "doc_id", "quality_prob"
    )
    w = Window.partitionBy("label").orderBy(
        F.col("quality_prob").desc(), F.col("doc_id")
    )
    return (
        labels.join(quality, "doc_id")
        .withColumn(
            "is_canonical",
            F.when(F.row_number().over(w) == 1, 1).otherwise(0).cast("bigint"),
        )
        .select(
            "doc_id",
            F.col("label").cast("bigint").alias("cluster_id"),
            "quality_prob",
            "is_canonical",
        )
    )


# ---------------------------------------------------------------------------
# k-anonymity group suppression
# ---------------------------------------------------------------------------

#: minimum group size for a (lang, source) cell to survive
_KANON_K = 20


@register(
    "kanonymity_suppress",
    oracle=f"""
    WITH cells AS (
        SELECT lang, source, count(*) AS n,
               CAST(coalesce(sum(n_chars), -1) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang, source
    )
    SELECT lang, source, CAST(n AS BIGINT) AS n,
           total_chars,
           CAST(CASE WHEN n < {_KANON_K} THEN 1 ELSE 0 END AS BIGINT)
               AS suppressed
    FROM cells
    """,
)
def kanonymity_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity cell audit over the (lang, source) quasi-identifier
    pair: any cell with fewer than k={_KANON_K} documents is flagged
    for suppression — releasing per-cell statistics (or the documents
    themselves keyed by these attributes) from a smaller cell risks
    re-identification, so privacy-reviewed corpus releases drop or
    generalize them. The flag, not a filter, is emitted so the
    downstream release step can choose suppression vs generalization
    (merge into a coarser cell).

    Scale: one map-side-combinable aggregate over the quasi-identifier
    key; output is bounded by the attribute-combination cardinality,
    never corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum("n_chars"), F.lit(-1))
        .cast("bigint")
        .alias("total_chars"),
    ).select(
        "lang",
        "source",
        "n",
        "total_chars",
        (F.col("n") < _KANON_K).cast("bigint").alias("suppressed"),
    )


# ---------------------------------------------------------------------------
# Cross-source duplication matrix
# ---------------------------------------------------------------------------


@register(
    "cross_source_duplication",
    oracle="""
    WITH hashed AS (
        SELECT DISTINCT
               sha256(trim(regexp_replace(lower(text),
                   '[\\t\\n\\x0b\\f\\r\\x{85}\\x{2028}\\x{2029}\\p{Zs}]+',
                   ' ', 'g'))) AS h,
               source
        FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared_texts
    FROM hashed a JOIN hashed b
      ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def cross_source_duplication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-SOURCE duplication matrix: for every pair of sources, how
    many normalized texts appear in BOTH — the mirroring/scraper-
    overlap diagnostic that decides which source to keep when two
    crawls cover the same site (and the denominator for source-level
    dedup priorities). Within-source duplicates don't count; the
    DISTINCT (hash, source) projection collapses them first.

    Scale: the (hash, source) projection is one map-side-combinable
    distinct on a 32-byte key; the pair join is a self-equi-join ON
    THE HASH (only texts duplicated across sources generate pairs, so
    fan-out is bounded by duplicate mass x sources-per-text, never
    corpus size); the matrix aggregate is bounded by source-pair
    cardinality."""
    from text_grabr_orc_spark.functions.text import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        F.sha2(normalize_text("text"), 256).alias("h"), "source"
    ).distinct()
    a = hashed.select("h", F.col("source").alias("source_a"))
    b = hashed.select("h", F.col("source").alias("source_b"))
    return (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_texts"))
    )


# ---------------------------------------------------------------------------
# Rendezvous (highest-random-weight) shard assignment
# ---------------------------------------------------------------------------

#: shard count for the HRW assignment demo
_HRW_SHARDS = 8


@register(
    "shard_rendezvous_hrw",
    oracle=f"""
    WITH weights AS (
        SELECT doc_id, s.shard,
               ('0x' || substr(md5('hrw:' || doc_id::VARCHAR || ':'
                                   || s.shard::VARCHAR), 1, 8))::BIGINT AS w
        FROM documents
        CROSS JOIN (SELECT unnest(range({_HRW_SHARDS}))::INT AS shard) s
    ), assigned AS (
        SELECT doc_id, shard FROM (
            SELECT doc_id, shard,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY w DESC, shard
                   ) AS rk
            FROM weights
        ) WHERE rk = 1
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM assigned GROUP BY shard
    """,
)
def shard_rendezvous_hrw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: each
    document goes to the shard with the highest hash(doc, shard)
    weight. Unlike ``doc_id % n`` sharding, adding or removing ONE
    shard reassigns only ~1/n of the corpus (the minimal-disruption
    property consistent-hashing systems rely on for shard rebalancing
    and cache placement) — this operator materializes the assignment
    and its balance profile.

    Determinism: weights are md5-prefix integers, the argmax breaks
    ties on shard id; both engines rank identical integers.

    Scale: the weight table fans out a constant {_HRW_SHARDS} rows per
    document map-side and collapses to one row via max_by partial
    aggregation — one shuffle keyed by doc_id carrying one candidate
    per mapper; the balance profile is a second, shard-cardinality-
    bounded aggregate."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    shard_arr = F.array(*[F.lit(s) for s in range(_HRW_SHARDS)])
    weights = docs.select(
        "doc_id", F.explode(shard_arr).alias("shard")
    ).select(
        "doc_id",
        "shard",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("hrw:"),
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("shard").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("w"),
    )
    assigned = weights.groupBy("doc_id").agg(
        F.max_by(
            "shard", F.struct(F.col("w"), (-F.col("shard")).alias("tb"))
        ).alias("shard")
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("min_doc"),
        F.max("doc_id").cast("bigint").alias("max_doc"),
    ).select(F.col("shard").cast("bigint"), "n_docs", "min_doc", "max_doc")


# ---------------------------------------------------------------------------
# Boilerplate removal (the action to the detector's signal)
# ---------------------------------------------------------------------------


def _bp_scrub_oracle() -> str:
    from text_grabr_orc_spark.registry import ORACLES

    return f"""
    WITH bp AS ({ORACLES["boilerplate_spans_by_source"]}
    ), spans AS (
        SELECT source, list(span ORDER BY rank) AS sl FROM bp GROUP BY source
    ), scrub AS (
        SELECT d.doc_id, d.source,
               length(d.text) AS chars_before,
               coalesce(len(spans.sl), 0) AS n_spans,
               CASE WHEN spans.sl IS NULL THEN d.text
                    ELSE list_reduce(list_prepend(d.text, spans.sl),
                                     (acc, s) -> replace(acc, s, ' '))
               END AS scrubbed
        FROM documents d LEFT JOIN spans USING (source)
    )
    SELECT doc_id, source,
           CAST(chars_before AS BIGINT) AS chars_before,
           CAST(length(scrubbed) AS BIGINT) AS chars_after,
           CAST(n_spans AS BIGINT) AS n_source_spans,
           md5(scrubbed) AS scrubbed_md5
    FROM scrub
    """


@register("boilerplate_scrub", oracle=_bp_scrub_oracle())
def boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate REMOVAL — the action to
    ``boilerplate_spans_by_source``'s signal (the same
    detection->action symmetry as PII detect/scrub): each document
    has its source's mined top spans replaced, and the scrubbed text
    is BIT-CHECKED via its md5 next to before/after char counts.
    Span application order is pinned (rank order) and the removal is
    an ordered fold (``aggregate`` / ``list_reduce``) of
    leftmost-non-overlapping replaces — identical semantics on both
    engines, same device as the BPE merge application.

    Scale: the span table is (sources x 3) rows broadcast; the scrub
    itself is map-only over the corpus — the cheapest possible
    full-pass rewrite, and exactly how a production pass applies a
    per-domain scrub list."""
    from text_grabr_orc_spark.operators.corpus_filters import (
        boilerplate_spans_by_source,
    )

    bp = boilerplate_spans_by_source(spark, sf_dir)
    spans = bp.groupBy("source").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rank", "span"))),
            lambda x: x["span"],
        ).alias("sl")
    )
    docs = load_table(spark, sf_dir, "documents")
    joined = docs.join(F.broadcast(spans), "source", "left")
    scrubbed = F.when(F.col("sl").isNull(), F.col("text")).otherwise(
        F.aggregate(
            F.col("sl"),
            F.col("text"),
            lambda acc, s: F.replace(acc, s, F.lit(" ")),
        )
    )
    return joined.select(
        "doc_id",
        "source",
        F.length("text").cast("bigint").alias("chars_before"),
        F.length(scrubbed).cast("bigint").alias("chars_after"),
        F.coalesce(F.size("sl"), F.lit(0))
        .cast("bigint")
        .alias("n_source_spans"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


def _dedup_impact_oracle() -> str:
    from text_grabr_orc_spark.registry import ORACLES

    return f"""
    WITH kb AS (
        SELECT * FROM ({ORACLES["dedup_keep_best_canonical"]})
    ), tok AS (
        SELECT d.doc_id, d.source,
               len(list_filter(regexp_split_to_array(d.text,
                   '{ORACLE_WS_RUN}'), t -> t <> '')) AS n_tok
        FROM documents d
    )
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(t.n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN kb.is_canonical = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_removed,
           CAST(sum(CASE WHEN kb.is_canonical = 0 THEN t.n_tok ELSE 0 END)
                AS BIGINT) AS n_tokens_removed,
           round(sum(CASE WHEN kb.is_canonical = 0 THEN t.n_tok ELSE 0 END)
                 / CAST(sum(t.n_tok) AS DOUBLE), 6) AS token_removal_rate
    FROM tok t
    LEFT JOIN kb ON kb.doc_id = t.doc_id
    GROUP BY t.source
    """


@register("dedup_impact_report", oracle=_dedup_impact_oracle())
def dedup_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COST side of the dedup decision: per source, documents and
    tokens that the keep-best policy (``dedup_keep_best_canonical``)
    would actually delete, with the token removal rate — the first
    number a data lead asks before approving a dedup setting, and
    the complement of ``corpus_curation_report``'s exposure fraction
    (exposure counts docs touched by ANY pair; this counts the
    resolved removals after cluster resolution keeps one canonical
    member). Non-clustered docs are never removed (LEFT join).

    Composition: the removal set is the registered decision operator
    verbatim (the oracle nests its recursive-CTE SQL), token counts
    are the strings.Fields-parity tokenizer — the report adds only a
    broadcast join on the (duplicate-mass-bounded) decision table
    and a per-source aggregate with map-side combine."""
    from text_grabr_orc_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    kb = dedup_keep_best_canonical(spark, sf_dir).select(
        "doc_id", "is_canonical"
    )
    tok = docs.select(
        "doc_id", "source", token_count("text").alias("n_tok")
    )
    removed = F.when(F.col("is_canonical") == 0, 1).otherwise(0)
    return (
        tok.join(F.broadcast(kb), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum(removed).cast("bigint").alias("n_docs_removed"),
            F.sum(removed * F.col("n_tok"))
            .cast("bigint")
            .alias("n_tokens_removed"),
            F.round(
                F.sum(removed * F.col("n_tok"))
                / F.sum("n_tok").cast("double"),
                6,
            ).alias("token_removal_rate"),
        )
    )
