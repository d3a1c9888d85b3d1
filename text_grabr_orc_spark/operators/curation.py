"""Training-corpus curation operators beyond dedup: the filters and
bookkeeping a 100 TB pretraining pipeline runs between "raw crawl" and
"tokenized shards".

Seven operators over the ``documents``/``embeddings`` fixtures, each
with a DuckDB oracle generated from the same constants:

- ``text_repetition_stats``   Gopher-style repetition signals
  (distinct-token ratio, top-bigram fraction) + a repetition flag
- ``text_pii_scrub``          PII detection/redaction (emails, IPv4,
  phone fragments) with bit-checked scrubbed output
- ``decontaminate_ngram_overlap``  benchmark decontamination: flag
  corpus docs sharing word n-grams with a held-out eval slice
- ``vocab_top_tokens``        tokenizer-vocabulary seed: global top-k
  tokens by frequency with deterministic tie-breaks
- ``source_mixing_weights``   domain-mixture weights to rebalance
  per-source token budgets toward a uniform target
- ``global_shuffle_order``    deterministic hash shuffle into training
  shards (shard id + intra-shard position)
- ``dedup_semantic_clusters`` SemDeDup-style semantic near-dup pairs
  inside coarse embedding clusters

Scale notes live on each operator; the common themes are the same as
``dedup.py``: candidate generation by equi-join on a derived key,
partial aggregation before any shuffle, windows always partitioned,
and every float that crosses the comparator either an exact int ratio
or an exact DECIMAL sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from text_grabr_orc_spark.functions.text import (
    ORACLE_WS_RUN,
    shingles_from_tokens,
    tokens,
)
from text_grabr_orc_spark.functions.windows import bounded_window
from text_grabr_orc_spark.registry import register
from text_grabr_orc_spark.pins import pin_frame
from text_grabr_orc_spark.tables import load_table

#: DuckDB fragment: Go strings.Fields-parity token array of ``text``.
_ORACLE_TOKS = (
    "list_filter(regexp_split_to_array(text, "
    f"'{ORACLE_WS_RUN}'), t -> t <> '')"
)


# ---------------------------------------------------------------------------
# Repetition statistics (Gopher-style quality rules)
# ---------------------------------------------------------------------------

#: flag thresholds — applied to the ROUNDED ratios on both engines so
#: the boundary comparison can never flip on a last-ulp difference.
_REP_DISTINCT_MIN = 0.3
_REP_TOP_BIGRAM_MAX = 0.2


@register(
    "text_repetition_stats",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents
    ), base AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_distinct,
               [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]
                   AS bgs
        FROM tok
    ), top AS (
        SELECT doc_id, max(n) AS top_n FROM (
            SELECT doc_id, bg, count(*) AS n
            FROM (SELECT doc_id, unnest(bgs) AS bg FROM base)
            GROUP BY doc_id, bg
        ) GROUP BY doc_id
    ), scored AS (
        SELECT b.doc_id,
               CAST(b.n_tokens AS BIGINT) AS n_tokens,
               round(CASE WHEN b.n_tokens > 0
                          THEN b.n_distinct::DOUBLE / b.n_tokens
                          ELSE 0.0 END, 6) AS distinct_ratio,
               CAST(coalesce(t.top_n, 0) AS BIGINT) AS top_bigram_n,
               round(CASE WHEN b.n_tokens >= 2
                          THEN coalesce(t.top_n, 0)::DOUBLE / (b.n_tokens - 1)
                          ELSE 0.0 END, 6) AS top_bigram_frac
        FROM base b LEFT JOIN top t USING (doc_id)
    )
    SELECT *,
           CAST(CASE WHEN distinct_ratio < {_REP_DISTINCT_MIN}
                       OR top_bigram_frac > {_REP_TOP_BIGRAM_MAX}
                     THEN 1 ELSE 0 END AS BIGINT) AS repetitive
    FROM scored
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals (the Gopher/MassiveText rules):
    distinct-token ratio and the fraction of bigram slots taken by the
    single most-frequent bigram, plus a 0/1 ``repetitive`` flag.

    Scale: the token-level stats are map-only expressions. The
    top-bigram count explodes bigrams and partial-aggregates
    (doc_id, bigram) counts map-side before one shuffle on doc_id —
    per-doc work is linear (explode + hash agg), never the quadratic
    all-slots comparison a naive higher-order-function max would do.
    The flag compares ROUNDED ratios so both engines apply the
    threshold to identical doubles."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens("text").alias("toks"))
    stats = base.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct"),
    )
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("toks", i),
                        F.element_at("toks", i + 1),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg"),
    )
    top = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("top_n"))
    )
    distinct_ratio = F.round(
        F.when(
            F.col("n_tokens") > 0, F.col("n_distinct").cast("double") / F.col("n_tokens")
        ).otherwise(F.lit(0.0)),
        6,
    )
    top_n = F.coalesce(F.col("top_n"), F.lit(0)).cast("bigint")
    top_frac = F.round(
        F.when(
            F.col("n_tokens") >= 2,
            top_n.cast("double") / (F.col("n_tokens") - 1),
        ).otherwise(F.lit(0.0)),
        6,
    )
    scored = stats.join(top, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        distinct_ratio.alias("distinct_ratio"),
        top_n.alias("top_bigram_n"),
        top_frac.alias("top_bigram_frac"),
    )
    return scored.withColumn(
        "repetitive",
        F.when(
            (F.col("distinct_ratio") < _REP_DISTINCT_MIN)
            | (F.col("top_bigram_frac") > _REP_TOP_BIGRAM_MAX),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint"),
    )


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------

#: regexes written in the RE2 ∩ java.util.regex common dialect (ASCII
#: classes, no lookaround) so both engines match identically.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE_RE = r"\b\d{3}-\d{4}\b"


def _augmented_sql() -> str:
    """DuckDB expression for the deterministic PII-bearing text (the
    fixture corpus is synthetic word soup with no PII, so the operator
    plants PII derived from row keys — same expression both engines)."""
    return (
        "text || ' reach ' || source || '@example.com or ' || source || "
        "'.admin@mail.test tel 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')"
        " || ' from 10.' || (doc_id % 256)::VARCHAR || '.0.' || "
        "((doc_id * 7) % 256)::VARCHAR"
    )


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id, {_augmented_sql()} AS t FROM documents
    ), pre AS (
        SELECT doc_id, t,
               regexp_replace(
                   regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_IP_RE}', '<IP>', 'g') AS partial
        FROM aug
    ), scrubbed AS (
        SELECT doc_id, t, partial,
               regexp_replace(partial, '{_PHONE_RE}', '<PHONE>', 'g') AS clean
        FROM pre
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(t, '{_IP_RE}')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(partial, '{_PHONE_RE}')) AS BIGINT)
               AS n_phones_pre_scrub,
           md5(clean) AS clean_hash,
           CAST(length(clean) AS BIGINT) AS clean_len
    FROM scrubbed
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: count and replace emails, IPv4 addresses, and
    phone fragments with typed placeholders; emit an md5 of the
    scrubbed text so the redaction itself is bit-checked, not just the
    counts.

    The fixture corpus carries no PII, so the operator first plants
    deterministic PII derived from (doc_id, source) — the scrub then
    has real matches to find, and the oracle plants the identical
    strings. Phone counting runs on the email/IP-scrubbed text
    (replacement ORDER is part of the contract: an IP inside an email
    must already be gone).

    Scale: pure map-side regexp work inside whole-stage codegen — no
    shuffle at all; the regexes use the RE2∩Java common dialect so the
    same patterns run on any engine."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" reach "),
        F.col("source"),
        F.lit("@example.com or "),
        F.col("source"),
        F.lit(".admin@mail.test tel 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
    )
    base = docs.select("doc_id", aug.alias("t"))
    partial = F.regexp_replace(
        F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>"
    )
    step = base.withColumn("partial", partial).withColumn(
        "clean", F.regexp_replace(F.col("partial"), _PHONE_RE, "<PHONE>")
    )
    return step.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(_IP_RE)).cast("bigint").alias("n_ips"),
        F.regexp_count(F.col("partial"), F.lit(_PHONE_RE))
        .cast("bigint")
        .alias("n_phones_pre_scrub"),
        F.md5(F.col("clean")).alias("clean_hash"),
        F.length("clean").cast("bigint").alias("clean_len"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

_DECON_N = 4  # word n-gram size
_DECON_MOD = 23  # doc_id % MOD == 0 -> held-out benchmark slice

#: DuckDB 4-gram shingles (parity with shingles_from_tokens(toks, 4):
#: docs shorter than n yield their whole joined token run).
_ORACLE_SHINGLES4 = f"""
    list_distinct([list_aggregate(toks[i:i+{_DECON_N - 1}], 'string_agg', ' ')
                   for i in range(1, greatest(len(toks)-{_DECON_N - 1}, 1) + 1)])
"""


@register(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, {_ORACLE_SHINGLES4} AS grams
        FROM (SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents)
    ), bench AS (
        SELECT doc_id AS bench_id, unnest(grams) AS g
        FROM sh WHERE doc_id % {_DECON_MOD} = 0
    ), corp AS (
        SELECT doc_id, unnest(grams) AS g
        FROM sh WHERE doc_id % {_DECON_MOD} <> 0
    )
    SELECT c.doc_id,
           CAST(count(DISTINCT c.g) AS BIGINT) AS n_shared_grams,
           CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_benchmark_docs
    FROM corp c JOIN bench b ON b.g = c.g
    GROUP BY c.doc_id
    """,
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents that share
    word 4-grams with a held-out benchmark slice (docs whose id is
    divisible by {MOD}) — the standard n-gram-overlap check run before
    pretraining so eval answers don't leak into the corpus.

    Scale: the same inverted-index shape as dedup_ngram_jaccard — both
    sides explode to (gram, doc) postings and meet in ONE equi-join on
    the gram; no document ever compares against all benchmark docs.
    The benchmark side is a tiny fraction of the corpus, so Spark
    broadcasts it after AQE sees its size. Join keys are xxhash64-ed
    to 8 bytes map-side (hash-collision risk per the hashed_shingle
    analysis in dedup.py — far below fixture noise); the oracle joins
    the gram strings themselves and must agree."""
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select("doc_id", tokens("text").alias("toks"))
        .select("doc_id", shingles_from_tokens(F.col("toks"), _DECON_N).alias("grams"))
        .select("doc_id", F.explode("grams").alias("g"))
        .select("doc_id", F.xxhash64("g").alias("h"))
    )
    bench = grams.filter(F.col("doc_id") % _DECON_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "h"
    )
    corp = grams.filter(F.col("doc_id") % _DECON_MOD != 0)
    return (
        corp.join(bench, "h")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("h").alias("n_shared_grams"),
            F.countDistinct("bench_id").alias("n_benchmark_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary building
# ---------------------------------------------------------------------------

_VOCAB_K = 64


@register(
    "vocab_top_tokens",
    oracle=f"""
    SELECT token, n, CAST(row_number() OVER (ORDER BY n DESC, token)
                          AS BIGINT) AS rank
    FROM (
        SELECT lower(tok) AS token, count(*) AS n
        FROM (SELECT unnest({_ORACLE_TOKS}) AS tok FROM documents)
        GROUP BY lower(tok)
    )
    QUALIFY rank <= {_VOCAB_K}
    """,
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary seed: the corpus's top-k lowercased tokens
    by frequency, ranked with a deterministic (count DESC, token ASC)
    tie-break — the first step of wordpiece/BPE vocab induction.

    Scale: explode + hash-aggregate partial-combines map-side, so the
    shuffle carries one row per distinct token per partition, bounded
    by vocab size, not corpus size. The top-k runs as orderBy+limit
    (distributed TakeOrdered) and only THEN ranks — the unpartitioned
    row_number window sees at most k rows, never the vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .select(F.lower("tok").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), F.col("token")).limit(_VOCAB_K)
    w = bounded_window("token", F.col("n").desc(), F.col("token"))
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


# ---------------------------------------------------------------------------
# Source mixing weights
# ---------------------------------------------------------------------------


@register(
    "source_mixing_weights",
    oracle=f"""
    WITH per AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(coalesce(sum(len({_ORACLE_TOKS})), -1) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS s
        FROM per
    )
    SELECT source, n_docs, n_tokens,
           round(n_tokens::DOUBLE / t, 6) AS token_share,
           round(t::DOUBLE / s / n_tokens, 6) AS mix_weight
    FROM per CROSS JOIN tot
    """,
)
def source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: per-source token totals, each
    source's share of the corpus, and the sampling weight that would
    equalize token budgets across sources (weight = uniform target
    share / actual share) — how pretraining mixes re-weight crawl vs
    curated domains.

    Scale: one partial-aggregated shuffle on source; everything after
    operates on the source-cardinality table (tiny by construction),
    where the grand total rides an unpartitioned window that sees one
    row per SOURCE, not per document. All ratios are single int/int
    double divisions — exact inputs, deterministic rounding, written
    in the identical operation order on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(F.size(tokens("text"))), F.lit(-1))
        .cast("bigint")
        .alias("n_tokens"),
    )
    w = Window.partitionBy(F.pmod(F.hash("source"), F.lit(1)))
    per = per.withColumn("t", F.sum("n_tokens").over(w)).withColumn(
        "s", F.count(F.lit(1)).over(w)
    )
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens").cast("double") / F.col("t"), 6).alias(
            "token_share"
        ),
        F.round(
            F.col("t").cast("double") / F.col("s") / F.col("n_tokens"), 6
        ).alias("mix_weight"),
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle into training shards
# ---------------------------------------------------------------------------

_N_SHARDS = 16


@register(
    "global_shuffle_order",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, md5('shuf:' || doc_id::VARCHAR) AS hx
        FROM documents
    )
    SELECT doc_id,
           ('0x' || substr(hx, 1, 8))::BIGINT % {_N_SHARDS} AS shard_id,
           CAST(row_number() OVER (
               PARTITION BY ('0x' || substr(hx, 1, 8))::BIGINT % {_N_SHARDS}
               ORDER BY hx, doc_id) AS BIGINT) AS pos_in_shard
    FROM h
    """,
)
def global_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-order assignment:
    hash every doc, route it to one of N shards by a hash slice, and
    number it inside its shard by hash order — a reproducible random
    permutation with no RNG state, so re-runs (and backfills) place
    every document identically.

    Scale: the only exchange is the shard hash partitioning; each
    shard's ordering is a partition-local sort under a PARTITIONED
    window (never a global row_number). N_SHARDS is a parameter — at
    100 TB you'd raise it so one shard ≈ one output file."""
    docs = load_table(spark, sf_dir, "documents")
    hx = F.md5(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string")))
    base = docs.select("doc_id", hx.alias("hx")).withColumn(
        "shard_id",
        (F.conv(F.substring("hx", 1, 8), 16, 10).cast("bigint") % _N_SHARDS),
    )
    w = Window.partitionBy("shard_id").orderBy("hx", "doc_id")
    return base.select(
        "doc_id",
        "shard_id",
        F.row_number().over(w).cast("bigint").alias("pos_in_shard"),
    )


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup inside coarse clusters
# ---------------------------------------------------------------------------

_SEM_STRIDE = 50  # centroid stride (same coarse quantizer as IVF)
_SEM_THRESHOLD = 0.4

#: DuckDB cosine (same fragment as similarity.py's oracles)
_DK_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@register(
    "dedup_semantic_clusters",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ), cent AS (
        SELECT vec_id AS centroid_id, e AS ce FROM v
        WHERE vec_id % {_SEM_STRIDE} = 0
    ), assigned AS (
        SELECT vec_id, e, centroid_id FROM (
            SELECT v.vec_id, v.e, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {_DK_COS.format(a="v.e", b="cent.ce")} DESC,
                                cent.centroid_id
                   ) AS crk
            FROM v CROSS JOIN cent
        ) WHERE crk = 1
    )
    SELECT a.centroid_id, a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_DK_COS.format(a="a.e", b="b.e")}, 6) AS cosine
    FROM assigned a JOIN assigned b
      ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    WHERE {_DK_COS.format(a="a.e", b="b.e")} >= {_SEM_THRESHOLD}
    """,
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: assign every embedding
    to its nearest coarse centroid (deterministic quantizer — every
    50th vector, as in similarity_topk_ivf), then compare pairs ONLY
    inside each cluster and keep those with cosine >= 0.4.

    This is the pruning insight of SemDeDup (Abbas et al., 2023):
    semantic duplicates land in the same coarse cluster, so the
    quadratic pair scan runs per-cluster (n/k docs each), never
    corpus-wide. Approximate by design — a dup pair straddling a
    cluster boundary is missed — yet fully deterministic, so the
    oracle replicates the exact same assignment and pair set.

    Scale: centroid assignment is a broadcast nested loop + map-side
    max_by argmin (one row per vector enters the shuffle); the pair
    stage shuffles vectors once on centroid_id, and AQE's skew-join
    splitting caps any oversized cluster. Same output contract as
    dedup_embedding_cosine/_rhp: (vec_a, vec_b, cosine)."""
    from text_grabr_orc_spark.functions.vectors import (
        cosine_from_parts,
        dot,
    )
    from text_grabr_orc_spark.operators.similarity import (
        _emb,
        _nearest_centroid_assign,
    )

    emb = _emb(spark, sf_dir).select("vec_id", "e", "n")
    cent = F.broadcast(
        emb.filter(F.col("vec_id") % _SEM_STRIDE == 0).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("e").alias("ce"),
            F.col("n").alias("cn"),
        )
    )
    from pyspark.storagelevel import StorageLevel

    # both pair-join sides reference the assignment — persist so the
    # broadcast centroid-scoring pass runs once per build, not once
    # per side (round-13 optimization, guide §2.4; same fix as
    # knn_graph_ivf)
    assigned = _nearest_centroid_assign(emb, cent).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pin_frame(assigned, "sem_clusters_assign", max_n=3)
    a = assigned.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("vec_a"),
        F.col("e").alias("ea"),
        F.col("n").alias("na"),
    )
    b = assigned.select(
        F.col("centroid_id").alias("centroid_id_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("e").alias("eb"),
        F.col("n").alias("nb"),
    )
    cos = cosine_from_parts(dot("ea", "eb", 64), F.col("na"), F.col("nb"))
    return (
        a.join(
            b,
            (F.col("centroid_id") == F.col("centroid_id_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .filter(cos >= _SEM_THRESHOLD)
        .select("centroid_id", "vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# BPE merge-pair counting (tokenizer training, step 1)
# ---------------------------------------------------------------------------

_BPE_TOP = 32


@register(
    "bpe_merge_pairs",
    oracle=f"""
    WITH words AS (
        SELECT lower(tok) AS w, count(*) AS n
        FROM (SELECT unnest({_ORACLE_TOKS}) AS tok FROM documents)
        GROUP BY lower(tok)
    ), idx AS (
        -- position table sized from the data itself (max word length),
        -- not a silent constant: a word longer than a hard-coded bound
        -- would undercount pairs only on the oracle side
        SELECT unnest(range(1, (SELECT max(len(w)) FROM words)))::INT AS i
    ), pairs AS (
        SELECT substr(w, i, 2) AS pair, sum(n) AS n_pair
        FROM words
        CROSS JOIN idx
        WHERE i <= len(w) - 1
        GROUP BY substr(w, i, 2)
    )
    SELECT pair, CAST(n_pair AS BIGINT) AS n_pair,
           CAST(row_number() OVER (ORDER BY n_pair DESC, pair)
                AS BIGINT) AS rank
    FROM pairs
    QUALIFY rank <= {_BPE_TOP}
    """,
)
def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, first merge step: count adjacent
    character pairs across the word-frequency table (each word
    contributes its corpus frequency to every adjacent pair of its
    initial character symbols) and rank the top candidates — the
    argmax of this table IS the first BPE merge; a full trainer loops
    merge -> re-pair on the shrinking symbol sequence.

    Scale: the word-frequency table is the first aggregate (bounded
    by vocabulary, not corpus); pair explosion runs over that bounded
    table, and pair counts partial-combine before one shuffle bounded
    by |distinct pairs| <= charset^2. The top-k is orderBy+limit
    (TakeOrdered), ranked only after the cut — the same no-global-
    window shape as vocab_top_tokens. Pairs come from substr windows
    (identical semantics on both engines), never a char-split whose
    empty-string edge cases differ."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .select(F.lower("tok").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # guard 1-char words: sequence(1, 0) would generate a DESCENDING
    # [1, 0] (Spark's default step is -1 when start > stop), not empty
    idx = F.when(
        F.length("w") >= 2, F.sequence(F.lit(1), F.length("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = (
        words.select(
            "n",
            F.explode(
                F.transform(idx, lambda i: F.col("w").substr(i, F.lit(2)))
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("n").alias("n_pair"))
    )
    top = pairs.orderBy(F.col("n_pair").desc(), F.col("pair")).limit(_BPE_TOP)
    w = bounded_window("pair", F.col("n_pair").desc(), F.col("pair"))
    return top.select(
        "pair",
        F.col("n_pair").cast("bigint").alias("n_pair"),
        F.row_number().over(w).cast("bigint").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Feature hashing (hashed bag-of-tokens text vectors)
# ---------------------------------------------------------------------------

_FH_DIM = 64


@register(
    "text_feature_hashing",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lower(unnest({_ORACLE_TOKS})) AS t FROM documents
    ), b AS (
        SELECT doc_id,
               ('0x' || substr(md5('fh:' || t), 1, 8))::BIGINT % {_FH_DIM}
                   AS bucket,
               count(*) AS n
        FROM tok GROUP BY 1, 2
    ), norms AS (
        SELECT doc_id, sqrt(sum(n * n)) AS l2 FROM b GROUP BY doc_id
    )
    SELECT b.doc_id, CAST(b.bucket AS BIGINT) AS bucket,
           CAST(b.n AS BIGINT) AS n,
           round(b.n / norms.l2, 6) AS weight
    FROM b JOIN norms USING (doc_id)
    """,
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the HashingTF trick): every token hashes into
    one of 64 buckets, per-document bucket counts are L2-normalized —
    a fixed-dimension text vector with NO vocabulary state, the
    classic way to get embeddings-before-embeddings for clustering /
    similarity / classifier features at corpus scale. Emitted SPARSE
    as (doc_id, bucket, n, weight) rows — the dense array is a
    map-side ``transform(sequence(..))`` away when an ANN operator
    wants it.

    Scale: one explode + two keyed aggregates, all partial-combined;
    no vocabulary broadcast, no state — the defining property of the
    hashing trick is that this runs identically on 100 TB without a
    dictionary build. md5-slice bucket hashing is the repo's
    cross-engine device (production would use xxhash64); the L2 norm
    is a sqrt of an exact integer sum, so weights are identical
    doubles on both engines before the 6dp round."""
    docs = load_table(spark, sf_dir, "documents")
    b = (
        docs.select("doc_id", F.explode(tokens("text")).alias("t"))
        .select(
            "doc_id",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("fh:"), F.lower("t"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint")
                % _FH_DIM
            ).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norms = b.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("n") * F.col("n"))).alias("l2")
    )
    return b.join(norms, "doc_id").select(
        "doc_id",
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.col("l2"), 6).alias("weight"),
    )


# ---------------------------------------------------------------------------
# Inverted index (search-engine posting lists)
# ---------------------------------------------------------------------------

#: document-frequency floor: tokens in fewer docs don't make the index
#: summary (bounds output by the common-token vocabulary)
_INV_MIN_DF = 20
#: posting-list head length kept per token
_INV_HEAD = 8


@register(
    "text_inverted_index",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, lower(unnest({_ORACLE_TOKS})) AS token
        FROM documents
    ), agg AS (
        SELECT token,
               count(*) AS df,
               array_to_string(list_sort(list(doc_id))[1:{_INV_HEAD}], ',')
                   AS head_postings
        FROM tok GROUP BY token
    )
    SELECT token, CAST(df AS BIGINT) AS df, head_postings
    FROM agg WHERE df >= {_INV_MIN_DF}
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: token -> document frequency + the first
    {_INV_HEAD} postings (sorted doc ids, comma-joined) for every
    token appearing in >= {_INV_MIN_DF} documents — the core data
    structure of full-text retrieval, expressed as one relational
    plan. The head slice keeps the driver-visible summary bounded;
    the full posting lists are the same aggregate without the slice.

    Scale: tokenize/explode is map-only; the DISTINCT (doc, token)
    postings set and the per-token aggregate are the SAME shuffle key
    (token is a function of the pair), so Catalyst plans one exchange
    for dedup + count + collect; df >= floor bounds the output by
    vocabulary, not corpus. Posting lists are emitted as strings so
    the cross-engine comparator sees a scalar column (arrays of ids
    compare engine-specifically through pandas)."""
    docs = load_table(spark, sf_dir, "documents")
    post = (
        docs.select(
            "doc_id", F.explode(tokens("text")).alias("tok")
        )
        .select("doc_id", F.lower("tok").alias("token"))
        .distinct()
    )
    return (
        post.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.transform(
                    F.slice(F.array_sort(F.collect_list("doc_id")), 1, _INV_HEAD),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("head_postings"),
        )
        .filter(F.col("df") >= _INV_MIN_DF)
        .select("token", F.col("df").cast("bigint").alias("df"), "head_postings")
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (sketch-based, memory-bounded)
# ---------------------------------------------------------------------------

#: Bloom geometry: 16384 bits as 512 x 32-bit words (32-bit words
#: keep every shift <= 31 — DuckDB raises on BIGINT << 63, and
#: sub-word arithmetic stays identical across engines), 2 hash
#: functions. Sized for the fixture's ~1.8k benchmark-gram
#: insertions: p(bit) ~ 0.1, false-positive rate ~ 1% — the 2 KB of
#: filter a pre-filter stage would actually broadcast.
_BLOOM_BITS = 16384
_BLOOM_WORD = 32


def _bloom_pos_sql(seed: str) -> str:
    """DuckDB bit position of gram ``g`` under hash ``seed``."""
    return f"('0x' || substr(md5('{seed}:' || g), 1, 8))::BIGINT % {_BLOOM_BITS}"


def _bloom_pos(col, seed: str):
    """Spark twin of _bloom_pos_sql (identical md5-prefix bucketing)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 8), 16, 10
        ).cast("bigint")
        % _BLOOM_BITS
    )


@register(
    "decontaminate_bloom",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, {_ORACLE_SHINGLES4} AS grams
        FROM (SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents)
    ), bench_g AS (
        SELECT DISTINCT unnest(grams) AS g
        FROM sh WHERE doc_id % {_DECON_MOD} = 0
    ), pos AS (
        SELECT {_bloom_pos_sql("b1")} AS p FROM bench_g
        UNION ALL
        SELECT {_bloom_pos_sql("b2")} FROM bench_g
    ), filt AS (
        SELECT p // {_BLOOM_WORD} AS w,
               bit_or(1::BIGINT << (p % {_BLOOM_WORD})) AS bits
        FROM pos GROUP BY w
    ), corp AS (
        SELECT doc_id, unnest(grams) AS g
        FROM sh WHERE doc_id % {_DECON_MOD} <> 0
    ), probe AS (
        SELECT doc_id, g,
               {_bloom_pos_sql("b1")} AS p1,
               {_bloom_pos_sql("b2")} AS p2
        FROM corp
    ), hits AS (
        SELECT pr.doc_id, count(*) AS n_hits
        FROM probe pr
        JOIN filt f1 ON f1.w = pr.p1 // {_BLOOM_WORD}
        JOIN filt f2 ON f2.w = pr.p2 // {_BLOOM_WORD}
        WHERE ((f1.bits >> (pr.p1 % {_BLOOM_WORD})) & 1) = 1
          AND ((f2.bits >> (pr.p2 % {_BLOOM_WORD})) & 1) = 1
        GROUP BY pr.doc_id
    ), totals AS (
        SELECT doc_id, count(*) AS n_grams FROM corp GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(t.n_grams AS BIGINT) AS n_grams,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_bloom_hits,
           CAST(CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 1 ELSE 0 END
                AS BIGINT) AS flagged
    FROM totals t LEFT JOIN hits h USING (doc_id)
    """,
)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based decontamination: the held-out benchmark slice's
    4-grams are folded into a 16384-bit Bloom filter (2 md5-derived
    hashes), and every training document's grams probe it — the
    memory-bounded alternative to ``decontaminate_ngram_overlap``'s
    exact postings join. The Bloom guarantee (no false negatives,
    bounded false positives) is what makes the sketch usable as a
    cheap pre-filter at 100 TB: the full benchmark n-gram set never
    ships to executors, only a constant 2 KB of filter, and only
    bloom-positive docs need the exact verification join. A pytest
    pins the superset relation against the exact operator.

    Determinism: bit positions are md5-prefix buckets (the repo's
    standard cross-engine hash device); the filter build is a bit_or
    aggregate over 512 32-bit words, integer end to end, identical on
    both engines by construction.

    Scale: the filter table is 512 rows broadcast to both probe joins;
    probes are map-side expressions plus two tiny equi-joins; the
    per-doc rollup is one shuffle keyed by doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.storagelevel import StorageLevel

    # the gram table feeds the benchmark slice (twice, via the two
    # bloom-position projections) AND the corpus probe side —
    # un-materialized, the tokenize+shingle explode ran 3x+ inside one
    # action (12 parquet scans in the plan; round-13 optimization,
    # guide §2.4)
    grams = (
        docs.select("doc_id", tokens("text").alias("toks"))
        .select(
            "doc_id", shingles_from_tokens(F.col("toks"), _DECON_N).alias("grams")
        )
        .select("doc_id", F.explode("grams").alias("g"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pin_frame(grams, "bloom_grams", max_n=2)
    bench_g = (
        grams.filter(F.col("doc_id") % _DECON_MOD == 0).select("g").distinct()
    )
    pos = bench_g.select(_bloom_pos(F.col("g"), "b1").alias("p")).unionAll(
        bench_g.select(_bloom_pos(F.col("g"), "b2").alias("p"))
    )
    filt = pos.groupBy(
        F.expr(f"p div {_BLOOM_WORD}").alias("w")
    ).agg(
        F.bit_or(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {_BLOOM_WORD} AS INT))")
        ).alias("bits")
    )
    corp = grams.filter(F.col("doc_id") % _DECON_MOD != 0)
    probe = corp.select(
        "doc_id",
        "g",
        _bloom_pos(F.col("g"), "b1").alias("p1"),
        _bloom_pos(F.col("g"), "b2").alias("p2"),
    )
    f1 = F.broadcast(filt.select(F.col("w").alias("w1"), F.col("bits").alias("bits1")))
    f2 = F.broadcast(filt.select(F.col("w").alias("w2"), F.col("bits").alias("bits2")))
    hits = (
        probe.join(f1, F.expr(f"w1 = p1 div {_BLOOM_WORD}"))
        .join(f2, F.expr(f"w2 = p2 div {_BLOOM_WORD}"))
        .filter(
            F.expr(
                f"((bits1 >> CAST(p1 % {_BLOOM_WORD} AS INT)) & 1) = 1 AND "
                f"((bits2 >> CAST(p2 % {_BLOOM_WORD} AS INT)) & 1) = 1"
            )
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    totals = corp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0))
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        n_hits.cast("bigint").alias("n_bloom_hits"),
        (n_hits > 0).cast("bigint").alias("flagged"),
    )


# ---------------------------------------------------------------------------
# In-engine model training: full-batch logistic regression
# ---------------------------------------------------------------------------

#: GD hyperparameters — small and FIXED so the oracle can unroll the
#: whole training run.
_LR_ITERS = 3
_LR_RATE = 0.5

#: shared feature definitions (exact rational doubles on both
#: engines): bias, scaled length, distinct-token ratio, scaled mean
#: token length. The label is the "long document" bit — learnable
#: from x1, so three GD steps visibly move the weights.
_LR_FEATURES = ("bias", "len_scaled", "distinct_ratio", "mean_tok_len")


def _logreg_layers() -> tuple[list[str], str]:
    """The unrolled-GD CTE layers (shared by the train and predict
    oracles): each iteration quantizes the sigmoid to 9 dp (engine
    exp() agrees far past that — the bigram-LM ln() convention), sums
    the per-row gradient terms as exact DECIMAL, and rounds the
    weight update to 9 dp, so no float difference can compound across
    iterations. Returns (layers, name of the final weight CTE)."""
    toks = _ORACLE_TOKS
    feats = f"""
        SELECT doc_id,
               1.0 AS x0,
               n_chars / 500.0 AS x1,
               len(list_distinct({toks})) * 1.0 / len({toks}) AS x2,
               list_sum(list_transform({toks}, t -> len(t)))
                   / (10.0 * len({toks})) AS x3,
               CASE WHEN n_chars >= 250 THEN 1.0 ELSE 0.0 END AS y
        FROM documents
        WHERE len({toks}) > 0
    """
    layers = [f"f AS ({feats})", "w0 AS (SELECT 0.0 a, 0.0 b, 0.0 c, 0.0 d)"]
    for it in range(1, _LR_ITERS + 1):
        p, wp, wn = f"p{it}", f"w{it - 1}", f"w{it}"
        layers.append(
            f"""{p} AS (
            SELECT f.*, CAST(round(
                1.0 / (1.0 + exp(-({wp}.a * f.x0 + {wp}.b * f.x1
                                   + {wp}.c * f.x2 + {wp}.d * f.x3))), 9)
                AS DECIMAL(12,9)) AS p
            FROM f CROSS JOIN {wp})"""
        )
        upd = ", ".join(
            f"round(any_value({wp}.{w}) - {_LR_RATE} * (CAST(sum(CAST(round("
            f"(CAST(p AS DOUBLE) - y) * {x}, 9) AS DECIMAL(18,9))) AS DOUBLE)"
            f" / count(*)), 9) AS {w}"
            for w, x in zip("abcd", ("x0", "x1", "x2", "x3"))
        )
        layers.append(f"{wn} AS (SELECT {upd} FROM {p} CROSS JOIN {wp})")
    return layers, f"w{_LR_ITERS}"


def _logreg_oracle() -> str:
    layers, final = _logreg_layers()
    return f"""
    WITH {", ".join(layers)}
    SELECT f.feature, CASE f.feature
        WHEN 'bias' THEN {final}.a
        WHEN 'len_scaled' THEN {final}.b
        WHEN 'distinct_ratio' THEN {final}.c
        ELSE {final}.d END AS weight
    FROM (VALUES ('bias'), ('len_scaled'), ('distinct_ratio'),
                 ('mean_tok_len')) AS f(feature)
    CROSS JOIN {final}
    """


@register("train_logreg_quality", oracle=_logreg_oracle())
def train_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a logistic-regression document classifier INSIDE the
    engine — full-batch gradient descent, {iters} fixed iterations —
    and return the learned weights. This is the "model fitting as a
    dataflow" capability (Spark MLlib's LogisticRegression is the
    same shape: per-iteration treeAggregate of the gradient); here
    every arithmetic step is pinned so the whole training run is
    bit-identical on both engines and the driver hash-checks the
    LEARNED MODEL itself, not an accuracy envelope.

    Per iteration: sigmoid quantized to 9 dp (engines' exp() agree
    far past 9 dp — the bigram-LM ln() convention), per-row gradient
    terms quantized to 9 dp and summed as exact DECIMAL (order-proof),
    weight update rounded to 9 dp. The weight vector is the ONLY
    driver-side state (4 floats per iteration, computed by a Spark
    expression and re-embedded as literals — the Lloyd-step device
    from similarity_topk_pq_trained at a different altitude).

    Scale: each iteration is one map-side-combinable aggregate over
    the feature table (persisted once; features are exact int-ratio
    doubles). At 100 TB: {iters} passes over cached features, each a
    single 4-column partial-agg reduce — no shuffle of rows at all.
    """
    from pyspark.storagelevel import StorageLevel

    toks = tokens(F.col("text"))
    feats = (
        load_table(spark, sf_dir, "documents")
        .filter(F.size(tokens(F.col("text"))) > 0)
        .select(
            F.lit(1.0).alias("x0"),
            (F.col("n_chars") / F.lit(500.0)).alias("x1"),
            (
                F.size(F.array_distinct(toks)).cast("double")
                / F.size(toks)
            ).alias("x2"),
            (
                F.aggregate(
                    F.transform(toks, F.length),
                    F.lit(0),
                    lambda acc, x: acc + x,
                ).cast("double")
                / (F.lit(10.0) * F.size(toks))
            ).alias("x3"),
            F.when(F.col("n_chars") >= 250, F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("y"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    xs = ("x0", "x1", "x2", "x3")
    w = [0.0, 0.0, 0.0, 0.0]
    for _ in range(_LR_ITERS):
        z = sum((F.lit(wk) * F.col(xk) for wk, xk in zip(w[1:], xs[1:])),
                F.lit(w[0]) * F.col("x0"))
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9).cast(
            "decimal(12,9)"
        )
        grad_terms = [
            F.sum(
                F.round(
                    (p.cast("double") - F.col("y")) * F.col(xk), 9
                ).cast("decimal(18,9)")
            ).alias(f"g{k}")
            for k, xk in enumerate(xs)
        ]
        upd = feats.agg(*grad_terms, F.count(F.lit(1)).alias("n")).select(
            *[
                F.round(
                    F.lit(wk)
                    - _LR_RATE * (F.col(f"g{k}").cast("double") / F.col("n")),
                    9,
                ).alias(f"w{k}")
                for k, wk in enumerate(w)
            ]
        )
        row = upd.collect()[0]
        w = [float(row[f"w{k}"]) for k in range(4)]
    out = [(name, wk) for name, wk in zip(_LR_FEATURES, w)]
    return spark.createDataFrame(out, "feature string, weight double")


train_logreg_quality.__doc__ = train_logreg_quality.__doc__.format(
    iters=_LR_ITERS
)


def _logreg_predict_oracle() -> str:
    """Score every document with the final trained weights — same
    unrolled layers, one more scoring pass."""
    layers, final = _logreg_layers()
    return f"""
    WITH {", ".join(layers)}
    SELECT f.doc_id,
           round(1.0 / (1.0 + exp(-({final}.a * f.x0 + {final}.b * f.x1
                                    + {final}.c * f.x2
                                    + {final}.d * f.x3))), 6) AS score,
           ({final}.a * f.x0 + {final}.b * f.x1 + {final}.c * f.x2
            + {final}.d * f.x3) >= 0.0 AS predicted,
           f.y = 1.0 AS label
    FROM f CROSS JOIN {final}
    """


@register("predict_logreg_quality", oracle=_logreg_predict_oracle())
def predict_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve the in-engine-trained model: score every document with
    the weights ``train_logreg_quality`` learns (train -> apply in one
    lineage, the standard batch-inference shape). The weight vector is
    4 floats, so inference is a map-only pass — no join, no shuffle;
    at 100 TB this is a single scan with a fused scalar expression.

    Oracle: the same unrolled-GD layers as the trainer plus one
    scoring projection, so the driver hash-checks training AND
    inference as one contract (score quantized at 6 dp; the decision
    uses the raw margin sign, identical doubles on both engines)."""
    toks = tokens(F.col("text"))
    feats = (
        load_table(spark, sf_dir, "documents")
        .filter(F.size(tokens(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.lit(1.0).alias("x0"),
            (F.col("n_chars") / F.lit(500.0)).alias("x1"),
            (
                F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
            ).alias("x2"),
            (
                F.aggregate(
                    F.transform(toks, F.length),
                    F.lit(0),
                    lambda acc, x: acc + x,
                ).cast("double")
                / (F.lit(10.0) * F.size(toks))
            ).alias("x3"),
            F.when(F.col("n_chars") >= 250, F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("y"),
        )
    )
    w = {
        r["feature"]: r["weight"]
        for r in train_logreg_quality(spark, sf_dir).collect()
    }
    z = (
        F.lit(w["bias"]) * F.col("x0")
        + F.lit(w["len_scaled"]) * F.col("x1")
        + F.lit(w["distinct_ratio"]) * F.col("x2")
        + F.lit(w["mean_tok_len"]) * F.col("x3")
    )
    return feats.select(
        "doc_id",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"),
        (z >= 0.0).alias("predicted"),
        (F.col("y") == 1.0).alias("label"),
    )


# ---------------------------------------------------------------------------
# Temperature-based source sampling (multilingual mixing)
# ---------------------------------------------------------------------------

#: sampling temperature alpha: p_i ∝ share_i^alpha. 0.5 is the
#: classic multilingual-pretraining setting (upsamples the tail
#: without letting any head source dominate).
_TEMP_ALPHA = 0.5


@register(
    "source_temperature_sampling",
    oracle="""
    WITH per AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    ), tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM per),
    q AS (
        SELECT source, n_docs,
               CAST(round(sqrt(n_docs::DOUBLE / tot.n), 9)
                    AS DECIMAL(18,9)) AS pw
        FROM per CROSS JOIN tot
    ), z AS (SELECT sum(pw) AS zsum FROM q)
    SELECT q.source, q.n_docs,
           round(q.n_docs::DOUBLE / tot.n, 6) AS share,
           round(CAST(q.pw / z.zsum AS DOUBLE), 6) AS temp_share,
           round(CAST(q.pw / z.zsum AS DOUBLE) * tot.n / q.n_docs, 6)
               AS upsample_factor,
           CAST(ceil(CAST(q.pw / z.zsum AS DOUBLE) * tot.n / q.n_docs)
                AS BIGINT) AS epochs
    FROM q CROSS JOIN z CROSS JOIN tot
    """,
)
def source_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling plan (the multilingual-LLM
    mixing rule, public since mBERT/XLM-R): sampling probability
    p_i ∝ share_i^alpha with alpha=0.5, reported per source as the
    temperature share, the implied upsample factor p_i·N/n_i, and the
    integer epoch count a sharded data loader would materialize.
    Complements ``source_mixing_weights`` (uniform-equalization
    target) with the tunable-temperature family between uniform
    (alpha=0) and natural (alpha=1).

    Cross-engine float discipline: sqrt is IEEE correctly-rounded
    (identical on both engines); each sqrt is quantized to
    DECIMAL(18,9) BEFORE the normalizing sum, so the only float sum
    in the operator is exact decimal arithmetic — the same device as
    the bigram-LM ln quantization.

    Scale: one partial-aggregated shuffle on source; everything after
    runs on the source-cardinality table."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    w = Window.partitionBy(F.pmod(F.hash("source"), F.lit(1)))
    per = per.withColumn("n", F.sum("n_docs").over(w))
    # alpha = 0.5 exactly: pow -> sqrt (correctly rounded IEEE op)
    per = per.withColumn(
        "pw",
        F.round(F.sqrt(F.col("n_docs").cast("double") / F.col("n")), 9).cast(
            "decimal(18,9)"
        ),
    ).withColumn("zsum", F.sum("pw").over(w))
    ts = (F.col("pw") / F.col("zsum")).cast("double")
    up = ts * F.col("n") / F.col("n_docs")
    return per.select(
        "source",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("n"), 6).alias("share"),
        F.round(ts, 6).alias("temp_share"),
        F.round(up, 6).alias("upsample_factor"),
        F.ceil(up).cast("bigint").alias("epochs"),
    )


# ---------------------------------------------------------------------------
# DSIR-style importance-weighted data selection
# ---------------------------------------------------------------------------

#: hashed feature space for the unigram importance model; 512 buckets
#: keeps the weight table broadcast-sized at ANY corpus scale.
_DSIR_BUCKETS = 512
#: docs to select (top-k by importance weight).
_DSIR_TOPN = 100
#: the in-fixture "target domain": English docs stand in for the
#: curated target corpus DSIR reweights toward.
_DSIR_TARGET_LANG = "en"


@register(
    "dsir_importance_topk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5('dsir:' || lower(unnest({_ORACLE_TOKS}))),
                               1, 8))::BIGINT % {_DSIR_BUCKETS} AS bucket
        FROM documents
    ), raw AS (
        SELECT bucket, count(*) AS cr FROM tok GROUP BY bucket
    ), tgt AS (
        SELECT bucket, count(*) AS ct FROM tok
        WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY bucket
    ), totals AS (
        SELECT (SELECT count(*) FROM tok) AS r_tot,
               (SELECT count(*) FROM tok
                WHERE lang = '{_DSIR_TARGET_LANG}') AS t_tot
    ), lw AS (
        -- Laplace-smoothed log-likelihood ratio per hashed feature,
        -- ln quantized to DECIMAL(18,9) (the bigram-LM device)
        SELECT raw.bucket,
               CAST(round(
                   ln((coalesce(tgt.ct, 0) + 1)::DOUBLE
                      / (totals.t_tot + {_DSIR_BUCKETS}))
                   - ln((raw.cr + 1)::DOUBLE
                        / (totals.r_tot + {_DSIR_BUCKETS})), 9)
                    AS DECIMAL(18,9)) AS w
        FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN totals
    ), doc AS (
        SELECT t.doc_id, any_value(t.lang) AS lang,
               count(*) AS n_tok, sum(lw.w) AS s
        FROM tok t JOIN lw ON lw.bucket = t.bucket
        GROUP BY t.doc_id
    )
    SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tok,
           round(CAST(s AS DOUBLE), 6) AS dsir_logratio,
           CAST(row_number() OVER (ORDER BY s DESC, doc_id)
                AS BIGINT) AS rank
    FROM doc
    QUALIFY rank <= {_DSIR_TOPN}
    """,
)
def dsir_importance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling", public): score
    every raw document by the log importance ratio of a hashed
    unigram model between a target domain (here: the English slice,
    standing in for the curated target corpus) and the raw pool, and
    keep the top-k — the standard cheap way to steer a 100 TB crawl
    toward a target distribution without a neural scorer.

    Cross-engine float discipline: the ONLY transcendental (ln of the
    two smoothed probabilities) is rounded to 9 dp and cast to
    DECIMAL(18,9) per bucket before any summation, so per-document
    scores are exact decimal sums — the driver hash-checks the
    learned ranking, not a float approximation.

    Scale: the feature space is fixed at {n} buckets, so the weight
    table is broadcast-sized for ANY corpus; per-doc scoring is one
    equi-join of (doc, bucket, count) rows against that broadcast and
    one partial-aggregated sum — a single corpus-sized shuffle on
    doc_id. The top-k is orderBy+limit (TakeOrdered), never a global
    window."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", "lang", F.explode(tokens("text")).alias("t"))
        .select(
            "doc_id",
            "lang",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("dsir:"), F.lower("t"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint")
                % _DSIR_BUCKETS
            ).alias("bucket"),
        )
        .persist()
    )
    raw = tok.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (
        tok.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    totals = tok.agg(
        F.count(F.lit(1)).alias("r_tot"),
        F.sum(
            (F.col("lang") == _DSIR_TARGET_LANG).cast("bigint")
        ).alias("t_tot"),
    )
    lw = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                    / (F.col("t_tot") + _DSIR_BUCKETS)
                )
                - F.log(
                    (F.col("cr") + 1).cast("double")
                    / (F.col("r_tot") + _DSIR_BUCKETS)
                ),
                9,
            )
            .cast("decimal(18,9)")
            .alias("w"),
        )
    )
    doc = (
        tok.join(F.broadcast(lw), "bucket")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("w").alias("s"),
        )
    )
    top = doc.orderBy(F.col("s").desc(), "doc_id").limit(_DSIR_TOPN)
    w = bounded_window("doc_id", F.col("s").desc(), "doc_id")
    return top.select(
        "doc_id",
        "lang",
        F.col("n_tok").cast("bigint"),
        F.round(F.col("s").cast("double"), 6).alias("dsir_logratio"),
        F.row_number().over(w).cast("bigint").alias("rank"),
    )


dsir_importance_topk.__doc__ = dsir_importance_topk.__doc__.format(
    n=_DSIR_BUCKETS
)


# ---------------------------------------------------------------------------
# BPE tokenizer training: the full iterative merge loop
# ---------------------------------------------------------------------------

#: number of merges the in-engine trainer learns.
_BPE_N_MERGES = 4


def _bpe_oracle_chain() -> tuple[str, list[str]]:
    """(head + layer CTE text, per-merge final SELECTs) for the
    unrolled BPE chain — shared by the trainer oracle (reads the
    best_i rows) and the encoder oracle (reads words{N}). Symbol
    sequences ride a bracketed string encoding ('[t][h][e]') whose
    '[x][y]' -> '[xy]' replace is the leftmost-non-overlapping greedy
    merge on BOTH engines; every words_i carries the raw word w so
    the encoder can join the corpus back."""
    head = f"""
    WITH words0 AS (
        SELECT lower(tok) AS w,
               regexp_replace(lower(tok), '(.)', '[\\1]', 'g') AS s,
               count(*) AS n
        FROM (SELECT unnest({_ORACLE_TOKS}) AS tok FROM documents)
        WHERE regexp_full_match(lower(tok), '[a-z0-9]+')
        GROUP BY 1, 2
    ), idx AS (
        SELECT unnest(range(1, (SELECT max(length(s)) FROM words0)))::INT AS i
    )"""
    layers, finals = [], []
    for m in range(1, _BPE_N_MERGES + 1):
        prev = f"words{m - 1}"
        layers.append(f"""
    , sy{m} AS (
        SELECT str_split(substr(s, 2, length(s) - 2), '][') AS syms, n
        FROM {prev}
    ), pairs{m} AS (
        SELECT syms[i] AS lhs, syms[i + 1] AS rhs, sum(n) AS np
        FROM sy{m} CROSS JOIN idx
        WHERE i <= len(syms) - 1
        GROUP BY 1, 2
    ), best{m} AS (
        SELECT lhs, rhs, np FROM pairs{m}
        ORDER BY np DESC, lhs, rhs LIMIT 1
    ), words{m} AS (
        SELECT w, replace(s, '[' || b.lhs || '][' || b.rhs || ']',
                          '[' || b.lhs || b.rhs || ']') AS s, n
        FROM {prev} CROSS JOIN best{m} b
    )""")
        finals.append(
            f"SELECT CAST({m} AS BIGINT) AS rank, lhs, rhs,"
            f" lhs || rhs AS merged, CAST(np AS BIGINT) AS n_pair"
            f" FROM best{m}"
        )
    return head + "".join(layers), finals


def _bpe_train_oracle() -> str:
    """Unrolled CTE oracle for the iterative BPE trainer — the same
    layer-unrolling device as train_logreg_quality."""
    chain, finals = _bpe_oracle_chain()
    return chain + "\n" + "\nUNION ALL\n".join(finals)


@register("bpe_train_merges", oracle=_bpe_train_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine BPE tokenizer TRAINING (Sennrich et al. 2016,
    public): the full iterative merge loop, not just the first pair
    table — each round counts adjacent symbol pairs over the
    word-frequency table (weighted by corpus frequency), merges the
    argmax pair everywhere it occurs, and repeats on the shrunken
    symbol sequences. The driver hash-checks the LEARNED MERGE TABLE
    (rank, pair, merged symbol, count at merge time) — like the
    logistic-regression trainer, the artifact under test is the
    model, and the oracle unrolls every iteration as CTE layers.

    Symbol sequences are encoded as bracketed strings ('[t][h][e]'):
    the merge is then one ``replace('[x][y]' -> '[xy]')`` whose
    leftmost-non-overlapping greedy semantics are identical on both
    engines (and match real BPE's left-to-right application — e.g.
    'aaa' under merge (a,a) becomes 'aa'+'a'). Words are restricted
    to ``[a-z0-9]+`` so the bracket encoding is unambiguous — the
    pre-tokenizer normalization every BPE recipe applies anyway.

    Scale: every round's state is the WORD-FREQUENCY table (bounded
    by vocabulary, not corpus — the first aggregate is the only
    corpus-sized shuffle, persisted once); pair counts
    partial-combine into a charset^2-bounded exchange; the argmax is
    orderBy+limit (TakeOrdered) whose ONE row is collected and
    applied as a literal merge — no global window, O(merges) rounds
    of vocabulary-sized work, one bounded 1-row collect per round."""
    merges, _ = _bpe_chain(spark, sf_dir)
    out = merges[0]
    for mdf in merges[1:]:
        out = out.unionAll(mdf)
    return out


def _bpe_chain(spark: SparkSession, sf_dir: str):
    """(per-merge best-pair DataFrames, final merged word table) —
    the shared train chain, consumed by the trainer (merge table) and
    the encoder (applies the final symbol strings to the corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .select(F.lower("tok").alias("w"))
        .filter(F.col("w").rlike("^[a-z0-9]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("w", F.regexp_replace("w", "(.)", "[$1]").alias("s"), "n")
    )
    # The word-frequency table is vocabulary-bounded (the corpus-sized
    # aggregate above is the only big shuffle) and every round scans
    # it — persist once so round m does not re-run the corpus
    # tokenize+aggregate m times. Each round's argmax is ONE row by
    # construction (LIMIT 1): collect it and apply the merge as a
    # LITERAL replace. The former fully-lazy chain re-inlined the
    # whole preceding lineage into every round's plan (82 Exchange
    # nodes for 4 merges, the corpus aggregate replanned per round —
    # round-13 optimization, guide §1.2); a one-row collect per round
    # is bounded driver work, and the learned merge table values are
    # identical (same TakeOrdered argmax, same replace semantics with
    # the collected literals).
    from pyspark.storagelevel import StorageLevel

    words = words.persist(StorageLevel.MEMORY_AND_DISK)
    pin_frame(words, "bpe_words", max_n=3)
    merge_rows: list[tuple] = []
    cur = words
    for m in range(1, _BPE_N_MERGES + 1):
        syms = F.split(F.expr("substr(s, 2, length(s) - 2)"), r"\]\[")
        with_syms = cur.select("n", syms.alias("syms"))
        i_seq = F.when(
            F.size("syms") >= 2, F.sequence(F.lit(1), F.size("syms") - 1)
        ).otherwise(F.array().cast("array<int>"))
        pairs = (
            with_syms.select("n", "syms", F.explode(i_seq).alias("i"))
            .select(
                "n",
                F.element_at("syms", F.col("i")).alias("lhs"),
                F.element_at("syms", F.col("i") + 1).alias("rhs"),
            )
            .groupBy("lhs", "rhs")
            .agg(F.sum("n").alias("np"))
        )
        best = (
            pairs.orderBy(F.col("np").desc(), "lhs", "rhs").limit(1).collect()
        )
        if not best:
            # no adjacent pairs anywhere: the former crossJoin with an
            # empty best emptied the word table (and every later
            # round) — mirror that exactly
            cur = cur.where(F.lit(False))
            continue
        lhs, rhs, np = best[0]["lhs"], best[0]["rhs"], best[0]["np"]
        merge_rows.append((m, lhs, rhs, lhs + rhs, np))
        cur = cur.select(
            "w",
            F.replace(
                F.col("s"),
                F.lit(f"[{lhs}][{rhs}]"),
                F.lit(f"[{lhs}{rhs}]"),
            ).alias("s"),
            "n",
        )
    merged_table = spark.createDataFrame(
        merge_rows,
        "rank bigint, lhs string, rhs string, merged string, n_pair bigint",
    )
    return [merged_table], cur


# ---------------------------------------------------------------------------
# Token-budget waterfilling across sources
# ---------------------------------------------------------------------------

#: fraction of the corpus token total to allocate.
_WF_BUDGET_FRAC = 0.5


@register(
    "token_budget_waterfill",
    oracle=f"""
    WITH per AS (
        SELECT source,
               CAST(coalesce(sum(len({_ORACLE_TOKS})), 0) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS s,
               CAST(floor({_WF_BUDGET_FRAC} * sum(n_tokens)) AS BIGINT)
                   AS budget
        FROM per
    ), ranked AS (
        SELECT source, n_tokens,
               row_number() OVER (ORDER BY n_tokens, source) AS rk,
               sum(n_tokens) OVER (ORDER BY n_tokens, source
                                   ROWS UNBOUNDED PRECEDING) AS pref
        FROM per
    ), lvl AS (
        -- water level: smallest rk whose level (budget - smaller
        -- sources all taken in full, split over the rest) fits
        -- under the next source size; exact rational arithmetic
        SELECT min(r.rk) AS k
        FROM ranked r CROSS JOIN tot
        WHERE (tot.budget - (r.pref - r.n_tokens))
              <= (tot.s - r.rk + 1) * r.n_tokens
    ), level AS (
        SELECT CAST(tot.budget - (r.pref - r.n_tokens) AS DECIMAL(28,6))
                   / (tot.s - lvl.k + 1) AS t_level
        FROM ranked r CROSS JOIN tot CROSS JOIN lvl
        WHERE r.rk = lvl.k
    )
    SELECT r.source, r.n_tokens,
           CAST(CASE WHEN r.rk < lvl.k THEN r.n_tokens
                     ELSE floor(level.t_level) END AS BIGINT) AS alloc_tokens,
           CASE WHEN r.rk < lvl.k THEN 1 ELSE 0 END AS exhausted,
           round(CAST(level.t_level AS DOUBLE), 6) AS fill_level
    FROM ranked r CROSS JOIN lvl CROSS JOIN level
    """,
)
def token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget WATERFILLING across sources: allocate a fixed
    budget (here 50% of total corpus tokens) by filling every source
    up to a common water level t — small sources are taken in full
    (exhausted=1), large ones are capped at t — the standard
    allocation rule when a pretraining mix must hit an exact token
    count without over-draining any single domain. The level has the
    closed form t = (B - sum_exhausted) / n_remaining at the unique
    pivot rank, found here with exact integer comparisons (no search
    loop) and one DECIMAL division.

    Scale: one partial-aggregated shuffle on source; ranking, prefix
    sums and the pivot scan run on the source-cardinality table
    (unpartitioned window over #sources rows, the same bounded-
    relation argument as source_mixing_weights)."""
    docs = load_table(spark, sf_dir, "documents")
    t_df = docs.select("doc_id", "source", tokens("text").alias("tk"))
    per = t_df.groupBy("source").agg(
        F.coalesce(F.sum(F.size("tk")), F.lit(0))
        .cast("bigint")
        .alias("n_tokens")
    )
    w = Window.partitionBy(F.pmod(F.hash("source"), F.lit(1)))
    per = (
        per.withColumn("t", F.sum("n_tokens").over(w))
        .withColumn("s", F.count(F.lit(1)).over(w))
        .withColumn(
            "budget",
            F.floor(F.lit(_WF_BUDGET_FRAC) * F.col("t")).cast("bigint"),
        )
    )
    from pyspark.storagelevel import StorageLevel

    ow = bounded_window("source", "n_tokens", "source")
    # ranked is referenced three times below (pivot scan, level join,
    # final projection) — without materialization each reference
    # re-runs the corpus-sized tokenize+aggregate inside one action
    # (round-13 optimization, guide §2.4). Source-cardinality frame:
    # persisting it is a few rows.
    ranked = (
        per.withColumn("rk", F.row_number().over(ow))
        .withColumn(
            "pref",
            F.sum("n_tokens").over(
                ow.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pin_frame(ranked, "waterfill_ranked", max_n=3)
    fits = (
        F.col("budget") - (F.col("pref") - F.col("n_tokens"))
    ) <= (F.col("s") - F.col("rk") + 1) * F.col("n_tokens")
    lvl = (
        ranked.filter(fits)
        .agg(F.min("rk").alias("k"))
    )
    level = (
        ranked.join(F.broadcast(lvl), ranked.rk == F.col("k"))
        .select(
            (
                (F.col("budget") - (F.col("pref") - F.col("n_tokens")))
                .cast("decimal(28,6)")
                / (F.col("s") - F.col("k") + 1)
            ).alias("t_level"),
            "k",
        )
    )
    return ranked.crossJoin(F.broadcast(level)).select(
        "source",
        "n_tokens",
        F.when(F.col("rk") < F.col("k"), F.col("n_tokens"))
        .otherwise(F.floor(F.col("t_level")))
        .cast("bigint")
        .alias("alloc_tokens"),
        F.when(F.col("rk") < F.col("k"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("exhausted"),
        F.round(F.col("t_level").cast("double"), 6).alias("fill_level"),
    )


# ---------------------------------------------------------------------------
# Classifier calibration (reliability diagram over the served model)
# ---------------------------------------------------------------------------


def _calibration_oracle() -> str:
    """Reliability bins over the served scores — nests the same
    unrolled training layers as predict, one more grouping pass."""
    layers, final = _logreg_layers()
    return f"""
    WITH {", ".join(layers)}, scored AS (
        SELECT round(1.0 / (1.0 + exp(-({final}.a * f.x0 + {final}.b * f.x1
                                       + {final}.c * f.x2
                                       + {final}.d * f.x3))), 6) AS score,
               f.y = 1.0 AS label
        FROM f CROSS JOIN {final}
    )
    SELECT CAST(least(99, floor(score * 100)) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(score AS DECIMAL(12,6))) AS DOUBLE)
                 / count(*), 6) AS mean_score,
           round(sum(CASE WHEN label THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS obs_rate,
           round(round(CAST(sum(CAST(score AS DECIMAL(12,6))) AS DOUBLE)
                       / count(*), 6)
                 - round(sum(CASE WHEN label THEN 1 ELSE 0 END)::DOUBLE
                         / count(*), 6), 6) AS gap
    FROM scored GROUP BY 1
    """


@register("logreg_calibration_bins", oracle=_calibration_oracle())
def logreg_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the in-engine-trained classifier:
    centile-bin the served scores (fixed-width map-only bins —
    rank-based equal-mass bins would need a global sort; fixed width
    stays scale-safe and the occupied-bin count adapts to the score
    spread) and compare mean predicted
    probability against the observed positive rate per bin — the
    calibration audit a production quality-filter runs before its
    threshold is trusted (an uncalibrated filter silently shifts the
    kept-data distribution). Composes the registered trainer +
    inference (same device as perplexity_bucket_filter nesting the
    bigram LM): the oracle nests the unrolled-GD layers, so the
    driver hash-checks training -> scoring -> binning as one
    contract.

    Scale: map-only scoring (4 broadcast weights) followed by one
    <=100-group partial-combined aggregate; exact DECIMAL sums of the
    6-dp scores, int-ratio observed rates, gap computed from the two
    already-rounded values so no float path diverges."""
    pred = predict_logreg_quality(spark, sf_dir)
    b = F.least(F.lit(99), F.floor(F.col("score") * 100)).cast("bigint")
    g = (
        pred.select(
            b.alias("bin"),
            F.col("score").cast("decimal(12,6)").alias("sd"),
            F.col("label").cast("int").alias("li"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("sd").cast("double") / F.count(F.lit(1)), 6).alias(
                "mean_score"
            ),
            F.round(
                F.sum("li").cast("double") / F.count(F.lit(1)), 6
            ).alias("obs_rate"),
        )
    )
    return g.select(
        "bin",
        "n",
        "mean_score",
        "obs_rate",
        F.round(F.col("mean_score") - F.col("obs_rate"), 6).alias("gap"),
    )


def _bpe_encode_oracle() -> str:
    chain, _ = _bpe_oracle_chain()
    return f"""{chain}
    , vocab AS (
        SELECT w,
               len(str_split(substr(s, 2, length(s) - 2), '][')) AS n_sym,
               length(w) AS n_chr
        FROM words{_BPE_N_MERGES}
    ), dtok AS (
        SELECT doc_id, lower(unnest({_ORACLE_TOKS})) AS w FROM documents
    ), scored AS (
        SELECT d.doc_id,
               CASE WHEN v.w IS NULL THEN 0 ELSE 1 END AS elig,
               coalesce(v.n_sym, 0) AS n_sym,
               coalesce(v.n_chr, 0) AS n_chr
        FROM dtok d LEFT JOIN vocab v USING (w)
    )
    SELECT doc_id,
           CAST(sum(elig) AS BIGINT) AS n_words,
           CAST(sum(1 - elig) AS BIGINT) AS n_skipped,
           CAST(sum(n_chr) AS BIGINT) AS n_char_tokens,
           CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,
           round(CASE WHEN sum(n_sym) = 0 THEN 0.0
                      ELSE sum(n_chr)::DOUBLE / sum(n_sym) END, 6)
               AS compression
    FROM scored GROUP BY doc_id
    """


@register("bpe_encode_corpus", oracle=_bpe_encode_oracle())
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the in-engine-trained BPE merges to the corpus — the
    train -> tokenize composition (the same two-operator contract as
    train_logreg_quality -> predict_logreg_quality): per document,
    the token count under the learned segmentation next to the
    character-level baseline and the compression ratio the merges
    buy. This is the number a tokenizer-budget planner actually needs
    (tokens-per-doc under the CURRENT tokenizer draft), and the
    oracle nests the full unrolled training chain, so training and
    application are hash-checked as one contract.

    Scale: the merged vocabulary is vocabulary-bounded state (the
    word table), applied to the corpus by ONE equi-join of exploded
    doc tokens against it — no per-document merge loop; out-of-
    alphabet tokens are counted, not dropped silently."""
    _, final_words = _bpe_chain(spark, sf_dir)
    core = F.expr("substr(s, 2, length(s) - 2)")
    vocab = final_words.select(
        "w",
        F.size(F.split(core, r"\]\[")).alias("n_sym"),
        F.length("w").alias("n_chr"),
    )
    docs = load_table(spark, sf_dir, "documents")
    dtok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("t")
    ).select("doc_id", F.lower("t").alias("w"))
    scored = dtok.join(vocab, "w", "left").select(
        "doc_id",
        F.when(F.col("n_sym").isNull(), 0).otherwise(1).alias("elig"),
        F.coalesce("n_sym", F.lit(0)).alias("n_sym"),
        F.coalesce("n_chr", F.lit(0)).alias("n_chr"),
    )
    g = scored.groupBy("doc_id").agg(
        F.sum("elig").cast("bigint").alias("n_words"),
        F.sum(1 - F.col("elig")).cast("bigint").alias("n_skipped"),
        F.sum("n_chr").cast("bigint").alias("n_char_tokens"),
        F.sum("n_sym").cast("bigint").alias("n_bpe_tokens"),
    )
    return g.select(
        "doc_id",
        "n_words",
        "n_skipped",
        "n_char_tokens",
        "n_bpe_tokens",
        F.round(
            F.when(F.col("n_bpe_tokens") == 0, F.lit(0.0)).otherwise(
                F.col("n_char_tokens").cast("double") / F.col("n_bpe_tokens")
            ),
            6,
        ).alias("compression"),
    )


# ---------------------------------------------------------------------------
# Per-source curation report (the dashboard a data team actually ships)
# ---------------------------------------------------------------------------


def _curation_report_oracle() -> str:
    # imported for their registration side effects: curation may load
    # before these modules in registry.load_all, and this oracle
    # composes their registered SQL
    from text_grabr_orc_spark.operators import dedup  # noqa: F401
    from text_grabr_orc_spark.operators import text_analysis  # noqa: F401
    from text_grabr_orc_spark.registry import ORACLES

    return f"""
    WITH mix AS ({ORACLES["source_mixing_weights"]}),
    wf AS ({ORACLES["token_budget_waterfill"]}),
    ts AS ({ORACLES["source_temperature_sampling"]}),
    q AS ({ORACLES["text_quality_scores"]}),
    mh AS ({ORACLES["dedup_minhash_lsh"]}),
    qa AS (
        SELECT source,
               round(CAST(sum(CAST(quality_score AS DECIMAL(12,6)))
                          AS DOUBLE) / count(*), 6) AS mean_quality
        FROM q GROUP BY source
    ), dup_docs AS (
        SELECT DISTINCT d FROM (
            SELECT doc_a AS d FROM mh UNION SELECT doc_b FROM mh
        )
    ), dup AS (
        SELECT doc.source, count(*) AS n_dup_docs
        FROM dup_docs JOIN documents doc ON doc.doc_id = dup_docs.d
        GROUP BY doc.source
    )
    SELECT mix.source, mix.n_docs, mix.n_tokens, mix.token_share,
           ts.temp_share, ts.epochs,
           wf.alloc_tokens, wf.exhausted,
           qa.mean_quality,
           CAST(coalesce(dup.n_dup_docs, 0) AS BIGINT) AS n_neardup_docs,
           round(coalesce(dup.n_dup_docs, 0)::DOUBLE / mix.n_docs, 6)
               AS neardup_rate
    FROM mix
    JOIN wf USING (source)
    JOIN ts USING (source)
    JOIN qa USING (source)
    LEFT JOIN dup USING (source)
    """


@register("corpus_curation_report", oracle=_curation_report_oracle())
def corpus_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source CURATION DASHBOARD — one row per source joining
    five registered operators: natural token share and equalization
    weight (mixing), the temperature-sampling plan (epochs), the
    waterfilled token allocation under the 50% budget, mean quality,
    and the near-duplicate exposure (fraction of docs appearing in
    any MinHash pair). This is the artifact a data team reviews
    before a pretraining run; the whole thing is hash-checked because
    every input is an already-proven operator and the report adds
    only joins on the source key and exact ratios.

    Scale: every input is source-cardinality (or pair-bounded for the
    dup set); the report itself is broadcast joins on a tiny key."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    mix = source_mixing_weights(spark, sf_dir)
    wf = token_budget_waterfill(spark, sf_dir).select(
        "source", "alloc_tokens", "exhausted"
    )
    ts = source_temperature_sampling(spark, sf_dir).select(
        "source", "temp_share", "epochs"
    )
    from text_grabr_orc_spark.operators.text_analysis import (
        quality_scores_cached,
    )

    qa = (
        quality_scores_cached(spark, sf_dir)
        .select("source", F.col("quality_score").cast("decimal(12,6)").alias("qd"))
        .groupBy("source")
        .agg(
            F.round(
                F.sum("qd").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_quality")
        )
    )
    from text_grabr_orc_spark.operators.dedup import minhash_pairs_cached

    mh = minhash_pairs_cached(spark, sf_dir)
    dup_docs = (
        mh.select(F.col("doc_a").alias("d"))
        .union(mh.select(F.col("doc_b").alias("d")))
        .distinct()
    )
    dup = (
        dup_docs.join(docs, dup_docs.d == docs.doc_id)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_dup_docs"))
    )
    return (
        mix.join(wf, "source")
        .join(ts, "source")
        .join(qa, "source")
        .join(dup, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "token_share",
            "temp_share",
            "epochs",
            "alloc_tokens",
            "exhausted",
            "mean_quality",
            F.coalesce("n_dup_docs", F.lit(0))
            .cast("bigint")
            .alias("n_neardup_docs"),
            F.round(
                F.coalesce("n_dup_docs", F.lit(0)).cast("double")
                / F.col("n_docs"),
                6,
            ).alias("neardup_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Negative-sampling table (unigram^0.75) for embedding training
# ---------------------------------------------------------------------------

#: vocabulary head carried in the table.
_NEG_TOP = 200


@register(
    "unigram_sampling_table",
    oracle=f"""
    WITH tok AS (
        SELECT lower(unnest({_ORACLE_TOKS})) AS t FROM documents
    ), cnt AS (
        SELECT t, count(*) AS n FROM tok GROUP BY t
        ORDER BY n DESC, t LIMIT {_NEG_TOP}
    ), pw AS (
        -- n^0.75 = sqrt(n * sqrt(n)): two correctly-rounded IEEE
        -- sqrts and one multiply — bit-identical on both engines,
        -- no pow()/exp() in sight — then quantized before the sum
        SELECT t, n,
               CAST(round(sqrt(n * sqrt(n::DOUBLE)), 9) AS DECIMAL(18,9))
                   AS w
        FROM cnt
    ), z AS (SELECT sum(w) AS zsum FROM pw)
    SELECT pw.t AS token, CAST(pw.n AS BIGINT) AS n,
           round(CAST(pw.w / z.zsum AS DOUBLE), 6) AS p_neg,
           round(CAST(sum(pw.w) OVER (ORDER BY pw.n DESC, pw.t
                                      ROWS UNBOUNDED PRECEDING)
                      / z.zsum AS DOUBLE), 6) AS cum_p
    FROM pw CROSS JOIN z
    """,
)
def unigram_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The word2vec negative-sampling table (Mikolov et al. 2013,
    public): sampling probability proportional to count^0.75 over the
    vocabulary head, with the cumulative column a trainer's binary
    search consumes. The 3/4 power is THE standard smoothing between
    natural unigram (head-dominated) and uniform (tail-dominated)
    negative draws.

    Portability trick worth naming: n^0.75 is computed as
    sqrt(n * sqrt(n)) — two correctly-rounded IEEE sqrts and one
    multiplication, bit-identical across engines, where a pow() call
    would be at the mercy of each engine's libm; the result is then
    quantized to DECIMAL(18,9) before the normalizing sum, so the
    whole table is exact decimal arithmetic (same device as the
    temperature-sampling operator's sqrt).

    Scale: one token-keyed partial-combined count, a {top}-row
    TakeOrdered head, and window arithmetic on that head only."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(tokens("text")).alias("t0"))
        .select(F.lower("t0").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "t")
        .limit(_NEG_TOP)
    )
    pw = cnt.select(
        "t",
        "n",
        F.round(
            F.sqrt(F.col("n") * F.sqrt(F.col("n").cast("double"))), 9
        )
        .cast("decimal(18,9)")
        .alias("w"),
    )
    wz = Window.partitionBy(F.pmod(F.hash("t"), F.lit(1)))
    wc = bounded_window("t", F.col("n").desc(), "t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        pw.withColumn("zsum", F.sum("w").over(wz))
        .select(
            F.col("t").alias("token"),
            F.col("n").cast("bigint"),
            F.round((F.col("w") / F.col("zsum")).cast("double"), 6).alias(
                "p_neg"
            ),
            F.round(
                (F.sum("w").over(wc) / F.col("zsum")).cast("double"), 6
            ).alias("cum_p"),
        )
    )


unigram_sampling_table.__doc__ = unigram_sampling_table.__doc__.format(
    top=_NEG_TOP
)


# ---------------------------------------------------------------------------
# Shard manifest with order-independent integrity checksums
# ---------------------------------------------------------------------------


@register(
    "shard_export_manifest",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               ('0x' || substr(md5('shuf:' || doc_id::VARCHAR), 1, 8))::BIGINT
                   % {_N_SHARDS} AS shard_id,
               ('0x' || substr(md5('ck:' || doc_id::VARCHAR), 1, 8))::BIGINT
                   AS ck,
               len({_ORACLE_TOKS}) AS n_tok,
               n_chars
        FROM documents
    )
    SELECT CAST(shard_id AS BIGINT) AS shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS n_chars,
           CAST(sum(ck) % 4294967296 AS BIGINT) AS id_checksum
    FROM t GROUP BY shard_id
    """,
)
def shard_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export MANIFEST for the training shards: per shard (the same
    deterministic hash assignment as ``global_shuffle_order``), doc
    and token totals plus an ORDER-INDEPENDENT id checksum (sum of
    per-id md5 slices mod 2^32) — the artifact a downstream trainer
    verifies before reading a single shard byte, and the one that
    catches a partial re-export or a dropped partition (counts alone
    miss a swap; the checksum doesn't). Order independence matters
    because shard writers emit rows in partition order, which is not
    reproducible — a running hash would be; a commutative sum is.

    Scale: map-only tag + checksum projection, one
    {n}-group partial-combined aggregate — the cheapest possible
    full-corpus pass, and the same shape however many output shards
    the real export uses."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % _N_SHARDS
        ).alias("shard_id"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ck:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("ck"),
        F.size(tokens("text")).alias("n_tok"),
        "n_chars",
    )
    return t.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.coalesce(F.sum("n_tok"), F.lit(0)).cast("bigint").alias("n_tokens"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("bigint").alias("n_chars"),
        # DECIMAL(38,0) accumulator: BIGINT would wrap past ~2^31 rows
        # per shard where the oracle's HUGEINT sum stays exact
        (F.sum(F.col("ck").cast("decimal(38,0)")) % F.lit(4294967296))
        .cast("bigint")
        .alias("id_checksum"),
    ).select(
        F.col("shard_id").cast("bigint"),
        "n_docs",
        "n_tokens",
        "n_chars",
        "id_checksum",
    )


shard_export_manifest.__doc__ = shard_export_manifest.__doc__.format(
    n=_N_SHARDS
)


# ---------------------------------------------------------------------------
# Interleaved source order (curriculum without a global sort)
# ---------------------------------------------------------------------------


@register(
    "interleave_sources_order",
    oracle="""
    WITH r AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('il:' || doc_id::VARCHAR), doc_id
               ) AS rk
        FROM documents
    ), c AS (
        SELECT source, count(*) AS n FROM documents GROUP BY source
    )
    SELECT r.doc_id, r.source, CAST(r.rk AS BIGINT) AS within_rank,
           CAST(sum(least(r.rk - 1, c.n)
                    + CASE WHEN c.source < r.source AND c.n >= r.rk
                           THEN 1 ELSE 0 END) AS BIGINT) AS global_pos
    FROM r CROSS JOIN c
    GROUP BY r.doc_id, r.source, r.rk
    """,
)
def interleave_sources_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic TRAINING ORDER with round-robin source
    interleaving — one doc from each source, then the next from each,
    hash-shuffled within source — the curriculum layout that stops a
    data loader from feeding an hour of one domain (the known
    loss-spike recipe), while staying reproducible across runs.

    The point is the PHYSICAL shape: the global position has a CLOSED
    FORM — pos(d) = sum over sources s' of min(rank(d)-1, n_s') plus
    the earlier-ordered sources still alive at rank(d) — so the total
    order needs NO global sort and NO prefix sum: a source-partitioned
    rank window plus a join against the broadcast source-counts table
    (sources are bounded; the join fan-out is #sources per doc).
    Compare ``global_shuffle_order`` (shard-local positions) and
    ``pack_training_sequences`` (two-pass prefix sum): this is the
    third ordering device, and the only one that yields a TOTAL
    cross-corpus order map-side.

    Pure integer arithmetic end to end — the whole permutation is
    hash-checked."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("il:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    r = docs.select("doc_id", "source").withColumn(
        "rk", F.row_number().over(w)
    )
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).select(
        F.col("source").alias("src2"), "n"
    )
    contrib = F.least(F.col("rk") - 1, F.col("n")) + F.when(
        (F.col("src2") < F.col("source")) & (F.col("n") >= F.col("rk")), 1
    ).otherwise(0)
    return (
        r.crossJoin(F.broadcast(c))
        .groupBy("doc_id", "source", "rk")
        .agg(F.sum(contrib).cast("bigint").alias("global_pos"))
        .select(
            "doc_id",
            "source",
            F.col("rk").cast("bigint").alias("within_rank"),
            "global_pos",
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary OOV coverage by source
# ---------------------------------------------------------------------------


def _oov_oracle() -> str:
    from text_grabr_orc_spark.registry import ORACLES

    vocab = ORACLES["vocab_top_tokens"]
    return f"""
    WITH vocab AS (
        SELECT token FROM ({vocab})
    ), tok AS (
        SELECT d.source, lower(t.tok) AS token
        FROM documents d, unnest({_ORACLE_TOKS}) AS t(tok)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           round(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS oov_rate
    FROM tok LEFT JOIN vocab v USING (token)
    GROUP BY source
    """


@register("vocab_oov_rate_by_source", oracle=_oov_oracle())
def vocab_oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage audit: per source, the fraction of token
    occurrences OUTSIDE the induced top-{k} vocabulary
    (``vocab_top_tokens`` — the oracle nests its SQL, so vocabulary
    and audit can never drift). A source with an outlying OOV rate is
    either a different register/language than the vocabulary was
    induced from or noise — the standard pre-tokenizer check before
    committing a vocab size, and the per-source twin of the
    compression-ratio report.

    Scale: the vocabulary is broadcast (k rows); the corpus pass is
    one explode + broadcast left-join + per-source aggregate with
    map-side combine — no corpus-sized shuffle. The OOV flag is a
    null-check on the join, so the hot path stays whole-stage
    codegen."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = F.broadcast(
        vocab_top_tokens(spark, sf_dir).select("token", F.lit(1).alias("iv"))
    )
    tok = docs.select(
        "source", F.explode(tokens("text")).alias("tok")
    ).select("source", F.lower("tok").alias("token"))
    return (
        tok.join(vocab, "token", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("iv").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
            F.round(
                F.sum(F.when(F.col("iv").isNull(), 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("oov_rate"),
        )
    )


vocab_oov_rate_by_source.__doc__ = vocab_oov_rate_by_source.__doc__.format(
    k=_VOCAB_K
)


# ---------------------------------------------------------------------------
# Canary-string decontamination (exact substring scan)
# ---------------------------------------------------------------------------

_CANARY_LEN = 16  # snippet chars; fixture-sized so planted dups hit


@register(
    "decontaminate_canary",
    oracle=f"""
    WITH b AS (
        SELECT doc_id AS bench_id, substring(text, 1, {_CANARY_LEN}) AS snip
        FROM documents WHERE doc_id % {_DECON_MOD} = 0
    ), c AS (
        SELECT doc_id, text FROM documents WHERE doc_id % {_DECON_MOD} <> 0
    )
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_canaries,
           CAST(min(b.bench_id) AS BIGINT) AS first_bench_id
    FROM c JOIN b ON position(b.snip IN c.text) > 0
    GROUP BY c.doc_id
    """,
)
def decontaminate_canary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canary decontamination: flag corpus documents containing an
    EXACT benchmark snippet as a raw substring — the third
    decontamination mechanism next to token n-gram overlap
    (``decontaminate_ngram_overlap``) and embedding similarity
    (``decontaminate_semantic``), and the one that catches
    canary-GUID-style markers (the BIG-bench device) and verbatim
    quotes that token alignment or paraphrase detection can miss.
    Snippets are the first {n} characters of each held-out benchmark
    doc (same % {mod} slice as the other two checks, so all three
    audit the same eval set).

    Scale: the snippet set is broadcast and the scan is one map-only
    corpus pass (contains() per snippet stays whole-stage codegen);
    with a canary set too large to loop per row, the same contract
    runs as an Aho-Corasick automaton in a mapInPandas stage — the
    broadcast-probe shape is unchanged. Substring match uses
    ``instr`` on raw text, identical semantics to the oracle's
    ``position(snip IN text)``."""
    docs = load_table(spark, sf_dir, "documents")
    bench = F.broadcast(
        docs.filter(F.col("doc_id") % _DECON_MOD == 0).select(
            F.col("doc_id").alias("bench_id"),
            F.substring("text", 1, _CANARY_LEN).alias("snip"),
        )
    )
    corp = docs.filter(F.col("doc_id") % _DECON_MOD != 0).select(
        "doc_id", "text"
    )
    return (
        corp.join(bench, F.instr(F.col("text"), F.col("snip")) > 0)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_canaries"),
            F.min("bench_id").cast("bigint").alias("first_bench_id"),
        )
    )


decontaminate_canary.__doc__ = decontaminate_canary.__doc__.format(
    n=_CANARY_LEN, mod=_DECON_MOD
)


# ---------------------------------------------------------------------------
# Tokenizer fertility by language
# ---------------------------------------------------------------------------


def _fertility_oracle() -> str:
    chain, _ = _bpe_oracle_chain()
    return f"""{chain}
    , vocab AS (
        SELECT w,
               len(str_split(substr(s, 2, length(s) - 2), '][')) AS n_sym
        FROM words{_BPE_N_MERGES}
    ), dtok AS (
        SELECT d.lang, lower(t.w) AS w
        FROM documents d, unnest({_ORACLE_TOKS}) AS t(w)
    ), scored AS (
        SELECT d.lang,
               CASE WHEN v.w IS NULL THEN 0 ELSE 1 END AS elig,
               coalesce(v.n_sym, 0) AS n_sym
        FROM dtok d LEFT JOIN vocab v USING (w)
    )
    SELECT lang,
           CAST(sum(elig) AS BIGINT) AS n_words,
           CAST(sum(1 - elig) AS BIGINT) AS n_oov_words,
           CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,
           round(CASE WHEN sum(elig) = 0 THEN 0.0
                      ELSE sum(n_sym)::DOUBLE / sum(elig) END, 6)
               AS fertility
    FROM scored GROUP BY lang
    """


@register("tokenizer_fertility_by_lang", oracle=_fertility_oracle())
def tokenizer_fertility_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer FERTILITY audit: BPE tokens emitted per in-alphabet
    word, by language — the standard multilingual-tokenizer fairness
    number (a language with outlying fertility pays more context
    budget per sentence and trains on fewer effective documents; the
    reason multilingual vocabularies are rebalanced before a run).
    Uses the in-engine-trained merges (``bpe_train_merges``), so the
    audited tokenizer is the shipped draft; the oracle nests the full
    unrolled training chain and the per-language aggregation in one
    hash-checked contract. Out-of-alphabet words are counted
    separately (n_oov_words), never silently dropped.

    Scale: identical shape to ``bpe_encode_corpus`` — the learned
    vocabulary is vocabulary-bounded state applied by ONE equi-join
    of exploded (lang, token) rows; the final aggregate has #langs
    groups with map-side combine."""
    _, final_words = _bpe_chain(spark, sf_dir)
    core = F.expr("substr(s, 2, length(s) - 2)")
    vocab = final_words.select(
        "w", F.size(F.split(core, r"\]\[")).alias("n_sym")
    )
    docs = load_table(spark, sf_dir, "documents")
    dtok = docs.select(
        "lang", F.explode(tokens("text")).alias("t")
    ).select("lang", F.lower("t").alias("w"))
    scored = dtok.join(vocab, "w", "left").select(
        "lang",
        F.when(F.col("n_sym").isNull(), 0).otherwise(1).alias("elig"),
        F.coalesce("n_sym", F.lit(0)).alias("n_sym"),
    )
    g = scored.groupBy("lang").agg(
        F.sum("elig").cast("bigint").alias("n_words"),
        F.sum(1 - F.col("elig")).cast("bigint").alias("n_oov_words"),
        F.sum("n_sym").cast("bigint").alias("n_bpe_tokens"),
    )
    return g.select(
        "lang",
        "n_words",
        "n_oov_words",
        "n_bpe_tokens",
        F.round(
            F.when(F.col("n_words") == 0, F.lit(0.0)).otherwise(
                F.col("n_bpe_tokens").cast("double") / F.col("n_words")
            ),
            6,
        ).alias("fertility"),
    )


def _canary_oracle_sql() -> str:
    return f"""
    WITH b AS (
        SELECT doc_id AS bench_id, substring(text, 1, {_CANARY_LEN}) AS snip
        FROM documents WHERE doc_id % {_DECON_MOD} = 0
    ), c AS (
        SELECT doc_id, text FROM documents WHERE doc_id % {_DECON_MOD} <> 0
    )
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_canaries,
           CAST(min(b.bench_id) AS BIGINT) AS first_bench_id
    FROM c JOIN b ON position(b.snip IN c.text) > 0
    GROUP BY c.doc_id
    """


@register("decontaminate_canary_ac", oracle=_canary_oracle_sql())
def decontaminate_canary_ac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AT-SCALE variant of ``decontaminate_canary``: the same
    contract (same oracle SQL — the two registered queries must
    hash-match each other), computed with an Aho-Corasick automaton
    in an Arrow-batched ``mapInPandas`` stage instead of one
    contains() predicate per snippet. Per-snippet scanning is
    O(|text| x #snippets); the automaton is O(|text| + matches)
    regardless of canary-set size — the shape that survives a
    million-entry canary list against 100 TB. The automaton is built
    ONCE per worker from the broadcast snippet list (goto/fail/output
    tables, Aho & Corasick 1975) and amortized across Arrow batches;
    dedup of multiple hits of the same snippet inside one document
    happens in the automaton's per-doc output set, and the per-doc
    aggregate (count + min bench id) stays in Spark so the Python
    stage emits one row per (doc, matched snippet)."""
    import pandas as pd  # noqa: F401 (worker-side)

    docs = load_table(spark, sf_dir, "documents")
    bench = (
        docs.filter(F.col("doc_id") % _DECON_MOD == 0)
        .select(
            F.col("doc_id").alias("bench_id"),
            F.substring("text", 1, _CANARY_LEN).alias("snip"),
        )
        .collect()  # canary sets are tiny by construction; broadcast
    )
    patterns = [(int(r["bench_id"]), r["snip"]) for r in bench]
    bc = spark.sparkContext.broadcast(patterns)

    def scan(batches):
        import pandas as pd

        # build the automaton once per worker task
        goto: list[dict] = [{}]
        out: list[set] = [set()]
        for pid, (bid, pat) in enumerate(bc.value):
            s = 0
            for ch in pat:
                nxt = goto[s].get(ch)
                if nxt is None:
                    goto.append({})
                    out.append(set())
                    nxt = len(goto) - 1
                    goto[s][ch] = nxt
                s = nxt
            out[s].add(bid)
        # BFS failure links
        from collections import deque

        fail = [0] * len(goto)
        dq = deque(goto[0].values())
        while dq:
            s = dq.popleft()
            for ch, t in goto[s].items():
                dq.append(t)
                f = fail[s]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[t] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != t else 0
                out[t] |= out[fail[t]]
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                s = 0
                hits = set()
                for ch in text:
                    while s and ch not in goto[s]:
                        s = fail[s]
                    s = goto[s].get(ch, 0)
                    if out[s]:
                        hits |= out[s]
                rows.extend((int(doc_id), bid) for bid in hits)
            yield pd.DataFrame(rows, columns=["doc_id", "bench_id"])

    corp = docs.filter(F.col("doc_id") % _DECON_MOD != 0).select(
        "doc_id", "text"
    )
    hits = corp.mapInPandas(scan, "doc_id long, bench_id long")
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_canaries"),
        F.min("bench_id").cast("bigint").alias("first_bench_id"),
    )


def _canary_scrub_oracle() -> str:
    return f"""
    WITH b AS (
        SELECT doc_id AS bench_id, substring(text, 1, {_CANARY_LEN}) AS snip
        FROM documents WHERE doc_id % {_DECON_MOD} = 0
    ), c AS (
        SELECT doc_id, text FROM documents WHERE doc_id % {_DECON_MOD} <> 0
    ), hits AS (
        SELECT c.doc_id, c.text, list(b.snip ORDER BY b.bench_id) AS sl
        FROM c JOIN b ON position(b.snip IN c.text) > 0
        GROUP BY c.doc_id, c.text
    )
    SELECT doc_id,
           CAST(len(sl) AS BIGINT) AS n_scrubbed,
           CAST(length(text) AS BIGINT) AS chars_before,
           CAST(length(list_reduce(list_prepend(text, sl),
                                   (acc, s) -> replace(acc, s, ' ')))
                AS BIGINT) AS chars_after,
           md5(list_reduce(list_prepend(text, sl),
                           (acc, s) -> replace(acc, s, ' '))) AS scrubbed_md5
    FROM hits
    """


@register("decontaminate_canary_scrub", oracle=_canary_scrub_oracle())
def decontaminate_canary_scrub(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ACTION to ``decontaminate_canary``'s signal (the same
    detect->remediate symmetry as boilerplate mining->scrub and PII
    detect->scrub): every flagged document has each matched benchmark
    snippet masked with a space, applied as an ordered fold
    (bench_id order, leftmost replace) so the result is
    deterministic, and the scrubbed text is BIT-CHECKED via its md5
    next to before/after char counts — remediation, not just a
    report. Only contaminated documents appear (the scrub is the
    identity elsewhere).

    Scale: the matched-snippet lists ride the same broadcast
    candidate join as the detector; the fold is map-only over the
    flagged slice — corpus cost is one detection pass plus a rewrite
    of the (tiny) contaminated subset."""
    docs = load_table(spark, sf_dir, "documents")
    bench = F.broadcast(
        docs.filter(F.col("doc_id") % _DECON_MOD == 0).select(
            F.col("doc_id").alias("bench_id"),
            F.substring("text", 1, _CANARY_LEN).alias("snip"),
        )
    )
    corp = docs.filter(F.col("doc_id") % _DECON_MOD != 0).select(
        "doc_id", "text"
    )
    hits = (
        corp.join(bench, F.instr(F.col("text"), F.col("snip")) > 0)
        .groupBy("doc_id", "text")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bench_id", "snip"))),
                lambda x: x["snip"],
            ).alias("sl")
        )
    )
    scrubbed = F.aggregate(
        F.col("sl"),
        F.col("text"),
        lambda acc, s: F.replace(acc, s, F.lit(" ")),
    )
    return hits.select(
        "doc_id",
        F.size("sl").cast("bigint").alias("n_scrubbed"),
        F.length("text").cast("bigint").alias("chars_before"),
        F.length(scrubbed).cast("bigint").alias("chars_after"),
        F.md5(scrubbed.cast("binary")).alias("scrubbed_md5"),
    )
