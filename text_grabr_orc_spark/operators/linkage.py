"""Record linkage: fuzzy (edit-distance) join without all-pairs.

The reference pipeline identifies documents by exact equality only;
a real crawl-scale corpus also needs *approximate* identity — near-
identical titles, OCR'd headers with one character flipped, keys that
differ by a typo. The classic formulation is a fuzzy self-join:
"all pairs of records whose key strings are within Levenshtein
distance k".

The naive plan is an O(n^2) theta join with a quadratic-cost edit
distance in the predicate — the exact shape this repo bans from its
registered surface (see ``dedup_embedding_cosine``'s scale guard).
The scale plan implemented here is **deletion-neighborhood blocking**
(FastSS, Bocek et al. 2007, public): two strings at edit distance
<= k always share at least one member of their depth-k deletion
neighborhoods, so

  1. expand each key into every variant obtainable by deleting <= k
     characters  (O(len^k) variants; keys here are short — the first
     3 tokens, <= ~22 chars — so <= ~254 variants at k=2),
  2. equi-join on the variant string (a plain hash-partitioned
     shuffle join — candidates only ever meet inside a bucket),
  3. verify surviving candidate pairs with the *banded* Levenshtein
     (``levenshtein(a, b, threshold)``, O(k*len) not O(len^2)).

Because depth-k deletion blocking has FULL recall for distance <= k,
the result is exactly the brute-force answer — so the DuckDB oracle
IS the brute-force all-pairs filter, and the green hash check proves
the recall theorem holds end-to-end on the fixture (the oracle checks
the algorithm's *contract*, not a replicated approximation).

Scale: no stage is quadratic in the corpus. The variant expansion is
map-only (bounded fan-out ~L^2/2 on a short key column, the standard
FastSS space trade); the join shuffles variant rows by hash; skewed
variant buckets (e.g. many identical keys) are split by AQE skew-join
handling. At 100 TB the variant table for a 22-char key column is
~250x the key column — still tiny next to the document payload, and
the payload never rides through the join (ids + keys only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_grabr_orc_spark.functions.text import ORACLE_WS_RUN, tokens
from text_grabr_orc_spark.registry import register
from text_grabr_orc_spark.pins import pin_frame
from text_grabr_orc_spark.tables import load_table

#: DuckDB fragment: Go strings.Fields-parity token array of ``text``.
_ORACLE_TOKS = (
    "list_filter(regexp_split_to_array(text, "
    f"'{ORACLE_WS_RUN}'), t -> t <> '')"
)

#: linkage key = first _KEY_TOKENS whitespace tokens, space-joined.
_KEY_TOKENS = 3
#: maximum edit distance for a match (and the deletion depth).
_MAX_DIST = 2
#: hard cap on the key length: variant fan-out is O(L^2/2), so an
#: adversarial document whose first token is huge would otherwise
#: explode one row into millions of variants (and skew that task).
#: 64 chars caps fan-out at ~2,081 variants/row; keys compare on
#: their first 64 chars, which for a 3-token head key loses nothing
#: on natural text (the fixture's max key is 22 chars — asserted
#: nowhere, ENFORCED here).
_KEY_MAX_CHARS = 64


def _variants_expr() -> str:
    """SQL expr: all strings reachable from ``key`` by <= 2 deletions.

    Three tiers concatenated then de-duplicated:
      depth 0 — the key itself;
      depth 1 — drop character i, for i in 1..L;
      depth 2 — drop characters i < j.
    Both inner ``sequence`` calls are guarded with a length test:
    Spark's ``sequence(1, 0)`` defaults to step -1 and yields a
    DESCENDING [1, 0] instead of an empty array (the same trap
    ``corpus_filters._spans`` and ``bpe_merge_pairs`` guard).
    """
    drop1 = (
        "transform(sequence(1, L), i -> "
        "concat(substring(key, 1, i-1), substring(key, i+1, L)))"
    )
    drop2 = (
        "flatten(transform(sequence(1, L-1), i -> "
        "transform(sequence(i+1, L), j -> "
        "concat(substring(key, 1, i-1), "
        "substring(key, i+1, j-i-1), "
        "substring(key, j+1, L)))))"
    )
    return (
        "array_distinct(concat("
        "array(key), "
        f"CASE WHEN L >= 1 THEN {drop1} ELSE array() END, "
        f"CASE WHEN L >= 2 THEN {drop2} ELSE array() END))"
    )


@register(
    "fuzzy_join_blocked",
    oracle=f"""
    WITH k AS (
        SELECT doc_id,
               substr(array_to_string(({_ORACLE_TOKS})[1:{_KEY_TOKENS}],
                             ' '), 1, {_KEY_MAX_CHARS}) AS key
        FROM documents
    )
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           a.key AS key_a, b.key AS key_b,
           CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
    FROM k a JOIN k b ON a.doc_id < b.doc_id
    WHERE levenshtein(a.key, b.key) <= {_MAX_DIST}
    """,
)
def fuzzy_join_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs whose 3-token head keys are within edit
    distance 2 — via FastSS deletion-neighborhood blocking (see the
    module docstring for the plan and the full-recall argument).

    The oracle is the brute-force all-pairs Levenshtein filter: equal
    output == the blocking lost nothing.
    """
    keys = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring(
            F.array_join(F.slice(tokens(F.col("text")), 1, _KEY_TOKENS), " "),
            1,
            _KEY_MAX_CHARS,
        ).alias("key"),
    )
    from pyspark.storagelevel import StorageLevel

    # keys feeds the variant explode AND both candidate rejoin sides;
    # variants feeds both sides of the blocking self-join. Without
    # materialization each side re-runs the regex tokenize + deletion-
    # neighborhood explode inside one action (the self-join's two
    # sides are different exchange kinds, so ReuseExchange never
    # matches them — round-13 optimization, guide §2.4). Both frames
    # are bounded: keys is corpus-row-count, variants is rows x the
    # fixed deletion-neighborhood size.
    keys = keys.withColumn("L", F.length("key")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pin_frame(keys, "fuzzy_keys", max_n=3)
    # join on the 8-byte hash of the variant, not the string: the
    # shuffle carries ints instead of ~20-char strings, and a hash
    # collision can only ADD a candidate pair, which the exact
    # Levenshtein verify below then rejects — recall is unaffected
    variants = keys.select(
        "doc_id",
        F.explode(
            F.transform(F.expr(_variants_expr()), lambda v: F.xxhash64(v))
        ).alias("variant"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    pin_frame(variants, "fuzzy_variants", max_n=3)
    # the exchange carries ONLY (doc_id, variant-hash) int pairs; key
    # strings rejoin after the candidate pairs are distinct'd, from
    # the doc->key table (corpus-row-count sized, not variant-sized)
    a = variants.select(F.col("doc_id").alias("doc_id_a"), "variant")
    b = variants.select(F.col("doc_id").alias("doc_id_b"), "variant")
    candidates = (
        a.join(b, "variant")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b")
        .distinct()
        .join(
            keys.select(
                F.col("doc_id").alias("doc_id_a"), F.col("key").alias("key_a")
            ),
            "doc_id_a",
        )
        .join(
            keys.select(
                F.col("doc_id").alias("doc_id_b"), F.col("key").alias("key_b")
            ),
            "doc_id_b",
        )
    )
    # banded verify: threshold form is O(k*len) and returns -1 above k
    dist = F.levenshtein("key_a", "key_b", _MAX_DIST)
    return (
        candidates.withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
        .select(
            "doc_id_a",
            "doc_id_b",
            "key_a",
            "key_b",
            F.col("dist").cast("bigint").alias("dist"),
        )
    )


# ---------------------------------------------------------------------------
# Sorted-neighborhood linkage (the other classical blocking family)
# ---------------------------------------------------------------------------

#: window width: each record pairs with its w-1 successors in global
#: key order.
_SN_WINDOW = 8


@register(
    "fuzzy_join_sorted_neighborhood",
    oracle=f"""
    WITH k AS (
        SELECT doc_id,
               substr(array_to_string(({_ORACLE_TOKS})[1:{_KEY_TOKENS}],
                             ' '), 1, {_KEY_MAX_CHARS}) AS key
        FROM documents
    ), ranked AS (
        SELECT doc_id, key,
               row_number() OVER (ORDER BY key, doc_id) AS rk
        FROM k
    )
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           a.key AS key_a, b.key AS key_b,
           CAST(b.rk - a.rk AS BIGINT) AS rank_gap,
           CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
    FROM ranked a JOIN ranked b
      ON b.rk > a.rk AND b.rk <= a.rk + {_SN_WINDOW} - 1
    WHERE levenshtein(a.key, b.key) <= {_MAX_DIST}
    """,
)
def fuzzy_join_sorted_neighborhood(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sorted-neighborhood record linkage (Hernandez & Stolfo 1995,
    public): rank all keys in global sort order, pair each record with
    its {w}-1 successors, verify with banded Levenshtein. Candidates
    are O(n*w) BY CONSTRUCTION — the hard guarantee FastSS lacks when
    a hot variant bucket blows up — at the price of recall: a pair
    whose keys sort far apart (e.g. a FIRST-character edit) never
    meets. The two methods are complementary passes in a production
    linkage pipeline; recall vs the full-recall FastSS operator is
    measured in tests, not assumed.

    Scale: the global rank does NOT use an unpartitioned window (the
    single-task scale-killer) — it is the repo's two-pass distributed
    prefix-sum (range-partition by key, broadcast per-partition count
    offsets, partition-local row_numbers). Neighbor pairing is then a
    d = 1..{w}-1 explode + equi-join on rank+d: every stage is a keyed
    exchange on ints."""
    from pyspark.storagelevel import StorageLevel

    keys = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring(
            F.array_join(F.slice(tokens(F.col("text")), 1, _KEY_TOKENS), " "),
            1,
            _KEY_MAX_CHARS,
        ).alias("key"),
    )
    spark_ = keys.sparkSession
    n_parts = int(spark_.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        keys.repartitionByRange(n_parts, "key", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = ranged.groupBy("pid").count().collect()
    offsets, running = [], 0
    for row in sorted(counts, key=lambda r: r["pid"]):
        offsets.append((row["pid"], running))
        running += row["count"]
    off_df = spark_.createDataFrame(offsets or [(0, 0)], "pid int, off bigint")
    from pyspark.sql import Window

    w = Window.partitionBy("pid").orderBy("key", "doc_id")
    ranked = (
        ranged.withColumn("prn", F.row_number().over(w))
        .join(F.broadcast(off_df), "pid")
        .select(
            "doc_id", "key", (F.col("prn") + F.col("off")).alias("rk")
        )
    )
    a = ranked.select(
        F.col("doc_id").alias("doc_id_a"),
        F.col("key").alias("key_a"),
        F.col("rk").alias("rk_a"),
        F.explode(
            F.sequence(F.col("rk") + 1, F.col("rk") + _SN_WINDOW - 1)
        ).alias("rk_b"),
    )
    b = ranked.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("key").alias("key_b"),
        F.col("rk").alias("rk_b"),
    )
    dist = F.levenshtein("key_a", "key_b", _MAX_DIST)
    return (
        a.join(b, "rk_b")
        .withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
        .select(
            "doc_id_a",
            "doc_id_b",
            "key_a",
            "key_b",
            (F.col("rk_b") - F.col("rk_a")).cast("bigint").alias("rank_gap"),
            F.col("dist").cast("bigint").alias("dist"),
        )
    )


# post-definition, like search_bm25_topk/train_logreg_quality: an
# inline ``""".format(...)`` is a discarded expression, not a docstring
fuzzy_join_sorted_neighborhood.__doc__ = (
    fuzzy_join_sorted_neighborhood.__doc__.format(w=_SN_WINDOW)
)
