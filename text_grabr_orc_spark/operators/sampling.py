"""Deterministic sampling + partitioned storage layout operators.

North-star training-data-pipeline ops (no reference counterpart —
SURVEY.md §2b): at 100 TB you sample with a DETERMINISTIC hash of a
stable key, not rand() — the sample is reproducible across runs,
engines, and retries, composable with incremental processing, and
push-down-able as an ordinary filter. The hash here is Knuth's
multiplicative scheme ((key * 2654435761) mod 2^32), chosen because
it is plain integer arithmetic both Spark and DuckDB (and any other
engine) evaluate identically — unlike engine-native hash()/xxhash64
whose seeds differ.

Also here: Hive-style partitioned parquet layout (partitionBy on
write, partition PRUNING on read) — the storage-layout half of "push
down and prune" that the ORC round-trip query covers for row-group
stats.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_grabr_orc_spark.functions.text import ORACLE_WS_RUN, tokens
from text_grabr_orc_spark.functions.windows import bounded_window
from text_grabr_orc_spark.registry import register
from text_grabr_orc_spark.tables import cache_tag, load_table

# (key * KNUTH) % 2^32 % scale < threshold  — identical in any engine
# with 64-bit integer arithmetic; keys here are < ~2^24 so the product
# stays far below 2^63.
_KNUTH = 2654435761


def hash_bucket(key_col: str, scale: int):
    """Deterministic bucket in [0, scale) from a bigint key column."""
    return F.pmod(
        F.pmod(F.col(key_col) * F.lit(_KNUTH), F.lit(4294967296)), F.lit(scale)
    )


@register(
    "sample_orders_deterministic",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_sampled,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS sum_price
    FROM orders
    WHERE ((o_orderkey * 2654435761) % 4294967296) % 100 < 10
    GROUP BY o_orderstatus
    """,
)
def sample_orders_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% reproducible sample of orders via multiplicative key hash,
    aggregated by status to make the sample observable. The predicate
    is a pure row-local filter — no shuffle, no rand() state, and the
    same rows are selected on every engine/run/partitioning, which is
    what makes hash-sampling the only sane sampling at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(hash_bucket("o_orderkey", 100) < 10)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(
                F.sum(F.expr("CAST(o_totalprice AS DECIMAL(18,2))")).cast("double"),
                2,
            ).alias("sum_price"),
        )
    )


@register(
    "sample_docs_stratified",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(coalesce(sum(n_chars), -1) AS BIGINT) AS total_chars
    FROM documents
    WHERE ((doc_id * 2654435761) % 4294967296) % 1000
          < CASE WHEN lang = 'en' THEN 50 ELSE 500 END
    GROUP BY lang
    """,
)
def sample_docs_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language rates (5% of
    dominant en, 50% of the rest) — the downsample-the-majority-class
    move of every training-data mix. One pass, no per-stratum jobs:
    the rate is a CASE expression over the same hash bucket, so the
    whole thing stays a single pushed-down filter."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 50).otherwise(500)
    return (
        docs.filter(hash_bucket("doc_id", 1000) < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("n_chars"), F.lit(-1)).cast("bigint")
            .alias("total_chars"),
        )
    )


@register(
    "partitioned_write_pruning",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(coalesce(sum(n_chars), -1) AS BIGINT) AS total_chars
    FROM documents
    WHERE lang IN ('fr', 'de')
    GROUP BY source
    """,
)
def partitioned_write_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet layout: write documents partitionBy
    lang, read back filtering lang IN ('fr','de') — the read plans
    PartitionFilters (directory-level pruning: non-matching partitions
    are never opened, the scale move for any low-cardinality routing
    column). Matching the unpartitioned oracle proves the layout is
    lossless. Partition count stays bounded because lang has 5
    values — never partition by a high-cardinality key."""
    tag = cache_tag(sf_dir)
    out = os.path.join(tempfile.gettempdir(), "tgos_part_cache", tag)
    docs = load_table(spark, sf_dir, "documents")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.filter(F.col("lang").isin("fr", "de"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("n_chars"), F.lit(-1)).cast("bigint")
            .alias("total_chars"),
        )
    )


@register(
    "split_train_val_test",
    oracle="""
    WITH tagged AS (
        SELECT CASE
                 WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 80 THEN 'train'
                 WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 90 THEN 'val'
                 ELSE 'test'
               END AS split,
               n_chars, doc_id
        FROM documents
    )
    SELECT split,
           count(*) AS n_docs,
           CAST(coalesce(sum(n_chars), -1) AS BIGINT) AS total_chars,
           CAST(coalesce(min(doc_id), -1) AS BIGINT) AS min_doc,
           CAST(coalesce(max(doc_id), -1) AS BIGINT) AS max_doc
    FROM tagged
    GROUP BY split
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split — the assignment
    every training-data pipeline needs to be STABLE: hash-bucketed on
    doc_id, so a document lands in the same split on every run, every
    engine, and every incremental append (new docs never reshuffle old
    ones — the property rand()-based splits lack, and the reason
    leakage audits can re-derive membership from the key alone).

    Scale: the split tag is a row-local integer expression (no
    shuffle); the rollup aggregates into 3 groups map-side. Writing
    the actual splits is `partitionBy('split')` on this tag — the
    layout operator partitioned_write_pruning already covers."""
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket("doc_id", 100)
    split = (
        F.when(b < 80, F.lit("train"))
        .when(b < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "n_chars", "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("n_chars"), F.lit(-1)).cast("bigint")
            .alias("total_chars"),
            F.coalesce(F.min("doc_id"), F.lit(-1)).cast("bigint")
            .alias("min_doc"),
            F.coalesce(F.max("doc_id"), F.lit(-1)).cast("bigint")
            .alias("max_doc"),
        )
    )


@register(
    "dynamic_partition_pruning_join",
    oracle="""
    WITH top_langs AS (
        SELECT lang FROM documents
        GROUP BY lang ORDER BY count(*) DESC, lang LIMIT 2
    )
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(d.n_chars), -1) AS BIGINT) AS total_chars
    FROM documents d JOIN top_langs USING (lang)
    GROUP BY d.lang
    """,
)
def dynamic_partition_pruning_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DYNAMIC partition pruning: the fact side is the lang-partitioned
    parquet layout, and the partition filter is NOT a literal — it is
    the result of joining against a computed dimension (the top-2
    languages by document count), which only exists at runtime. Spark
    plans a DynamicPruningExpression on the scan: the dim side
    evaluates first (reusing its broadcast), and only the matching
    lang= directories are ever opened — the join-driven half of
    partition pruning that star-schema scans at 100 TB live on
    (static IN-list pruning is partitioned_write_pruning next door).
    Plan-tested in tests/test_plans.py.

    Matching the unpartitioned oracle proves pruning changed I/O,
    never the answer."""
    from pyspark.sql import Window

    tag = cache_tag(sf_dir)
    out = os.path.join(tempfile.gettempdir(), "tgos_part_cache", tag)
    dim_out = os.path.join(tempfile.gettempdir(), "tgos_langdim_cache", tag)
    docs = load_table(spark, sf_dir, "documents")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    if not os.path.exists(os.path.join(dim_out, "_SUCCESS")):
        # materialized language dimension with a popularity rank —
        # DPP's pattern requires the dim side to be a SOURCE relation
        # carrying a literal Filter (aggregates/limits don't count as
        # the selective predicate)
        w = bounded_window("lang", F.col("n").desc(), "lang")
        (
            docs.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("priority", F.row_number().over(w))
            .select("lang", "priority")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(dim_out)
        )
    back = spark.read.parquet(out)
    dim = spark.read.parquet(dim_out).filter(F.col("priority") <= 2)
    return (
        back.join(F.broadcast(dim), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("n_chars"), F.lit(-1))
            .cast("bigint")
            .alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis A-Res)
# ---------------------------------------------------------------------------

#: sample size for the weighted draw.
_ARES_K = 50


@register(
    "sample_weighted_ares",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, source,
               len(list_filter(regexp_split_to_array(text,
                   '{ORACLE_WS_RUN}'), t -> t <> '')) AS wt,
               ('0x' || substr(md5('ares:' || doc_id::VARCHAR), 1, 8))::BIGINT
                   AS u32
        FROM documents
    ), keyed AS (
        SELECT doc_id, source, wt,
               round(-ln((u32 + 1) / 4294967297.0) / wt, 9) AS k
        FROM w WHERE wt > 0
    )
    SELECT doc_id, source, CAST(wt AS BIGINT) AS weight, k AS sort_key,
           CAST(row_number() OVER (ORDER BY k, doc_id) AS BIGINT) AS rank
    FROM keyed
    QUALIFY rank <= {_ARES_K}
    """,
)
def sample_weighted_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential keys
    (Efraimidis & Spirakis 2006, public; the A-Res/A-ES family):
    every doc draws key = -ln(u)/w from a deterministic per-doc
    uniform, and the k smallest keys ARE a weighted sample without
    replacement — the only known way to do this in ONE distributed
    pass with no sequential state, which is why it's the standard
    cluster-side primitive for token-weighted corpus draws
    (inclusion probability proportional to the doc's token count).

    Determinism/portability: u = (md5_u32 + 1) / 2^32+1 in (0, 1)
    exactly as both engines compute it; the single ln is quantized to
    9 dp (the bigram-LM device) so ranking keys are identical; top-k
    is orderBy+limit (TakeOrdered), never a global window.

    Scale: map-only key assignment, then a k-row TakeOrdered — the
    same shuffle profile as any top-k; at 100 TB this is the
    one-pass weighted reservoir over the whole corpus."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        "source",
        F.size(tokens("text")).alias("wt"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ares:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("u32"),
    ).filter(F.col("wt") > 0)
    keyed = w.select(
        "doc_id",
        "source",
        "wt",
        F.round(
            -F.log((F.col("u32") + 1) / F.lit(4294967297.0)) / F.col("wt"), 9
        ).alias("k"),
    )
    from pyspark.sql import Window

    top = keyed.orderBy("k", "doc_id").limit(_ARES_K)
    rw = bounded_window("doc_id", "k", "doc_id")
    return top.select(
        "doc_id",
        "source",
        F.col("wt").cast("bigint").alias("weight"),
        F.col("k").alias("sort_key"),
        F.row_number().over(rw).cast("bigint").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Split-leakage audit: near-dups crossing train/val/test boundaries
# ---------------------------------------------------------------------------

#: same Knuth multiplicative-hash split as split_train_val_test —
#: shared SQL fragment so the audit provably uses the REAL membership.
_SPLIT_CASE = """CASE
        WHEN (({d} * 2654435761) % 4294967296) % 100 < 80 THEN 'train'
        WHEN (({d} * 2654435761) % 4294967296) % 100 < 90 THEN 'val'
        ELSE 'test' END"""


def _split_leakage_oracle() -> str:
    from text_grabr_orc_spark.operators import dedup  # noqa: F401
    from text_grabr_orc_spark.registry import ORACLES

    return f"""
    WITH mh AS ({ORACLES["dedup_minhash_lsh"]})
    SELECT least({_SPLIT_CASE.format(d="doc_a")},
                 {_SPLIT_CASE.format(d="doc_b")}) AS split_lo,
           greatest({_SPLIT_CASE.format(d="doc_a")},
                    {_SPLIT_CASE.format(d="doc_b")}) AS split_hi,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(max(jaccard), 6) AS worst_jaccard
    FROM mh
    GROUP BY 1, 2
    """


@register("split_leakage_report", oracle=_split_leakage_oracle())
def split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVAL-LEAKAGE AUDIT for the registered train/val/test split:
    count near-duplicate pairs (the registered MinHash operator's
    output) by the split pair they straddle — a train/test or
    train/val row with n_pairs > 0 IS leakage (the eval doc's
    near-twin was trained on), the failure mode random per-run
    splits can't even audit. Because the split is a pure function of
    doc_id (Knuth hash, shared SQL fragment), membership is
    RE-DERIVED inside the audit rather than joined from a side table
    — the audit can run on any engine that sees only the pair list.

    Scale: the near-dup pair set is duplicate-mass-bounded; the audit
    is a map-side split tag + a 6-group aggregate on it."""
    from text_grabr_orc_spark.operators.dedup import minhash_pairs_cached

    mh = minhash_pairs_cached(spark, sf_dir)

    def tag(c):
        b = hash_bucket(c, 100)
        return (
            F.when(b < 80, F.lit("train"))
            .when(b < 90, F.lit("val"))
            .otherwise(F.lit("test"))
        )

    ta, tb = tag("doc_a"), tag("doc_b")
    return (
        mh.select(
            F.least(ta, tb).alias("split_lo"),
            F.greatest(ta, tb).alias("split_hi"),
            "jaccard",
        )
        .groupBy("split_lo", "split_hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.max("jaccard"), 6).alias("worst_jaccard"),
        )
    )


def _split_by_cluster_oracle() -> str:
    from text_grabr_orc_spark.registry import ORACLES

    clusters = ORACLES["dedup_clusters"]
    return f"""
    WITH cl AS (
        SELECT * FROM ({clusters})
    ), grouped AS (
        SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS group_id
        FROM documents d LEFT JOIN cl ON cl.node_id = d.doc_id
    )
    SELECT doc_id, CAST(group_id AS BIGINT) AS group_id,
           CASE
             WHEN ((group_id * 2654435761) % 4294967296) % 100 < 80 THEN 'train'
             WHEN ((group_id * 2654435761) % 4294967296) % 100 < 90 THEN 'val'
             ELSE 'test'
           END AS split
    FROM grouped
    """


@register("split_by_cluster", oracle=_split_by_cluster_oracle())
def split_by_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware train/val/test split: hash-bucket on the NEAR-DUP
    CLUSTER id, not the document id, so an entire near-duplicate
    cluster lands in one split — the structural fix for the
    train/test leakage that ``split_leakage_report`` audits (a plain
    per-doc split puts ~20% of every cluster's near-copies in val/test
    against their train twins). Documents outside any cluster are
    their own group, so their assignment degenerates to the standard
    per-doc split and stays append-stable.

    Composition: cluster ids come from the registered
    ``dedup_clusters`` (connected components over the embedding
    near-dup graph; the oracle nests its recursive-CTE SQL verbatim),
    and the bucket is the same Knuth multiplicative hash as
    ``split_train_val_test`` — membership stays re-derivable from the
    group key alone.

    Scale: the cluster table is a tiny fraction of the corpus (only
    docs with at least one near-dup edge), so the LEFT join broadcasts
    it; the split tag itself is a row-local integer expression. The
    clustering cost is the CC loop's — paid once and shared via the
    dedup family's pair cache."""
    from text_grabr_orc_spark.operators.dedup import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    cl = dedup_clusters(spark, sf_dir).select(
        F.col("node_id").alias("doc_id"), "cluster_id"
    )
    grouped = docs.select("doc_id").join(F.broadcast(cl), "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("group_id"),
    )
    b = F.pmod(
        F.pmod(F.col("group_id") * F.lit(2654435761), F.lit(4294967296)),
        F.lit(100),
    )
    split = (
        F.when(b < 80, F.lit("train"))
        .when(b < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return grouped.select(
        "doc_id", F.col("group_id").cast("bigint"), split.alias("split")
    )
