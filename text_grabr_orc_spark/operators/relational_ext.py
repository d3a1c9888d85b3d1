"""M1 extensions: outer joins, approximate aggregates, JSON
source/sink round-trip, and subquery shapes — the rest of the
relational checklist (SURVEY.md §2b).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_grabr_orc_spark.registry import register
from text_grabr_orc_spark.tables import cache_tag, load_table


@register(
    "left_outer_order_returns",
    oracle="""
    WITH returns AS (
        SELECT l_orderkey, count(*) AS n_returned
        FROM lineitem WHERE l_returnflag = 'R'
        GROUP BY l_orderkey
    )
    SELECT o.o_orderkey,
           o.o_orderstatus,
           coalesce(r.n_returned, 0) AS n_returned,
           CAST(r.n_returned IS NULL AS INT) AS no_returns
    FROM orders o LEFT JOIN returns r ON o.o_orderkey = r.l_orderkey
    """,
)
def left_outer_order_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with null-side handling: every order keeps a
    row whether or not it has returned lineitems. Aggregating the
    fact side BEFORE the join keeps the outer join 1:1 — at scale
    this halves the shuffle and avoids outer-join row explosion."""
    orders = load_table(spark, sf_dir, "orders")
    returns = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_returned"))
    )
    j = orders.join(returns, orders.o_orderkey == returns.l_orderkey, "left")
    return j.select(
        "o_orderkey",
        "o_orderstatus",
        F.coalesce("n_returned", F.lit(0)).alias("n_returned"),
        F.col("n_returned").isNull().cast("int").alias("no_returns"),
    )


@register(
    "full_outer_nation_accounts",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT coalesce(c.nk, s.nk) AS nationkey,
           coalesce(c.n_cust, 0) AS n_customers,
           coalesce(s.n_supp, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def full_outer_nation_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: nations with only customers or only suppliers
    survive with zero-filled counts."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    j = cust.join(supp, "nk", "full_outer")
    return j.select(
        F.col("nk").cast("bigint").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_customers"),
        F.coalesce("n_supp", F.lit(0)).alias("n_suppliers"),
    )


@register(
    "subquery_above_avg_orders",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def subquery_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (uncorrelated): orders above 1.5x
    the global average.

    avg() noise note: the threshold is a double average; an order
    would need a price within ~1e-9 of the exact threshold for engine
    last-ulp differences to flip membership — not present in this
    data, and checked by the oracle either way.

    The threshold rides as a broadcast scalar join (one single-row
    aggregate crossJoined onto the scan), keeping the whole query ONE
    Spark job — the previous .collect()[0][0] ran a separate job just
    to fetch the scalar into the driver (round-7 verdict cosmetic)."""
    orders = load_table(spark, sf_dir, "orders")
    thr = orders.agg((1.5 * F.avg("o_totalprice")).alias("thr"))
    return (
        orders.crossJoin(F.broadcast(thr))
        .filter(F.col("o_totalprice") > F.col("thr"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


@register(
    "correlated_exists_big_lines",
    oracle="""
    SELECT p_partkey, p_brand
    FROM part p
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49
    )
    """,
)
def correlated_exists_big_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS via spark.sql — exercises the SQL entry path
    and Catalyst's rewrite of correlated subqueries to semi joins."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("tgos_part")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("tgos_lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_brand
        FROM tgos_part p
        WHERE EXISTS (
            SELECT 1 FROM tgos_lineitem l
            WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49
        )
        """
    )


@register("events_user_reach_approx")  # approx sketches differ per engine ->
# rows-only driver check; accuracy bounded by tests/test_relational_ext.py
def events_user_reach_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to the exact count —
    the sketch that replaces exact distinct at 100 TB (mergeable,
    fixed memory). Output keeps both so accuracy is observable."""
    from text_grabr_orc_spark.sources.events import load_events

    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


@register(
    "json_roundtrip",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(coalesce(sum(n_chars), -1) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON sink + source round-trip: write documents as JSON lines,
    read back with an explicit schema, aggregate. Equality with the
    parquet-side oracle proves losslessness. Explicit schemas on read
    skip the inference scan — mandatory at scale."""
    tag = cache_tag(sf_dir)
    out = os.path.join(tempfile.gettempdir(), "tgos_json_cache", tag)
    docs = load_table(spark, sf_dir, "documents")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        docs.select("doc_id", "lang", "n_chars").write.mode("overwrite").json(out)
    back = spark.read.schema("doc_id bigint, lang string, n_chars bigint").json(out)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("n_chars"), F.lit(-1)).cast("bigint")
        .alias("total_chars"),
    )


@register(
    "pivot_segment_priority",
    oracle="""
    SELECT c.c_mktsegment,
           count(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent,
           count(CASE WHEN o.o_orderpriority = '2-HIGH' THEN 1 END) AS n_high,
           count(CASE WHEN o.o_orderpriority = '3-MEDIUM' THEN 1 END) AS n_medium,
           count(CASE WHEN o.o_orderpriority = '4-NOT SPECIFIED' THEN 1 END)
               AS n_notspec,
           count(CASE WHEN o.o_orderpriority = '5-LOW' THEN 1 END) AS n_low
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def pivot_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order-priority counts spread into columns per market
    segment. The pivot values are declared explicitly — with inferred
    values Spark first runs a distinct() discovery pass over the fact
    table, a full extra scan at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    pri = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    piv = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderpriority", pri)
        .count()
    )
    names = ["n_urgent", "n_high", "n_medium", "n_notspec", "n_low"]
    return piv.select(
        "c_mktsegment",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(a) for p, a in zip(pri, names)],
    )


@register(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT measure, count(*) AS n,
           round(CAST(sum(CAST(val AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
    FROM (
        SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    )
    GROUP BY measure
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: the four lineitem numeric measures into long form
    then a per-measure aggregate. Spark's unpivot is a map-side
    expression (no shuffle until the aggregate), so the long form
    never materializes 4x the table."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.expr("CAST(val AS DECIMAL(18,2))")).cast("double"), 2
        ).alias("total"),
    )


@register(
    "salted_returnflag_stats",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def salted_returnflag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation for pathological key skew: the
    group-by key has only ~4 distinct values, so a direct shuffle
    lands all 100 TB on 4 reducers. Stage 1 fans each key out across
    64 salts (count/sum are algebraic, so partials merge exactly —
    DECIMAL keeps the sum associative); stage 2 merges 4x64 tiny rows.
    The oracle is the unsalted group-by: salting must never change
    the answer. (For skewed JOINS the same salt trick replicates the
    build side; AQE's skewJoin does it adaptively.)"""
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(64))
    )
    partial = salted.groupBy("l_returnflag", "l_linestatus", "_salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.expr("CAST(l_quantity AS DECIMAL(18,2))")).alias("pq"),
    )
    return partial.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("pq").cast("double"), 2).alias("sum_qty"),
    )


@register(
    "csv_roundtrip",
    oracle="""
    SELECT r.r_name AS region,
           count(*) AS n_nations,
           min(n.n_name) AS first_nation
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source round-trip on nation, then a broadcast join
    to region. Read uses an explicit schema (header inference is an
    extra full scan at scale) — losslessness proven by matching the
    parquet-side oracle."""
    tag = cache_tag(sf_dir)
    out = os.path.join(tempfile.gettempdir(), "tgos_csv_cache", tag)
    nation = load_table(spark, sf_dir, "nation")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        nation.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(
        "n_nationkey bigint, n_name string, n_regionkey bigint, n_comment string"
    ).option("header", True).csv(out)
    region = load_table(spark, sf_dir, "region")
    return (
        back.join(F.broadcast(region), back.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_name").alias("first_nation"),
        )
    )


@register(
    "grouping_sets_returns",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def grouping_sets_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube sugar over)
    via the SQL entry path: per-(flag,status), per-flag, and grand
    total in one pass. Spark expands the sets AFTER map-side partial
    aggregation, so the scan and first shuffle are paid once, not once
    per set."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("tgos_li_gs")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                   AS revenue
        FROM tgos_li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT round(CAST(
               100.00 * sum(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))
                   ELSE CAST(0 AS DECIMAL(38,4)) END)
               / sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2))))
           AS DOUBLE), 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect, adapted to the fixture's flat
    p_type values): share of one month's discounted revenue from PROMO
    parts. Both sums ride exact DECIMAL so the ratio's doubles agree
    across engines; the date filter pushes to the parquet scan and the
    part table broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.expr(
        "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
    )
    j = li.filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ'1997-09-01'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ'1997-10-01'"))
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return j.agg(
        F.round(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", disc).otherwise(
                        F.expr("CAST(0 AS DECIMAL(38,4))")
                    )
                )
                / F.sum(disc)
            ).cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, o.o_orderkey,
           round(o.o_totalprice, 2) AS totalprice,
           round(CAST(big.sum_qty AS DOUBLE), 2) AS sum_qty
    FROM (
        SELECT l_orderkey,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
    ) big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds 250, with buyer names. The HAVING aggregate runs FIRST on
    the fact table (map-side partial agg), shrinking the join input to
    the rare qualifying orders — never join-then-filter at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.expr("CAST(l_quantity AS DECIMAL(18,2))")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round(F.col("sum_qty").cast("double"), 2).alias("sum_qty"),
        )
    )


@register(
    "q10_returned_item_reporting",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2)
               AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_item_reporting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by
    returned-merchandise revenue in a half-year window. DECIMAL
    revenue keeps the top-20 cut deterministic (ties broken by
    custkey); nation broadcasts, the orders date filter prunes before
    the fact join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ'1997-01-01'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ'1997-07-01'"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.expr(
        "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "xml_roundtrip",
    oracle="""
    SELECT n.n_regionkey AS regionkey,
           count(*) AS n_suppliers,
           round(CAST(sum(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total_bal
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_regionkey
    """,
)
def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + source round-trip (Spark 4 native `xml` format — no
    external package) on supplier, then a broadcast join to nation.
    Read uses an explicit schema: XML schema inference is a full
    extra scan AND type-guesses (acctbal could flip double/decimal),
    both wrong at scale. Losslessness proven by matching the
    parquet-side oracle."""
    tag = cache_tag(sf_dir)
    out = os.path.join(tempfile.gettempdir(), "tgos_xml_cache", tag)
    supp = load_table(spark, sf_dir, "supplier")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        supp.write.mode("overwrite").format("xml").option(
            "rootTag", "suppliers"
        ).option("rowTag", "supplier").save(out)
    back = spark.read.schema(
        "s_suppkey bigint, s_name string, s_nationkey bigint, s_acctbal double"
    ).format("xml").option("rowTag", "supplier").load(out)
    nation = load_table(spark, sf_dir, "nation")
    return (
        back.join(F.broadcast(nation), back.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_regionkey").alias("regionkey"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(
                F.sum(F.expr("CAST(s_acctbal AS DECIMAL(18,2))")).cast("double"), 2
            ).alias("total_bal"),
        )
    )


@register(
    "schema_evolution_mergeschema",
    oracle="""
    SELECT coalesce(CASE WHEN o_orderdate >= TIMESTAMP '1999-01-01'
                         THEN o_orderpriority END, '(pre-upgrade)') AS priority,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total_price
    FROM orders
    GROUP BY priority
    """,
)
def schema_evolution_mergeschema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on a live table: an old writer produced
    (o_orderkey, o_totalprice), a newer one added o_orderpriority —
    exactly how 100 TB lakehouse tables actually grow. Reading the
    directory with ``mergeSchema=true`` reconciles the footers into
    the union schema, old files surface NULL for the added column, and
    the rollup coalesces them into a '(pre-upgrade)' bucket. The
    oracle reproduces the same split from the unevolved table.
    (mergeSchema is a read-time footer union — it costs a footer scan,
    not a data rewrite; at scale you set it per-table, not globally.)"""
    tag = cache_tag(sf_dir)
    out = os.path.join(tempfile.gettempdir(), "tgos_evo_cache", tag)
    orders = load_table(spark, sf_dir, "orders")
    cut = F.expr("TIMESTAMP_NTZ'1999-01-01'")
    if not os.path.exists(os.path.join(out, "v2", "_SUCCESS")):
        orders.filter(F.col("o_orderdate") < cut).select(
            "o_orderkey", "o_totalprice"
        ).write.mode("overwrite").parquet(os.path.join(out, "v1"))
        orders.filter(F.col("o_orderdate") >= cut).select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        ).write.mode("overwrite").parquet(os.path.join(out, "v2"))
    merged = spark.read.option("mergeSchema", True).parquet(
        os.path.join(out, "v1"), os.path.join(out, "v2")
    )
    return merged.groupBy(
        F.coalesce(F.col("o_orderpriority"), F.lit("(pre-upgrade)")).alias("priority")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(F.expr("CAST(o_totalprice AS DECIMAL(18,2))")).cast("double"), 2
        ).alias("total_price"),
    )


@register(
    "json_corrupt_records",
    oracle="""
    SELECT 'good' AS record_class,
           count(*) AS n,
           CAST(coalesce(sum(CAST(event_id AS BIGINT)), -1) AS BIGINT) AS id_sum
    FROM events
    UNION ALL
    SELECT 'corrupt', CAST(7 AS BIGINT), CAST(-1 AS BIGINT)
    """,
)
def json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-input tolerance: a JSON ingest where a known set of
    malformed lines is interleaved with good records. PERMISSIVE mode
    (the default) routes unparseable lines into ``_corrupt_record``
    instead of failing the job — at 100 TB some input WILL be garbage,
    and the reference's fail-the-request stance (`http.Error`,
    `main.go:45-91`) becomes route-to-error-side-output here
    (SURVEY.md §2a). The query classifies rows and proves (a) every
    good record survived bit-exact (id checksum matches the parquet
    oracle), (b) exactly the 7 planted bad lines landed in the corrupt
    bucket (-1 sentinel id_sum: nullable-int rule, see registry notes).

    Scale: mode=PERMISSIVE is per-record and map-side — no coordination;
    FAILFAST is the right mode only when upstream guarantees schema."""
    from text_grabr_orc_spark.sources.events import load_events

    tag = cache_tag(sf_dir)
    out = os.path.join(tempfile.gettempdir(), "tgos_badjson_cache", tag)
    marker = os.path.join(out, "_DONE")
    ev = load_events(spark, sf_dir)
    if not os.path.exists(marker):
        ev.select("event_id", "event_type").coalesce(4).write.mode(
            "overwrite"
        ).json(out)
        bad = [
            '{"event_id": 1, "event_type": "click"',   # truncated object
            '{"event_id": "not a number"} trailing',    # trailing garbage
            "[1, 2, 3",                                  # broken array
            "{unquoted: true}",                          # bare key
            '{"event_id":}',                             # missing value
            "plain text line",                           # not JSON at all
            '{"a"',                                      # truncated key
        ]
        with open(os.path.join(out, "part-corrupt.json"), "w") as fh:
            fh.write("\n".join(bad) + "\n")
        with open(marker, "w") as fh:
            fh.write("ok")
    back = spark.read.schema(
        "event_id bigint, event_type string, _corrupt_record string"
    ).json(out)
    # The classifier must reference parsed columns alongside
    # _corrupt_record: a consumer that only needs the group key (e.g.
    # count()) lets column pruning strip everything else, and Spark
    # refuses a raw-JSON scan whose only referenced column is the
    # internal corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    # Malformed lines parse to all-null fields + non-null corrupt
    # record, so the three-column test is equivalent to corrupt-only.
    cls = F.when(
        F.col("_corrupt_record").isNotNull()
        & F.col("event_id").isNull()
        & F.col("event_type").isNull(),
        "corrupt",
    ).otherwise("good")
    return (
        back.groupBy(cls.alias("record_class"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("event_id"), F.lit(-1)).alias("id_sum"),
        )
    )


@register(
    "sorted_layout_zone_maps",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    GROUP BY l_returnflag
    """,
)
def sorted_layout_zone_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-layout optimization: rewrite lineitem range-partitioned
    + sorted by l_shipdate, then answer a one-month query against the
    sorted copy. Because every parquet file (and row group) now covers
    a narrow, disjoint shipdate range, the pushed-down date predicate
    prunes via footer min/max statistics — most files contribute ZERO
    row groups to the scan. At 100 TB this layout turns a full-corpus
    scan into reading ~1/72 of the files (one month of six years);
    it's the same zone-map effect Z-ordering generalizes to multiple
    columns. repartitionByRange samples the key distribution, so file
    sizes stay balanced even when ship dates are skewed.
    tests/test_plans.py proves the physical property from the footers:
    per-file min/max shipdate spans are narrow and non-overlapping.
    The oracle runs the same query on the unsorted original — layout
    must never change answers."""
    tag = cache_tag(sf_dir)
    out = os.path.join(tempfile.gettempdir(), "tgos_sorted_cache", tag)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        li = load_table(spark, sf_dir, "lineitem")
        (
            li.repartitionByRange(8, "l_shipdate")
            .sortWithinPartitions("l_shipdate")
            .write.mode("overwrite")
            .parquet(out)
        )
    back = spark.read.parquet(out).filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ'1997-03-01'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ'1997-04-01'"))
    )
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.expr("CAST(l_extendedprice AS DECIMAL(18,2))")).cast("double"), 2
        ).alias("revenue"),
    )


@register(
    "window_rank_variants",
    oracle="""
    SELECT c_custkey,
           round(c_acctbal, 2) AS acctbal,
           dense_rank() OVER w AS drank,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-function family beyond row_number: dense_rank, ntile
    quartiles, percent_rank, cume_dist — per-nation account-balance
    standings. The window ordering includes c_custkey as tiebreak so
    every function is total-order deterministic (percent_rank/
    cume_dist over a non-total order would be engine-dependent for
    ties). One shuffle on c_nationkey serves all four functions —
    Spark evaluates them in a single Window operator pass."""
    from pyspark.sql import Window as W

    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return cust.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.dense_rank().over(w).cast("bigint").alias("drank"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "profile_orders_table",
    oracle="""
    SELECT 'o_orderkey' AS col, count(*) AS n_rows,
           count(*) - count(o_orderkey) AS n_nulls,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_val,
           CAST(max(o_orderkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*),
           count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*),
           count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    """,
)
def profile_orders_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling primitive: per-column row/null/distinct counts
    and min/max (stringified for a uniform schema) — the audit run
    before any 100 TB ingest is trusted. Shaped as ONE pass over the
    table computing all columns' profiles together (count_distinct
    per column in a single aggregate) rather than a scan per column;
    min/max stringification happens after aggregation, so the scan
    stays typed and pushdown-friendly. At extreme cardinalities the
    exact count_distinct becomes approx_count_distinct — the swap
    point is a one-line change per column and the output contract
    stays fixed."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            x
            for c in ("o_orderkey", "o_orderstatus", "o_orderpriority")
            for x in (
                F.count(c).alias(f"{c}_nn"),
                F.count_distinct(c).alias(f"{c}_nd"),
                F.min(c).alias(f"{c}_min"),
                F.max(c).alias(f"{c}_max"),
            )
        ],
    )
    rows = []
    for c in ("o_orderkey", "o_orderstatus", "o_orderpriority"):
        rows.append(
            agg.select(
                F.lit(c).alias("col"),
                F.col("n_rows"),
                (F.col("n_rows") - F.col(f"{c}_nn")).alias("n_nulls"),
                F.col(f"{c}_nd").alias("n_distinct"),
                F.col(f"{c}_min").cast("string").alias("min_val"),
                F.col(f"{c}_max").cast("string").alias("max_val"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


@register(
    "stats_price_quantity",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           round(corr(l_quantity, l_extendedprice), 6) AS qp_corr,
           round(stddev_samp(l_quantity), 6) AS qty_sd,
           round(avg(l_quantity), 6) AS qty_mean,
           -- Spark reports POPULATION skewness g1 and excess kurtosis
           -- g2; DuckDB's skewness is the sample-corrected G1, so
           -- un-correct it (g1 = G1*(n-2)/sqrt(n*(n-1))) and use
           -- kurtosis_pop directly
           round(skewness(l_quantity) * (count(*) - 2)
                 / sqrt(count(*) * (count(*) - 1.0)), 6) AS qty_skew,
           round(kurtosis_pop(l_quantity), 6) AS qty_kurt
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def stats_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family: correlation, stddev, skewness,
    kurtosis per return flag — one pass, all moments together (Spark
    merges the co-moment sketches associatively, so partial
    aggregation holds and the shuffle carries one small state row per
    group per mapper; the same property is what makes these exact on
    100 TB without a second pass). Quantities are integer-valued
    doubles, so the moment sums are exact and both engines agree at
    6 dp despite different summation orders. Formula trap the oracle
    gate caught: Spark reports POPULATION skewness/kurtosis (g1, g2)
    while DuckDB defaults to the sample-corrected G1/G2 — the oracle
    un-corrects skewness algebraically and uses kurtosis_pop, because
    'skewness' does not name one formula across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qp_corr"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_sd"),
        F.round(F.avg("l_quantity"), 6).alias("qty_mean"),
        F.round(F.skewness("l_quantity"), 6).alias("qty_skew"),
        F.round(F.kurtosis("l_quantity"), 6).alias("qty_kurt"),
    )


@register(
    "nested_struct_pruning",
    oracle="""
    SELECT o_orderpriority AS priority,
           count(*) AS n,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total_price
    FROM orders
    WHERE year(o_orderdate) = 1998
    GROUP BY priority
    """,
)
def nested_struct_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type round trip + nested schema pruning: orders are
    rewritten with the payload folded into a STRUCT (meta.priority,
    meta.placed.year, amounts.total) — the shape event logs and API
    dumps actually arrive in — then the query touches only three leaf
    fields. Spark's nestedSchemaPruning pushes the projection INTO the
    parquet scan: ReadSchema lists just the referenced leaves, not the
    whole struct (tests/test_plans.py pins it). At 100 TB of deeply
    nested logs, reading 3 leaves instead of the full struct is the
    difference between a column scan and a table scan. The oracle runs
    the equivalent flat query on the original table — nesting must
    not change a single aggregate."""
    tag = cache_tag(sf_dir)
    out = os.path.join(tempfile.gettempdir(), "tgos_nested_cache", tag)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        orders = load_table(spark, sf_dir, "orders")
        nested = orders.select(
            "o_orderkey",
            F.struct(
                F.col("o_orderpriority").alias("priority"),
                F.struct(
                    F.year("o_orderdate").alias("year"),
                    F.month("o_orderdate").alias("month"),
                ).alias("placed"),
                F.col("o_orderstatus").alias("status"),
            ).alias("meta"),
            F.struct(
                F.col("o_totalprice").alias("total"),
                (F.col("o_totalprice") * 0.1).alias("tax_estimate"),
            ).alias("amounts"),
        )
        nested.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.filter(F.col("meta.placed.year") == 1998)
        .groupBy(F.col("meta.priority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.expr("CAST(amounts.total AS DECIMAL(18,2))")).cast(
                    "double"
                ),
                2,
            ).alias("total_price"),
        )
    )


@register(
    "array_functions_showcase",
    oracle="""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    )
    SELECT vec_id,
           len(e) AS dim,
           len(list_filter(e, x -> x > 0)) AS n_pos,
           CAST(len(list_filter(e, x -> abs(x) > 2)) > 0 AS INT) AS any_big,
           CAST(len(list_filter(e, x -> abs(x) >= 4)) = 0 AS INT) AS all_small,
           round(list_sum(e), 6) AS total,
           round(list_reverse_sort(e)[1], 6) AS max0,
           round(list_reverse_sort(e)[2], 6) AS max1
    FROM v
    """,
)
def array_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function surface over the embedding column:
    transform (double widening), filter, exists/forall (emitted as
    ints — nullable-boolean columns hash differently per engine),
    aggregate (sequential left fold — matches DuckDB's list_sum
    ordering exactly, same reason the cosine oracles agree to the
    ulp), and sort_array for ranked element access. These lambdas run
    on Spark's interpreted higher-order evaluator — fine for per-row
    feature math, and exactly what the hot paths in dedup/similarity
    deliberately AVOID by reshaping into explode + codegen aggregates
    (see minhash_signatures_from_shingles); this query documents both
    sides of that tradeoff."""
    from text_grabr_orc_spark.functions.vectors import to_double_array

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("e")
    )
    desc = F.reverse(F.array_sort("e"))
    return emb.select(
        "vec_id",
        F.size("e").cast("bigint").alias("dim"),
        F.size(F.filter("e", lambda x: x > 0)).cast("bigint").alias("n_pos"),
        F.exists("e", lambda x: F.abs(x) > 2).cast("int").alias("any_big"),
        F.forall("e", lambda x: F.abs(x) < 4).cast("int").alias("all_small"),
        F.round(
            F.aggregate("e", F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("total"),
        F.round(desc.getItem(0), 6).alias("max0"),
        F.round(desc.getItem(1), 6).alias("max1"),
    )


@register(
    "set_ops_multiset",
    oracle="""
    WITH a AS (
        SELECT o_custkey AS custkey FROM orders
        WHERE o_orderpriority = '1-URGENT'
    ), b AS (
        SELECT o_custkey AS custkey FROM orders
        WHERE o_totalprice > 200000
    )
    SELECT 'intersect_all' AS op, count(*) AS n
    FROM (SELECT custkey FROM a INTERSECT ALL SELECT custkey FROM b)
    UNION ALL
    SELECT 'except_all', count(*)
    FROM (SELECT custkey FROM a EXCEPT ALL SELECT custkey FROM b)
    UNION ALL
    SELECT 'union_all', count(*)
    FROM (SELECT custkey FROM a UNION ALL SELECT custkey FROM b)
    """,
)
def set_ops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — intersectAll / exceptAll /
    unionAll — which keep DUPLICATE multiplicity: a customer with
    three urgent orders and one big order contributes min(3,1)=1 row
    to INTERSECT ALL and 3-1=2 rows to EXCEPT ALL. The distinct
    variants (set_ops_customer_cohorts) answer "which customers"; the
    ALL variants answer "how many order events" — different questions
    that a complete engine must keep apart. Spark plans intersectAll/
    exceptAll as count-aggregated joins on the key, so the shuffle
    carries (key, count) rows, not the multiset itself."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("custkey")
    )
    counts = [
        ("intersect_all", a.intersectAll(b)),
        ("except_all", a.exceptAll(b)),
        ("union_all", a.unionAll(b)),
    ]
    parts = [
        df.agg(F.lit(op).alias("op"), F.count(F.lit(1)).alias("n"))
        for op, df in counts
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# Z-order (multi-dimensional) data layout
# ---------------------------------------------------------------------------

#: bits per dimension for the 2-D Morton code (4 bits -> 16 buckets
#: per key, 256 z-values) and z-values per layout block
_Z_BITS = 4
_Z_BLOCK = 16


def _z_value_sql() -> str:
    """Morton (Z-order) interleave of the low _Z_BITS bits of the
    partkey/suppkey bucket pair — written in the Spark-SQL ∩ DuckDB
    common operator dialect (%, >>, &, <<) so the SAME string is the
    expression on both engines."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((((l_partkey % 16) >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((((l_suppkey % 16) >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


@register(
    "zorder_layout_2d",
    oracle=f"""
    WITH z AS (
        SELECT l_partkey % 16 AS bx, l_suppkey % 16 AS by,
               {_z_value_sql()} AS zval
        FROM lineitem
    )
    SELECT zval // {_Z_BLOCK} AS block_id,
           count(*) AS n_rows,
           CAST(min(bx) AS BIGINT) AS min_bx,
           CAST(max(bx) AS BIGINT) AS max_bx,
           CAST(min(by) AS BIGINT) AS min_by,
           CAST(max(by) AS BIGINT) AS max_by
    FROM z GROUP BY block_id
    """,
)
def zorder_layout_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER layout: the multi-column generalization of
    ``sorted_layout_zone_maps``. Each lineitem row gets a Morton code
    interleaving the bits of its (partkey, suppkey) buckets; rows
    sorted by that code land in layout blocks whose per-block min/max
    zone maps are TIGHT in BOTH dimensions simultaneously (each block
    covers a small sub-rectangle of the key space, never a full row
    or column stripe), which is what lets a scan prune files for
    predicates on EITHER key — single-column sort gives pruning on
    one key and none on the other.

    This query computes the per-block zone maps directly (block =
    contiguous z-value range, exactly what a writer sorting by zval
    into fixed-size files produces); the write itself is the
    repartitionByRange(zval) + sortWithinPartitions pattern of
    sorted_layout_zone_maps. The block summary quantifies layout
    quality: every block spans at most a 4x4 bucket rectangle of the
    16x16 key grid. The Morton expression is integer bit arithmetic —
    bit-identical across engines by construction.

    Scale: the z-value is a map-only expression; the block summary is
    one aggregate keyed by 16 block ids. A real table rewrite adds
    one range shuffle — the standard price of re-clustering, paid
    once to make every later multi-dim scan prune."""
    li = load_table(spark, sf_dir, "lineitem")
    z = li.select(
        (F.col("l_partkey") % 16).alias("bx"),
        (F.col("l_suppkey") % 16).alias("by"),
        F.expr(_z_value_sql()).alias("zval"),
    )
    return (
        z.groupBy(F.expr(f"zval div {_Z_BLOCK}").alias("block_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("bx").cast("bigint").alias("min_bx"),
            F.max("bx").cast("bigint").alias("max_bx"),
            F.min("by").cast("bigint").alias("min_by"),
            F.max("by").cast("bigint").alias("max_by"),
        )
    )


# ---------------------------------------------------------------------------
# SCD Type-2 dimension versioning (warehouse merge semantics)
# ---------------------------------------------------------------------------

#: deterministic "incoming update" slice: every 7th customer gets a
#: new account balance (derived from row keys, same on both engines)
_SCD_MOD = 7


@register(
    "scd2_customer_updates",
    oracle=f"""
    WITH updates AS (
        SELECT c_custkey,
               round(CAST(c_acctbal AS DECIMAL(18,2))
                     + CAST(100.50 AS DECIMAL(18,2)), 2) AS new_bal
        FROM customer WHERE c_custkey % {_SCD_MOD} = 0
    )
    SELECT c.c_custkey,
           CAST(1 AS BIGINT) AS version,
           round(CAST(c.c_acctbal AS DECIMAL(18,2)), 2) AS acctbal,
           CAST(CASE WHEN u.c_custkey IS NULL THEN 1 ELSE 0 END AS BIGINT)
               AS is_current
    FROM customer c LEFT JOIN updates u USING (c_custkey)
    UNION ALL
    SELECT c_custkey, CAST(2 AS BIGINT), CAST(new_bal AS DOUBLE),
           CAST(1 AS BIGINT)
    FROM updates
    """,
)
def scd2_customer_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 merge: an incoming update
    batch (deterministic slice: every 7th customer's balance changes)
    versions the customer dimension — updated keys keep their old row
    closed (version 1, is_current=0) and gain a new current row
    (version 2), untouched keys stay current at version 1. This is
    the MERGE INTO ... WHEN MATCHED pattern expressed as pure
    relational algebra (one left join + one union), which is exactly
    how engines without row-level mutation (plain parquet at 100 TB)
    implement warehouse merges: rewrite-on-merge with version flags,
    the reader filtering is_current=1 for the live view.

    Scale: the update batch is tiny relative to the dimension, so the
    left join broadcasts it; the union appends |updates| rows. One
    shuffle-free pass over the dimension at any scale — the same
    shape a Delta/Iceberg MERGE compiles to under the hood (minus
    their file-level skipping metadata).

    Money values ride DECIMAL(18,2) end to end; the version-2 balance
    widens to DOUBLE only at the output boundary (both engines from
    the identical decimal)."""
    cust = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    updates = cust.filter(F.col("c_custkey") % _SCD_MOD == 0).select(
        "c_custkey",
        F.round(bal + F.lit(100.50).cast("decimal(18,2)"), 2).alias("new_bal"),
    )
    old = (
        cust.join(
            F.broadcast(updates.select("c_custkey", F.lit(1).alias("upd"))),
            "c_custkey",
            "left",
        )
        .select(
            "c_custkey",
            F.lit(1).cast("bigint").alias("version"),
            F.round(bal, 2).cast("double").alias("acctbal"),
            F.col("upd").isNull().cast("bigint").alias("is_current"),
        )
    )
    new = updates.select(
        "c_custkey",
        F.lit(2).cast("bigint").alias("version"),
        F.col("new_bal").cast("double").alias("acctbal"),
        F.lit(1).cast("bigint").alias("is_current"),
    )
    return old.unionByName(new)
