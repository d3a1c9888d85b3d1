"""M1 — the relational query surface (SURVEY.md §2b).

The reference has no relational engine at all (its whole computation
is one projection, ``/root/reference/main.go:192-197``); this module
supplies the full operator surface a user of a query engine needs:
filters, projections, joins of every kind, hash aggregates, grouping
sets/rollup/cube, window functions, sorts/top-k, set operations and
scalar functions — each as a declarative DataFrame plan that Catalyst
compiles to whole-stage-codegen with pushdown, plus a DuckDB oracle.

Cross-engine determinism convention (money math): double sums are not
associative, so any aggregate over prices first casts per-row values
to DECIMAL (exact, order-independent addition), then rounds and casts
the final result back to double. Both engines do the identical
per-row double arithmetic and identical exact decimal sums, so value
hashes match bit-for-bit.

Scale notes per query are in the docstrings — the short version:
every join against region/nation/part/supplier/customer is
broadcast-able at real-world cardinalities (Spark picks broadcast via
AQE; region/nation are hinted explicitly), every aggregation
partial-aggregates before its shuffle, and every scan projects and
filters at the parquet reader (verified by plan tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from text_grabr_orc_spark.registry import register
from text_grabr_orc_spark.tables import load_table


def _dec(expr: str, scale: int = 4) -> str:
    """SQL fragment: exact decimal cast for order-independent sums."""
    return f"CAST({expr} AS DECIMAL(18,{scale}))"


#: revenue per lineitem row — identical double math in both engines,
#: then exact decimal for the (order-sensitive) sum.
_REVENUE = _dec("l_extendedprice * (1 - l_discount)")


# ---------------------------------------------------------------------------
# Aggregations (TPC-H Q1 / Q6 style)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum({_dec("l_quantity", 2)}) AS DOUBLE), 2) AS sum_qty,
           round(CAST(sum({_dec("l_extendedprice", 2)}) AS DOUBLE), 2) AS sum_base_price,
           round(CAST(sum({_REVENUE}) AS DOUBLE), 2) AS sum_disc_price,
           round(CAST(sum({_dec("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)}) AS DOUBLE), 2) AS sum_charge,
           round(CAST(sum({_dec("l_quantity", 2)}) AS DOUBLE) / count(*), 2) AS avg_qty,
           round(CAST(sum({_dec("l_extendedprice", 2)}) AS DOUBLE) / count(*), 2) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape on the fixture schema).

    Scale: scan→partial agg→2-key shuffle (6 groups); the shuffle
    carries ~6 rows per map task. The date filter reaches the parquet
    reader (min/max row-group pruning)."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ'2001-09-02'"))
    cnt = F.count(F.lit(1))
    dbl = lambda c: c.cast("double")  # noqa: E731
    return (
        f.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(dbl(F.sum(F.expr(_dec("l_quantity", 2)))), 2).alias("sum_qty"),
            F.round(dbl(F.sum(F.expr(_dec("l_extendedprice", 2)))), 2).alias("sum_base_price"),
            F.round(dbl(F.sum(F.expr(_REVENUE))), 2).alias("sum_disc_price"),
            F.round(
                dbl(F.sum(F.expr(_dec("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)))), 2
            ).alias("sum_charge"),
            F.round(dbl(F.sum(F.expr(_dec("l_quantity", 2)))) / cnt, 2).alias("avg_qty"),
            F.round(dbl(F.sum(F.expr(_dec("l_extendedprice", 2)))) / cnt, 2).alias("avg_price"),
            cnt.alias("count_order"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT round(CAST(sum({_dec("l_extendedprice * l_discount")}) AS DOUBLE), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-heavy scalar aggregate (TPC-H Q6 shape) — the pushdown
    showcase: all four predicates reach the parquet scan; no shuffle
    at all beyond the final 1-row reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ'1996-01-01'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ'1997-01-01'"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.expr(_dec("l_extendedprice * l_discount"))).cast("double"), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-way joins (TPC-H Q3 / Q5 style)
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           round(CAST(sum({_REVENUE}) AS DOUBLE), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY sum({_REVENUE}) DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 unshipped high-revenue orders (TPC-H Q3 shape).

    Scale: customer is filtered before the join (segment predicate
    pushed to its scan) and is the small side; orders⋈lineitem is the
    big shuffle join on the natural key. Exact-decimal revenue makes
    the ORDER BY ... LIMIT deterministic across engines; o_orderkey
    breaks ties."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ'1998-01-01'")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.expr("TIMESTAMP_NTZ'1998-01-01'")
    )
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey).join(
        li, F.col("l_orderkey") == F.col("o_orderkey")
    )
    rev = F.sum(F.expr(_REVENUE))
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.round(F.col("_rev").cast("double"), 2).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           round(CAST(sum({_REVENUE}) AS DOUBLE), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way join, revenue by nation (TPC-H Q5 shape).

    Scale: nation⋈region are explicit broadcast hints (bounded
    cardinality at any sf — see tables.BROADCAST_TABLES); supplier is
    broadcast-sized too. The only big shuffle is orders⋈lineitem.
    The region filter prunes before broadcasting."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ'1996-01-01'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ'1998-01-01'"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    joined = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.expr(_REVENUE)).cast("double"), 2).alias("revenue")
    )


@register(
    "top_parts_by_revenue",
    oracle=f"""
    SELECT p_partkey, p_name, p_brand,
           round(CAST(sum({_REVENUE}) AS DOUBLE), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_partkey, p_name, p_brand
    ORDER BY sum({_REVENUE}) DESC, p_partkey
    LIMIT 20
    """,
)
def top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast join + top-k: part is the dimension side (200 rows at
    sf0.001, still broadcast-sized at 100 TB fact scale); aggregate on
    the fact first is unnecessary here since the join is broadcast —
    no extra shuffle is introduced."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = F.sum(F.expr(_REVENUE))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_name", "p_brand")
        .agg(rev.alias("_rev"), F.count(F.lit(1)).alias("n_lines"))
        .orderBy(F.col("_rev").desc(), F.col("p_partkey"))
        .limit(20)
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            F.round(F.col("_rev").cast("double"), 2).alias("revenue"),
            "n_lines",
        )
    )


# ---------------------------------------------------------------------------
# Semi / anti joins, set ops
# ---------------------------------------------------------------------------


@register(
    "customers_without_urgent_orders",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY c.c_mktsegment
    """,
)
def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (the `except`-style dedup-diff operator of
    SURVEY §2b). Scale: anti join on the orders key shuffles both
    sides once; the priority filter shrinks the build side before the
    join, and AQE converts to broadcast when it fits."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "active_high_value_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE c.c_acctbal > 5000
      AND EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
      )
    """,
)
def active_high_value_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: high-balance customers with at least one open
    order. The status filter lands on the orders scan before the semi
    join, shrinking its build side."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    open_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    return cust.join(
        open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))


@register(
    "set_ops_customer_cohorts",
    oracle="""
    WITH urgent AS (
        SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE o_orderpriority = '1-URGENT'
    ), big AS (
        SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE o_totalprice > 200000
    )
    SELECT 'urgent_and_big' AS cohort, count(*) AS n
    FROM (SELECT custkey FROM urgent INTERSECT SELECT custkey FROM big)
    UNION ALL
    SELECT 'urgent_only' AS cohort, count(*) AS n
    FROM (SELECT custkey FROM urgent EXCEPT SELECT custkey FROM big)
    UNION ALL
    SELECT 'either' AS cohort, count(*) AS n
    FROM (SELECT custkey FROM urgent UNION SELECT custkey FROM big)
    """,
)
def set_ops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer-key cohorts.

    Scale: set ops on a single bigint key; Spark plans them as
    aggregates/joins on the key and AQE coalesces the small results."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    big = (
        orders.filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    def tagged(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("cohort"), F.col("n").cast("bigint")
        )
    return (
        tagged("urgent_and_big", urgent.intersect(big))
        .unionAll(tagged("urgent_only", urgent.exceptAll(big.distinct())))
        .unionAll(tagged("either", urgent.union(big).distinct()))
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rk
        FROM orders
    )
    WHERE rk <= 3
    """,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — the dedup-keep-first /
    top-k-per-key primitive. Scale: one shuffle on the partition key;
    Spark 4 pushes a per-partition rank limit (WindowGroupLimit) so
    executors never materialize full groups."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.col("rk").cast("bigint"),
        )
    )


@register(
    "window_customer_order_history",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE), 2) AS running_spend,
           round(COALESCE(lag(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ), 0.0), 2) AS prev_totalprice,
           CAST(datediff('day',
               lag(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    """,
)
def window_customer_order_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + running frame aggregate per customer — order history with
    inter-order gaps. Running sum goes through DECIMAL so the
    prefix-sum is exact in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.round("o_totalprice", 2).alias("totalprice"),
        F.round(
            F.sum(F.expr("CAST(o_totalprice AS DECIMAL(18,2))")).over(run).cast("double"),
            2,
        ).alias("running_spend"),
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2).alias(
            "prev_totalprice"
        ),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).cast("bigint").alias("days_since_prev"),
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube
# ---------------------------------------------------------------------------


@register(
    "agg_rollup_returns",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum({_dec("l_quantity", 2)}) AS DOUBLE), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: per-(flag,status), per-flag subtotals, grand total.
    Scale: Spark expands grouping sets after partial aggregation — the
    shuffle still carries only group keys."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(F.expr(_dec("l_quantity", 2))).cast("double"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_cube_segment_priority",
    oracle="""
    SELECT c_mktsegment, o_orderpriority,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_spend
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY CUBE (c_mktsegment, o_orderpriority)
    """,
)
def agg_cube_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over market segment x order priority (all 4 grouping
    sets) after a customer join."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.expr("CAST(o_totalprice AS DECIMAL(18,2))")).cast("double"), 2
            ).alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# Scalar functions / JSON
# ---------------------------------------------------------------------------


@register(
    "scalar_functions_showcase",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS BIGINT) AS brand_num,
           substr(p_type, 1, 3) AS type_prefix,
           concat(p_brand, '/', p_type) AS brand_type,
           CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M'
                ELSE 'L' END AS size_class,
           round(p_retailprice * 1.1, 2) AS uplifted_price,
           length(p_name) AS name_len
    FROM part
    WHERE p_size BETWEEN 1 AND 40
    """,
)
def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/regex/case/arithmetic scalar surface (SURVEY §2b row
    'scalar functions') — all codegen'd JVM expressions."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_size").between(1, 40)).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).cast("bigint").alias("brand_num"),
        F.substring("p_type", 1, 3).alias("type_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_size") < 10, "S")
        .when(F.col("p_size") < 30, "M")
        .otherwise("L")
        .alias("size_class"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("uplifted_price"),
        F.length("p_name").cast("bigint").alias("name_len"),
    )
