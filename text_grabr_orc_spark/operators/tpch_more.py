"""TPC-H shape completion (SURVEY.md §2b "joins (all kinds)" /
"aggregations" / "sorts / limits / top-k").

The reference has no relational engine (SURVEY.md §2b — `main.go` is
the whole codebase), so these are north-star operators: the remaining
canonical TPC-H query shapes not yet covered by q1/q3/q5/q6/q10/q14/
q18 — semi-join EXISTS aggregation (Q4), many-way join with derived
grouping column (Q7), profit-by-nation (Q9), conditional CASE
aggregation (Q12), outer-join two-level distribution (Q13),
disjunctive multi-range predicates (Q19), correlated EXISTS + NOT
EXISTS (Q21), anti-join with scalar subquery threshold (Q22), and the
correlated-min shape at the heart of Q2. Columns the fixtures lack
(l_commitdate, l_shipmode, c_phone, partsupp) are substituted with
semantically-equivalent predicates on existing columns; each docstring
notes the substitution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from text_grabr_orc_spark.registry import register
from text_grabr_orc_spark.tables import load_table

_DISC_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(1 - CAST(l_discount AS DECIMAL(18,2)))"
)


@register(
    "q4_priority_returns_exist",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_returns_exist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): one quarter's orders having
    at least one flagged lineitem, counted by priority. The fixture has
    no l_commitdate/l_receiptdate, so "late" is substituted with
    l_returnflag = 'R'. Built as a LEFT SEMI join — existence only, the
    probe side never duplicates orders rows, and the lineitem side is
    pre-filtered so the shuffle carries only candidate keys."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ'1997-01-01'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ'1997-04-01'"))
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS l_year,
               {_DISC_REV} AS volume
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        WHERE n1.n_name <> n2.n_name
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): cross-border revenue by (supplier
    nation, customer nation, ship year) over two years. Adapted to keep
    ALL nation pairs (the classic FRANCE/GERMANY pair may be empty at
    tiny sf) — output stays bounded at |nation|^2 x 2 rows. The two
    nation lookups broadcast; the date filter pushes to the lineitem
    scan so the 6-way join only ever shuffles the two fact tables.
    Rounding happens on the exact DECIMAL sum BEFORE the double cast —
    cast-then-round puts sums ending in .005 on different sides of the
    tie in different engines (observed: a one-cent mismatch)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ'1996-01-01'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ'1998-01-01'"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(F.expr(_DISC_REV)), 2).cast("double").alias("revenue"))
    )


@register(
    "q9_promo_profit_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(l.l_shipdate) AS INT) AS o_year,
           CAST(round(sum({_DISC_REV}), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'PROMO'
    GROUP BY nation, o_year
    """,
)
def q9_promo_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): revenue attributable to PROMO
    parts by supplier nation and year. The fixture has no partsupp /
    ps_supplycost, so profit degrades to discounted revenue and the
    part filter is the flat p_type = 'PROMO' (fixture p_type values are
    single words). part and supplier+nation both broadcast — the only
    shuffle is the final group-by."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", F.year("l_shipdate").cast("int"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.round(F.sum(F.expr(_DISC_REV)), 2).cast("double").alias("profit"))
    )


@register(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l.l_linestatus,
           count(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 END) AS high_line_count,
           count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                 THEN 1 END) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / order priority): conditional CASE
    counts splitting each group by a predicate on the joined side. The
    fixture has no l_shipmode, so the grouping column is l_linestatus
    and the date window is one ship year. count(CASE ...) not
    sum(CASE) keeps both engines on plain BIGINT."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ'1997-01-01'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ'1998-01-01'"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): two-level aggregation — orders
    per customer (keeping zero-order customers via LEFT join with the
    filter in the JOIN condition, not WHERE), then the histogram of
    those counts. The fixture has no o_comment, so the classic
    NOT-LIKE filter is substituted with a priority exclusion. The
    second aggregate's input is |customers| rows, tiny relative to the
    first — the expensive shuffle happens exactly once."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT round(CAST(sum({_DISC_REV}) AS DOUBLE), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1'
           AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#2'
           AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 25)
       OR (p.p_brand = 'Brand#3'
           AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): a disjunction of three
    conjunctive brand/size/quantity range clauses spanning BOTH join
    sides. Catalyst extracts the common join key and pushes the
    single-side conjuncts below the join where possible; the part side
    broadcasts so the disjunction evaluates map-side with no extra
    shuffle. (Fixture has no p_container, so that clause is dropped.)"""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(clause).agg(
        F.round(F.sum(F.expr(_DISC_REV)).cast("double"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q21_sole_returned_supplier",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q21_sole_returned_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept waiting): suppliers who are the
    ONLY one with a returned line in a finished multi-supplier order —
    the correlated EXISTS + NOT EXISTS pair on the same fact table.
    Expressed through the SQL entry path so Catalyst performs the
    rewrite to left-semi + left-anti joins itself (visible in the
    plan). "Late delivery" is substituted with l_returnflag = 'R'
    (fixture has no commit/receipt dates). ORDER BY is total
    (numwait DESC, s_name) so the LIMIT is deterministic."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("tgos_q21_s")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("tgos_q21_l")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("tgos_q21_o")
    return spark.sql(
        """
        SELECT s.s_name, count(*) AS numwait
        FROM tgos_q21_s s
        JOIN tgos_q21_l l1 ON l1.l_suppkey = s.s_suppkey
        JOIN tgos_q21_o o  ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (
              SELECT 1 FROM tgos_q21_l l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM tgos_q21_l l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_returnflag = 'R'
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 10
        """
    )


@register(
    "q22_dormant_high_balance",
    oracle="""
    SELECT c.c_nationkey AS nationkey,
           count(*) AS numcust,
           round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01'
          )
    GROUP BY c.c_nationkey
    """,
)
def q22_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): well-funded customers gone
    dormant — above-average positive balance AND no order since
    2000-01-01 — grouped by nation. The fixture has no c_phone, so the
    country-code IN-list becomes the nationkey grouping, and "no
    orders at all" (true of no fixture customer) becomes a recency
    window. The average-balance threshold rides as a broadcast scalar
    join (single-row aggregate crossJoined onto the scan) — same
    pattern as ``subquery_above_avg_orders``; the previous
    ``.collect()[0][0]`` ran a separate driver-side job just to fetch
    the scalar (round-8 verdict cosmetic #3). The anti join probes
    only the date-filtered slice of orders."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ'2000-01-01'")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .drop("avg_bal")
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(
                F.sum(F.expr("CAST(c_acctbal AS DECIMAL(18,2))")).cast("double"), 2
            ).alias("totacctbal"),
        )
    )


@register(
    "min_price_supplier_per_part",
    oracle="""
    SELECT DISTINCT p.p_partkey, s.s_name,
           round(l.l_extendedprice, 2) AS min_price
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE l.l_extendedprice = (
        SELECT min(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey
    )
    """,
)
def min_price_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's core shape (minimum-cost supplier): for every part,
    the supplier(s) offering its minimum observed price. The fixture
    has no partsupp, so lineitem serves as the part-supplier price
    link. Spark-side this is a window min over l_partkey + an equality
    filter — ONE shuffle on the existing join key instead of the
    oracle's correlated-subquery re-scan; the comparison is on the
    stored double (no arithmetic), so engines agree exactly."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    cheapest = (
        li.withColumn("min_p", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("min_p"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        cheapest.join(F.broadcast(part), cheapest.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), cheapest.l_suppkey == supp.s_suppkey)
        .select(
            "p_partkey",
            "s_name",
            F.round("l_extendedprice", 2).alias("min_price"),
        )
        .distinct()
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_1' THEN volume
                          ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               {_DISC_REV} AS volume,
               n2.n_name AS nation
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n1.n_regionkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'EUROPE'
          AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_1 suppliers' share of
    PROMO-part revenue sold to EUROPE customers, by order year. The
    numerator/denominator are exact DECIMAL sums cast to double only
    for the final division (sum order can't perturb the ratio). All
    five dimension tables broadcast; the only shuffles are the two
    fact-fact joins (lineitem-orders on orderkey, orders-customer on
    custkey) — at 100 TB those are the same two shuffles, with the
    share arithmetic map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ'1996-01-01'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ'1998-01-01'"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    ).select("r_regionkey")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = F.expr(_DISC_REV)
    zero = F.expr("CAST(0.00 AS DECIMAL(18,2))")
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"), "left_semi")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    return (
        j.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_1", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q11_part_value_concentration",
    oracle=f"""
    WITH per_part AS (
        SELECT l.l_partkey AS partkey,
               CAST(sum({_DISC_REV}) AS DOUBLE) AS part_value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_2'
        GROUP BY l.l_partkey
    )
    SELECT partkey, round(part_value, 2) AS part_value
    FROM per_part
    WHERE part_value > (SELECT 2 * avg(part_value) FROM per_part)
    """,
)
def q11_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification): parts whose revenue
    through NATION_2 suppliers exceeds twice the mean per-part value —
    group-by + HAVING against a scalar subquery over the same
    aggregate. The fixture has no partsupp, so "stock value" degrades
    to discounted revenue via that nation's suppliers. Per-part sums
    are exact DECIMAL (order-independent), cast double once; the
    threshold is a 1-row broadcast cross join, so the per-part table
    is scanned once and never re-shuffled."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_2"
    ).select("n_nationkey")
    per_part = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.expr(_DISC_REV)).cast("double").alias("part_value"))
    )
    thresh = per_part.agg((2 * F.avg("part_value")).alias("thr"))
    return (
        per_part.join(F.broadcast(thresh))
        .filter(F.col("part_value") > F.col("thr"))
        .select("partkey", F.round("part_value", 2).alias("part_value"))
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum({_DISC_REV}) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           round(CAST(r.total_revenue AS DOUBLE), 2) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) with maximum revenue
    in 1997Q1 — the view + scalar-max-equality shape, which keeps ALL
    tied winners (a LIMIT 1 would not). Revenue stays exact DECIMAL
    through the max comparison (double rounding there could split a
    tie); the double cast happens only in the projection. The revenue
    aggregate is one shuffle on l_suppkey; the max is a 1-row
    broadcast; supplier joins broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ'1997-01-01'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ'1997-04-01'"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.expr(_DISC_REV)).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue").cast("double"), 2).alias("total_revenue"),
        )
    )


@register(
    "q16_supplier_cnt_by_part",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): distinct supplier count
    per (brand, type, size) bucket, excluding flagged suppliers — the
    count-distinct + NOT-IN-subquery shape. Substitutions: lineitem is
    the part-supplier link (no partsupp); "customer complaints" is
    s_acctbal < 0 (no s_comment). The exclusion is a broadcast
    LEFT ANTI join (NOT IN with non-nullable keys is exactly anti-join
    semantics); part prunes to the 8-size IN-list before broadcasting,
    so the count-distinct shuffle carries only qualifying rows."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE) / 7.0, 2) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue of Brand#3
    lines whose quantity is below 20% of that part's average — the
    correlated scalar-average shape. Spark-side the correlated
    subquery becomes a window average over l_partkey: one shuffle on
    a key the join already uses, no re-scan. The threshold compare is
    exact: quantities are integer-valued doubles, so the per-part avg
    (exact-sum / count) is identical in both engines. The window runs
    over UNFILTERED lineitem (the avg must see all quantities), with
    the brand semi-join applied before the window so only Brand#3
    partitions are ever windowed — same rows the oracle's correlated
    subquery averages, fraction of the shuffle."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).join(F.broadcast(part), F.col("l_partkey") == part.p_partkey, "left_semi")
    w = Window.partitionBy("l_partkey")
    flagged = li.withColumn("avg_qty", F.avg("l_quantity").over(w)).filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    return flagged.agg(
        F.round(
            F.sum(F.expr("CAST(l_extendedprice AS DECIMAL(18,2))")).cast("double")
            / 7.0,
            2,
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q20_promotion_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#4'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING sum(l.l_quantity) > 50
    )
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): suppliers that moved more
    than 50 units of some Brand#4 part since 1996 — the
    nested-grouped-subquery semi-join shape. Substitutions: lineitem
    quantity sums stand in for ps_availqty (no partsupp), Brand#4 for
    the p_name LIKE prefix. Quantity sums are integer-valued doubles —
    exact, so the HAVING boundary can't flip between engines. The
    inner aggregate shuffles on (suppkey, partkey); the distinct
    supplier set after HAVING is tiny and broadcast for the semi-join."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#4"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ'1996-01-01'")
    ).select("l_suppkey", "l_partkey", "l_quantity")
    movers = (
        li.join(F.broadcast(part), F.col("l_partkey") == part.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return supp.join(
        F.broadcast(movers), supp.s_suppkey == movers.l_suppkey, "left_semi"
    )
