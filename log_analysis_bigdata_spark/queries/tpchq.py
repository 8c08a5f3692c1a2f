"""Extended TPC-H-shaped relational queries (round 3).

Widens the §2.3/§2.4 join+agg surface with the classic decision-support
shapes q8/q9/q10/q12/q14/q16/q17/q18/q19, adapted to the driver's
star schema (no ``partsupp``; ``lineitem`` has no
shipmode/commitdate/receiptdate — adaptations documented per query).

Determinism rules are the package ones (queries/__init__ docstring):
money as per-item integer cents, ratios rounded to 4, every LIMIT under
a total order. Two queries make classically-floating comparisons exact:
q17 rewrites ``qty < 0.2 * avg(qty)`` into pure integer arithmetic
(``5 * qty * n < sum``) so no engine's partial-agg order can flip a
boundary row, and q8/q14's shares divide two integer cents-sums.

Scale notes: region/nation are always broadcast; part joins are left to
AQE (part scales with SF — at 100 TB it's a shuffle join with the
selective type/brand filter pushed to the scan); q18's big-order
semi-join is an aggregate-then-semi-join (one extra shuffle on
l_orderkey, no row explosion); nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register
from .relational import _cents_sum

_VOL_CENTS_SQL = "CAST(round((l.l_extendedprice * (1 - l.l_discount)) * 100) AS BIGINT)"


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN vol_cents ELSE 0 END) AS DOUBLE)
                 / sum(vol_cents), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             {_VOL_CENTS_SQL} AS vol_cents,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("join", "agg", "tpch", "J1", "J4"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_1 suppliers' share of
    ECONOMY-part revenue sold into AMERICA customers, per order year.

    Share = ratio of two integer cents-sums (order-independent), rounded
    to 4 — a double revenue total could flip its last bit with partial-agg
    order and shift the rounded share.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol_cents = F.round(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
    ).cast("long")
    joined = (
        p.join(l, l.l_partkey == p.p_partkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), n1.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n1.n_regionkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n2), F.col("n2_nationkey") == s.s_nationkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol_cents.alias("vol_cents"),
            "supp_nation",
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_1", F.col("vol_cents")).otherwise(0)
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.round(num.cast("double") / F.sum("vol_cents"), 4).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_profit_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)
                                - 0.2 * p.p_retailprice * l.l_quantity) * 100) AS BIGINT)) AS BIGINT)
             AS profit_cents
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year
    """,
    tags=("join", "agg", "tpch", "J1", "F2"),
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit) adapted: the schema has no
    ``partsupp``, so unit cost is proxied as ``0.2 * p_retailprice``
    (the classic query's ``ps_supplycost * l_quantity`` term keeps its
    shape — a part-side attribute times quantity). Profit per supplier
    nation per order year over parts named like '%red%'.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.2 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        p.join(l, l.l_partkey == p.p_partkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(_cents_sum(amount).alias("profit_cents"))
        .orderBy("nation", "o_year")
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(sum({_VOL_CENTS_SQL}) AS BIGINT) AS revenue_cents,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue_cents DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk", "tpch", "J1", "W4"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns
    (returnflag 'R') for orders placed in 1997H1. c_acctbal passes
    through untouched from parquet, so it hash-matches raw.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _cents_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue_cents"
            )
        )
        .select("c_custkey", "c_name", "revenue_cents", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue_cents"), "c_custkey")
        .limit(20)
    )


@register(
    "q12_late_shipments",
    oracle="""
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 90 THEN 'very_late'
                WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 30 THEN 'late'
                ELSE 'on_time' END AS ship_bucket,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY ship_bucket
    ORDER BY ship_bucket
    """,
    tags=("join", "agg", "tpch", "F7"),
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping-mode priority) adapted: the schema has no
    shipmode/commitdate/receiptdate, so lines are bucketed by
    order-to-ship latency (<=30d on_time, <=90d late, else very_late)
    and counted by urgent-vs-other order priority — the classic query's
    exact CASE shape over a derived transport attribute.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay > 90, "very_late").when(delay > 30, "late").otherwise("on_time")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO' THEN {_VOL_CENTS_SQL} ELSE 0 END)
                 / sum({_VOL_CENTS_SQL}), 4) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-04-01'
    """,
    tags=("join", "agg", "tpch", "F7"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO parts' percentage of 1998Q1 shipped revenue.
    One ratio of integer cents-sums, rounded to 4."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    vol = F.round((F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100).cast(
        "long"
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0))
    return (
        l.join(p, p.p_partkey == l.l_partkey)
        .agg(
            F.round(100.0 * promo.cast("double") / F.sum(vol), 4).alias(
                "promo_revenue_pct"
            )
        )
    )


@register(
    "q16_parts_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#12' AND p.p_type <> 'PROMO' AND p.p_size IN (1, 9, 14, 23, 36, 45)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    tags=("join", "agg", "distinct", "tpch", "A8"),
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) adapted: ``partsupp`` is
    absent, so the observed supplier set per part comes from lineitem —
    count(DISTINCT l_suppkey) per (brand, type, size) outside an excluded
    brand/type, sizes from a fixed IN-list. Distinct-agg shuffles once on
    the group key with partial distinct upstream.
    """
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#12")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 23, 36, 45)
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        p.join(l, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH agg AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS small_qty_revenue_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN agg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#15'
      AND 5 * CAST(l.l_quantity AS BIGINT) * a.n < a.qty_sum
    """,
    tags=("join", "agg", "subquery", "tpch", "A5"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue from Brand#15
    lines whose quantity is below 20% of that part's average quantity.

    The correlated ``l_quantity < 0.2 * avg(l_quantity)`` is decorrelated
    into a per-part aggregate join, and the comparison is made EXACT in
    integers — ``5*qty*n < qty_sum`` ⇔ ``qty < 0.2*sum/n`` (quantities
    are integral) — so no engine's floating partial-agg order can flip a
    boundary row. At scale: two shuffles on l_partkey (agg + join), both
    AQE-coalesced; the Brand filter prunes the probe side at the scan.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#15")
    agg = l.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"),
        F.count(F.lit(1)).alias("n"),
    )
    probe = l.select("l_partkey", "l_quantity", "l_extendedprice")
    return (
        probe.join(p, p.p_partkey == probe.l_partkey)
        .join(agg, "l_partkey")
        .filter(
            5 * F.col("l_quantity").cast("long") * F.col("n") < F.col("qty_sum")
        )
        .agg(_cents_sum("l_extendedprice").alias("small_qty_revenue_cents"))
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS BIGINT)) > 200
    )
    GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY total_cents DESC, o.o_orderkey
    LIMIT 100
    """,
    tags=("join", "agg", "semi", "topk", "tpch", "J5", "W4"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds 200, with customer and per-order quantity, top-100 by price.

    The HAVING subquery is an aggregate + LEFT SEMI join on l_orderkey —
    no row duplication, and at scale the semi-join's build side is only
    the qualifying keys (tiny after the >200 filter).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .filter(F.col("q") > 200)
        .select("l_orderkey")
    )
    o_big = o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
    return (
        c.join(o_big, o_big.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o_big.o_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
            "sum_qty",
        )
        .orderBy(F.desc("total_cents"), "o_orderkey")
        .limit(100)
    )


@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(sum({_VOL_CENTS_SQL}) AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "agg", "tpch", "F7", "P5"),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): disjunctive brand/size/quantity
    predicate over the part join (shipmode/container legs dropped — not
    in schema). Catalyst extracts the common l_quantity bounds below the
    join and evaluates the residual disjunction post-join; single-row
    cents total.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(p, p.p_partkey == l.l_partkey)
        .filter(cond)
        .agg(
            _cents_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue_cents"
            )
        )
    )
