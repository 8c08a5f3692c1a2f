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


# --- round 3b: the remaining classic shapes (q2/q11/q13/q15/q20/q21/q22) ----
# With these the catalog carries all 22 TPC-H query shapes, each adapted
# to the driver schema (no partsupp / phone / comment / commitdate —
# substitutions documented per query).


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT))
               AS cost_cents
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eu AS (
      SELECT ps.l_partkey, ps.l_suppkey, ps.cost_cents,
             s.s_name, s.s_acctbal, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT CAST(round(eu.s_acctbal * 100) AS BIGINT) AS acctbal_cents,
           eu.s_name, eu.n_name, p.p_partkey, eu.cost_cents
    FROM eu
    JOIN part p ON p.p_partkey = eu.l_partkey
    WHERE p.p_type = 'STANDARD'
      AND eu.cost_cents = (
        SELECT min(e2.cost_cents) FROM eu e2 WHERE e2.l_partkey = eu.l_partkey
      )
    ORDER BY acctbal_cents DESC, eu.s_name, p.p_partkey
    LIMIT 100
    """,
    tags=("join", "agg", "subquery", "tpch", "J1", "J4"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for every STANDARD part, the
    EUROPE supplier(s) offering it at the lowest unit cost.

    Schema adaptation: no ``partsupp`` table, so the (part, supplier)
    cost relation is DERIVED from lineitem — cost = min unit price
    (extendedprice/quantity, per-row division then round: no aggregation
    order sensitivity) ever charged by that supplier for that part.

    The correlated min subquery is rendered as a WINDOW min over
    l_partkey, not as a min-aggregate self-joined back: the self-join
    rendering makes Spark build the whole ps+supplier+nation+region
    subtree TWICE (verified in the formatted plan — two full lineitem
    scans), which doubles the dominant cost at 100 TB. The window
    rendering computes eu once and adds a single hash shuffle on
    l_partkey; the filter cost == min-over-part then runs in-partition.
    """
    from pyspark.sql.window import Window

    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    unit_cents = F.round(
        F.col("l_extendedprice") / F.col("l_quantity") * 100
    ).cast("long")
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(unit_cents).alias("cost_cents")
    )
    eu = (
        ps.join(s, s.s_suppkey == ps.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .select("l_partkey", "cost_cents", "s_name", "s_acctbal", "n_name")
    )
    best = F.min("cost_cents").over(Window.partitionBy("l_partkey"))
    return (
        eu.withColumn("best_cents", best)
        .filter(F.col("cost_cents") == F.col("best_cents"))
        .join(p, p.p_partkey == F.col("l_partkey"))
        .select(
            F.round(F.col("s_acctbal") * 100).cast("long").alias("acctbal_cents"),
            "s_name",
            "n_name",
            "p_partkey",
            "cost_cents",
        )
        .orderBy(F.desc("acctbal_cents"), "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_parts",
    oracle=f"""
    WITH pv AS (
      SELECT l.l_partkey,
             CAST(sum({_VOL_CENTS_SQL}) AS BIGINT) AS value_cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, value_cents
    FROM pv
    WHERE CAST(value_cents AS DOUBLE) > 2 * (SELECT avg(value_cents) FROM pv)
    ORDER BY value_cents DESC, l_partkey
    """,
    tags=("join", "agg", "subquery", "tpch", "A5"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): parts whose NATION_3-supplied revenue
    exceeds a corpus-wide threshold.

    Schema adaptation: part value = Σ revenue-cents of that part's
    lineitems shipped by NATION_3 suppliers (no partsupp availqty/cost).
    Classic Q11's fixed ``0.0001/SF`` fraction is replaced by
    ``2 × avg per-part value`` — a scalar that self-scales with SF, so
    the query stays selective at every test scale. The threshold is a
    scalar-aggregate subquery: Spark computes it as a 1-row broadcast
    cross join (no second scan barrier at scale); integer cents make the
    avg deterministic (exact long sum / count).
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    pv = (
        l.join(s, s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy("l_partkey")
        .agg(
            _cents_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("value_cents")
        )
    )
    thresh = pv.agg((2 * F.avg("value_cents")).alias("thresh"))
    return (
        pv.join(F.broadcast(thresh))
        .filter(F.col("value_cents").cast("double") > F.col("thresh"))
        .select("l_partkey", "value_cents")
        .orderBy(F.desc("value_cents"), "l_partkey")
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "agg", "outer", "tpch", "J2", "A5"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): histogram of
    per-customer order counts, zeros included via the outer join.

    Schema adaptation: the classic ``o_comment NOT LIKE '%special%
    requests%'`` exclusion becomes ``o_orderpriority <> '1-URGENT'``
    (no comment column) — same shape: the predicate lives in the JOIN
    condition, not a WHERE, so customers whose every order is excluded
    still appear with count 0.

    Two shuffles (custkey, then count) — the second input is one row
    per customer, negligible at any scale.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l.l_suppkey,
             CAST(sum({_VOL_CENTS_SQL}) AS BIGINT) AS total_rev_cents
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev.total_rev_cents
    FROM supplier s
    JOIN rev ON rev.l_suppkey = s.s_suppkey
    WHERE rev.total_rev_cents = (SELECT max(total_rev_cents) FROM rev)
    ORDER BY s.s_suppkey
    """,
    tags=("join", "agg", "subquery", "tpch", "A5"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) with maximum 1996Q1 revenue.

    The classic VIEW becomes a CTE-shaped DataFrame reused for both the
    per-supplier revenue and the scalar max — Spark computes rev once
    per branch (at 100 TB, ``rev`` is one shuffle over the
    shipdate-pruned scan; the max side is a 1-row broadcast). Integer
    cents make ``= max`` an exact comparison — the whole point of the
    query — where a double revenue would make ties engine-dependent.
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            _cents_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_rev_cents")
        )
    )
    mx = rev.agg(F.max("total_rev_cents").alias("mx"))
    return (
        s.join(rev, rev.l_suppkey == s.s_suppkey)
        .join(F.broadcast(mx))
        .filter(F.col("total_rev_cents") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_rev_cents")
        .orderBy("s_suppkey")
    )


@register(
    "q20_excess_share_suppliers",
    oracle="""
    WITH pq AS (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'PROMO' AND year(l.l_shipdate) = 1997
      GROUP BY l.l_partkey, l.l_suppkey
    ), tot AS (
      SELECT l_partkey, CAST(sum(supp_qty) AS BIGINT) AS total_qty
      FROM pq GROUP BY l_partkey
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT pq.l_suppkey
      FROM pq JOIN tot ON tot.l_partkey = pq.l_partkey
      WHERE 2 * pq.supp_qty > tot.total_qty
    )
    ORDER BY s.s_name
    """,
    tags=("join", "agg", "semi", "tpch", "J5"),
)
def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (excess-share suppliers): suppliers who shipped a
    MAJORITY (>50%) of some PROMO part's 1997 volume.

    Schema adaptation: no partsupp availqty, so "excess stock" becomes
    "dominant shipper": per-(part, supplier) 1997 quantity vs the
    part's total, compared in pure integer arithmetic
    (``2·supp_qty > total_qty`` — no float share, no boundary flips).
    Shape preserved from the classic: a nested IN subquery that Spark
    executes as aggregate → join → LEFT SEMI join into supplier; the
    part filter prunes the lineitem scan before the first shuffle.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    pq = (
        l.filter(F.year("l_shipdate") == 1997)
        .join(p, p.p_partkey == l.l_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("supp_qty"))
    )
    tot = pq.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("supp_qty").alias("total_qty")
    )
    dominant = (
        pq.join(tot, F.col("l_partkey") == F.col("t_partkey"))
        .filter(2 * F.col("supp_qty") > F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), n.n_nationkey == F.col("s_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "q21_final_shipper",
    oracle="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate >= l1.l_shipdate
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    tags=("join", "agg", "semi", "anti", "tpch", "J3", "J5"),
)
def q21_final_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): per supplier, how
    many finished multi-supplier orders ended with THIS supplier's
    shipment strictly last.

    Schema adaptation: no commitdate/receiptdate, so "late" becomes
    "shipped strictly after every other supplier in the order". The
    EXISTS/NOT-EXISTS pair keeps the classic shape and maps to Spark's
    LEFT SEMI + LEFT ANTI self-joins on l_orderkey with the non-equi
    residual (suppkey ≠, shipdate ≥) evaluated inside the join — both
    are one hash shuffle of lineitem on orderkey, reused by AQE, never
    a cartesian.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    l1 = l.alias("l1")
    l2 = l.alias("l2")
    l3 = l.alias("l3")
    has_other = l1.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    sole_last = has_other.join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
        & (F.col("l3.l_shipdate") >= F.col("l1.l_shipdate")),
        "left_anti",
    )
    return (
        sole_last.join(o, o.o_orderkey == F.col("l1.l_orderkey"))
        .join(s, s.s_suppkey == F.col("l1.l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@register(
    "q22_dormant_customers",
    oracle="""
    WITH bal AS (
      SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / count(*) AS avg_cents
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS totacctbal_cents
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > (SELECT avg_cents FROM bal)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    tags=("join", "agg", "anti", "subquery", "tpch", "J3"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers with no RECENT orders, grouped by nation.

    Schema adaptations: country code comes from the nation join (no
    c_phone to substring), and because this dataset gives every
    customer at least one lifetime order, "never ordered" becomes "no
    order since 1999-01-01" — the anti-join shape is identical, with
    the date predicate pushed into the join condition.

    Determinism: the scalar average is computed over integer cents
    (exact long sum ÷ count — one double division) rather than
    avg(double), whose partial-sum order varies run to run; the
    comparison side is the customer's exact cents. Both engines agree
    bit-for-bit.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(cents).cast("double") / F.count(F.lit(1))
        ).alias("avg_cents")
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    return (
        c.withColumn("bal_cents", cents)
        .join(F.broadcast(bal))
        .filter(F.col("bal_cents") > F.col("avg_cents"))
        .join(recent, recent.o_custkey == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(n), n.n_nationkey == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_cents").alias("totacctbal_cents"),
        )
        .orderBy("n_name")
    )
