"""Wider TPC-H-style relational coverage (SURVEY.md §2.7 joins/aggs).

The reference library has no joins or aggregations of its own (SURVEY.md
§2.7: "joins: NONE", "aggregations: NONE") — its dataflow layer is Kafka
Streams.  Our engine exposes Spark's, and these queries pin the remaining
classic TPC-H planner shapes not covered by q1/q3/q4/q5/q14/q17/q18:

- **Q7 volume shipping**: multi-way fact⨝fact join with TWO independent
  broadcast dim legs (supplier-nation and customer-nation) and a
  symmetric nation-pair predicate — the join-ordering stress shape.
- **Q8 market share**: conditional-numerator / total-denominator ratio
  over a 6-table join tree, grouped by year.
- **Q10 returned-item revenue**: selective fact filter + top-k on an
  aggregated join — TakeOrderedAndProject above a partial agg.
- **Q13 order distribution**: LEFT OUTER join distribution — a two-level
  aggregate (count per customer, then count-of-counts) where the outer
  join must preserve zero-order customers.
- **Q19 OR-of-ANDs**: disjunctive mixed fact/dim predicate — pins that
  the part-side conjuncts still reach the broadcast dim scan and the
  lineitem conjuncts the fact scan (no cross-join blowup).
- **Q22 anti-join + scalar subquery**: customers above the average
  positive balance with no orders — global scalar aggregate broadcast +
  left-anti join.

At 100 TB: every dim here (customer 150k×SF, supplier 10k×SF, nation,
part 200k×SF) is orders of magnitude below the fact tables — all dim
joins carry explicit ``broadcast()`` hints so the fact side never
shuffles for them; the only unavoidable shuffle is lineitem⨝orders on
the order key, and the Q13/Q22 aggregates are keyed on customer — both
are the natural partitioning keys downstream consumers reuse.

Float discipline (SURVEY.md §8): SUMs rounded to 2 decimals for hashing;
ratios to 4 (q14 convention); counts are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..sources.files import load_table as _t


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between a symmetric nation pair,
    by supplier nation / customer nation / ship year."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    nations = [f"NATION_{i}" for i in range(1, 7)]
    pair = (
        F.col("supp_nation").isin(nations)
        & F.col("cust_nation").isin(nations)
        & (F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


SQL_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 2) AS revenue,
       count(*) AS n_lineitems
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
    AND n1.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5','NATION_6')
    AND n2.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5','NATION_6')
    AND n1.n_name <> n2.n_name
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3 suppliers' share of PROMO-part revenue to
    ASIA customers, per order year."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part")
    n_c = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(broadcast(p.filter(F.col("p_type") == "PROMO")), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(n_c), F.col("c_nationkey") == F.col("c_nk"))
        .join(broadcast(n_s), F.col("s_nationkey") == F.col("s_nk"))
        .join(
            broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("c_rk") == F.col("r_regionkey"),
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
    )


SQL_Q8 = """
SELECT year(o_orderdate) AS o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END)
             / sum(volume), 4) AS mkt_share,
       round(sum(volume), 2) AS total_volume
FROM (
  SELECT o_orderdate, n2.n_name AS supp_nation,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey AND p_type = 'PROMO'
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
)
GROUP BY year(o_orderdate)
"""


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top 20 customers by revenue lost to returned items
    in H1-1996 — selective fact filter, agg, then TakeOrderedAndProject."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1996-07-01")
            ),
            l.l_orderkey == o.o_orderkey,
        )
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_returns"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_Q10 = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_returns
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts — LEFT
    OUTER join so zero-order customers land in the c_count=0 bucket, then
    a count-of-counts."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


SQL_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q19_or_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of brand/size/quantity
    conjunct groups — the disjunctive-pushdown stress query.  The shared
    conjuncts (small part sizes) still prune the broadcast dim scan."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


SQL_Q19 = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 30
       AND l_quantity BETWEEN 20 AND 30)
"""


def q22_no_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich customers (above the average positive account
    balance) with no order since 2000-01-01, grouped by nation — a
    broadcast global scalar aggregate + left-anti join.  (Every synthetic
    customer has ~10 lifetime orders, so the classic "never ordered"
    predicate is empty at every SF; "no recent order" keeps the identical
    plan shape with a non-trivial result.)"""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    n = _t(spark, sf_dir, "nation")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


SQL_Q22 = """
SELECT n_name, count(*) AS n_custs, round(sum(c_acctbal), 2) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n_name
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit from 'red' parts by supplier nation and
    order year — LIKE-filtered broadcast dim + two dim legs + year
    grouping.  (No partsupp table in this schema, so profit is revenue
    rather than revenue − supplycost; the join tree is the point.)"""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(
            broadcast(p.filter(F.col("p_name").like("%red%"))),
            l.l_partkey == p.p_partkey,
        )
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("profit"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


SQL_Q9 = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS profit,
       count(*) AS n_lineitems
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name, year(o_orderdate)
"""


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, size) for
    non-PROMO small parts, excluding a NOT-IN supplier list — distinct
    agg over a join with an anti-membership predicate."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    excluded = ["Supplier#000000001", "Supplier#000000002"]
    s = _t(spark, sf_dir, "supplier").filter(~F.col("s_name").isin(excluded))
    return (
        l.join(
            broadcast(
                p.filter(
                    (F.col("p_type") != "PROMO") & F.col("p_size").between(1, 15)
                )
            ),
            l.l_partkey == p.p_partkey,
        )
        .join(broadcast(s), l.l_suppkey == s.s_suppkey, "inner")
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("s_suppkey").alias("supplier_cnt"))
    )


SQL_Q16 = """
SELECT p_brand, p_size, count(DISTINCT s_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_type <> 'PROMO' AND p_size BETWEEN 1 AND 15
  AND s_name NOT IN ('Supplier#000000001', 'Supplier#000000002')
GROUP BY p_brand, p_size
"""


QUERIES = {
    "q7_volume_shipping": (q7_volume_shipping, SQL_Q7),
    "q9_product_profit": (q9_product_profit, SQL_Q9),
    "q16_supplier_cnt": (q16_supplier_cnt, SQL_Q16),
    "q8_market_share": (q8_market_share, SQL_Q8),
    "q10_returned_revenue": (q10_returned_revenue, SQL_Q10),
    "q13_order_distribution": (q13_order_distribution, SQL_Q13),
    "q19_or_predicates": (q19_or_predicates, SQL_Q19),
    "q22_no_order_customers": (q22_no_order_customers, SQL_Q22),
}
