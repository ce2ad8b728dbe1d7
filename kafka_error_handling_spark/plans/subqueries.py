"""Subquery and non-equi join shapes (SURVEY.md §2.7 joins/aggregations).

The reference has no joins of its own (SURVEY.md §2.7 "joins: NONE") — our
engine exposes Spark's, and these queries pin the classic TPC-H-style
shapes that exercise the planner paths a 100 TB deployment leans on:

- EXISTS → left-semi join (Catalyst rewrites the correlated predicate);
- correlated scalar aggregate → broadcast join against a pre-aggregated
  per-group frame (never a per-row subquery execution);
- HAVING on an aggregated child joined back to dims;
- min-per-group join-back (the partsupp-less Q2 shape);
- bounded time-range self-join (equi key + range predicate → SMJ on the
  key with the range as a post-join filter; the equi component keeps the
  pair blowup per-key, which is what makes it safe at scale).

Float discipline (SURVEY.md §8): quantities are integer-valued doubles, so
AVG is bit-identical across engines (exact integer sums < 2^53, one IEEE
divide); only SUMs are rounded for hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.files import load_table as _t


def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts for orders where EXISTS a
    lineitem shipped more than 60 days after the order date.  Expressed as
    a left-semi join — exactly what Catalyst rewrites EXISTS into."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


SQL_Q4 = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below half
    the per-part average.  The correlated scalar subquery becomes one
    pre-aggregated per-part frame broadcast into the join — the aggregate
    runs once per part, not once per probe row."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(avg_qty), l.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_Q17 = """
SELECT p_brand,
       round(sum(l_extendedprice), 2) AS small_qty_revenue,
       count(*) AS n_items
FROM lineitem l1
JOIN part ON l1.l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l1.l_quantity < 0.5 * (
    SELECT avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
  )
GROUP BY p_brand
"""


def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on an aggregated child (orders whose total
    quantity exceeds 300) joined back to customer and orders dims."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


SQL_Q18 = """
SELECT c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 2) AS totalprice,
       round(sum_qty, 2) AS sum_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def cheapest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-per-group join-back (the partsupp-less TPC-H Q2 shape): each
    customer's cheapest order, ties broken by min orderkey.  The group
    minimum joins back on the exact stored double — safe, both engines
    compare the identical parquet bit pattern."""
    o = _t(spark, sf_dir, "orders")
    mins = o.groupBy(F.col("o_custkey").alias("m_custkey")).agg(
        F.min("o_totalprice").alias("min_price")
    )
    return (
        o.join(
            mins,
            (o.o_custkey == F.col("m_custkey"))
            & (o.o_totalprice == F.col("min_price")),
        )
        .groupBy("o_custkey")
        .agg(
            F.min("o_orderkey").alias("cheapest_orderkey"),
            F.round(F.min("o_totalprice"), 2).alias("cheapest_price"),
        )
    )


SQL_CHEAPEST = """
SELECT o_custkey,
       min(o_orderkey) AS cheapest_orderkey,
       round(min(o_totalprice), 2) AS cheapest_price
FROM orders
JOIN (
  SELECT o_custkey AS m_custkey, min(o_totalprice) AS min_price
  FROM orders GROUP BY o_custkey
) m ON o_custkey = m_custkey AND o_totalprice = min_price
GROUP BY o_custkey
"""


def range_join_click_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded time-range self-join: for every click, count same-user
    events in the following 5 minutes.  The user_id equi-key carries the
    join (one shuffle, per-user partitions); the range predicate filters
    inside each key group, so the pair count stays linear in practice —
    the pattern that replaces unbounded theta joins at 100 TB."""
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    return (
        clicks.join(
            e,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("ts") > F.col("c_ts"))
            & (F.col("ts") <= F.col("c_ts") + F.expr("INTERVAL 5 MINUTES")),
            "left",
        )
        .groupBy("click_id")
        .agg(F.count("event_id").alias("n_followups"))
    )


SQL_RANGE_JOIN = """
SELECT c.event_id AS click_id, count(e.event_id) AS n_followups
FROM events c
LEFT JOIN events e
  ON e.user_id = c.user_id
 AND e.ts > c.ts AND e.ts <= c.ts + INTERVAL 5 MINUTE
WHERE c.event_type = 'click'
GROUP BY c.event_id
"""


QUERIES = {
    "q4_priority_exists": (q4_priority_exists, SQL_Q4),
    "q17_small_qty_revenue": (q17_small_quantity_revenue, SQL_Q17),
    "q18_large_volume_orders": (q18_large_volume_orders, SQL_Q18),
    "min_per_group_joinback": (cheapest_order_per_customer, SQL_CHEAPEST),
    "range_join_followups": (range_join_click_followups, SQL_RANGE_JOIN),
}
