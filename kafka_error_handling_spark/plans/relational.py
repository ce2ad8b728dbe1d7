"""Stock relational operator inventory (SURVEY.md §2.7).

The reference has NO joins / aggregations / windows / sorts / set-ops of its
own — its dataflow layer is Kafka Streams.  Our engine inherits all of them
from Spark SQL / Catalyst; these queries pin down that inventory against the
DuckDB oracle and are written the way they should run at 100 TB:

- dimension joins take explicit ``broadcast()`` hints (region/nation/
  supplier/customer are tiny relative to fact tables);
- aggregations are expressed so Catalyst plans partial (map-side) aggs;
- top-k = window/``orderBy`` + ``limit`` with deterministic tie-breaks so
  results are stable across engines AND across partitionings;
- float aggregates are rounded at the output edge only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window


from ..sources.files import load_table as _t  # noqa: E402


# --- aggregation: partial+final hash agg, multiple aggregates (TPC-H Q1 shape)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- multi-way join + agg + deterministic top-k (TPC-H Q3 shape)


def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_Q3 = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --- star join through all dimensions (TPC-H Q5 shape), broadcast dims


def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


SQL_Q5 = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --- window functions: ranking with frame, deterministic tie-breaks


def window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "rank")
    )


SQL_WINDOW_TOPK = """
SELECT o_custkey, o_orderkey, rank FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
) WHERE rank <= 3
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


SQL_WINDOW_RUNNING = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
FROM events
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        F.lag("event_type", 1).over(w).alias("prev_type"),
        F.lead("event_type", 1).over(w).alias("next_type"),
        F.round(F.col("value") - F.lag("value", 1).over(w), 4).alias("delta_value"),
    )


SQL_WINDOW_LAG_LEAD = """
SELECT event_id,
       lag(event_type, 1) OVER w AS prev_type,
       lead(event_type, 1) OVER w AS next_type,
       round(value - lag(value, 1) OVER w, 4) AS delta_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- rollup / cube / grouping sets


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = c.join(broadcast(n), c.c_nationkey == n.n_nationkey).join(
        broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
    )


SQL_ROLLUP = """
SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


SQL_CUBE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("keh_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM keh_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


SQL_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --- distinct aggregates


def distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_DISTINCT = """
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(DISTINCT l_partkey) AS n_parts,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


# --- set operations


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    has_open = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    rich = c.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    return (
        building.intersect(has_open)
        .union(rich.exceptAll(has_open).distinct())
        .distinct()
    )


SQL_SET_OPS = """
SELECT custkey FROM (
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
)
UNION
SELECT custkey FROM (
  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
  EXCEPT
  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
)
"""


# --- semi / anti joins


def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", F.lit("has_orders").alias("bucket")
    )
    without = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", F.lit("no_orders").alias("bucket")
    )
    return with_orders.unionByName(without)


SQL_SEMI_ANTI = """
SELECT c_custkey, 'has_orders' AS bucket FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT c_custkey, 'no_orders' AS bucket FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# --- sort / limit / top-k


def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


SQL_SORT_LIMIT = """
SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


# --- scalar functions: string / date / math


def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("user_tag"),
        F.length("props").alias("props_len"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.hour("ts").alias("hh"),
        F.round(F.sqrt(F.abs(F.col("value"))), 4).alias("sqrt_abs_value"),
        F.round(F.pow(F.col("value"), 2), 4).alias("value_sq"),
        (F.col("event_id") % 7).alias("mod7"),
    )


SQL_SCALAR = """
SELECT event_id,
       upper(event_type) AS type_upper,
       concat('u', CAST(user_id AS VARCHAR)) AS user_tag,
       length(props) AS props_len,
       strftime(ts, '%Y-%m-%d') AS day,
       EXTRACT(hour FROM ts) AS hh,
       round(sqrt(abs(value)), 4) AS sqrt_abs_value,
       round(pow(value, 2), 4) AS value_sq,
       event_id % 7 AS mod7
FROM events
"""


# --- tumbling event-time windows (batch shape of the streaming window op)


def event_time_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SQL_EVENT_WINDOWS = """
SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, SQL_Q1),
    "q3_top_revenue_orders": (q3_top_revenue_orders, SQL_Q3),
    "q5_revenue_by_nation": (q5_revenue_by_nation, SQL_Q5),
    "window_topk_orders": (window_topk_orders, SQL_WINDOW_TOPK),
    "window_running_sum": (window_running_sum, SQL_WINDOW_RUNNING),
    "window_lag_lead": (window_lag_lead, SQL_WINDOW_LAG_LEAD),
    "agg_rollup": (agg_rollup, SQL_ROLLUP),
    "agg_cube": (agg_cube, SQL_CUBE),
    "agg_grouping_sets": (agg_grouping_sets, SQL_GROUPING_SETS),
    "distinct_aggs": (distinct_aggs, SQL_DISTINCT),
    "set_ops": (set_ops, SQL_SET_OPS),
    "semi_anti_join": (semi_anti_join, SQL_SEMI_ANTI),
    "sort_limit_topk": (sort_limit_topk, SQL_SORT_LIMIT),
    "scalar_functions": (scalar_functions, SQL_SCALAR),
    "event_time_windows": (event_time_windows, SQL_EVENT_WINDOWS),
}


def collection_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / map / JSON scalar-function coverage (SURVEY.md §2.7 scalar
    row): the Spark side exercises the real collection builders and
    accessors; the oracle predicts each closed-form result, so any
    semantic drift in the functions themselves fails the hash."""
    e = _t(spark, sf_dir, "events")
    n = F.col("event_id") % 5 + 1
    arr = F.sequence(F.lit(1), n)
    m = F.map_from_arrays(F.array(F.lit("a"), F.lit("b")), F.array("value", n.cast("double")))
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("json_k"),
        F.size(arr).alias("arr_len"),
        F.aggregate(arr, F.lit(0).cast("long"), lambda s, x: s + x).alias("arr_sum"),
        F.array_contains(arr, 3).cast("int").alias("has_3"),
        F.element_at(F.reverse(arr), 1).alias("arr_max"),
        F.round(F.element_at(m, "a"), 4).alias("map_a"),
        F.size(m).alias("map_len"),
    )


SQL_COLLECTION = """
SELECT event_id,
       CAST(regexp_extract(props, '(-?\\d+)', 1) AS INT) AS json_k,
       event_id % 5 + 1 AS arr_len,
       CAST((event_id % 5 + 1) * (event_id % 5 + 2) / 2 AS BIGINT) AS arr_sum,
       CASE WHEN event_id % 5 + 1 >= 3 THEN 1 ELSE 0 END AS has_3,
       event_id % 5 + 1 AS arr_max,
       round(value, 4) AS map_a,
       2 AS map_len
FROM events
"""


QUERIES["collection_functions"] = (collection_functions, SQL_COLLECTION)


def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (the inverse of the pivot query): three lineitem
    measure columns stacked into (metric, value) rows — ``DataFrame
    .unpivot`` is a narrow projection (no shuffle), so it scales as a
    pure map over the scan."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount"],
            "metric",
            "value",
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "metric",
            F.round("value", 4).alias("value"),
        )
    )


SQL_UNPIVOT = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, round(l_quantity, 4) AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', round(l_extendedprice, 4) FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', round(l_discount, 4) FROM lineitem
"""


QUERIES["unpivot_metrics"] = (unpivot_metrics, SQL_UNPIVOT)


def window_analytic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist (the remaining analytic trio) —
    deterministic because the window orders by the unique o_orderkey."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


SQL_WINDOW_ANALYTIC = """
SELECT o_orderkey, o_orderpriority,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
"""


QUERIES["window_analytic_suite"] = (window_analytic_suite, SQL_WINDOW_ANALYTIC)


def temporal_regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc / add_months / dayofweek / regexp_extract / regexp_replace
    coverage (scalar-function families not in scalar_functions)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus3m"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.regexp_extract("o_orderpriority", r"^(\d+)", 1).cast("int").alias("prio_num"),
        F.regexp_replace("o_orderpriority", r"^\d+-", "").alias("prio_word"),
    )


SQL_TEMPORAL_REGEX = """
SELECT o_orderkey,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
       dayofweek(o_orderdate) + 1 AS dow,
       CAST(regexp_extract(o_orderpriority, '^(\\d+)', 1) AS INT) AS prio_num,
       regexp_replace(o_orderpriority, '^\\d+-', '') AS prio_word
FROM orders
"""


QUERIES["temporal_regex_functions"] = (temporal_regex_functions, SQL_TEMPORAL_REGEX)


def window_value_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over explicit ROWS frames —
    the frame-boundary semantics the lag/lead query doesn't touch."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    trail3 = w.rowsBetween(-2, Window.currentRow)
    return e.select(
        "event_id",
        F.first("event_type").over(whole).alias("first_type"),
        F.last("event_type").over(whole).alias("last_type"),
        F.nth_value("event_type", 2).over(whole).alias("second_type"),
        F.round(F.max("value").over(trail3), 4).alias("trailing3_max"),
    )


SQL_WINDOW_VALUE_FRAMES = """
SELECT event_id,
       first_value(event_type) OVER whole AS first_type,
       last_value(event_type) OVER whole AS last_type,
       nth_value(event_type, 2) OVER whole AS second_type,
       round(max(value) OVER trail3, 4) AS trailing3_max
FROM events
WINDOW whole AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
       trail3 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


QUERIES["window_value_frames"] = (window_value_frames, SQL_WINDOW_VALUE_FRAMES)
