"""Data-quality operators: one-pass column profiling, referential-integrity
orphan detection, and declarative constraint validation routed into the
engine's dead-letter model.

The reference's whole premise is "bad records are routed, never silently
eaten" — its unit of badness is a thrown exception
(``ErrorCapturingValueMapper.java:86-95``).  At warehouse scale most bad
records are *declaratively* bad (null key, out-of-range amount, orphan
foreign key); raising Python exceptions per row to capture them would be
an anti-pattern.  ``validate_to_dlq`` therefore builds the SAME
:data:`~kafka_error_handling_spark.model.ERROR_SCHEMA` struct the capture
decorators emit, but from pure column expressions — whole-stage codegen,
no UDF, no Python — so downstream DLQ formatting (``dead_letter_struct``,
Avro/proto converters, ``__streams.errors.*`` headers) works on
constraint violations exactly as it does on captured exceptions.

Profiling is Deequ-style: every metric for every column in ONE scan
(a single aggregate, no per-column passes), unpivoted to long format.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.files import load_table as _t

__all__ = ["profile_columns", "fk_orphans", "validate_to_dlq"]


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column completeness / distinctness / extremes in ONE pass.

    Emits (column, n_rows, n_null, n_distinct, min_str, max_str) — string
    renderings of extremes so heterogeneous column types share a schema.
    One aggregate over the scan: count/count-distinct/min/max all combine
    map-side; nothing is per-column re-scanned.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__mn"),
            F.max(F.col(c)).cast("string").alias(f"{c}__mx"),
        ]
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"{c}__nn").alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__mn").alias("min_str"),
                F.col(f"{c}__mx").alias("max_str"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return profile_columns(
        o, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    )


def _sql_profile_orders() -> str:
    arms = []
    for c in ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]:
        arms.append(
            f"SELECT '{c}' AS column, count(*) AS n_rows,"
            f" CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,"
            f" count(DISTINCT {c}) AS n_distinct,"
            f" min({c})::VARCHAR AS min_str, max({c})::VARCHAR AS max_str"
            f" FROM orders"
        )
    return " UNION ALL ".join(arms)


def fk_orphans(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Referential-integrity violations: child rows whose key has no parent
    — a LEFT ANTI join (Catalyst broadcasts the smaller side; no payload
    columns cross the wire, just the key)."""
    return child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )


def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: orphan counts across the three core relationships.  The
    driver's generator keeps them consistent, so the oracle predicts
    zeros — the query still exercises the full anti-join plan."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    checks = [
        ("lineitem.l_orderkey->orders", fk_orphans(l, o, "l_orderkey", "o_orderkey")),
        ("orders.o_custkey->customer", fk_orphans(o, c, "o_custkey", "c_custkey")),
        ("supplier.s_nationkey->nation", fk_orphans(s, n, "s_nationkey", "n_nationkey")),
    ]
    arms = [
        d.agg(F.lit(name).alias("relationship"), F.count(F.lit(1)).alias("n_orphans"))
        for name, d in checks
    ]
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


SQL_FK_ORPHANS = """
SELECT 'lineitem.l_orderkey->orders' AS relationship,
       (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
         (SELECT o_orderkey FROM orders)) AS n_orphans
UNION ALL
SELECT 'orders.o_custkey->customer',
       (SELECT count(*) FROM orders WHERE o_custkey NOT IN
         (SELECT c_custkey FROM customer))
UNION ALL
SELECT 'supplier.s_nationkey->nation',
       (SELECT count(*) FROM supplier WHERE s_nationkey NOT IN
         (SELECT n_nationkey FROM nation))
"""


def validate_to_dlq(
    df: DataFrame, checks: Mapping[str, Column], value_col: str
) -> DataFrame:
    """Declarative constraint validation emitting the capture decorators'
    sum-type: adds an ``error`` column (:data:`ERROR_SCHEMA` struct, null
    = row passed every check) listing every failed constraint.

    Pure column expressions — the checks, the message, and the rendered
    input value all stay in whole-stage codegen; a 100 TB validation pass
    is a mapper, not a Python round-trip.  The output feeds the exact
    same splitters/formatters as exception capture: ``errors(df)``,
    ``dead_letter_struct``, Avro/proto converters, error headers.

    error struct fields (mirroring a captured ``ValueError``):
      input_value = rendered ``value_col``; error_class =
      'ConstraintViolation'; message = comma-joined failed check names;
      stack_trace = null (nothing threw — violations are data, not code).
    """
    # three-valued logic: a row passes a check only when the predicate is
    # definitely TRUE — `when(~cond, ...)` would silently pass NULL
    # predicates (NOT NULL = NULL), letting null-ridden rows through
    failed = F.array_compact(
        F.array(
            *[
                F.when(cond, F.lit(None)).otherwise(F.lit(name))
                for name, cond in checks.items()
            ]
        )
    )
    err = F.when(
        F.size(failed) > 0,
        F.struct(
            F.col(value_col).cast("string").alias("input_value"),
            F.lit("ConstraintViolation").alias("error_class"),
            F.concat(
                F.lit("Constraint(s) violated: "), F.array_join(failed, ", ")
            ).alias("message"),
            F.lit(None).cast("string").alias("stack_trace"),
        ),
    )
    from ..model import ERROR_SCHEMA

    return df.withColumn("error", err.cast(ERROR_SCHEMA))


def q_validate_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: three value constraints on orders; emits every DLQ-routed row
    with its violation message plus the pass/fail split counts baked into
    the message distribution (hash-checkable end to end)."""
    o = _t(spark, sf_dir, "orders")
    v = validate_to_dlq(
        o,
        {
            "totalprice_positive": F.col("o_totalprice") > 0,
            "status_known": F.col("o_orderstatus").isin("O", "F", "P"),
            "priority_filled": F.col("o_orderpriority").isNotNull()
            & (F.length("o_orderpriority") > 0),
            "totalprice_under_cap": F.col("o_totalprice") < 400000.0,
        },
        value_col="o_orderkey",
    )
    errs = v.filter(F.col("error").isNotNull())
    return errs.select(
        "o_orderkey",
        F.col("error.input_value").alias("input_value"),
        F.col("error.error_class").alias("error_class"),
        F.col("error.message").alias("message"),
    )


SQL_VALIDATE = """
WITH checked AS (
  SELECT o_orderkey,
         list_filter([
           CASE WHEN o_totalprice > 0 THEN NULL ELSE 'totalprice_positive' END,
           CASE WHEN o_orderstatus IN ('O','F','P') THEN NULL ELSE 'status_known' END,
           CASE WHEN o_orderpriority IS NOT NULL
                     AND length(o_orderpriority) > 0 THEN NULL
                ELSE 'priority_filled' END,
           CASE WHEN o_totalprice < 400000.0 THEN NULL ELSE 'totalprice_under_cap' END
         ], x -> x IS NOT NULL) AS failed
  FROM orders
)
SELECT o_orderkey,
       o_orderkey::VARCHAR AS input_value,
       'ConstraintViolation' AS error_class,
       'Constraint(s) violated: ' || list_aggregate(failed, 'string_agg', ', ')
         AS message
FROM checked
WHERE len(failed) > 0
"""


QUERIES = {
    "quality_profile_columns": (q_profile_orders, _sql_profile_orders()),
    "quality_fk_orphans": (q_fk_orphans, SQL_FK_ORPHANS),
    "quality_validate_dlq": (q_validate_constraints, SQL_VALIDATE),
}


# ---------------------------------------------------------------------------
# Join-key skew diagnostics: the pre-flight a 100 TB join needs.  One
# aggregation computes per-key counts; a second (tiny: one row per
# distinct key) summarizes the distribution — max/p99/median multiplicity
# and the share of rows held by the heaviest key.  A key whose share is
# large is the signal to salt that join or lean on AQE skew handling;
# emitting the diagnosis as data (not a log line) lets pipelines gate on
# it.  Discrete percentiles keep the gate engine-exact (SURVEY §8 rule).
# ---------------------------------------------------------------------------


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """(n_rows, n_keys, max_mult, p99_mult, median_mult, top_key,
    top_share_ppm) for a prospective join key."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("mult"))
    return counts.agg(
        F.sum("mult").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("mult").alias("max_mult"),
        # percentile_disc picks an ACTUAL mult value, so the long cast is
        # lossless; Spark types the result double, DuckDB types it like
        # the input — cast both sides (caught by the type-faithful gate)
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY mult)")
        .cast("long")
        .alias("p99_mult"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY mult)")
        .cast("long")
        .alias("median_mult"),
        F.max(
            F.struct(F.col("mult").alias("m"), F.col(key_col).cast("long").alias("k"))
        )["k"].alias("top_key"),
        F.floor(F.max("mult") * 1_000_000 / F.sum("mult")).alias("top_share_ppm"),
    )


def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return key_skew_profile(e, "user_id").select(
        "n_rows", "n_keys", "max_mult", "p99_mult", "median_mult",
        F.col("top_key").cast("long").alias("top_key"), "top_share_ppm",
    )


SQL_KEY_SKEW = """
WITH counts AS (
  SELECT user_id, count(*) AS mult FROM events GROUP BY user_id
)
SELECT CAST(sum(mult) AS BIGINT) AS n_rows,
       count(*) AS n_keys,
       max(mult) AS max_mult,
       CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY mult) AS BIGINT) AS p99_mult,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY mult) AS BIGINT) AS median_mult,
       (max(struct_pack(m := mult, k := CAST(user_id AS BIGINT)))).k AS top_key,
       CAST(floor(max(mult) * 1000000 / sum(mult)) AS BIGINT) AS top_share_ppm
FROM counts
"""

QUERIES["quality_key_skew"] = (q_key_skew, SQL_KEY_SKEW)


# ---------------------------------------------------------------------------
# Robust outlier detection + winsorization.  Median/MAD (not mean/stddev:
# one wild value corrupts a z-score but barely moves a median) and
# percentile clamping — the standard numeric-hygiene pair in front of a
# training pipeline.  Discrete percentiles (actual data values) keep both
# engines bit-identical where interpolation would tie-break differently.
#
# Scale note: percentile_disc over a low-cardinality group key cannot
# partial-aggregate — each group's values concentrate on one reducer.
# That is the price of EXACTNESS (the oracle contract here); the 100 TB
# path swaps in approx_percentile per group (sketch, map-side combinable)
# with everything else unchanged.  Both stats frames are tiny (one row
# per group) and broadcast back, so events itself shuffles only for the
# group-stat aggregations, never for the join.
# ---------------------------------------------------------------------------


def robust_outliers(df: DataFrame, group_col: str, value_col: str, k: float = 3.0):
    """Per-group (median, MAD) and the |x - med| > k*MAD outlier flag."""
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile_disc(0.5) WITHIN GROUP (ORDER BY {value_col})").alias(
            "med"
        )
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "adev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )
    return dev.join(F.broadcast(mad), group_col).withColumn(
        "is_outlier", F.col("adev") > F.lit(k) * F.col("mad")
    )


def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    flagged = robust_outliers(e, "event_type", "value", k=3.0)
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.min("med"), 4).alias("median_value"),
        F.round(F.min("mad"), 4).alias("mad_value"),
        F.count(F.when(F.col("is_outlier"), 1)).alias("n_outliers"),
    )


SQL_ANOMALY_MAD = """
WITH med AS (
  SELECT event_type,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       count(*) AS n_events,
       round(min(d.med), 4) AS median_value,
       round(min(m.mad), 4) AS mad_value,
       count(CASE WHEN d.adev > 3.0 * m.mad THEN 1 END) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
"""

QUERIES["events_anomaly_mad"] = (q_anomaly_mad, SQL_ANOMALY_MAD)


def winsorize(df: DataFrame, group_col: str, value_col: str,
              lo: float = 0.05, hi: float = 0.95):
    """Clamp ``value_col`` into the per-group [p_lo, p_hi] discrete-
    percentile band; adds ``clamped`` plus the band columns."""
    bounds = df.groupBy(group_col).agg(
        F.expr(
            f"percentile_disc({lo}) WITHIN GROUP (ORDER BY {value_col})"
        ).alias("p_lo"),
        F.expr(
            f"percentile_disc({hi}) WITHIN GROUP (ORDER BY {value_col})"
        ).alias("p_hi"),
    )
    return df.join(F.broadcast(bounds), group_col).withColumn(
        "clamped",
        F.least(F.greatest(F.col(value_col), F.col("p_lo")), F.col("p_hi")),
    )


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = winsorize(e, "event_type", "value")
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.min("p_lo"), 4).alias("p05"),
        F.round(F.min("p_hi"), 4).alias("p95"),
        F.count(F.when(F.col("value") < F.col("p_lo"), 1)).alias("n_low"),
        F.count(F.when(F.col("value") > F.col("p_hi"), 1)).alias("n_high"),
        F.round(F.sum("clamped"), 2).alias("sum_clamped"),
    )


SQL_WINSORIZE = """
WITH bounds AS (
  SELECT event_type,
         percentile_disc(0.05) WITHIN GROUP (ORDER BY value) AS p_lo,
         percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS p_hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       count(*) AS n_events,
       round(min(b.p_lo), 4) AS p05,
       round(min(b.p_hi), 4) AS p95,
       count(CASE WHEN e.value < b.p_lo THEN 1 END) AS n_low,
       count(CASE WHEN e.value > b.p_hi THEN 1 END) AS n_high,
       round(sum(least(greatest(e.value, b.p_lo), b.p_hi)), 2) AS sum_clamped
FROM events e JOIN bounds b USING (event_type)
GROUP BY e.event_type
"""

QUERIES["quality_winsorize"] = (q_winsorize, SQL_WINSORIZE)


# ---------------------------------------------------------------------------
# Distribution-drift monitor (PSI): the check a production pipeline runs
# before trusting a new data batch.  The reference window is the first
# half of the stream (event_id ≤ median), the current window the second;
# bin edges are the REFERENCE deciles (discrete percentiles — actual data
# values, engine-exact), every event is binned by counting edges below
# its value (a pure array expression), and PSI per event_type is
# Σ (p_cur − p_ref)·ln(p_cur/p_ref) with +0.5 Laplace smoothing so empty
# bins stay finite.  Scale shape: two scans' worth of work in ONE pass
# (conditional aggregation by side), per-type stats are tiny broadcast
# frames, ln is the only transcendental (same cross-engine discipline as
# the green BM25 gate).  PSI > 0.2 is the conventional "investigate"
# threshold — emitted as data, not a verdict, so pipelines can gate.
# ---------------------------------------------------------------------------

_PSI_DECILES = [i / 10.0 for i in range(1, 10)]


def psi_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    split_col: str = "event_id",
) -> DataFrame:
    """(group, n_ref, n_cur, psi) — population stability index of
    ``value_col`` between the first and second half of ``split_col``."""
    # eager localCheckpoint on the 1-row median: `sided` is consumed by BOTH
    # the edges branch and the binned branch, and Catalyst inlines the whole
    # median subtree (a full-table sort-based percentile) into each — the
    # cut halves the percentile passes over df (r14, guide §3.3)
    med = df.agg(
        F.expr(
            f"percentile_disc(0.5) WITHIN GROUP (ORDER BY {split_col})"
        ).alias("med")
    ).localCheckpoint(eager=True)
    sided = df.crossJoin(F.broadcast(med)).withColumn(
        "is_ref", F.col(split_col) <= F.col("med")
    )
    edges = (
        sided.filter("is_ref")
        .groupBy(group_col)
        .agg(
            F.array(
                *[
                    F.expr(
                        f"percentile_disc({p}) WITHIN GROUP (ORDER BY {value_col})"
                    )
                    for p in _PSI_DECILES
                ]
            ).alias("edges")
        )
    )
    binned = sided.join(F.broadcast(edges), group_col).withColumn(
        "bin",
        F.size(F.filter("edges", lambda b: F.col(value_col) > b)),
    )
    per_bin = binned.groupBy(group_col, "bin").agg(
        F.count(F.when(F.col("is_ref"), 1)).alias("c_ref"),
        F.count(F.when(~F.col("is_ref"), 1)).alias("c_cur"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col)
    p_ref = (F.col("c_ref") + 0.5) / (F.sum("c_ref").over(w) + 5.0)
    p_cur = (F.col("c_cur") + 0.5) / (F.sum("c_cur").over(w) + 5.0)
    return (
        per_bin.withColumn("term", (p_cur - p_ref) * F.log(p_cur / p_ref))
        .groupBy(group_col)
        .agg(
            F.sum("c_ref").alias("n_ref"),
            F.sum("c_cur").alias("n_cur"),
            F.round(F.sum("term"), 6).alias("psi"),
        )
    )


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return psi_drift(e, "event_type", "value")


_PSI_EDGE_LIST = ", ".join(
    f"percentile_disc({p}) WITHIN GROUP (ORDER BY value)" for p in _PSI_DECILES
)

SQL_PSI_DRIFT = f"""
WITH med AS (
  SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY event_id) AS med
  FROM events
), sided AS (
  SELECT e.event_type, e.value, e.event_id <= m.med AS is_ref
  FROM events e CROSS JOIN med m
), edges AS (
  SELECT event_type, [{_PSI_EDGE_LIST}] AS edges
  FROM sided WHERE is_ref GROUP BY event_type
), binned AS (
  SELECT s.event_type, s.is_ref,
         len(list_filter(x.edges, b -> s.value > b)) AS bin
  FROM sided s JOIN edges x USING (event_type)
), per_bin AS (
  SELECT event_type, bin,
         count(CASE WHEN is_ref THEN 1 END) AS c_ref,
         count(CASE WHEN NOT is_ref THEN 1 END) AS c_cur
  FROM binned GROUP BY event_type, bin
), terms AS (
  SELECT event_type, c_ref, c_cur,
         ((c_cur + 0.5) / (sum(c_cur) OVER (PARTITION BY event_type) + 5.0)
          - (c_ref + 0.5) / (sum(c_ref) OVER (PARTITION BY event_type) + 5.0))
         * ln(((c_cur + 0.5) / (sum(c_cur) OVER (PARTITION BY event_type) + 5.0))
              / ((c_ref + 0.5) / (sum(c_ref) OVER (PARTITION BY event_type) + 5.0)))
           AS term
  FROM per_bin
)
SELECT event_type,
       CAST(sum(c_ref) AS BIGINT) AS n_ref,
       CAST(sum(c_cur) AS BIGINT) AS n_cur,
       round(sum(term), 6) AS psi
FROM terms
GROUP BY event_type
"""

QUERIES["quality_psi_drift"] = (q_psi_drift, SQL_PSI_DRIFT)


# ---------------------------------------------------------------------------
# Cross-table value reconciliation: does the header total actually equal
# the sum of its lines?  FK orphan checks (above) verify EXISTENCE; this
# verifies VALUE consistency — the check that catches partial loads,
# double-applied deltas, and currency/tax drift.  Emits a distribution
# report (not a pass/fail): ratio percentiles are discrete (actual data
# values, engine-exact), the join is one exchange on the order key.
# ---------------------------------------------------------------------------


def reconcile_totals(
    header: DataFrame, lines: DataFrame, header_key: str, line_key: str,
    header_total: str, line_amount,
) -> DataFrame:
    # LEFT join: a header whose lines are entirely missing is the WORST
    # partial-load failure — an inner join would silently drop it from
    # the very report that exists to catch it (round-4 review #2).  Such
    # headers surface with calc_total NULL / ratio NULL.
    per_key = lines.groupBy(line_key).agg(F.sum(line_amount).alias("calc_total"))
    j = header.join(
        per_key, header.__getattr__(header_key) == per_key[line_key], "left"
    )
    ratio = F.col(header_total) / F.col("calc_total")
    return j.select(F.col(header_key), F.col(header_total).alias("stated"),
                    "calc_total", ratio.alias("ratio"))


def q_reconcile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    r = reconcile_totals(o, l, "o_orderkey", "l_orderkey", "o_totalprice", amount)
    return r.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("calc_total").isNull(), 1)).alias("n_no_lines"),
        F.count(
            F.when(F.abs(F.col("stated") - F.col("calc_total")) / F.col("stated")
                   < 0.01, 1)
        ).alias("n_within_1pct"),
        F.round(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY ratio)"), 4
        ).alias("p50_ratio"),
        F.round(
            F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY ratio)"), 4
        ).alias("p05_ratio"),
        F.round(
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY ratio)"), 4
        ).alias("p95_ratio"),
    )


SQL_RECONCILE_ORDERS = """
WITH per_key AS (
  SELECT l_orderkey,
         sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS calc_total
  FROM lineitem GROUP BY l_orderkey
), r AS (
  SELECT o.o_totalprice AS stated, p.calc_total,
         o.o_totalprice / p.calc_total AS ratio
  FROM orders o LEFT JOIN per_key p ON o.o_orderkey = p.l_orderkey
)
SELECT count(*) AS n_orders,
       count(CASE WHEN calc_total IS NULL THEN 1 END) AS n_no_lines,
       count(CASE WHEN abs(stated - calc_total) / stated < 0.01 THEN 1 END)
         AS n_within_1pct,
       round(percentile_disc(0.5) WITHIN GROUP (ORDER BY ratio), 4) AS p50_ratio,
       round(percentile_disc(0.05) WITHIN GROUP (ORDER BY ratio), 4) AS p05_ratio,
       round(percentile_disc(0.95) WITHIN GROUP (ORDER BY ratio), 4) AS p95_ratio
FROM r
"""

QUERIES["quality_reconcile_orders"] = (q_reconcile_orders, SQL_RECONCILE_ORDERS)


# ---------------------------------------------------------------------------
# Error-rate SLO monitor: tumbling-window breach report
# ---------------------------------------------------------------------------

SLO_WINDOW_S = 21600  # 6h tumbling buckets
SLO_BREACH_PPM = 250_000  # alert above 25% errors (corpus base rate ~20%)


def q_error_rate_slo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The alert rule an error-handling deployment actually pages on:
    per 6-hour tumbling window, total records vs records that would hit
    the DLQ ('error' events), the error rate in INTEGER ppm (floor
    division — cross-engine exact, no float ratio in the gate), and the
    breach flag against the SLO threshold.

    The reference library ROUTES errors; the operator consuming its DLQ
    needs exactly this artifact to notice a bad deploy (error ppm jumping
    across windows).  Window key is plain integer epoch bucketing
    (``epoch_s DIV window``) rather than ``F.window``/``time_bucket`` so
    both engines compute byte-identical keys.  One aggregate, map-side
    combined; at 100 TB the exchange carries one partial row per
    (window, map task).
    """
    e = _t(spark, sf_dir, "events")
    bucket = F.expr(f"unix_timestamp(ts) DIV {SLO_WINDOW_S}")
    agg = (
        e.select(bucket.alias("b"), (F.col("event_type") == "error").alias("is_err"))
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("is_err").cast("long")).alias("n_errors"),
        )
    )
    ppm = F.expr("(n_errors * 1000000) DIV n_total")
    return agg.select(
        F.date_format(
            F.timestamp_seconds(F.col("b") * SLO_WINDOW_S), "yyyy-MM-dd HH:mm:ss"
        ).alias("window_start"),
        "n_total",
        "n_errors",
        ppm.alias("error_ppm"),
        (ppm > SLO_BREACH_PPM).alias("breach"),
    )


SQL_ERROR_RATE_SLO = f"""
WITH agg AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // {SLO_WINDOW_S} AS b,
         count(*) AS n_total,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_errors
  FROM events GROUP BY 1
)
-- make_timestamp(µs) is TZ-NAIVE; to_timestamp would render in the
-- host session TimeZone and break parity off-UTC
SELECT strftime(make_timestamp(b * {SLO_WINDOW_S} * 1000000),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       n_total, n_errors,
       (n_errors * 1000000) // n_total AS error_ppm,
       ((n_errors * 1000000) // n_total) > {SLO_BREACH_PPM} AS breach
FROM agg
"""

QUERIES["quality_error_slo"] = (q_error_rate_slo, SQL_ERROR_RATE_SLO)


# ---------------------------------------------------------------------------
# Benford first-digit audit: the anomaly screen for monetary columns
# ---------------------------------------------------------------------------

# log10(1 + 1/d) in ppm, d = 1..9 (precomputed — no float in the gate)
_BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs Benford's
    law — the classic screen for fabricated or truncated monetary data
    (naturally-scaled amounts follow log10(1+1/d); synthetic uniform data
    shows up immediately, as it does here).  The digit is extracted from
    the INTEGER CENTS via string head — no float log10 anywhere; expected
    shares are precomputed ppm constants, deviations integer ppm.  One
    map-combined aggregate over 9 groups."""
    o = _t(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(F.sum("n").alias("total"))
    expected = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _BENFORD_PPM.items() for x in kv]
        ),
        F.col("digit"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.expr("(n * 1000000) DIV total").alias("observed_ppm"),
            expected.alias("benford_ppm"),
        )
        .withColumn(
            "abs_dev_ppm", F.abs(F.col("observed_ppm") - F.col("benford_ppm"))
        )
    )


_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {ppm}" for d, ppm in _BENFORD_PPM.items()
)

SQL_BENFORD_DIGITS = f"""
WITH counts AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                           AS VARCHAR), 1, 1) AS INT) AS digit,
         count(*) AS n
  FROM orders GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts)
SELECT digit, CAST(n AS BIGINT) AS n,
       (n * 1000000) // total AS observed_ppm,
       CASE digit {_BENFORD_CASE} END AS benford_ppm,
       abs((n * 1000000) // total - (CASE digit {_BENFORD_CASE} END))
         AS abs_dev_ppm
FROM counts CROSS JOIN tot
"""

QUERIES["quality_benford_digits"] = (q_benford_digits, SQL_BENFORD_DIGITS)


def q_breach_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive SLO-breach streaks — the alerting layer above
    ``quality_error_slo``: a single breached window is noise, a STREAK is
    an incident.  Classic gaps-and-islands: among breached buckets in
    order, ``bucket − row_number()`` is constant within each maximal run,
    so one window + one aggregate yields every incident's start, end, and
    duration.  All integer bucket arithmetic on the tiny per-window
    frame (the event-stream aggregate is the only full-data exchange).
    """
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    bucket = F.expr(f"unix_timestamp(ts) DIV {SLO_WINDOW_S}")
    agg = (
        e.select(bucket.alias("b"), (F.col("event_type") == "error").alias("is_err"))
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("is_err").cast("long")).alias("n_errors"),
        )
        .withColumn("ppm", F.expr("(n_errors * 1000000) DIV n_total"))
        .filter(F.col("ppm") > SLO_BREACH_PPM)
    )
    grp = F.col("b") - F.row_number().over(Window.orderBy("b"))
    islands = agg.withColumn("grp", grp).groupBy("grp").agg(
        F.min("b").alias("b0"),
        F.max("b").alias("b1"),
        F.count(F.lit(1)).alias("n_windows"),
        F.max("ppm").alias("peak_ppm"),
    )
    return islands.select(
        F.date_format(
            F.timestamp_seconds(F.col("b0") * SLO_WINDOW_S), "yyyy-MM-dd HH:mm:ss"
        ).alias("streak_start"),
        F.date_format(
            F.timestamp_seconds((F.col("b1") + 1) * SLO_WINDOW_S),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("streak_end"),
        "n_windows",
        "peak_ppm",
    )


SQL_BREACH_STREAKS = f"""
WITH agg AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // {SLO_WINDOW_S} AS b,
         count(*) AS n_total,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_errors
  FROM events GROUP BY 1
),
breached AS (
  SELECT b, (n_errors * 1000000) // n_total AS ppm FROM agg
  WHERE (n_errors * 1000000) // n_total > {SLO_BREACH_PPM}
),
islands AS (
  SELECT b - row_number() OVER (ORDER BY b) AS grp, b, ppm FROM breached
)
SELECT strftime(make_timestamp(min(b) * {SLO_WINDOW_S} * 1000000),
                '%Y-%m-%d %H:%M:%S') AS streak_start,
       strftime(make_timestamp((max(b) + 1) * {SLO_WINDOW_S} * 1000000),
                '%Y-%m-%d %H:%M:%S') AS streak_end,
       count(*) AS n_windows,
       CAST(max(ppm) AS BIGINT) AS peak_ppm
FROM islands
GROUP BY grp
"""

QUERIES["quality_breach_streaks"] = (q_breach_streaks, SQL_BREACH_STREAKS)


# ---------------------------------------------------------------------------
# Shuffle-partition balance: what salting actually buys
# ---------------------------------------------------------------------------

_PB_BUCKETS = 32
_PB_SALTS = 4


def q_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reducer-balance report for the events user_id shuffle, raw vs
    salted: (scheme, n_buckets, min_rows, max_rows, imbalance_ppm) where
    imbalance = max_bucket * n_buckets * 1e6 / total (1e6 = perfectly
    uniform).  `quality_key_skew` profiles the KEY distribution; this
    gate profiles what the shuffle layer actually sees — a straggler
    forecast.  The salted scheme appends a per-row salt in [0, 4) to the
    hash input (the standard skew-join mitigation; downstream the 4
    partial aggregates re-merge on the unsalted key).  Deterministic md5
    bucketing stands in for the engine's hash partitioner so the oracle
    can reproduce it."""
    e = _t(spark, sf_dir, "events")
    from ..datapipe.sampling import hash_bucket

    raw_b = hash_bucket(F.col("user_id").cast("string")) % _PB_BUCKETS
    salted_key = F.concat(
        F.col("user_id").cast("string"),
        F.lit("|"),
        (F.col("event_id") % _PB_SALTS).cast("string"),
    )
    salted_b = hash_bucket(salted_key) % _PB_BUCKETS
    schemes = []
    for scheme, b in (("raw", raw_b), ("salted", salted_b)):
        schemes.append(
            e.select(b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.lit(scheme).alias("scheme"),
                F.lit(_PB_BUCKETS).alias("n_buckets"),
                F.min("n").alias("min_rows"),
                F.max("n").alias("max_rows"),
                F.expr(
                    f"(max(n) * {_PB_BUCKETS} * 1000000) DIV sum(n)"
                ).alias("imbalance_ppm"),
            )
        )
    return schemes[0].unionByName(schemes[1])


_SQL_PARTITION_BALANCE = f"""
WITH raw_b AS (
  SELECT (CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
               AS BIGINT) % 1000000) % {_PB_BUCKETS} AS bucket
  FROM events
), salted_b AS (
  SELECT (CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR) || '|' ||
                                   CAST(event_id % {_PB_SALTS} AS VARCHAR)), 1, 15))
               AS BIGINT) % 1000000) % {_PB_BUCKETS} AS bucket
  FROM events
), raw_c AS (SELECT bucket, count(*) AS n FROM raw_b GROUP BY bucket),
salted_c AS (SELECT bucket, count(*) AS n FROM salted_b GROUP BY bucket)
SELECT 'raw' AS scheme, {_PB_BUCKETS} AS n_buckets,
       min(n) AS min_rows, max(n) AS max_rows,
       CAST((max(n) * {_PB_BUCKETS} * 1000000) // sum(n) AS BIGINT)
         AS imbalance_ppm
FROM raw_c
UNION ALL
SELECT 'salted', {_PB_BUCKETS}, min(n), max(n),
       CAST((max(n) * {_PB_BUCKETS} * 1000000) // sum(n) AS BIGINT)
FROM salted_c
"""

QUERIES["quality_partition_balance"] = (
    q_partition_balance,
    _SQL_PARTITION_BALANCE,
)


# ---------------------------------------------------------------------------
# Duplicate-payment detection: near-dup on transactions
# ---------------------------------------------------------------------------

_DC_WINDOW_DAYS = 90
_DC_BAND = 1000  # same-$1000 amount band


def q_double_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suspected duplicate orders: same customer, amount in the same
    $1000 band, within 90 days of the previous such order — the
    transactional sibling of document near-dup (retry storms and
    duplicate submissions repeat a similar order close in time; the
    reference's at-least-once delivery world is where these come from).
    Exact-cents matching is the production rule for card charges, but a
    banded screen is the right first pass for ORDERS, where totals
    jitter (and the exact rule provably fires zero times on this corpus
    — a gate that can never fire verifies nothing).

    One window over (custkey, band) ordered by (date, orderkey): lag
    gives the previous similar order, a datediff filter flags the
    suspects.  The shuffle key (custkey, band) is near-unique, so at
    100 TB partitions stay tiny — this is the cheap shape for
    self-similarity WITHIN a key, where a self-join would square the
    key's row count."""
    o = _t(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    band = F.expr(f"CAST(round(o_totalprice) AS BIGINT) DIV {_DC_BAND}")
    w = Window.partitionBy("o_custkey", "band").orderBy("o_orderdate", "o_orderkey")
    flagged = (
        o.select("o_orderkey", "o_custkey", "o_orderdate", band.alias("band"))
        .withColumn("prev_key", F.lag("o_orderkey").over(w))
        .withColumn("prev_date", F.lag("o_orderdate").over(w))
        .withColumn("days_apart", F.datediff("o_orderdate", "prev_date"))
        .filter(F.col("days_apart") <= _DC_WINDOW_DAYS)
    )
    return flagged.select(
        "o_orderkey",
        "o_custkey",
        F.col("band").alias("amount_band"),
        "prev_key",
        F.col("days_apart").cast("long").alias("days_apart"),
    )


_SQL_DOUBLE_CHARGE = f"""
WITH keyed AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         CAST(round(o_totalprice) AS BIGINT) // {_DC_BAND} AS band
  FROM orders
), lagged AS (
  SELECT o_orderkey, o_custkey, band,
         lag(o_orderkey) OVER w AS prev_key,
         date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS days_apart
  FROM keyed
  WINDOW w AS (PARTITION BY o_custkey, band ORDER BY o_orderdate, o_orderkey)
)
SELECT o_orderkey, o_custkey, band AS amount_band, prev_key,
       CAST(days_apart AS BIGINT) AS days_apart
FROM lagged
WHERE days_apart <= {_DC_WINDOW_DAYS}
"""

QUERIES["quality_double_charge"] = (q_double_charge, _SQL_DOUBLE_CHARGE)


# ---------------------------------------------------------------------------
# k-anonymity audit: re-identification risk before data release
# ---------------------------------------------------------------------------

_KANON_K = 5
_KANON_BAL_BAND = 1000  # acctbal quasi-identifier coarsened to $1000 bands


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quasi-identifier groups smaller than k=5 over customers — the
    re-identification risk audit run before any customer-derived dataset
    leaves the platform (a (segment, nation, balance-band) combination
    shared by fewer than k people identifies them).  Training-data
    governance is part of the 100 TB pipeline, not an afterthought: this
    is the gate a release job must pass, and the violating-groups
    listing is what the remediation (further coarsening or suppression)
    consumes.  One map-combined aggregate; the output is bounded by the
    quasi-identifier domain, not the row count."""
    c = _t(spark, sf_dir, "customer")
    band = F.expr(f"CAST(floor(c_acctbal / {_KANON_BAL_BAND}) AS BIGINT)")
    return (
        c.groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").cast("long").alias("nation"),
            band.alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < _KANON_K)
    )


_SQL_K_ANONYMITY = f"""
SELECT c_mktsegment AS segment,
       CAST(c_nationkey AS BIGINT) AS nation,
       CAST(floor(c_acctbal / {_KANON_BAL_BAND}) AS BIGINT) AS bal_band,
       count(*) AS group_size
FROM customer
GROUP BY 1, 2, 3
HAVING count(*) < {_KANON_K}
"""

QUERIES["quality_k_anonymity"] = (q_k_anonymity, _SQL_K_ANONYMITY)


# ---------------------------------------------------------------------------
# Flagship #7: the dataset release gate
# ---------------------------------------------------------------------------

# release thresholds — the checklist a dataset must clear before leaving
# the platform; values are POLICY, the point is the one-plan evaluation
_RG_MAX_KANON_VIOLATIONS = 500   # QI groups under k (customers table)
_RG_MAX_EVAL_LEAKAGE = 0         # dup pairs crossing into val/test
_RG_MAX_CONTAMINATED = 10        # docs overlapping the benchmark set
_RG_MIN_GOPHER_PASS_PPM = 500_000  # >= 50% of docs must pass quality


def q_release_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The release checklist, evaluated as ONE result set: four
    independent governance/quality audits (k-anonymity violations,
    duplicate leakage into eval splits, benchmark contamination,
    Gopher-rule pass rate) each reduced to a single metric and compared
    against its release threshold — (check, value, threshold, passed).

    Composition, not re-implementation: every sub-check calls the
    already-gated operator and aggregates its output, and the oracle
    composes the same operators' oracle SQL as subqueries — the flagship
    inherits the correctness of its parts by construction.  Each branch
    is a small aggregate; the union is 4 rows."""
    from ..datapipe.dedup import q_split_leakage
    from ..datapipe.text import q_decontaminate, q_gopher_report

    kanon = q_k_anonymity(spark, sf_dir).agg(
        F.lit("k_anonymity_violations").alias("check"),
        F.count(F.lit(1)).alias("value"),
        F.lit(_RG_MAX_KANON_VIOLATIONS).alias("threshold"),
    )
    leak = (
        q_split_leakage(spark, sf_dir)
        .filter(
            # any pair that crosses into val or test contaminates eval:
            # train->val leakage counts too, not just test-facing pairs
            F.col("split_pair").isin("train_test", "val_test", "train_val")
        )
        .agg(
            F.lit("eval_leakage_pairs").alias("check"),
            F.sum("n_dup_pairs").alias("value"),
            F.lit(_RG_MAX_EVAL_LEAKAGE).alias("threshold"),
        )
    )
    contam = q_decontaminate(spark, sf_dir).agg(
        F.lit("contaminated_docs").alias("check"),
        F.count(F.lit(1)).alias("value"),
        F.lit(_RG_MAX_CONTAMINATED).alias("threshold"),
    )
    gopher = q_gopher_report(spark, sf_dir).agg(
        F.lit("gopher_pass_ppm").alias("check"),
        F.expr("(sum(n_pass) * 1000000) DIV sum(n_docs)").alias("value"),
        F.lit(_RG_MIN_GOPHER_PASS_PPM).alias("threshold"),
    )
    out = kanon.unionByName(leak).unionByName(contam).unionByName(gopher)
    return out.withColumn(
        "passed",
        F.when(
            F.col("check") == "gopher_pass_ppm",
            F.col("value") >= F.col("threshold"),
        ).otherwise(F.col("value") <= F.col("threshold")),
    )


def _sql_release_gate() -> str:
    # compose the sibling gates' oracle SQL as subqueries — one source of
    # truth (the registry loads plans.quality after the datapipe modules,
    # so these imports are cycle-safe at module-load time)
    from ..datapipe import text as _text
    from ..datapipe.dedup import _sql_split_leakage

    decon_sql = _text.QUERIES["text_decontaminate"][1]
    gopher_sql = _text.QUERIES["quality_gopher_report"][1]
    return f"""
SELECT "check", value, threshold,
       CASE WHEN "check" = 'gopher_pass_ppm' THEN value >= threshold
            ELSE value <= threshold END AS passed
FROM (
  SELECT 'k_anonymity_violations' AS "check",
         (SELECT count(*) FROM ({_SQL_K_ANONYMITY})) AS value,
         {_RG_MAX_KANON_VIOLATIONS} AS threshold
  UNION ALL
  SELECT 'eval_leakage_pairs',
         (SELECT CAST(sum(n_dup_pairs) AS BIGINT) FROM ({_sql_split_leakage()})
          WHERE split_pair IN ('train_test', 'val_test', 'train_val')),
         {_RG_MAX_EVAL_LEAKAGE}
  UNION ALL
  SELECT 'contaminated_docs',
         (SELECT count(*) FROM ({decon_sql})),
         {_RG_MAX_CONTAMINATED}
  UNION ALL
  SELECT 'gopher_pass_ppm',
         (SELECT CAST((sum(n_pass) * 1000000) // sum(n_docs) AS BIGINT)
          FROM ({gopher_sql})),
         {_RG_MIN_GOPHER_PASS_PPM}
)
"""


QUERIES["corpus_release_gate"] = (q_release_gate, _sql_release_gate())
