"""Statistical aggregates, outer joins, and range window frames — rounding
out the SURVEY.md §2.7 inventory (joins: left/full outer; window frames:
RANGE BETWEEN; aggregates: stddev/percentile/correlation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.files import load_table as _t


def stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact statistical aggregates per group (sample stddev/variance,
    exact median via percentile, Pearson correlation)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
    )


SQL_STATS = """
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4) AS sd_qty,
       round(var_samp(l_discount), 6) AS var_disc,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
FROM lineitem
GROUP BY l_returnflag
"""


def outer_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of per-customer order counts against the customer dim
    (customers without orders AND orders outside the dim both survive)."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


SQL_OUTER_JOINS = """
SELECT coalesce(c_custkey, o_custkey) AS custkey,
       c_mktsegment AS segment,
       coalesce(n_orders, 0) AS n_orders
FROM customer
FULL OUTER JOIN (
  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
) o ON c_custkey = o_custkey
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: per-customer count of orders within ±5000 of each
    order's totalprice (value-based frame, not row-based).  The range key is
    integer dollars — float range boundaries are engine-arithmetic-sensitive
    (x−5000 ≤ y vs y−x ≤ 5000 can disagree by 1 ULP)."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "price_d", F.round("o_totalprice").cast("long")
    )
    w = Window.partitionBy("o_custkey").orderBy("price_d").rangeBetween(-5000, 5000)
    return o.select(
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_similar_priced"),
        # sum, not avg: avg of n 2-decimal values lands on exact .xx5 ties
        # that HALF_UP (Spark) and HALF_EVEN-ish (C libs) round apart
        F.round(F.sum("o_totalprice").over(w), 2).alias("sum_similar_price"),
    )


SQL_WINDOW_RANGE = """
SELECT o_orderkey,
       count(*) OVER w AS n_similar_priced,
       round(sum(o_totalprice) OVER w, 2) AS sum_similar_price
FROM (SELECT *, CAST(round(o_totalprice) AS BIGINT) AS price_d FROM orders)
WINDOW w AS (PARTITION BY o_custkey ORDER BY price_d
             RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING)
"""


def conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (conditional aggregation over a known category domain)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "user_id",
            F.col("click").alias("n_click"),
            F.col("purchase").alias("n_purchase"),
            F.col("view").alias("n_view"),
            F.col("signup").alias("n_signup"),
            F.col("error").alias("n_error"),
        )
    )


SQL_PIVOT = """
SELECT user_id,
       count(*) FILTER (event_type = 'click') AS n_click,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'view') AS n_view,
       count(*) FILTER (event_type = 'signup') AS n_signup,
       count(*) FILTER (event_type = 'error') AS n_error
FROM events
GROUP BY user_id
"""


def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch (Greenwald-Khanna ``approx_percentile``), made
    oracle-hashable the same way as ``approx_distinct``: emit the exact
    quantiles plus within-1% booleans comparing sketch vs exact — both
    deterministic on fixed data, so the oracle predicts the exact values
    and ``true``.  At 100 TB the sketch is the only option (exact
    percentile materializes the whole group per key); this query pins
    that the sketch's error stays inside its contract."""
    l = _t(spark, sf_dir, "lineitem")

    def _within(p: float) -> F.Column:
        approx = F.expr(f"approx_percentile(l_extendedprice, {p}, 10000)")
        exact = F.expr(f"percentile(l_extendedprice, {p})")
        return (F.abs(approx - exact) / exact <= 0.01).alias(
            f"p{int(p * 100)}_within_1pct"
        )

    return l.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("exact_p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("exact_p95"),
        _within(0.5),
        _within(0.95),
    )


SQL_APPROX_QUANTILES = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS exact_p95,
       TRUE AS p50_within_1pct,
       TRUE AS p95_within_1pct
FROM lineitem
GROUP BY l_returnflag
"""


QUERIES = {
    "stats_aggs": (stats_aggs, SQL_STATS),
    "approx_quantiles": (approx_quantiles, SQL_APPROX_QUANTILES),
    "outer_joins": (outer_joins, SQL_OUTER_JOINS),
    "window_range_frame": (window_range_frame, SQL_WINDOW_RANGE),
    "conditional_pivot": (conditional_pivot, SQL_PIVOT),
}


# ---------------------------------------------------------------------------
# Count-min sketch — the mergeable heavy-hitter/frequency structure for
# 100 TB streams.  Unlike sampling-based summaries, a CM sketch with
# FIXED hash functions is fully deterministic and merge-order-independent
# (cells are sums), so the whole d×w matrix is exactly oracle-checkable —
# the rare sketch you can hash-gate, not just bound-check.
# Scale shape: one narrow shuffle of ((depth, col), partial-count) pairs,
# map-side combined down to ≤ d·w rows per task; merging two sketches is
# cell-wise addition, so executors can sketch independently and combine.
# ---------------------------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 64


def _cm_hash(key, j: int):
    """Row-j bucket for ``key``: first 8 md5 hex digits of 'cm{j}|key' mod
    width — identical bytes on any engine (verified vs DuckDB)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cm{j}|"), key.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % CM_WIDTH
    )


def sketch_countmin(df: DataFrame, key) -> DataFrame:
    """The full d×w count matrix for ``key``'s frequency distribution.

    ONE pass over ``df``: each row projects its d (depth, col) pairs and
    explodes them in-stage (r14, guide §2.4 — the previous UNION ALL of d
    per-depth projections inlined d full scans of the source; the
    exploded multiset is identical, so the aggregated matrix is too, and
    the map-side partial agg sees the same rows either way)."""
    pairs = F.array(
        *[
            F.struct(F.lit(j).alias("depth"), _cm_hash(key, j).alias("col"))
            for j in range(CM_DEPTH)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("_dc"))
        .select(F.col("_dc.depth").alias("depth"), F.col("_dc.col").alias("col"))
        .groupBy("depth", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return sketch_countmin(o, F.col("o_custkey"))


def _sql_cm_hash(j: int, key: str) -> str:
    return f"(('0x' || substring(md5('cm{j}|' || {key}::VARCHAR), 1, 8))::BIGINT % {CM_WIDTH})"


def _sql_sketch_countmin() -> str:
    arms = " UNION ALL ".join(
        f"SELECT {j} AS depth, {_sql_cm_hash(j, 'o_custkey')} AS col FROM orders"
        for j in range(CM_DEPTH)
    )
    return f"SELECT depth, col, count(*) AS cnt FROM ({arms}) GROUP BY depth, col"


def q_sketch_countmin_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point queries against the sketch: est(key) = min over rows of the
    key's cell — checked alongside the exact count (CM guarantees
    est >= exact; `overcount` is the collision inflation)."""
    o = _t(spark, sf_dir, "orders")
    sketch = sketch_countmin(o, F.col("o_custkey"))
    probes = (
        o.filter(F.col("o_custkey") < 20)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    # one pass over the (bounded) probe aggregate: explode the d probe
    # cells per key instead of UNION-ALL-ing d copies of the aggregate
    # subtree (r14, guide §2.4 — same multiset, one aggregation)
    cells = probes.select(
        "o_custkey",
        "exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth"),
                        _cm_hash(F.col("o_custkey"), j).alias("col"),
                    )
                    for j in range(CM_DEPTH)
                ]
            )
        ).alias("_dc"),
    ).select(
        "o_custkey",
        "exact",
        F.col("_dc.depth").alias("depth"),
        F.col("_dc.col").alias("col"),
    )
    return (
        cells.join(F.broadcast(sketch), ["depth", "col"])
        .groupBy("o_custkey", "exact")
        .agg(F.min("cnt").alias("est"))
        .select(
            "o_custkey",
            "exact",
            "est",
            (F.col("est") - F.col("exact")).alias("overcount"),
        )
    )


def _sql_sketch_countmin_estimate() -> str:
    probe_arms = " UNION ALL ".join(
        f"SELECT o_custkey, exact, {j} AS depth, {_sql_cm_hash(j, 'o_custkey')} AS col "
        f"FROM probes"
        for j in range(CM_DEPTH)
    )
    return f"""
WITH sketch AS ({_sql_sketch_countmin()}),
probes AS (
  SELECT o_custkey, count(*) AS exact FROM orders
  WHERE o_custkey < 20 GROUP BY o_custkey
),
cells AS ({probe_arms})
SELECT o_custkey, exact, min(cnt) AS est, min(cnt) - exact AS overcount
FROM cells JOIN sketch USING (depth, col)
GROUP BY o_custkey, exact
"""


QUERIES["sketch_countmin"] = (q_sketch_countmin, _sql_sketch_countmin())
QUERIES["sketch_countmin_estimate"] = (
    q_sketch_countmin_estimate,
    _sql_sketch_countmin_estimate(),
)


CMS_TOPK = 20


def q_sketch_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter report — the CM sketch's actual production use: the
    top-k keys by SKETCH estimate, each verified against its exact count
    and flagged if it also belongs to the exact top-k (the
    precision-of-the-sketch-ranking audit run before trusting the sketch
    alone on the full stream).

    Scale shape: the sketch is ≤ d·w = 256 cells (broadcast); candidate
    enumeration is one distinct over the key column (bounded by key
    cardinality, never by event count — map-side combine collapses
    events per partition first); the exact top-k membership flag joins
    the k-row TakeOrdered frame back broadcast.  Nothing event-shaped
    shuffles twice, nothing key-shaped hits the driver.  Determinism:
    fixed md5 hash rows make every estimate engine-exact, and both
    orderings tie-break on the key, so the two LIMIT boundaries are
    stable (SURVEY.md §8 discipline)."""
    ev = _t(spark, sf_dir, "events")
    sketch = sketch_countmin(ev, F.col("user_id"))
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    # one pass over the per-key exact aggregate: explode the d probe
    # cells per key instead of UNION-ALL-ing d copies of the whole
    # events aggregation (r14, guide §2.4 — same multiset; the exact
    # frame's groupBy now runs once, and its exchange is shared with
    # the exact_topk branch by runtime reuse)
    cells = exact.select(
        "user_id",
        "exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth"),
                        _cm_hash(F.col("user_id"), j).alias("col"),
                    )
                    for j in range(CM_DEPTH)
                ]
            )
        ).alias("_dc"),
    ).select(
        "user_id",
        "exact",
        F.col("_dc.depth").alias("depth"),
        F.col("_dc.col").alias("col"),
    )
    est = (
        cells.join(F.broadcast(sketch), ["depth", "col"])
        .groupBy("user_id", "exact")
        .agg(F.min("cnt").alias("est"))
    )
    exact_topk = (
        exact.orderBy(F.desc("exact"), F.asc("user_id"))
        .limit(CMS_TOPK)
        .select(F.col("user_id").alias("_xk"))
    )
    return (
        est.orderBy(F.desc("est"), F.asc("user_id"))
        .limit(CMS_TOPK)
        .join(F.broadcast(exact_topk), est.user_id == F.col("_xk"), "left")
        .select(
            "user_id",
            "est",
            "exact",
            (F.col("est") - F.col("exact")).alias("overcount"),
            F.col("_xk").isNotNull().alias("in_exact_topk"),
        )
    )


def _sql_sketch_cms_topk() -> str:
    probe_arms = " UNION ALL ".join(
        f"SELECT user_id, exact, {j} AS depth, {_sql_cm_hash(j, 'user_id')} AS col "
        f"FROM exact"
        for j in range(CM_DEPTH)
    )
    return f"""
WITH sketch AS (
  SELECT depth, col, count(*) AS cnt FROM ({" UNION ALL ".join(
      f"SELECT {j} AS depth, {_sql_cm_hash(j, 'user_id')} AS col FROM events"
      for j in range(CM_DEPTH)
  )}) GROUP BY depth, col
),
exact AS (SELECT user_id, count(*) AS exact FROM events GROUP BY user_id),
cells AS ({probe_arms}),
est AS (
  SELECT user_id, exact, min(cnt) AS est
  FROM cells JOIN sketch USING (depth, col)
  GROUP BY user_id, exact
),
exact_topk AS (
  SELECT user_id FROM exact
  ORDER BY exact DESC, user_id ASC LIMIT {CMS_TOPK}
),
top AS (
  SELECT user_id, est, exact FROM est
  ORDER BY est DESC, user_id ASC LIMIT {CMS_TOPK}
)
SELECT t.user_id, t.est, t.exact, t.est - t.exact AS overcount,
       (x.user_id IS NOT NULL) AS in_exact_topk
FROM top t LEFT JOIN exact_topk x ON t.user_id = x.user_id
"""


QUERIES["sketch_cms_topk"] = (q_sketch_cms_topk, _sql_sketch_cms_topk())


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch with an exact error report
# ---------------------------------------------------------------------------

KMV_K = 64
_KMV_BITS = 48  # 12 hex chars of md5; (k-1)·2^48 ≈ 1.8e16 fits int64


def q_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count estimation via the k-minimum-values sketch (Bar-
    Yossef et al. 2002) next to the EXACT answer — the distinct-count
    member of the sketch family (count-min = frequencies, KMV/HLL =
    cardinality), chosen over HLL for the gate because KMV is exactly
    reproducible: the estimate is pure integer arithmetic over md5
    hashes, so the oracle can verify the SKETCH itself, not a tolerance.

    D̂ = (k−1)·2^48 DIV h₍ₖ₎ where h₍ₖ₎ is the k-th smallest distinct
    48-bit hash.  The k smallest values survive any partitioning (min-k
    is a semigroup — each partition keeps its local k, merge keeps the
    global k: the same mergeability HLL registers have), so at 100 TB
    the exchange carries k hashes per map task, never the key stream.
    The exact distinct count rides along for the error column — at gate
    scale it is cheap; at 100 TB one publishes only the sketch.
    """
    e = _t(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    hashes = e.select(h.alias("h")).distinct()
    topk = hashes.orderBy(F.asc("h")).limit(KMV_K)
    sk = topk.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.max("h").alias("kth_hash"),
    )
    exact = hashes.agg(F.count(F.lit(1)).alias("exact_distinct"))
    est = F.when(
        F.col("n_sampled") < KMV_K, F.col("exact_distinct")
    ).otherwise(F.expr(f"({KMV_K - 1} * {2 ** _KMV_BITS}) DIV kth_hash"))
    return (
        sk.crossJoin(F.broadcast(exact))
        .select(
            F.lit(KMV_K).alias("k"),
            "kth_hash",
            est.alias("est_distinct"),
            "exact_distinct",
        )
        .withColumn(
            "abs_err_ppm",
            F.expr(
                "CASE WHEN exact_distinct = 0 THEN 0 ELSE"
                " (abs(est_distinct - exact_distinct) * 1000000)"
                " DIV exact_distinct END"
            ),
        )
    )


SQL_SKETCH_KMV = f"""
WITH hashes AS (
  SELECT DISTINCT CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
                                       1, 12)) AS BIGINT) AS h
  FROM events
),
topk AS (SELECT h FROM hashes ORDER BY h ASC LIMIT {KMV_K}),
sk AS (SELECT count(*) AS n_sampled, max(h) AS kth_hash FROM topk),
ex AS (SELECT count(*) AS exact_distinct FROM hashes)
SELECT {KMV_K} AS k, kth_hash,
       CASE WHEN n_sampled < {KMV_K} THEN exact_distinct
            ELSE ({KMV_K - 1} * {2 ** _KMV_BITS}) // kth_hash
       END AS est_distinct,
       exact_distinct,
       CASE WHEN exact_distinct = 0 THEN 0
            ELSE (abs(CASE WHEN n_sampled < {KMV_K} THEN exact_distinct
                           ELSE ({KMV_K - 1} * {2 ** _KMV_BITS}) // kth_hash END
                      - exact_distinct) * 1000000) // exact_distinct
       END AS abs_err_ppm
FROM sk CROSS JOIN ex
"""

QUERIES["sketch_kmv_distinct"] = (q_sketch_kmv, SQL_SKETCH_KMV)


# ---------------------------------------------------------------------------
# HyperLogLog register sketch, exactly verified
# ---------------------------------------------------------------------------

HLL_P = 6                      # 2^6 = 64 registers
HLL_M = 1 << HLL_P
_HLL_HASH_BITS = 48            # 12 hex chars of md5, same source as KMV
_HLL_W_BITS = _HLL_HASH_BITS - HLL_P   # 42 value bits per hash
# alpha_64 = 0.7213 / (1 + 1.079/64), fixed to integer ppm so BOTH engines
# compute the estimator with the same literal — no float in the plan
_HLL_ALPHA_PPM = 709341
# registers deeper than this contribute < 2^-40 to the harmonic sum —
# clamping lets the sum stay an exact BIGINT (64 * 2^40 ~ 7e13) instead of
# an order-dependent float; mirrored in the oracle, so the clamp is part
# of the pinned estimator definition, not a hidden approximation
_HLL_REG_CLAMP = 40


def hll_registers(df: DataFrame, key) -> DataFrame:
    """The full 64-row HLL register table for ``key``'s distinct count:
    (bucket, register) with register = max over hashes of rho(w), the
    1-based position of the leftmost 1-bit in the hash's 42 value bits
    (43 when w = 0).

    This is the HLL member of the sketch family (count-min = frequencies,
    KMV = distinct via order statistics, HLL = distinct via bit patterns).
    Like the other two it is a MERGEABLE semigroup — per-partition
    register maxes merge by elementwise max, so at 100 TB every map task
    ships 64 small ints and the key stream never shuffles.  Unlike most
    HLL writeups the register table here is EXACTLY reproducible (md5
    bits + integer ops only), so the gate verifies the sketch itself.

    rho via decimal bit-length: rho = 43 - bitlen(w) where bitlen(w) =
    length(bin(w)) for w > 0 — `bin` renders without leading zeros in
    both engines, and the w = 0 case (bin = '0', length 1) is special-
    cased rather than inherited from that rendering quirk.
    """
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 12), 16, 10).cast("long")
    spine = (
        df.sparkSession.range(HLL_M).select(F.col("id").cast("long").alias("bucket"))
    )
    regs = (
        df.select(h.alias("h"))
        .select(
            F.expr(f"h DIV {1 << _HLL_W_BITS}").alias("bucket"),
            (F.col("h") % (1 << _HLL_W_BITS)).alias("w"),
        )
        .select(
            "bucket",
            F.when(F.col("w") == 0, F.lit(_HLL_W_BITS + 1))
            .otherwise(F.lit(_HLL_W_BITS + 1) - F.length(F.bin(F.col("w"))))
            .alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
    )
    return (
        spine.join(F.broadcast(regs), "bucket", "left")
        .select("bucket", F.coalesce("register", F.lit(0)).alias("register"))
    )


def q_sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return hll_registers(e, F.col("user_id"))


_SQL_HLL_REGS = f"""
WITH hashed AS (
  SELECT CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
              AS BIGINT) AS h
  FROM events
), rho AS (
  SELECT h // {1 << _HLL_W_BITS} AS bucket,
         CASE WHEN h % {1 << _HLL_W_BITS} = 0 THEN {_HLL_W_BITS + 1}
              ELSE {_HLL_W_BITS + 1} - length(bin(h % {1 << _HLL_W_BITS}))
         END AS rho
  FROM hashed
), regs AS (
  SELECT bucket, max(rho) AS register FROM rho GROUP BY bucket
)
SELECT s.bucket, CAST(coalesce(r.register, 0) AS BIGINT) AS register
FROM (SELECT unnest(range(0, {HLL_M})) AS bucket) s
LEFT JOIN regs r USING (bucket)
"""

QUERIES["sketch_hll_registers"] = (q_sketch_hll_registers, _SQL_HLL_REGS)


# linear-counting table: LN64_PPM[V] = round(1e6 * ln(64 / V)) for
# V = 1..64 zero registers (V=64 — the empty-input case, ln(1)=0 — must
# be present: element_at past the end is a runtime error under Spark's
# ANSI mode).  ln is NOT engine-stable as a runtime float, but V only
# takes 64 values — precomputing the table in ppm makes the small-range
# correction of the HLL paper exactly reproducible.  The table is
# generated once here and interpolated into BOTH plans.
import math as _math

_HLL_LN64_PPM = [0] + [
    round(1_000_000 * _math.log(HLL_M / v)) for v in range(1, HLL_M + 1)
]


def q_sketch_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL estimate (raw + small-range linear counting) next to the
    exact answer, all integer: E_raw = alpha_m * m^2 / sum(2^-register),
    evaluated as (ALPHA_PPM * ((m^2 * 2^40) DIV 1e6)) DIV
    sum(2^(40 - min(reg, 40))) — the dyadic harmonic sum is EXACT in
    int64 under the register clamp, so E_raw is bit-reproducible.  Per
    the HLL paper, when E_raw <= 5m/2 and zero registers exist the
    estimate switches to linear counting m*ln(m/V) — ln comes from a
    64-entry ppm table covering V=1..64 baked into both plans (runtime
    ln/pow floats are not engine-stable; a 64-value domain doesn't need
    them; V=64 = all registers zero = empty input, estimate 0)."""
    e = _t(spark, sf_dir, "events")
    regs = hll_registers(e, F.col("user_id"))
    sk = regs.agg(
        F.sum(
            F.expr(
                f"cast(pow(2, {_HLL_REG_CLAMP} - least(register, {_HLL_REG_CLAMP}))"
                " as bigint)"
            )
        ).alias("denom_scaled"),
        F.sum((F.col("register") == 0).cast("long")).alias("n_zero_registers"),
    )
    t_const = (HLL_M * HLL_M * (1 << _HLL_REG_CLAMP)) // 1_000_000
    ln_arr = F.array(*[F.lit(x) for x in _HLL_LN64_PPM[1:]])
    exact = e.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    raw = F.expr(f"({_HLL_ALPHA_PPM} * {t_const}) DIV denom_scaled")
    lc = F.expr(
        f"({HLL_M} * element_at(ln_ppm, cast(n_zero_registers as int)))"
        " DIV 1000000"
    )
    return (
        sk.crossJoin(F.broadcast(exact))
        .withColumn("ln_ppm", ln_arr)
        .withColumn("raw_est", raw)
        .select(
            F.lit(HLL_M).alias("m"),
            F.when(
                (F.col("n_zero_registers") > 0)
                & (F.col("raw_est") <= 5 * HLL_M // 2),
                lc,
            )
            .otherwise(F.col("raw_est"))
            .alias("est_distinct"),
            F.when(
                (F.col("n_zero_registers") > 0)
                & (F.col("raw_est") <= 5 * HLL_M // 2),
                F.lit("linear_counting"),
            )
            .otherwise(F.lit("raw"))
            .alias("estimator"),
            "exact_distinct",
            "n_zero_registers",
        )
        .withColumn(
            "abs_err_ppm",
            F.expr(
                "CASE WHEN exact_distinct = 0 THEN 0 ELSE"
                " (abs(est_distinct - exact_distinct) * 1000000)"
                " DIV exact_distinct END"
            ),
        )
    )


_SQL_HLL_EST = f"""
WITH regs AS ({_SQL_HLL_REGS}),
sk AS (
  SELECT CAST(sum(CAST(pow(2, {_HLL_REG_CLAMP} - least(register, {_HLL_REG_CLAMP}))
                  AS BIGINT)) AS BIGINT) AS denom_scaled,
         CAST(sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zero_registers
  FROM regs
),
ex AS (SELECT count(DISTINCT user_id) AS exact_distinct FROM events),
est AS (
  SELECT denom_scaled, n_zero_registers, exact_distinct,
         ({_HLL_ALPHA_PPM} * {(HLL_M * HLL_M * (1 << _HLL_REG_CLAMP)) // 1_000_000})
           // denom_scaled AS raw_est,
         {_HLL_LN64_PPM[1:]}::BIGINT[] AS ln_ppm
  FROM sk CROSS JOIN ex
),
picked AS (
  SELECT m, exact_distinct, n_zero_registers,
         CASE WHEN use_lc
              THEN ({HLL_M} * ln_ppm[CAST(n_zero_registers AS INT)]) // 1000000
              ELSE raw_est END AS est_distinct,
         CASE WHEN use_lc THEN 'linear_counting' ELSE 'raw' END AS estimator
  FROM (
    SELECT {HLL_M} AS m, exact_distinct, n_zero_registers, raw_est, ln_ppm,
           n_zero_registers > 0 AND raw_est <= {5 * HLL_M // 2} AS use_lc
    FROM est
  )
)
SELECT m, est_distinct, estimator, exact_distinct, n_zero_registers,
       CASE WHEN exact_distinct = 0 THEN 0
            ELSE (abs(est_distinct - exact_distinct) * 1000000)
                 // exact_distinct END AS abs_err_ppm
FROM picked
"""

QUERIES["sketch_hll_estimate"] = (q_sketch_hll_estimate, _SQL_HLL_EST)


# ---------------------------------------------------------------------------
# Windowed HLL: the approximate-distinct dashboard series
# ---------------------------------------------------------------------------

_HLL_WINDOW_S = 21600  # 6h tumbling, same epoch bucketing as quality_error_slo


def q_sketch_hll_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-6h-window approximate distinct users with the full estimator
    (raw + linear-counting switch), exact answer riding along — the
    time-series a 100 TB event pipeline actually publishes.  The window
    dimension changes the aggregation shape, not the sketch: registers
    combine per (window, bucket) with map-side partial max, one exchange
    keyed on the window carries <= 64 small ints per window per task, and
    absent buckets ARE the zero registers (present buckets always have
    rho >= 1), so no spine join is needed.  Streaming mergeability of the
    same registers is pinned by
    ``test_streaming_hll_registers_merge_across_batches``."""
    e = _t(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    w = F.expr(f"unix_timestamp(ts) DIV {_HLL_WINDOW_S}")
    rho = F.when(F.col("w0") == 0, F.lit(_HLL_W_BITS + 1)).otherwise(
        F.lit(_HLL_W_BITS + 1) - F.length(F.bin(F.col("w0")))
    )
    regs = (
        e.select(w.alias("win"), h.alias("h"))
        .select(
            "win",
            F.expr(f"h DIV {1 << _HLL_W_BITS}").alias("bucket"),
            (F.col("h") % (1 << _HLL_W_BITS)).alias("w0"),
        )
        .select("win", "bucket", rho.alias("rho"))
        .groupBy("win", "bucket")
        .agg(F.max("rho").alias("register"))
    )
    sk = regs.groupBy("win").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.expr(
                f"cast(pow(2, {_HLL_REG_CLAMP} - least(register, {_HLL_REG_CLAMP}))"
                " as bigint)"
            )
        ).alias("denom_present"),
    )
    exact = (
        e.select(w.alias("win"), "user_id")
        .distinct()
        .groupBy("win")
        .agg(F.count(F.lit(1)).alias("exact_distinct"))
    )
    t_const = (HLL_M * HLL_M * (1 << _HLL_REG_CLAMP)) // 1_000_000
    ln_arr = F.array(*[F.lit(x) for x in _HLL_LN64_PPM[1:]])
    out = (
        sk.join(exact, "win")
        .withColumn("n_zero_registers", F.lit(HLL_M) - F.col("n_present"))
        .withColumn(
            "denom_scaled",
            F.col("denom_present")
            + F.col("n_zero_registers") * (1 << _HLL_REG_CLAMP),
        )
        .withColumn("ln_ppm", ln_arr)
        .withColumn(
            "raw_est", F.expr(f"({_HLL_ALPHA_PPM} * {t_const}) DIV denom_scaled")
        )
        .withColumn(
            "use_lc",
            (F.col("n_zero_registers") > 0) & (F.col("raw_est") <= 5 * HLL_M // 2),
        )
    )
    lc = F.expr(
        f"({HLL_M} * element_at(ln_ppm, cast(n_zero_registers as int))) DIV 1000000"
    )
    return out.select(
        F.date_format(
            F.timestamp_seconds(F.col("win") * _HLL_WINDOW_S), "yyyy-MM-dd HH:mm:ss"
        ).alias("window_start"),
        F.when(F.col("use_lc"), lc).otherwise(F.col("raw_est")).alias("est_distinct"),
        F.when(F.col("use_lc"), F.lit("linear_counting"))
        .otherwise(F.lit("raw"))
        .alias("estimator"),
        "exact_distinct",
        "n_zero_registers",
    ).withColumn(
        "abs_err_ppm",
        F.expr(
            "CASE WHEN exact_distinct = 0 THEN 0 ELSE"
            " (abs(est_distinct - exact_distinct) * 1000000)"
            " DIV exact_distinct END"
        ),
    )


_SQL_HLL_WINDOWED = f"""
WITH hashed AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // {_HLL_WINDOW_S} AS win,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
              AS BIGINT) AS h
  FROM events
), rho AS (
  SELECT win, h // {1 << _HLL_W_BITS} AS bucket,
         CASE WHEN h % {1 << _HLL_W_BITS} = 0 THEN {_HLL_W_BITS + 1}
              ELSE {_HLL_W_BITS + 1} - length(bin(h % {1 << _HLL_W_BITS}))
         END AS rho
  FROM hashed
), regs AS (
  SELECT win, bucket, max(rho) AS register FROM rho GROUP BY win, bucket
), sk AS (
  SELECT win, count(*) AS n_present,
         CAST(sum(CAST(pow(2, {_HLL_REG_CLAMP} - least(register, {_HLL_REG_CLAMP}))
                  AS BIGINT)) AS BIGINT) AS denom_present
  FROM regs GROUP BY win
), ex AS (
  SELECT win, count(*) AS exact_distinct FROM (
    SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // {_HLL_WINDOW_S} AS win,
           user_id
    FROM events
  ) GROUP BY win
), est AS (
  SELECT s.win, s.n_present, e.exact_distinct,
         {HLL_M} - s.n_present AS n_zero_registers,
         s.denom_present + ({HLL_M} - s.n_present) * {1 << _HLL_REG_CLAMP}
           AS denom_scaled,
         [{", ".join(str(x) for x in _HLL_LN64_PPM[1:])}]::BIGINT[] AS ln_ppm
  FROM sk s JOIN ex e ON s.win = e.win
), picked AS (
  SELECT win, exact_distinct, n_zero_registers,
         CASE WHEN use_lc
              THEN ({HLL_M} * ln_ppm[CAST(n_zero_registers AS INT)]) // 1000000
              ELSE raw_est END AS est_distinct,
         CASE WHEN use_lc THEN 'linear_counting' ELSE 'raw' END AS estimator
  FROM (
    SELECT *,
           ({_HLL_ALPHA_PPM} * {(HLL_M * HLL_M * (1 << _HLL_REG_CLAMP)) // 1_000_000})
             // denom_scaled AS raw_est,
           n_zero_registers > 0 AND
           (({_HLL_ALPHA_PPM} * {(HLL_M * HLL_M * (1 << _HLL_REG_CLAMP)) // 1_000_000})
             // denom_scaled) <= {5 * HLL_M // 2} AS use_lc
    FROM est
  )
)
SELECT strftime(make_timestamp(win * {_HLL_WINDOW_S} * 1000000),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       est_distinct, estimator, exact_distinct, n_zero_registers,
       CASE WHEN exact_distinct = 0 THEN 0
            ELSE (abs(est_distinct - exact_distinct) * 1000000)
                 // exact_distinct END AS abs_err_ppm
FROM picked
"""

QUERIES["sketch_hll_windowed"] = (q_sketch_hll_windowed, _SQL_HLL_WINDOWED)


# ---------------------------------------------------------------------------
# KMV set semantics: sketch union = union sketch
# ---------------------------------------------------------------------------


def q_sketch_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users across TWO event-type populations estimated by
    merging their KMV sketches — merge = union the two k-min sets, keep
    the k smallest (the semigroup KMV shares with HLL registers), which
    is how a 100 TB deployment answers 'distinct across sources' from
    per-source sketches WITHOUT re-scanning either.  The gate publishes
    the merged estimate next to the exact union count and, as the
    set-semantics witness, the per-side estimates — union_est <=
    side sums (inclusion) is checkable downstream."""
    e = _t(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
    ).cast("long")

    def side_topk(pred):
        return (
            e.filter(pred)
            .select(h.alias("h"))
            .distinct()
            .orderBy(F.asc("h"))
            .limit(KMV_K)
        )

    a = side_topk(F.col("event_type") == "click")
    b = side_topk(F.col("event_type") == "purchase")
    merged = a.unionByName(b).distinct().orderBy(F.asc("h")).limit(KMV_K)

    def est_of(topk):
        return topk.agg(
            F.count(F.lit(1)).alias("n"), F.max("h").alias("kth")
        ).select(
            F.when(
                F.col("n") < KMV_K, F.col("n")
            )  # under-filled sketch IS exact
            .otherwise(F.expr(f"({KMV_K - 1} * {2 ** _KMV_BITS}) DIV kth"))
            .alias("est")
        )

    exact = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .select("user_id")
        .distinct()
        .agg(F.count(F.lit(1)).alias("exact_union"))
    )
    return (
        est_of(merged)
        .select(F.col("est").alias("union_est"))
        .crossJoin(F.broadcast(est_of(a).select(F.col("est").alias("click_est"))))
        .crossJoin(
            F.broadcast(est_of(b).select(F.col("est").alias("purchase_est")))
        )
        .crossJoin(F.broadcast(exact))
        .withColumn(
            "abs_err_ppm",
            F.expr(
                "CASE WHEN exact_union = 0 THEN 0 ELSE"
                " (abs(union_est - exact_union) * 1000000) DIV exact_union END"
            ),
        )
    )


SQL_SKETCH_KMV_UNION = f"""
WITH ha AS (
  SELECT DISTINCT CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
                       AS BIGINT) AS h
  FROM events WHERE event_type = 'click'
),
hb AS (
  SELECT DISTINCT CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
                       AS BIGINT) AS h
  FROM events WHERE event_type = 'purchase'
),
ta AS (SELECT h FROM ha ORDER BY h LIMIT {KMV_K}),
tb AS (SELECT h FROM hb ORDER BY h LIMIT {KMV_K}),
tm AS (SELECT DISTINCT h FROM (SELECT h FROM ta UNION ALL SELECT h FROM tb)
       ORDER BY h LIMIT {KMV_K}),
est AS (
  SELECT
    (SELECT CASE WHEN count(*) < {KMV_K} THEN count(*)
                 ELSE ({KMV_K - 1} * {2 ** _KMV_BITS}) // max(h) END FROM tm)
      AS union_est,
    (SELECT CASE WHEN count(*) < {KMV_K} THEN count(*)
                 ELSE ({KMV_K - 1} * {2 ** _KMV_BITS}) // max(h) END FROM ta)
      AS click_est,
    (SELECT CASE WHEN count(*) < {KMV_K} THEN count(*)
                 ELSE ({KMV_K - 1} * {2 ** _KMV_BITS}) // max(h) END FROM tb)
      AS purchase_est,
    (SELECT count(DISTINCT user_id) FROM events
     WHERE event_type IN ('click', 'purchase')) AS exact_union
)
SELECT CAST(union_est AS BIGINT) AS union_est,
       CAST(click_est AS BIGINT) AS click_est,
       CAST(purchase_est AS BIGINT) AS purchase_est,
       exact_union,
       CASE WHEN exact_union = 0 THEN 0
            ELSE (abs(CAST(union_est AS BIGINT) - exact_union) * 1000000)
                 // exact_union END AS abs_err_ppm
FROM est
"""

QUERIES["sketch_kmv_union"] = (q_sketch_kmv_union, SQL_SKETCH_KMV_UNION)
