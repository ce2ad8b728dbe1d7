"""Advanced relational patterns: session windows, skew-salted joins,
sketch aggregates, and the remaining fact/dim join shapes (SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from ..sources.files import load_table as _t

SALT_BUCKETS = 8


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: lineitem ⨝ part (broadcast dim), conditional agg."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(broadcast(p), l.l_partkey == p.p_partkey)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy("p_brand").agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(0.0))
            / F.sum(disc),
            4,
        ).alias("promo_share"),
        F.round(F.sum(disc), 2).alias("revenue"),
    )


SQL_Q14 = """
SELECT p_brand,
       round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (1h inactivity gap) per user over events — the batch
    shape of ``F.session_window``; in streaming the same expression runs
    under a watermark."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "1 hour").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


# gaps-and-islands: a session starts when the gap from the previous event of
# the same user exceeds 1h; session id = running count of starts.  Session
# start must match Spark's session_window.start = first event ts (formatted
# at seconds, matching the µs truncation note in sources/files.py).
SQL_SESSION_WINDOWS = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 1 HOUR OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
),
sess AS (
  SELECT user_id, ts, value,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       round(sum(value), 2) AS session_value
FROM sess
GROUP BY user_id, sid
"""


def salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation pattern: explode the build side over SALT_BUCKETS
    replicas, salt the probe side, join on (key, salt), aggregate.

    The oracle is the *plain* join — salting must be result-transparent.
    At 100 TB this is the manual remedy when one key dominates and AQE's
    skew split can't help (e.g. a broadcast is too big, or the skew is in
    a grouping, not the join); buckets spread one hot key over
    SALT_BUCKETS tasks."""
    l = _t(spark, sf_dir, "lineitem").withColumn(
        "salt", (F.col("l_linenumber") % SALT_BUCKETS)
    )
    o = _t(spark, sf_dir, "orders")
    o_rep = o.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_BUCKETS)]))
    )
    j = l.join(o_rep, (l.l_orderkey == o_rep.o_orderkey) & (l.salt == o_rep.salt))
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


SQL_SALTED_JOIN = """
SELECT o_orderpriority, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def approx_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch aggregate, made oracle-hashable: the raw sketch estimate is
    approximate by design, so instead of emitting it we emit the exact
    distinct count plus a ``within_5pct`` boolean (|approx − exact|/exact ≤
    0.05).  Both sides are deterministic on fixed data — HLL on the same
    input always yields the same estimate — so the oracle simply predicts
    the exact count and ``true`` (VERDICT r1 "what's wrong" #3)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", 0.02)
                - F.count_distinct("l_partkey")
            )
            / F.count_distinct("l_partkey")
            <= 0.05
        ).alias("within_5pct"),
    )


SQL_APPROX_DISTINCT = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_parts,
       TRUE AS within_5pct
FROM lineitem
GROUP BY l_returnflag
"""


QUERIES = {
    "q14_promo_revenue": (q14_promo_revenue, SQL_Q14),
    "session_windows": (session_windows, SQL_SESSION_WINDOWS),
    "salted_join_agg": (salted_join_agg, SQL_SALTED_JOIN),
    "approx_distinct": (approx_distinct_suppliers, SQL_APPROX_DISTINCT),
}


def sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) event-time windows: 1-hour windows every 30
    minutes, so each event lands in exactly two overlapping windows —
    the shape `event_time_windows` (tumbling) does not exercise.  Spark's
    ``window(ts, dur, slide)`` generates the window copies JVM-side; the
    oracle reproduces the epoch-aligned starts with explicit arithmetic."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
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


SQL_SLIDING_WINDOWS = """
SELECT strftime(make_timestamp(CAST((floor(epoch(ts) / 1800) * 1800 - k * 1800)
                                    * 1000000 AS BIGINT)),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events, unnest([0, 1]) AS t(k)
GROUP BY 1, 2
"""


def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p95) per group — the
    sort-based exact path next to the `approx_quantiles` sketch gate.
    Both engines linearly interpolate over the identical sorted doubles,
    so the values match bit-for-bit; floored to 4 for display."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        (F.floor(F.expr("percentile(l_extendedprice, 0.5)") * 10000) / 10000.0).alias(
            "median_price"
        ),
        (F.floor(F.expr("percentile(l_extendedprice, 0.95)") * 10000) / 10000.0).alias(
            "p95_price"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_EXACT_PERCENTILES = """
SELECT l_returnflag,
       floor(quantile_cont(l_extendedprice, 0.5) * 10000) / 10000.0 AS median_price,
       floor(quantile_cont(l_extendedprice, 0.95) * 10000) / 10000.0 AS p95_price,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


QUERIES["sliding_windows"] = (sliding_windows, SQL_SLIDING_WINDOWS)
QUERIES["exact_percentiles"] = (exact_percentiles, SQL_EXACT_PERCENTILES)


def event_funnel(spark, sf_dir):
    """Ordered conversion funnel over the event stream: first 'view', then
    the first 'click' strictly after it, then the first 'purchase'
    strictly after that — the MATCH_RECOGNIZE-ish sequential-pattern
    query, done in ONE shuffle.

    Plan: groupBy(user_id) collects each user's (ts, type) pairs, then a
    whole-stage-codegen ``aggregate`` fold walks the time-sorted array
    advancing a (stage, since) accumulator.  One exchange on user_id and
    a per-user state machine in the JVM — vs the join-per-stage SQL
    formulation (the oracle) that re-shuffles the event table once per
    funnel step.  Per-user arrays are bounded by per-user activity, the
    same envelope every sessionization op here assumes.
    """
    from ..sources.files import load_table

    e = load_table(spark, sf_dir, "events")
    acc0 = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("timestamp").alias("since")
    )
    steps = [("view", 1), ("click", 2), ("purchase", 3)]

    def advance(acc, ev):
        out = acc
        for typ, nxt in reversed(steps):
            hit = (
                (acc["stage"] == nxt - 1)
                & (ev["event_type"] == typ)
                & ((acc["since"].isNull()) | (ev["ts"] > acc["since"]))
            )
            out = F.when(
                hit,
                F.struct(F.lit(nxt).alias("stage"), ev["ts"].alias("since")),
            ).otherwise(out)
        return out

    per_user = (
        e.select("user_id", F.struct("ts", "event_type").alias("ev"))
        .groupBy("user_id")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list("ev")), acc0, advance
            )["stage"].alias("stage")
        )
    )
    return (
        per_user.select(
            F.explode(
                F.filter(
                    F.array(*[F.lit(s) for _, s in steps]),
                    lambda s: s <= F.col("stage"),
                )
            ).alias("funnel_stage")
        )
        .groupBy("funnel_stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


SQL_EVENT_FUNNEL = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, min(ts) AS t
  FROM events e JOIN t1 USING (user_id)
  WHERE event_type = 'click' AND ts > t1.t GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, min(ts) AS t
  FROM events e JOIN t2 USING (user_id)
  WHERE event_type = 'purchase' AND ts > t2.t GROUP BY e.user_id
)
SELECT 1 AS funnel_stage, count(*) AS n_users FROM t1
UNION ALL SELECT 2, count(*) FROM t2
UNION ALL SELECT 3, count(*) FROM t3
"""


QUERIES["event_funnel"] = (event_funnel, SQL_EVENT_FUNNEL)


# ---------------------------------------------------------------------------
# Bloom-filter join pruning
# ---------------------------------------------------------------------------

BLOOM_BITS = 8192
BLOOM_K = 3


def _bloom_pos(key, i: int):
    """Hash ``i``'s bit position for ``key`` — first 8 md5 hex digits of
    'bf{i}|key' mod BLOOM_BITS, the same engine-portable scheme as
    ``_cm_hash`` (identical bytes on Spark and DuckDB)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"bf{i}|"), key.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % BLOOM_BITS
    )


def bloom_filter_positions(build: DataFrame, key) -> DataFrame:
    """The bloom filter of the build side's keys, as the DISTINCT set of bit
    positions (column ``pos``) — at most BLOOM_BITS rows regardless of the
    build side's cardinality, so it broadcasts at any scale."""
    # ONE pass over the build side: each row explodes its K bit
    # positions in-stage (r14, guide §2.4 — the previous UNION ALL of K
    # per-hash projections inlined K full scans of the build side; the
    # exploded position multiset is identical, so the distinct set is
    # too)
    return build.select(
        F.explode(
            F.array(*[_bloom_pos(key, i) for i in range(BLOOM_K)])
        ).alias("pos")
    ).distinct()


def bloom_prune(probe: DataFrame, key, positions: DataFrame) -> DataFrame:
    """Filter ``probe`` down to rows whose key MIGHT be in the build side
    (false positives possible, false negatives impossible).

    The membership test "all K bit positions set" compiles to a chain of K
    broadcast LEFT SEMI hash joins against the (≤ BLOOM_BITS row) position
    set — the probe side streams through without a single shuffle, which is
    the entire point: at 100 TB this runs BEFORE the real join's exchange
    and drops the rows that would die there anyway, paying one broadcast
    instead of shuffling non-matching rows.  This is the manual form of
    Spark's runtime row-level filtering (spark.sql.optimizer.runtime
    .bloomFilter), usable when the build side is a separate pipeline stage.

    The position set is persisted: it is ≤ BLOOM_BITS longs no matter how
    large the build side is, and without the persist each of the K
    broadcasts would recompute the whole build-side aggregation.
    """
    positions = positions.persist()
    out = probe
    for i in range(BLOOM_K):
        p = positions.select(F.col("pos").alias(f"__bf{i}"))
        out = out.join(
            F.broadcast(p), _bloom_pos(key, i) == F.col(f"__bf{i}"), "left_semi"
        )
    return out


def q_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: bloom of one nation's suppliers prunes lineitem, then the real
    join.  ``n_bloom_survivors`` pins the exact hash scheme (false
    positives included); ``n_true_matches`` pins zero false negatives."""
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 7)
    l = _t(spark, sf_dir, "lineitem")
    pos = bloom_filter_positions(s, F.col("s_suppkey"))
    survivors = bloom_prune(l, F.col("l_suppkey"), pos)
    j = survivors.join(
        broadcast(s.select("s_suppkey")),
        survivors.l_suppkey == F.col("s_suppkey"),
        "left",
    )
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_bloom_survivors"),
        F.count("s_suppkey").alias("n_true_matches"),
        F.round(
            F.sum(
                F.when(F.col("s_suppkey").isNotNull(), F.col("l_extendedprice")).otherwise(
                    0.0
                )
            ),
            2,
        ).alias("true_revenue"),
    )


def _sql_bloom_pos(i: int, key: str) -> str:
    return (
        f"(('0x' || substring(md5('bf{i}|' || {key}::VARCHAR), 1, 8))::BIGINT"
        f" % {BLOOM_BITS})"
    )


SQL_BLOOM_PRUNED_JOIN = f"""
WITH supp AS (SELECT s_suppkey FROM supplier WHERE s_nationkey = 7),
pos AS (
  {" UNION ".join(f"SELECT DISTINCT {_sql_bloom_pos(i, 's_suppkey')} AS pos FROM supp" for i in range(BLOOM_K))}
),
survivors AS (
  SELECT l_returnflag, l_suppkey, l_extendedprice FROM lineitem
  WHERE {" AND ".join(
      f"EXISTS (SELECT 1 FROM pos WHERE pos = {_sql_bloom_pos(i, 'l_suppkey')})"
      for i in range(BLOOM_K)
  )}
)
SELECT l_returnflag,
       count(*) AS n_bloom_survivors,
       count(s_suppkey) AS n_true_matches,
       round(sum(CASE WHEN s_suppkey IS NOT NULL THEN l_extendedprice ELSE 0.0 END),
             2) AS true_revenue
FROM survivors LEFT JOIN supp ON l_suppkey = s_suppkey
GROUP BY l_returnflag
"""


QUERIES["bloom_pruned_join"] = (q_bloom_pruned_join, SQL_BLOOM_PRUNED_JOIN)


# ---------------------------------------------------------------------------
# Forward-fill imputation
# ---------------------------------------------------------------------------


def forward_fill(
    df: DataFrame,
    cols: list[str],
    partition_by: list[str],
    order_by: list[str],
) -> DataFrame:
    """Replace NULLs with the last non-null value per partition in event
    order — ``last(ignorenulls)`` over a running frame, one exchange on
    the partition key (the same key/order every sessionization op here
    shuffles on, so in a composed pipeline the exchange is reused)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def q_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: knock out every 5th event's value, forward-fill per user in
    (ts, event_id) order; leading NULLs (no predecessor) stay NULL."""
    e = _t(spark, sf_dir, "events")
    sparse = e.withColumn(
        "value", F.when(F.col("event_id") % 5 == 0, None).otherwise(F.col("value"))
    )
    filled = forward_fill(sparse, ["value"], ["user_id"], ["ts", "event_id"])
    return filled.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        (F.col("event_id") % 5 == 0).alias("was_filled"),
    )


SQL_FORWARD_FILL = """
WITH sparse AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS value
  FROM events
)
SELECT event_id, user_id,
       round(last_value(value IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING), 2) AS value,
       event_id % 5 = 0 AS was_filled
FROM sparse
"""


QUERIES["forward_fill"] = (q_forward_fill, SQL_FORWARD_FILL)


# ---------------------------------------------------------------------------
# Batch sessionization: gap-based session assignment over the whole event
# log (the batch complement of the streaming session_window gate).  Plan:
# ONE shuffle on user_id serves both windows — the gap flag (lag) and the
# session counter (running sum) share the same partitioning, and the
# per-session aggregate groups on (user_id, session_idx), a superset of
# the partition key, so it re-uses the exchange too.  At 100 TB this is
# the canonical "one shuffle, three window passes" sessionizer.
# ---------------------------------------------------------------------------

SESSION_GAP_S = 1800  # 30 min


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Per-session stats: (user_id, session_idx, n_events, first_event,
    last_event, dur_s, total_value_cents)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts")  # floor-to-second, engine-stable
    new_sess = (
        F.when(sec - F.lag(sec).over(w) > gap_s, 1)
        .otherwise(0)
    )
    # first event of a user has lag NULL -> when() falls to otherwise(0),
    # so session numbering starts at 0 for every user
    with_idx = events.withColumn(
        "session_idx", F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return with_idx.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
        (F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts"))).alias("dur_s"),
        F.sum(F.floor(F.col("value") * 100)).alias("total_value_cents"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(_t(spark, sf_dir, "events"))


SQL_SESSIONIZE = f"""
WITH seq AS (
  SELECT user_id, event_id, value, ts,
         floor(epoch(ts)) AS sec,
         CASE WHEN floor(epoch(ts))
                   - lag(floor(epoch(ts))) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                   > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), idx AS (
  -- the running counter MUST order by the same (ts, event_id) key as the
  -- lag window above: ordering by the floored sec would assign an
  -- earlier-id event inside a boundary second to the wrong session
  SELECT user_id, event_id, value, sec,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM seq
)
SELECT user_id, session_idx,
       count(*) AS n_events,
       min(event_id) AS first_event,
       max(event_id) AS last_event,
       CAST(max(sec) - min(sec) AS BIGINT) AS dur_s,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_value_cents
FROM idx
GROUP BY user_id, session_idx
"""

QUERIES["event_sessionize"] = (q_sessionize, SQL_SESSIONIZE)


# ---------------------------------------------------------------------------
# Per-key event-time rate limiting (throttling): keep at most N events per
# (user, minute), drop the rest — the batch analog of a streaming
# throttle, and the dedup-adjacent guard a feed ingester runs before an
# expensive enrichment stage.  ONE shuffle on user_id (the window
# partition key carries the minute bucket too, so Spark partitions by
# (user_id, minute) — no second exchange); deterministic tie-break on
# (ts, event_id) keeps both engines on the same N rows.
# ---------------------------------------------------------------------------

RATE_LIMIT_PER_MINUTE = 3


def rate_limit(df: DataFrame, key_col: str, ts_col: str, n: int,
               order_cols: list | None = None) -> DataFrame:
    """Keep the first ``n`` events per (key, minute) in event-time order;
    adds ``rl_kept`` instead of filtering so callers can audit drops."""
    minute = F.date_trunc("minute", F.col(ts_col))
    w = Window.partitionBy(F.col(key_col), minute).orderBy(
        *(order_cols or [F.col(ts_col), F.col("event_id")])
    )
    return df.withColumn("rl_kept", F.row_number().over(w) <= n)


def q_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    r = rate_limit(e, "user_id", "ts", RATE_LIMIT_PER_MINUTE)
    return r.groupBy("event_type").agg(
        F.count(F.when(F.col("rl_kept"), 1)).alias("n_kept"),
        F.count(F.when(~F.col("rl_kept"), 1)).alias("n_dropped"),
        F.countDistinct(F.when(~F.col("rl_kept"), F.col("user_id"))).alias(
            "n_throttled_users"
        ),
    )


SQL_RATE_LIMIT = f"""
WITH ranked AS (
  SELECT event_type, user_id,
         row_number() OVER (
           PARTITION BY user_id, date_trunc('minute', ts)
           ORDER BY ts, event_id
         ) AS rn
  FROM events
)
SELECT event_type,
       count(CASE WHEN rn <= {RATE_LIMIT_PER_MINUTE} THEN 1 END) AS n_kept,
       count(CASE WHEN rn > {RATE_LIMIT_PER_MINUTE} THEN 1 END) AS n_dropped,
       count(DISTINCT CASE WHEN rn > {RATE_LIMIT_PER_MINUTE} THEN user_id END)
         AS n_throttled_users
FROM ranked
GROUP BY event_type
"""

QUERIES["events_rate_limit"] = (q_rate_limit, SQL_RATE_LIMIT)


# ---------------------------------------------------------------------------
# Retention cohorts: users grouped by first-activity day, activity counted
# by day offset — the standard triangle. Two shuffles total: one
# groupBy(user) for the cohort anchor (map-side combinable min), one for
# the (cohort, offset) rollup; the anchor frame joins back broadcast at
# dimension size... no — user-level anchors are corpus-sized, so the join
# stays shuffle-keyed on user_id, which ALSO serves the first groupBy:
# with bucketing on user_id both exchanges disappear.
# ---------------------------------------------------------------------------


def retention_cohorts(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    anchors = df.groupBy(user_col).agg(
        F.date_trunc("day", F.min(ts_col)).alias("cohort_day")
    )
    j = df.join(anchors, user_col)
    offset = F.datediff(F.date_trunc("day", F.col(ts_col)), F.col("cohort_day"))
    return (
        j.select(user_col, "cohort_day", offset.alias("day_offset"))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return retention_cohorts(e).select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "day_offset",
        "n_users",
    )


SQL_RETENTION_COHORTS = """
WITH anchors AS (
  SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
  FROM events GROUP BY user_id
)
SELECT strftime(a.cohort_day, '%Y-%m-%d') AS cohort_day,
       datediff('day', a.cohort_day, date_trunc('day', e.ts)) AS day_offset,
       count(DISTINCT e.user_id) AS n_users
FROM events e JOIN anchors a USING (user_id)
GROUP BY a.cohort_day, datediff('day', a.cohort_day, date_trunc('day', e.ts))
"""

QUERIES["retention_cohorts"] = (q_retention_cohorts, SQL_RETENTION_COHORTS)


# ---------------------------------------------------------------------------
# Pareto / cumulative-share: "how concentrated is revenue across
# suppliers" — rank by revenue, running share of the total.  All money is
# exact integer cent-basis-points (price_cents × (1−disc) in bps) so the
# cumulative sums and the ppm shares hash identically on both engines
# (SURVEY §8 float discipline: displayed division is floor, never round).
# One groupBy(supplier) + one window over the tiny supplier-level frame.
# ---------------------------------------------------------------------------


def q_pareto_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    unit = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.round((1 - F.col("l_discount")) * 100).cast("long")
    )
    per_supp = l.groupBy("l_suppkey").agg(F.sum(unit).alias("rev_cbps"))
    w = Window.orderBy(F.desc("rev_cbps"), F.asc("l_suppkey"))
    total = Window.partitionBy()
    return (
        per_supp.withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_share_ppm",
            # cum × 1e6 overflows int64 (cent-bps totals ~1e16), so the
            # share goes through doubles — SAME op order both engines
            # ((cum AS DOUBLE) × 1e6 ÷ (total AS DOUBLE)), which is
            # bit-identical IEEE arithmetic, then floor
            F.floor(
                F.sum("rev_cbps")
                .over(w.rowsBetween(Window.unboundedPreceding, 0))
                .cast("double")
                * 1_000_000.0
                / F.sum("rev_cbps").over(total).cast("double")
            ),
        )
        .filter(F.col("rank") <= 50)
        .select("rank", "l_suppkey", "rev_cbps", "cum_share_ppm")
    )


SQL_PARETO_SUPPLIER = """
WITH per_supp AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS rev_cbps
  FROM lineitem GROUP BY l_suppkey
), ranked AS (
  SELECT l_suppkey, CAST(rev_cbps AS BIGINT) AS rev_cbps,
         row_number() OVER (ORDER BY rev_cbps DESC, l_suppkey ASC) AS rank,
         CAST(floor(CAST(sum(rev_cbps) OVER (ORDER BY rev_cbps DESC,
                                             l_suppkey ASC
                                             ROWS UNBOUNDED PRECEDING)
                         AS DOUBLE)
                    * 1000000.0
                    / CAST(sum(rev_cbps) OVER () AS DOUBLE)) AS BIGINT)
           AS cum_share_ppm
  FROM per_supp
)
SELECT rank, l_suppkey, rev_cbps, cum_share_ppm
FROM ranked WHERE rank <= 50
"""

QUERIES["pareto_supplier_revenue"] = (
    q_pareto_supplier_revenue,
    SQL_PARETO_SUPPLIER,
)


# ---------------------------------------------------------------------------
# Last-touch attribution: every purchase credits the most recent click by
# the same user within the attribution window (1 day) — a direct consumer
# of the as-of join (strict backward + tolerance), aggregated to the
# purchase day.  Same single-shuffle asof plan; the rollup is tiny.
# ---------------------------------------------------------------------------


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .asof import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    j = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_id"],
        strict=True,
        tolerance="1 day",
    )
    return (
        j.select(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            F.col("asof_click_id").isNotNull().alias("attributed"),
            "value",
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count(F.when(F.col("attributed"), 1)).alias("n_attributed"),
            F.round(F.sum(F.when(F.col("attributed"), F.col("value"))), 2).alias(
                "attributed_value"
            ),
        )
    )


SQL_ATTRIBUTION = """
WITH attributed AS (
  SELECT p.ts, p.value,
         (SELECT c.event_id FROM events c
          WHERE c.user_id = p.user_id AND c.event_type = 'click'
            AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 1 DAY
          ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
  FROM events p WHERE p.event_type = 'purchase'
)
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(*) AS n_purchases,
       count(CASE WHEN click_id IS NOT NULL THEN 1 END) AS n_attributed,
       round(sum(CASE WHEN click_id IS NOT NULL THEN value END), 2)
         AS attributed_value
FROM attributed
GROUP BY date_trunc('day', ts)
"""

QUERIES["attribution_last_touch"] = (q_attribution_last_touch, SQL_ATTRIBUTION)


# ---------------------------------------------------------------------------
# Time-to-convert: per user, the delay from first signup to the first
# purchase AFTER it; reported as discrete percentiles of the delay in
# seconds (BIGINT — engine-exact).  One groupBy(user) computes both
# anchors with conditional min aggregates (no join, no window): the
# first-purchase-after-signup is min(ts WHERE purchase AND ts >= signup)
# — expressed as a min over a conditional that references the signup min
# via a second pass... avoided: min_by tricks don't apply, so the plan is
# two tiny passes fused by Catalyst into ONE aggregate over (user) using
# a conditional struct min.  Scale: one user-keyed exchange, map-side
# combinable.
# ---------------------------------------------------------------------------


def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("signup_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    conv = (
        # NO broadcast hint: the anchor frame is one row per user —
        # corpus-sized at scale (same reasoning as retention_cohorts);
        # the join shuffles on user_id, which the first groupBy already
        # keyed, and bucketing removes both exchanges
        purchases.join(per_user.filter(F.col("signup_ts").isNotNull()), "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(
            F.min("signup_ts").alias("signup_ts"),
            F.min("ts").alias("first_purchase_ts"),
        )
        .withColumn(
            "delay_s",
            # unix_micros requires TIMESTAMP (events load as NTZ; session
            # TZ is pinned UTC so the cast is a relabel, not a shift)
            # integer floor-division of the microsecond delta: DuckDB's
            # double->BIGINT cast ROUNDS while Spark's truncates (SURVEY
            # §8 float discipline), so the seconds value must never pass
            # through a double cast
            F.floor(
                (
                    F.unix_micros(F.col("first_purchase_ts").cast("timestamp"))
                    - F.unix_micros(F.col("signup_ts").cast("timestamp"))
                )
                / F.lit(1_000_000)
            ).cast("long"),
        )
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY delay_s)")
        .cast("long")
        .alias("p50_s"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY delay_s)")
        .cast("long")
        .alias("p90_s"),
        F.max("delay_s").cast("long").alias("max_s"),
    )


SQL_TIME_TO_CONVERT = """
WITH signup AS (
  SELECT user_id, min(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), conv AS (
  SELECT p.user_id,
         min(s.signup_ts) AS signup_ts,
         min(p.ts) AS first_purchase_ts
  FROM events p JOIN signup s USING (user_id)
  WHERE p.event_type = 'purchase' AND p.ts >= s.signup_ts
  GROUP BY p.user_id
), delays AS (
  SELECT epoch_us(first_purchase_ts - signup_ts) // 1000000 AS delay_s
  FROM conv
)
SELECT count(*) AS n_converted,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY delay_s) AS BIGINT) AS p50_s,
       CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY delay_s) AS BIGINT) AS p90_s,
       CAST(max(delay_s) AS BIGINT) AS max_s
FROM delays
"""

QUERIES["events_time_to_convert"] = (q_time_to_convert, SQL_TIME_TO_CONVERT)


# ---------------------------------------------------------------------------
# Market-basket pair co-occurrence: which parts ship together in one
# order — frequent-itemset-lite.  The self-join is keyed on the ORDER
# (bounded fan-out: k items per order → k(k-1)/2 pairs, never corpus-
# quadratic), distinct parts per order first so multiplicity doesn't
# inflate support.  Top-50 pairs with full deterministic tie-break.
# ---------------------------------------------------------------------------


def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the canonical pair-support frame IS the weighted co-purchase edge
    # artifact (r5): one shared build serves the graph family, this gate,
    # and the association rules
    from .graph import _weighted_edges_for

    return (
        _weighted_edges_for(spark, sf_dir)
        .select(
            F.col("src").alias("part_a"),
            F.col("dst").alias("part_b"),
            "n_orders",
        )
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(50)
    )


SQL_BASKET_PAIRS = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
FROM items a JOIN items b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
ORDER BY n_orders DESC, part_a ASC, part_b ASC
LIMIT 50
"""

QUERIES["basket_pair_counts"] = (q_basket_pairs, SQL_BASKET_PAIRS)


# ---------------------------------------------------------------------------
# Event-transition matrix (first-order Markov): per user in event-time
# order, count (from_type → to_type) transitions across the corpus and
# each from-state's transition share in ppm (integer — engine-exact).
# One user_id-keyed window pass (lag) + a tiny (|types|²) rollup.
# ---------------------------------------------------------------------------


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("from_type", F.lag("event_type").over(w))
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_total = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.floor(F.col("n") * 1_000_000 / F.sum("n").over(row_total)).alias(
            "share_ppm"
        ),
    )


SQL_EVENT_TRANSITIONS = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_type,
         event_type AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       CAST(floor(n * 1000000 / sum(n) OVER (PARTITION BY from_type))
            AS BIGINT) AS share_ppm
FROM counts
"""

QUERIES["events_markov_transitions"] = (q_event_transitions, SQL_EVENT_TRANSITIONS)


# ---------------------------------------------------------------------------
# Inter-arrival time distribution per event type: the capacity-planning /
# anomaly baseline (is traffic bursty? did a producer stall?).  Gaps are
# integer microseconds (floor semantics end-to-end — no double casts),
# discrete percentiles keep both engines bit-identical.  One window pass
# keyed by (type ordered by ts) + a tiny per-type rollup.
# ---------------------------------------------------------------------------


def q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        e.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .withColumn(
            "gap_us",
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("prev_ts").cast("timestamp")),
        )
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us)")
        .cast("long")
        .alias("p50_us"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY gap_us)")
        .cast("long")
        .alias("p99_us"),
        F.max("gap_us").alias("max_us"),
    )


SQL_INTERARRIVAL = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts - lag(ts) OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id)) AS gap_us
  FROM events
)
SELECT event_type,
       count(*) AS n_gaps,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us) AS BIGINT)
         AS p50_us,
       CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY gap_us) AS BIGINT)
         AS p99_us,
       max(gap_us) AS max_us
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY event_type
"""

QUERIES["events_interarrival_stats"] = (q_interarrival_stats, SQL_INTERARRIVAL)


# ---------------------------------------------------------------------------
# Debounce: collapse per-key event bursts to their first record
# ---------------------------------------------------------------------------

DEBOUNCE_GAP_S = 7200  # 2h; corpus median per-user gap is ~7.4h, p10 ~1.1h


def debounce(events: DataFrame, gap_s: int = DEBOUNCE_GAP_S) -> DataFrame:
    """Keep the FIRST event of every per-user burst (events closer than
    ``gap_s`` to their predecessor collapse into the burst), reporting how
    many records each kept event absorbed.

    Debounce vs the existing throttles: ``events_rate_limit`` keeps the
    first N per FIXED (user, minute) bucket; ``sessionize`` aggregates
    bursts; debounce EMITS A RECORD STREAM — the kept representative per
    dynamic burst — which is the duplicate-webhook / retry-storm collapse
    semantics (same record fired 5x in a burst → 1 downstream record).

    Plan: the lag window, the running burst counter, and the final
    groupBy all key on user_id — ONE exchange serves all three (the same
    single-shuffle discipline as ``sessionize``, which this extends).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts")  # floor-to-second, engine-stable
    new_burst = (
        F.when(sec - F.lag(sec).over(w) > gap_s, 1).otherwise(0)
    )
    with_idx = events.withColumn(
        "burst_idx",
        F.sum(new_burst).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    first = F.min(F.struct("ts", "event_id", "event_type", "value"))
    return with_idx.groupBy("user_id", "burst_idx").agg(
        first.alias("__f"),
        (F.count(F.lit(1)) - F.lit(1)).alias("n_collapsed"),
        (F.max(sec) - F.min(sec)).alias("burst_span_s"),
    ).select(
        "user_id",
        "burst_idx",
        F.col("__f.event_id").alias("event_id"),
        F.date_format("__f.ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.col("__f.event_type").alias("event_type"),
        F.round("__f.value", 2).alias("value"),
        "n_collapsed",
        "burst_span_s",
    )


def q_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return debounce(_t(spark, sf_dir, "events"))


SQL_DEBOUNCE = f"""
WITH seq AS (
  SELECT user_id, event_id, event_type, value, ts,
         floor(epoch(ts)) AS sec,
         CASE WHEN floor(epoch(ts))
                   - lag(floor(epoch(ts))) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                   > {DEBOUNCE_GAP_S}
              THEN 1 ELSE 0 END AS new_burst
  FROM events
), idx AS (
  SELECT user_id, event_id, event_type, value, ts, sec,
         CAST(sum(new_burst) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS burst_idx
  FROM seq
)
SELECT user_id, burst_idx,
       first(event_id ORDER BY ts, event_id) AS event_id,
       strftime(first(ts ORDER BY ts, event_id), '%Y-%m-%d %H:%M:%S') AS ts,
       first(event_type ORDER BY ts, event_id) AS event_type,
       round(first(value ORDER BY ts, event_id), 2) AS value,
       count(*) - 1 AS n_collapsed,
       CAST(max(sec) - min(sec) AS BIGINT) AS burst_span_s
FROM idx
GROUP BY user_id, burst_idx
"""

QUERIES["events_debounce"] = (q_debounce, SQL_DEBOUNCE)


# ---------------------------------------------------------------------------
# Association rules: support / confidence / lift over co-purchase pairs
# ---------------------------------------------------------------------------

RULE_MIN_SUPPORT = 2  # orders; pairs seen once are noise
RULE_TOPK = 50


def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic market-basket association rules a→b ranked by lift — the
    statistical layer ABOVE ``basket_pair_counts``: a pair can co-occur
    often purely because both items are popular; lift divides that out.

    All ratios are INTEGER ppm with floor division (engine-exact):
      confidence_ppm(a→b) = 1e6·n_ab DIV n_a
      lift_ppm(a→b)       = confidence_ppm·N DIV n_b   (≈ 1e6·lift)
    Directional rules are emitted both ways from each undirected pair.

    Plan: the distinct (order, part) projection feeds the pair self-join
    (bounded per order, the basket-expansion shuffle) and the per-part
    order counts; counts join back BROADCAST (catalog-sized, not
    corpus-sized), and the order-count scalar rides a 1-row broadcast.
    Top-k via TakeOrdered — no global sort.
    """
    # the distinct (order, part) projection feeds the per-part counts and
    # the order total; the PAIR support frame comes from the shared
    # weighted co-purchase edge artifact (r5) instead of a second
    # basket-expansion join — the SQL twin marks its twin MATERIALIZED
    from .graph import _weighted_edges_for

    items = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    pairs = (
        _weighted_edges_for(spark, sf_dir)
        .select(
            F.col("src").alias("part_a"),
            F.col("dst").alias("part_b"),
            F.col("n_orders").alias("n_ab"),
        )
        .filter(F.col("n_ab") >= RULE_MIN_SUPPORT)
    )
    # both directions: a→b and b→a have different confidence
    rules = pairs.unionByName(
        pairs.select(
            F.col("part_b").alias("part_a"),
            F.col("part_a").alias("part_b"),
            "n_ab",
        )
    )
    part_n = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    tot = items.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    joined = (
        rules.join(
            F.broadcast(part_n.select(F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a"))),
            "part_a",
        )
        .join(
            F.broadcast(part_n.select(F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b"))),
            "part_b",
        )
        .crossJoin(F.broadcast(tot))
    )
    conf = F.expr("(n_ab * 1000000) DIV n_a")
    lift = F.expr("(((n_ab * 1000000) DIV n_a) * n_orders) DIV n_b")
    return (
        joined.select(
            "part_a",
            "part_b",
            F.col("n_ab").alias("support_n"),
            conf.alias("confidence_ppm"),
            lift.alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), F.asc("part_a"), F.asc("part_b"))
        .limit(RULE_TOPK)
    )


SQL_ASSOCIATION_RULES = f"""
WITH items AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {RULE_MIN_SUPPORT}
),
rules AS (
  SELECT part_a, part_b, n_ab FROM pairs
  UNION ALL SELECT part_b, part_a, n_ab FROM pairs
),
part_n AS (SELECT l_partkey, count(*) AS n_part FROM items GROUP BY 1),
tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items)
SELECT part_a, part_b,
       CAST(n_ab AS BIGINT) AS support_n,
       (n_ab * 1000000) // na.n_part AS confidence_ppm,
       (((n_ab * 1000000) // na.n_part) * n_orders) // nb.n_part AS lift_ppm
FROM rules
JOIN part_n na ON na.l_partkey = part_a
JOIN part_n nb ON nb.l_partkey = part_b
CROSS JOIN tot
ORDER BY lift_ppm DESC, part_a ASC, part_b ASC
LIMIT {RULE_TOPK}
"""

QUERIES["basket_association_rules"] = (q_association_rules, SQL_ASSOCIATION_RULES)


# ---------------------------------------------------------------------------
# RFM segmentation: recency / frequency / monetary quintile scoring
# ---------------------------------------------------------------------------


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic RFM customer segmentation — per customer: days since last
    order (recency), order count (frequency), lifetime spend in integer
    cents (monetary); each scored into quintiles 1..5 (5 = best) and
    rolled up per 3-digit segment code (555 = champions, 111 = lost).

    Determinism: recency via integer second floor-division against the
    corpus max order date (broadcast 1-row frame, not wall clock);
    monetary in floor cents; quintiles via ``ntile(5)`` over a TOTAL
    order (metric + custkey tie-break) — ntile's remainder-to-early-
    buckets distribution is SQL-standard and identical in both engines,
    but only deterministic when the ORDER BY is total.  The three ntile
    windows are unpartitioned — fine because they run over the per-
    customer ROLLUP (one row per customer), not the order stream; at
    cluster scale the same scores come from percent_rank against
    broadcast quantile boundaries.
    """
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max(F.unix_timestamp("o_orderdate")).alias("last_sec"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.floor(F.col("o_totalprice") * 100)).alias("monetary_cents"),
    )
    mx = per_cust.agg(F.max("last_sec").alias("max_sec"))
    base = per_cust.crossJoin(F.broadcast(mx)).withColumn(
        "recency_days", F.expr("(max_sec - last_sec) DIV 86400")
    )
    # 5 = best: most recent / most frequent / biggest spender
    r_s = F.ntile(5).over(Window.orderBy(F.desc("recency_days"), F.asc("o_custkey")))
    f_s = F.ntile(5).over(Window.orderBy(F.asc("frequency"), F.asc("o_custkey")))
    m_s = F.ntile(5).over(Window.orderBy(F.asc("monetary_cents"), F.asc("o_custkey")))
    scored = base.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        r_s.alias("r"),
        f_s.alias("f"),
        m_s.alias("m"),
    )
    return scored.groupBy(
        (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("monetary_cents").alias("segment_cents"),
        F.min("o_custkey").alias("example_cust"),
    )


SQL_RFM_SEGMENTS = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(max(floor(epoch(o_orderdate))) AS BIGINT) AS last_sec,
         count(*) AS frequency,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders GROUP BY o_custkey
),
base AS (
  SELECT *, (max_sec - last_sec) // 86400 AS recency_days
  FROM per_cust CROSS JOIN (SELECT max(last_sec) AS max_sec FROM per_cust)
),
scored AS (
  SELECT o_custkey, monetary_cents,
         ntile(5) OVER (ORDER BY recency_days DESC, o_custkey ASC) AS r,
         ntile(5) OVER (ORDER BY frequency ASC, o_custkey ASC) AS f,
         ntile(5) OVER (ORDER BY monetary_cents ASC, o_custkey ASC) AS m
  FROM base
)
SELECT (r * 100 + f * 10 + m) AS segment,
       count(*) AS n_customers,
       CAST(sum(monetary_cents) AS BIGINT) AS segment_cents,
       min(o_custkey) AS example_cust
FROM scored
GROUP BY 1
"""

QUERIES["customer_rfm_segments"] = (q_rfm_segments, SQL_RFM_SEGMENTS)


# ---------------------------------------------------------------------------
# Time-decayed engagement: exponential decay in pure integer arithmetic
# ---------------------------------------------------------------------------

DECAY_HALF_LIFE_DAYS = 7
DECAY_MAX_SHIFT = 40  # floor: 2^40 halvings zero out any int64 cent value


def q_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user engagement score with EXPONENTIAL TIME DECAY — the
    recommender/feature-store staple (recent activity counts full, each
    ``DECAY_HALF_LIFE_DAYS``-old week counts half).  The decay is a pure
    integer RIGHT SHIFT: value_cents >> (age_days DIV half_life), which
    IS floor(value / 2^k) for non-negative ints — so the score is exactly
    reproducible across engines, where float exp(-lambda*t) would hash
    differently.  Age anchors on the corpus max timestamp (broadcast
    1-row frame), not wall clock.  One map-combined aggregate on user_id.
    """
    e = _t(spark, sf_dir, "events")
    mx = e.select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    ).agg(F.max("us").alias("max_us"))
    scored = e.crossJoin(F.broadcast(mx)).select(
        "user_id",
        "event_id",
        F.expr(
            "shiftright(CAST(floor(value * 100) AS BIGINT), "
            f"CAST(least((max_us - unix_micros(CAST(ts AS TIMESTAMP))) DIV 86400000000 "
            f"DIV {DECAY_HALF_LIFE_DAYS}, {DECAY_MAX_SHIFT}) AS INT))"
        ).alias("decayed_cents"),
    )
    return scored.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("decayed_cents").alias("engagement_cents"),
    )


SQL_DECAYED_ENGAGEMENT = f"""
WITH mx AS (SELECT max(epoch_us(ts)) AS max_us FROM events)
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(
         CAST(floor(value * 100) AS BIGINT)
           >> least((max_us - epoch_us(ts)) // 86400000000
                      // {DECAY_HALF_LIFE_DAYS}, {DECAY_MAX_SHIFT})
       ) AS BIGINT) AS engagement_cents
FROM events CROSS JOIN mx
GROUP BY user_id
"""

QUERIES["events_decayed_engagement"] = (q_decayed_engagement, SQL_DECAYED_ENGAGEMENT)


# ---------------------------------------------------------------------------
# DAU / WAU stickiness: trailing-window distinct actives
# ---------------------------------------------------------------------------


def q_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily actives, trailing-7-day actives, and the DAU/WAU stickiness
    ratio in integer ppm — the product-health metric every event pipeline
    publishes.  Trailing DISTINCT users cannot be summed from daily
    counts (users repeat); instead each (user, day) activity contributes
    itself to the 7 window-ends it falls in — one 7-wide explode of the
    already-distinct (user, day) frame, then a distinct count per window
    end.  Window keys are integer epoch days (floor division) so both
    engines bucket identically; the first 6 calendar days are partial
    windows by construction and reported as-is.
    """
    e = _t(spark, sf_dir, "events")
    ud = (
        e.select(
            "user_id",
            F.expr("unix_timestamp(ts) DIV 86400").alias("day"),
        )
        .distinct()
    )
    # ONE corpus pass for both metrics (r14, guide §2.4): referencing the
    # distinct (user, day) frame from two branches re-ran the events scan
    # per branch (the wau branch's explode fused BELOW its distinct, so
    # the subtrees never canonicalized).  Instead each activity carries a
    # day-0 flag through the 7-wide explode: max(flag) per (user, wend)
    # marks users active ON the window end itself, so one (wend, user)
    # dedup yields wau = count(*) and dau = count(flag) per window end.
    # The old inner join dropped window ends with no same-day activity —
    # the dau > 0 filter is that exact condition.
    uw = (
        ud.select(
            "user_id",
            "day",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + F.lit(6))
            ).alias("wend"),
        )
        .select(
            "user_id", "wend", (F.col("day") == F.col("wend")).alias("d0")
        )
        .groupBy("user_id", "wend")
        .agg(F.max("d0").alias("d0"))
    )
    return (
        uw.groupBy("wend")
        .agg(
            F.count(F.when(F.col("d0"), 1)).alias("dau"),
            F.count(F.lit(1)).alias("wau"),
        )
        .filter(F.col("dau") > 0)
        .select(
            F.date_format(
                F.timestamp_seconds(F.col("wend") * 86400), "yyyy-MM-dd"
            ).alias("day"),
            "dau",
            "wau",
            F.expr("(dau * 1000000) DIV wau").alias("stickiness_ppm"),
        )
    )


SQL_DAU_WAU = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
),
dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
wau AS (
  SELECT wend, count(*) AS wau FROM (
    SELECT DISTINCT user_id, day + t.o AS wend
    FROM ud CROSS JOIN range(0, 7) t(o)
  ) GROUP BY wend
)
SELECT strftime(make_timestamp(d.day * 86400 * 1000000), '%Y-%m-%d') AS day,
       dau, wau,
       (dau * 1000000) // wau AS stickiness_ppm
FROM dau d JOIN wau w ON w.wend = d.day
"""

QUERIES["events_dau_wau"] = (q_dau_wau, SQL_DAU_WAU)


# ---------------------------------------------------------------------------
# Linear multi-touch attribution: every touch in the window shares credit
# ---------------------------------------------------------------------------

ATTR_WINDOW = "INTERVAL 1 DAY"


def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution — the fairness counterpart of
    ``attribution_last_touch``: every click in the day before a purchase
    shares the purchase's value EQUALLY.  Credit is integer micro-cents,
    ``(value_cents · 1e6) DIV n_touches`` — cross-engine exact, and the
    floor-division remainder (< n_touches µ¢ per purchase) is the
    documented rounding loss.

    Plan: equi-join on user_id with the window predicate as a filter (the
    bounded range-join shape of ``range_join_followups``), then ONE window
    count partitioned by purchase to learn n_touches without a second
    join, then the per-day rollup.
    """
    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    j = p.join(c, "user_id").filter(
        (F.col("cts") < F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr(ATTR_WINDOW))
    )
    n = F.count(F.lit(1)).over(Window.partitionBy("purchase_id"))
    credited = j.select(
        F.date_format(F.date_trunc("day", "cts"), "yyyy-MM-dd").alias("click_day"),
        "click_id",
        F.expr("value_cents * 1000000").alias("vc"),
        n.alias("n_touches"),
    ).withColumn("credit_ucents", F.expr("vc DIV n_touches"))
    return credited.groupBy("click_day").agg(
        F.count(F.lit(1)).alias("n_credited_clicks"),
        F.sum("credit_ucents").alias("credit_ucents"),
    )


SQL_ATTRIBUTION_LINEAR = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, ts AS pts,
         CAST(floor(value * 100) AS BIGINT) AS value_cents
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, event_id AS click_id, ts AS cts
  FROM events WHERE event_type = 'click'
),
j AS (
  SELECT p.purchase_id, p.value_cents, c.click_id, c.cts,
         count(*) OVER (PARTITION BY p.purchase_id) AS n_touches
  FROM p JOIN c ON p.user_id = c.user_id
  WHERE c.cts < p.pts AND c.cts >= p.pts - INTERVAL 1 DAY
)
SELECT strftime(date_trunc('day', cts), '%Y-%m-%d') AS click_day,
       count(*) AS n_credited_clicks,
       CAST(sum((value_cents * 1000000) // n_touches) AS BIGINT)
         AS credit_ucents
FROM j
GROUP BY 1
"""

QUERIES["attribution_linear"] = (q_attribution_linear, SQL_ATTRIBUTION_LINEAR)


# ---------------------------------------------------------------------------
# Order-to-ship SLA: fulfillment-delay percentiles per month
# ---------------------------------------------------------------------------


def q_ship_delay_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship delay distribution per order month — the fulfillment
    SLA report: p50/p90/max delay in WHOLE DAYS (integer floor division
    of the second delta — cross-engine exact) plus the share of lineitems
    shipped within 30 days in integer ppm.  (The synthetic testdata draws
    shipdate independently of orderdate, so delays can be NEGATIVE; that
    is safe because Spark's DIV and DuckDB's // both truncate toward
    zero on negative operands — measured -7/2 = -3 on each — so the
    day bucketing agrees sign-for-sign.)  Percentiles are
    ``percentile_disc`` (a discrete member of the set, hash-safe — never
    the interpolated percentile_cont).  One join orders→lineitem (orders
    side grouped per month AFTER the join; the join key carries the
    single shuffle) and one aggregate.
    """
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").alias("odate")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), F.col("l_shipdate").alias("sdate")
    )
    j = li.join(o, "o_orderkey").select(
        F.date_format(F.date_trunc("month", "odate"), "yyyy-MM").alias("month"),
        F.expr("(unix_timestamp(sdate) - unix_timestamp(odate)) DIV 86400").alias(
            "delay_days"
        ),
    )
    return j.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        # Spark percentile_disc returns DOUBLE even over integer input;
        # cast back so the type class matches DuckDB's BIGINT
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY delay_days) AS BIGINT)"
        ).alias("p50_days"),
        F.expr(
            "CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY delay_days) AS BIGINT)"
        ).alias("p90_days"),
        F.max("delay_days").alias("max_days"),
        F.expr(
            "(sum(CASE WHEN delay_days <= 30 THEN 1 ELSE 0 END) * 1000000)"
            " DIV count(1)"
        ).alias("within_30d_ppm"),
    )


SQL_SHIP_DELAY_SLA = """
WITH j AS (
  SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS month,
         (CAST(floor(epoch(l.l_shipdate)) AS BIGINT)
            - CAST(floor(epoch(o.o_orderdate)) AS BIGINT)) // 86400
           AS delay_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT month,
       count(*) AS n_lineitems,
       percentile_disc(0.5) WITHIN GROUP (ORDER BY delay_days) AS p50_days,
       percentile_disc(0.9) WITHIN GROUP (ORDER BY delay_days) AS p90_days,
       max(delay_days) AS max_days,
       (CAST(sum(CASE WHEN delay_days <= 30 THEN 1 ELSE 0 END) AS BIGINT)
          * 1000000) // count(*) AS within_30d_ppm
FROM j
GROUP BY month
"""

QUERIES["orders_ship_delay_sla"] = (q_ship_delay_sla, SQL_SHIP_DELAY_SLA)


# ---------------------------------------------------------------------------
# Cohort LTV: cumulative value per signup cohort over weeks-since
# ---------------------------------------------------------------------------


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves — the VALUE companion of
    ``retention_cohorts``: users grouped by first-seen week, cumulative
    purchase cents per cohort over weeks-since-signup.  Week indices are
    integer epoch-week floor divisions; money is integer cents; the
    cumulative sum is a window over the tiny (cohort × week) rollup, so
    the only full-data exchanges are the per-user min and the per-cell
    aggregate.
    """
    e = _t(spark, sf_dir, "events")
    wk = F.expr("unix_timestamp(ts) DIV 604800")
    anchors = e.groupBy("user_id").agg(F.min(wk).alias("cohort_wk"))
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        wk.alias("w"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    cells = (
        purchases.join(anchors, "user_id")
        .groupBy("cohort_wk", (F.col("w") - F.col("cohort_wk")).alias("week_offset"))
        .agg(
            F.sum("cents").alias("cents"),
            F.count_distinct("user_id").alias("n_buyers"),
        )
    )
    from pyspark.sql.window import Window as _W

    cum = F.sum("cents").over(
        _W.partitionBy("cohort_wk")
        .orderBy("week_offset")
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    return cells.select(
        F.date_format(
            F.timestamp_seconds(F.col("cohort_wk") * 604800), "yyyy-MM-dd"
        ).alias("cohort_week"),
        "week_offset",
        "n_buyers",
        "cents",
        cum.alias("cum_cents"),
    )


SQL_COHORT_LTV = """
WITH anchors AS (
  SELECT user_id,
         min(CAST(floor(epoch(ts)) AS BIGINT) // 604800) AS cohort_wk
  FROM events GROUP BY user_id
),
cells AS (
  SELECT a.cohort_wk,
         (CAST(floor(epoch(e.ts)) AS BIGINT) // 604800) - a.cohort_wk
           AS week_offset,
         CAST(sum(CAST(floor(e.value * 100) AS BIGINT)) AS BIGINT) AS cents,
         count(DISTINCT e.user_id) AS n_buyers
  FROM events e JOIN anchors a USING (user_id)
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT strftime(make_timestamp(cohort_wk * 604800 * 1000000), '%Y-%m-%d')
         AS cohort_week,
       week_offset, n_buyers, cents,
       CAST(sum(cents) OVER (PARTITION BY cohort_wk ORDER BY week_offset
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
FROM cells
"""

QUERIES["events_cohort_ltv"] = (q_cohort_ltv, SQL_COHORT_LTV)


# ---------------------------------------------------------------------------
# Activity concentration: exact integer Gini + top-decile share
# ---------------------------------------------------------------------------


def q_activity_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How concentrated is event activity across users — exact Gini
    coefficient and top-decile share, both in integer ppm: the
    inequality screen run before per-user sampling (a handful of bot
    accounts owning half the corpus skews every downstream rate).

    Gini via the rank formula over ascending activity
    G = 2·Σ(i·xᵢ) / (n·Σx) − (n+1)/n, computed as
    ``(2·Σ(i·xᵢ)·1e6) DIV (n·Σx) − ((n+1)·1e6) DIV n`` — both engines
    evaluate the IDENTICAL floor-division sequence, so the ppm result
    hashes exactly.  The rank window runs over the per-user rollup (one
    row per user) with a (count, user_id) total order.  Top-decile
    membership = rank > n − n DIV 10.
    """
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    rk = F.row_number().over(Window.orderBy(F.asc("x"), F.asc("user_id")))
    n_all = F.count(F.lit(1)).over(
        Window.partitionBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    ranked = per_user.withColumn("i", rk).withColumn("n", n_all)
    return ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("n_events"),
        F.expr(
            "(2 * sum(CAST(i AS BIGINT) * x) * 1000000) DIV (count(1) * sum(x))"
            " - ((count(1) + 1) * 1000000) DIV count(1)"
        ).alias("gini_ppm"),
        F.expr(
            "(sum(CASE WHEN i > n - n DIV 10 THEN x ELSE 0 END) * 1000000)"
            " DIV sum(x)"
        ).alias("top_decile_ppm"),
    )


SQL_ACTIVITY_CONCENTRATION = """
WITH per_user AS (
  SELECT user_id, count(*) AS x FROM events GROUP BY user_id
),
ranked AS (
  SELECT x, CAST(row_number() OVER (ORDER BY x ASC, user_id ASC) AS BIGINT)
           AS i,
         count(*) OVER () AS n
  FROM per_user
)
SELECT count(*) AS n_users,
       CAST(sum(x) AS BIGINT) AS n_events,
       (2 * CAST(sum(i * x) AS BIGINT) * 1000000)
         // (count(*) * CAST(sum(x) AS BIGINT))
         - ((count(*) + 1) * 1000000) // count(*) AS gini_ppm,
       (CAST(sum(CASE WHEN i > n - n // 10 THEN x ELSE 0 END) AS BIGINT)
          * 1000000) // CAST(sum(x) AS BIGINT) AS top_decile_ppm
FROM ranked
"""

QUERIES["events_concentration"] = (q_activity_concentration, SQL_ACTIVITY_CONCENTRATION)


# ---------------------------------------------------------------------------
# Bot screening: inter-arrival regularity per user
# ---------------------------------------------------------------------------

BOT_MIN_EVENTS = 10
BOT_REGULARITY_PPM = 100_000  # spread < 10% of median delta → timer-like


def q_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timer-bot screen: humans arrive with heavy-tailed gaps, scripted
    clients fire on schedules — so a user whose p10–p90 inter-arrival
    SPREAD is small relative to the median gap is machine-like.  Per user
    (≥ ``BOT_MIN_EVENTS`` events): median/p10/p90 of the microsecond
    deltas (``percentile_disc`` — set members, integer, hash-safe),
    regularity = spread/median in integer ppm, and the bot flag.  One
    user-keyed window (lag) + one aggregate sharing the same exchange.
    """
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    deltas = (
        e.withColumn("d", us - F.lag(us).over(w))
        .filter(F.col("d").isNotNull())
    )
    agg = deltas.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY d) AS BIGINT)"
        ).alias("med_us"),
        F.expr(
            "CAST(percentile_disc(0.1) WITHIN GROUP (ORDER BY d) AS BIGINT)"
        ).alias("p10_us"),
        F.expr(
            "CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY d) AS BIGINT)"
        ).alias("p90_us"),
    ).filter(F.col("n_gaps") >= BOT_MIN_EVENTS - 1)
    reg = F.expr("((p90_us - p10_us) * 1000000) DIV med_us")
    return agg.select(
        "user_id",
        "n_gaps",
        F.expr("med_us DIV 1000000").alias("median_gap_s"),
        reg.alias("regularity_ppm"),
        (reg < BOT_REGULARITY_PPM).alias("timer_like"),
    )


SQL_BOT_REGULARITY = f"""
WITH deltas AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS d
  FROM events
),
agg AS (
  SELECT user_id, count(*) AS n_gaps,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY d) AS med_us,
         percentile_disc(0.1) WITHIN GROUP (ORDER BY d) AS p10_us,
         percentile_disc(0.9) WITHIN GROUP (ORDER BY d) AS p90_us
  FROM deltas WHERE d IS NOT NULL
  GROUP BY user_id
  HAVING count(*) >= {BOT_MIN_EVENTS - 1}
)
SELECT user_id, n_gaps,
       med_us // 1000000 AS median_gap_s,
       ((p90_us - p10_us) * 1000000) // med_us AS regularity_ppm,
       ((p90_us - p10_us) * 1000000) // med_us < {BOT_REGULARITY_PPM}
         AS timer_like
FROM agg
"""

QUERIES["events_bot_regularity"] = (q_bot_regularity, SQL_BOT_REGULARITY)


# ---------------------------------------------------------------------------
# A/B experiment readout
# ---------------------------------------------------------------------------


def q_ab_test_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B readout: users hash into control/treatment
    ('ab|' salt — independent of every other hash decision, same rule as
    split/fold salting), conversion = any purchase event.  Output per
    variant: users, converters, conversion ppm, plus the assignment
    share ppm — the sample-ratio-mismatch (SRM) check an experiment
    platform runs before trusting any lift number (a biased assignment
    invalidates the readout regardless of the metric).  All integer; the
    significance test belongs downstream (floats), the COUNTS are the
    gate.  One user-keyed aggregate then a 2-row rollup."""
    e = _t(spark, sf_dir, "events")
    from ..datapipe.sampling import hash_bucket

    # hash_bucket % 2 == raw-hash % 2 (the ppm denominator is even), so
    # the shared salted-bucket helper serves here too — one bucketing
    # scheme across split/fold/ab decisions (round-4 review)
    variant = F.when(
        hash_bucket(F.concat(F.lit("ab|"), F.col("user_id").cast("string"))) % 2
        == 0,
        F.lit("control"),
    ).otherwise(F.lit("treatment"))
    per_user = (
        e.select("user_id", (F.col("event_type") == "purchase").alias("p"))
        .groupBy("user_id")
        .agg(F.max("p").cast("long").alias("converted"))
        .withColumn("variant", variant)
    )
    counts = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    total = counts.agg(F.sum("n_users").alias("total_users"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "variant",
            "n_users",
            "n_converted",
            F.expr("(n_converted * 1000000) DIV n_users").alias("conv_ppm"),
            F.expr("(n_users * 1000000) DIV total_users").alias("assign_share_ppm"),
        )
    )


_SQL_AB_TEST = """
WITH per_user AS (
  SELECT user_id,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS converted,
         CASE WHEN CAST(concat('0x', substr(md5('ab|' || CAST(user_id AS VARCHAR)),
                                        1, 15)) AS BIGINT) % 2 = 0
              THEN 'control' ELSE 'treatment' END AS variant
  FROM events GROUP BY user_id
),
counts AS (
  SELECT variant, count(*) AS n_users,
         CAST(sum(converted) AS BIGINT) AS n_converted
  FROM per_user GROUP BY variant
),
total AS (SELECT CAST(sum(n_users) AS BIGINT) AS total_users FROM counts)
SELECT variant, n_users, n_converted,
       (n_converted * 1000000) // n_users AS conv_ppm,
       (n_users * 1000000) // total_users AS assign_share_ppm
FROM counts CROSS JOIN total
"""

QUERIES["events_ab_test"] = (q_ab_test_readout, _SQL_AB_TEST)


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest
# ---------------------------------------------------------------------------

_FC_SEASON_DAYS = 7


def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest over the daily event series: forecast(day)
    = actual(day - 7), scored on every day with history, per event type.
    The seasonal-naive baseline is what any production forecast must
    beat, and its backtest is pure integer arithmetic — MAE and bias in
    ppm of actual volume — so the whole evaluation is oracle-exact where
    a fitted model's floats would not be.  Plan: one daily rollup (the
    only row-count-bound stage), a self-join on (type, day-7) — an
    equi-join on a tiny aggregate — and one summary aggregate."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.select(
            F.col("event_type"),
            F.expr("CAST(unix_timestamp(ts) DIV 86400 AS BIGINT)").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("actual"))
    )
    fc = daily.select(
        "event_type",
        (F.col("day") + _FC_SEASON_DAYS).alias("day"),
        F.col("actual").alias("forecast"),
    )
    scored = daily.join(fc, ["event_type", "day"])
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days_scored"),
        F.sum("actual").alias("total_actual"),
        F.expr(
            "(sum(abs(actual - forecast)) * 1000000) DIV sum(actual)"
        ).alias("mae_ppm"),
        # over/under split instead of one signed bias: a negative numerator
        # divides differently across engines (Spark DIV truncates toward
        # zero, DuckDB // floors) — two non-negative parts are exact in both
        F.expr(
            "(sum(greatest(forecast - actual, 0)) * 1000000) DIV sum(actual)"
        ).alias("over_ppm"),
        F.expr(
            "(sum(greatest(actual - forecast, 0)) * 1000000) DIV sum(actual)"
        ).alias("under_ppm"),
    )


_SQL_FORECAST_BACKTEST = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         count(*) AS actual
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT a.event_type, a.actual, f.actual AS forecast
  FROM daily a JOIN daily f
    ON a.event_type = f.event_type AND a.day = f.day + {_FC_SEASON_DAYS}
)
SELECT event_type, count(*) AS n_days_scored,
       CAST(sum(actual) AS BIGINT) AS total_actual,
       CAST((sum(abs(actual - forecast)) * 1000000) // sum(actual) AS BIGINT)
         AS mae_ppm,
       CAST((sum(greatest(forecast - actual, 0)) * 1000000) // sum(actual) AS BIGINT)
         AS over_ppm,
       CAST((sum(greatest(actual - forecast, 0)) * 1000000) // sum(actual) AS BIGINT)
         AS under_ppm
FROM scored GROUP BY event_type
"""

QUERIES["events_forecast_backtest"] = (q_forecast_backtest, _SQL_FORECAST_BACKTEST)


# ---------------------------------------------------------------------------
# Order-backlog curve: sweep-line interval concurrency
# ---------------------------------------------------------------------------


def q_backlog_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak order backlog: an order is OPEN from o_orderdate until its
    last lineitem ships; the backlog on a day is how many orders are
    open.  Interval concurrency via the sweep line — +1 at open, -1
    after close, running sum ordered by day — which is THE scale shape
    for interval stabbing: materializing per-day open-order lists is
    quadratic, the delta stream is 2 rows per order and one global
    ordered window.  (The single global sort is the honest cost; at
    100 TB one range-partitions by day and prefix-sums per partition
    with a tiny offset exchange — same arithmetic.)  Top-20 peak days,
    deterministic tie-break on day."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    close = l.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.expr("CAST(unix_timestamp(max(l_shipdate)) DIV 86400 AS BIGINT)").alias(
            "close_day"
        )
    )
    opens = o.select(
        F.expr("CAST(unix_timestamp(CAST(o_orderdate AS timestamp)) DIV 86400 AS BIGINT)").alias("day"),
        F.lit(1).alias("delta"),
    )
    closes = close.select((F.col("close_day") + 1).alias("day"), F.lit(-1).alias("delta"))
    deltas = (
        opens.unionByName(closes)
        .groupBy("day")
        .agg(F.sum("delta").alias("d"))
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    curve = deltas.withColumn("backlog", F.sum("d").over(w))
    return (
        curve.select("day", F.col("backlog").cast("long").alias("backlog"))
        .orderBy(F.desc("backlog"), F.asc("day"))
        .limit(20)
    )


_SQL_BACKLOG_CURVE = """
WITH close AS (
  SELECT l_orderkey AS o_orderkey,
         CAST(floor(epoch(max(l_shipdate))) AS BIGINT) // 86400 AS close_day
  FROM lineitem GROUP BY l_orderkey
),
deltas AS (
  SELECT day, CAST(sum(delta) AS BIGINT) AS d FROM (
    SELECT CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) // 86400
             AS day, 1 AS delta
    FROM orders
    UNION ALL
    SELECT close_day + 1, -1 FROM close
  ) GROUP BY day
),
curve AS (
  SELECT day, CAST(sum(d) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS backlog
  FROM deltas
)
SELECT day, backlog FROM curve
ORDER BY backlog DESC, day ASC
LIMIT 20
"""

QUERIES["orders_backlog_curve"] = (q_backlog_curve, _SQL_BACKLOG_CURVE)


# ---------------------------------------------------------------------------
# Nested complex-type analytics: array-of-structs, no re-explode
# ---------------------------------------------------------------------------

_NESTED_LONG_GAP_S = 21600  # 6h


def q_nested_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity digest computed INSIDE a nested array of
    (epoch_s, event_type) structs: event count, long-gap count, max gap,
    first/last type — one collect per user, then pure array HOFs
    (sort_array, slice, zip_with, filter, aggregate).  This is the
    complex-types surface a denormalized 100 TB event store exercises:
    the nested list is built once and EVERY metric reads it in-place —
    no second explode, no extra shuffle, no self-join.  The gap stream
    is zip_with over the array against its own 1-shifted slice (the
    array-domain lag())."""
    e = _t(spark, sf_dir, "events")
    per_user = (
        e.select(
            "user_id",
            F.struct(
                F.expr("CAST(unix_timestamp(ts) AS BIGINT)").alias("es"),
                F.col("event_type").alias("et"),
            ).alias("ev"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("ev")).alias("evs"))
    )
    n = F.size("evs")
    gaps = F.zip_with(
        F.slice(F.col("evs"), 2, n - 1),
        F.slice(F.col("evs"), 1, n - 1),
        lambda a, b: a["es"] - b["es"],
    )
    return per_user.select(
        "user_id",
        n.cast("long").alias("n_events"),
        F.size(F.filter(gaps, lambda g: g > _NESTED_LONG_GAP_S))
        .cast("long")
        .alias("n_long_gaps"),
        F.coalesce(F.array_max(gaps), F.lit(0)).cast("long").alias("max_gap_s"),
        F.element_at("evs", 1)["et"].alias("first_type"),
        F.element_at("evs", -1)["et"].alias("last_type"),
    )


_SQL_NESTED_ACTIVITY = f"""
WITH per_user AS (
  SELECT user_id,
         list(struct_pack(es := CAST(floor(epoch(ts)) AS BIGINT), et := event_type)
              ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_type) AS evs
  FROM events GROUP BY user_id
),
gapped AS (
  SELECT user_id, evs, len(evs) AS n,
         list_transform(range(2, len(evs) + 1),
                        i -> evs[i].es - evs[i-1].es) AS gaps
  FROM per_user
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       CAST(len(list_filter(gaps, g -> g > {_NESTED_LONG_GAP_S})) AS BIGINT)
         AS n_long_gaps,
       CAST(coalesce(list_max(gaps), 0) AS BIGINT) AS max_gap_s,
       evs[1].et AS first_type,
       evs[-1].et AS last_type
FROM gapped
"""

QUERIES["events_nested_activity"] = (q_nested_activity, _SQL_NESTED_ACTIVITY)


# ---------------------------------------------------------------------------
# Flagship #6 composition: vendor scorecard
# ---------------------------------------------------------------------------


def q_vendor_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composition: the per-supplier operations scorecard a
    procurement review reads — revenue (exact integer cent-bps, same
    unit as the pareto gate), revenue share, return rate, and p90
    order-to-ship delay — as ONE plan over lineitem ⋈ orders ⋈ supplier.

    Scale shape: all three metrics aggregate on the SAME l_suppkey
    exchange; the order-date join brings o_orderdate to the lineitem
    BEFORE aggregation (one shuffle keyed on the orderkey — the fact-
    to-fact join every warehouse schema pays), and the supplier dim is
    broadcast.  percentile_disc is exact by contract (the oracle
    hashes); the 100 TB swap-in is approx_percentile with everything
    else unchanged.  Top-20 by revenue, deterministic ties."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    unit = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.round((1 - F.col("l_discount")) * 100).cast("long")
    )
    joined = l.join(
        o.select("o_orderkey", "o_orderdate"),
        l.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_suppkey",
        unit.alias("rev"),
        (F.col("l_returnflag") == "R").cast("long").alias("returned"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("delay_d"),
    )
    per_supp = joined.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("rev").alias("rev_cbps"),
        F.sum("returned").alias("n_returned"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY delay_d)")
        .cast("long")
        .alias("p90_ship_delay_d"),
    )
    total = per_supp.agg(F.sum("rev_cbps").alias("total_rev"))
    return (
        per_supp.crossJoin(F.broadcast(total))
        .join(
            F.broadcast(s.select(F.col("s_suppkey").alias("l_suppkey"), "s_name")),
            "l_suppkey",
        )
        .select(
            F.col("l_suppkey").alias("suppkey"),
            "s_name",
            "n_lines",
            "rev_cbps",
            F.floor(
                F.col("rev_cbps").cast("double")
                * 1_000_000.0
                / F.col("total_rev").cast("double")
            )
            .cast("long")
            .alias("rev_share_ppm"),
            F.expr("(n_returned * 1000000) DIV n_lines").alias("return_ppm"),
            "p90_ship_delay_d",
        )
        .orderBy(F.desc("rev_cbps"), F.asc("suppkey"))
        .limit(20)
    )


SQL_VENDOR_SCORECARD = """
WITH joined AS (
  SELECT l_suppkey,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round((1 - l_discount) * 100) AS BIGINT) AS rev,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS returned,
         date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
           AS delay_d
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
per_supp AS (
  SELECT l_suppkey, count(*) AS n_lines,
         CAST(sum(rev) AS BIGINT) AS rev_cbps,
         CAST(sum(returned) AS BIGINT) AS n_returned,
         CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY delay_d) AS BIGINT)
           AS p90_ship_delay_d
  FROM joined GROUP BY l_suppkey
),
total AS (SELECT CAST(sum(rev_cbps) AS BIGINT) AS total_rev FROM per_supp)
SELECT p.l_suppkey AS suppkey, s.s_name, p.n_lines, p.rev_cbps,
       CAST(floor(CAST(p.rev_cbps AS DOUBLE) * 1000000.0
                  / CAST(t.total_rev AS DOUBLE)) AS BIGINT) AS rev_share_ppm,
       (p.n_returned * 1000000) // p.n_lines AS return_ppm,
       p.p90_ship_delay_d
FROM per_supp p CROSS JOIN total t
JOIN supplier s ON s.s_suppkey = p.l_suppkey
ORDER BY p.rev_cbps DESC, suppkey ASC
LIMIT 20
"""

QUERIES["vendor_scorecard"] = (q_vendor_scorecard, SQL_VENDOR_SCORECARD)


# ---------------------------------------------------------------------------
# Conversion-window sensitivity sweep
# ---------------------------------------------------------------------------

_CONV_WINDOWS_D = [1, 7, 30]


def q_conversion_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion counted at a ladder of attribution
    windows (1/7/30 days) in ONE conditional-aggregation pass — the
    sensitivity artifact that stops window-length debates (same pattern
    as the embedding threshold sweep: sweep in the aggregate, not in N
    query reruns).  Per user the anchor is the FIRST signup and the
    conversion the first purchase after it; the per-user reduction and
    every ladder rung share one user_id exchange."""
    e = _t(spark, sf_dir, "events")
    per_user = (
        e.select(
            "user_id",
            F.when(
                F.col("event_type") == "signup",
                F.expr("CAST(unix_timestamp(ts) AS BIGINT)"),
            ).alias("signup_s"),
        )
        .groupBy("user_id")
        .agg(F.min("signup_s").alias("s0"))
        .filter(F.col("s0").isNotNull())
    )
    first_purchase_after = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", F.expr("CAST(unix_timestamp(ts) AS BIGINT)").alias("p"))
        .join(per_user, "user_id")
        .filter(F.col("p") >= F.col("s0"))
        .groupBy("user_id", "s0")
        .agg(F.min("p").alias("p0"))
    )
    base = per_user.join(
        first_purchase_after.select("user_id", "p0"), "user_id", "left"
    )
    aggs = [F.count(F.lit(1)).alias("n_signup_users")]
    for d in _CONV_WINDOWS_D:
        aggs.append(
            F.sum(
                (
                    F.col("p0").isNotNull()
                    & (F.col("p0") - F.col("s0") <= d * 86400)
                ).cast("long")
            ).alias(f"conv_{d}d")
        )
    row = base.agg(*aggs)
    stack = ", ".join(
        f"'{d}d', conv_{d}d, (conv_{d}d * 1000000) DIV n_signup_users"
        for d in _CONV_WINDOWS_D
    )
    return row.selectExpr(
        "n_signup_users",
        f"stack({len(_CONV_WINDOWS_D)}, {stack}) AS (conv_window, n_converted, conv_ppm)",
    ).select("conv_window", "n_signup_users", "n_converted", "conv_ppm")


def _sql_conversion_windows() -> str:
    conv_cols = ", ".join(
        f"CAST(sum(CASE WHEN p0 IS NOT NULL AND p0 - s0 <= {d} * 86400"
        f" THEN 1 ELSE 0 END) AS BIGINT) AS conv_{d}d"
        for d in _CONV_WINDOWS_D
    )
    arms = " UNION ALL ".join(
        f"SELECT '{d}d' AS conv_window, n_signup_users, conv_{d}d AS n_converted,"
        f" (conv_{d}d * 1000000) // n_signup_users AS conv_ppm FROM agg"
        for d in _CONV_WINDOWS_D
    )
    return f"""
WITH su AS (
  SELECT user_id, CAST(min(floor(epoch(ts))) AS BIGINT) AS s0
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
fp AS (
  SELECT e.user_id, CAST(min(floor(epoch(e.ts))) AS BIGINT) AS p0
  FROM events e JOIN su ON e.user_id = su.user_id
  WHERE e.event_type = 'purchase' AND CAST(floor(epoch(e.ts)) AS BIGINT) >= su.s0
  GROUP BY e.user_id
),
base AS (SELECT su.user_id, su.s0, fp.p0 FROM su LEFT JOIN fp ON su.user_id = fp.user_id),
agg AS (SELECT count(*) AS n_signup_users, {conv_cols} FROM base)
SELECT conv_window, n_signup_users, n_converted, conv_ppm FROM ({arms})
"""


QUERIES["events_conversion_windows"] = (
    q_conversion_windows,
    _sql_conversion_windows(),
)


# ---------------------------------------------------------------------------
# Seasonal-residual anomaly detection
# ---------------------------------------------------------------------------

_SR_K_X100 = 300  # flag |residual| > 3.0 * MAD (k scaled by 100, integer)


def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomalies after removing weekly seasonality: the
    residual is actual minus the day-of-week MEDIAN (an integer from the
    data — robust where the mean chases the outliers it should flag),
    the threshold is 3x the MAD of all residuals (global, also exact
    integers).  The composition a monitoring pipeline actually deploys —
    de-season first, THEN robust-threshold; flagging raw volumes pages
    on every weekend.  Two small aggregates over the daily rollup (one
    per-weekday median, one global MAD) and a broadcast join back; the
    only row-count-bound stage is the daily rollup itself."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.select(F.expr("CAST(unix_timestamp(ts) DIV 86400 AS BIGINT)").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("actual"))
        .withColumn("dow", F.expr("day % 7"))
    )
    dow_med = daily.groupBy("dow").agg(
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY actual) AS BIGINT)")
        .alias("dow_median")
    )
    resid = daily.join(F.broadcast(dow_med), "dow").withColumn(
        "residual", F.col("actual") - F.col("dow_median")
    )
    mad = resid.agg(
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(residual))"
            " AS BIGINT)"
        ).alias("mad")
    )
    return (
        resid.crossJoin(F.broadcast(mad))
        .filter(F.expr(f"abs(residual) * 100 > {_SR_K_X100} * greatest(mad, 1)"))
        .select("day", "dow", "actual", "dow_median", "residual", "mad")
        .orderBy(F.desc(F.abs(F.col("residual"))), F.asc("day"))
        .limit(20)
    )


_SQL_SEASONAL_ANOMALY = f"""
WITH daily AS (
  SELECT day, count(*) AS actual, day % 7 AS dow FROM (
    SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events
  ) GROUP BY day
),
dow_med AS (
  SELECT dow,
         CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY actual) AS BIGINT)
           AS dow_median
  FROM daily GROUP BY dow
),
resid AS (
  SELECT d.day, d.dow, d.actual, m.dow_median,
         d.actual - m.dow_median AS residual
  FROM daily d JOIN dow_med m USING (dow)
),
mad AS (
  SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(residual))
              AS BIGINT) AS mad
  FROM resid
)
SELECT day, dow, actual, dow_median, residual, mad
FROM resid CROSS JOIN mad
WHERE abs(residual) * 100 > {_SR_K_X100} * greatest(mad, 1)
ORDER BY abs(residual) DESC, day ASC
LIMIT 20
"""

QUERIES["events_seasonal_anomaly"] = (q_seasonal_anomaly, _SQL_SEASONAL_ANOMALY)
