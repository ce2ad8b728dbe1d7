"""CDC / slowly-changing-dimension patterns: latest-wins upsert merge and
SCD2 validity intervals.

The reference has no merge machinery (its world is append-only Kafka
topics), but any 100 TB training-data pipeline ingesting recrawls needs
"new snapshot beats old snapshot per key" as a first-class, shuffle-
minimal operation.  Both ops here are single-exchange plans:

- ``merge_upsert``: union + one groupBy(key) with ``max_by`` — the winner
  is picked with partial (map-side) aggregation, unlike the row_number
  window formulation which needs a full sort of every replica.  At scale
  the shuffle carries one (key, best-so-far) pair per key per map task.
- ``scd2_intervals``: one window over (key ORDER BY version) building
  [valid_from, valid_to) ranges — the standard history-table shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.files import load_table as _t


def merge_upsert(
    snapshot: DataFrame,
    delta: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Latest-wins merge of ``delta`` into ``snapshot``.

    Rows are ranked per key by ``order_cols`` (later wins); on a full tie
    the delta row wins.  Exactly one shuffle: groupBy(key) + ``max_by`` of
    the full row over the ordering tuple, which combines map-side, so the
    exchange moves one candidate per key per input partition — not every
    replica, which is what the equivalent row_number() window would sort.

    Both inputs must share a schema (use ``unionByName`` semantics: delta
    may omit columns only if the caller aligns them first).
    """
    payload = [c for c in snapshot.columns]
    snap = snapshot.withColumn("__src", F.lit(0))
    dl = delta.withColumn("__src", F.lit(1))
    u = snap.unionByName(dl)
    ordering = F.struct(*[F.col(c) for c in order_cols], F.col("__src"))
    row = F.struct(*[F.col(c) for c in payload], F.col("__src"))
    merged = u.groupBy(*key_cols).agg(F.max_by(row, ordering).alias("__row"))
    return merged.select(
        *key_cols,
        *[F.col(f"__row.{c}").alias(c) for c in payload if c not in key_cols],
        F.col("__row.__src").alias("src"),
    )


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: merge a derived correction set (every 7th event re-delivered
    1 hour later with a doubled value) into the events snapshot."""
    e = _t(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    delta = (
        e.filter(F.col("event_id") % 7 == 0)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
        .withColumn("value", F.col("value") * 2)
    )
    m = merge_upsert(e, delta, ["event_id"], ["ts"])
    return m.select(
        "event_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.round("value", 2).alias("value"),
        "src",
    )


SQL_MERGE_UPSERT = """
WITH delta AS (
  SELECT event_id, ts + INTERVAL 1 HOUR AS ts, event_type, value * 2 AS value,
         1 AS src
  FROM events WHERE event_id % 7 = 0
),
all_rows AS (
  SELECT event_id, ts, event_type, value, 0 AS src FROM events
  UNION ALL SELECT * FROM delta
)
SELECT event_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       round(value, 2) AS value, src
FROM all_rows
QUALIFY row_number() OVER (PARTITION BY event_id ORDER BY ts DESC, src DESC) = 1
"""


def scd2_intervals(
    versions: DataFrame,
    key_cols: list[str],
    version_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """SCD2 history: each version row gets [valid_from, valid_to) with
    valid_to = next version's timestamp (null for the current row) and an
    ``is_current`` flag.  One window exchange on the key.

    Pass ``tiebreak_cols`` (e.g. an id column) whenever two versions of a
    key can share a ``version_col`` value — without a total order the
    lead() chain is nondeterministic on ties."""
    order = [version_col, *(tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return versions.select(
        *versions.columns,
        F.col(version_col).alias("valid_from"),
        F.lead(version_col).over(w).alias("valid_to"),
        F.lead(version_col).over(w).isNull().alias("is_current"),
    )


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: version history of each user's events of one type — per-user
    interval chains, counted and bounded for a compact hashable result."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    v = e.select("user_id", "ts", "value")
    iv = scd2_intervals(v, ["user_id"], "ts")
    return iv.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(F.when(F.col("is_current"), 1).otherwise(0)).alias("n_current"),
        # unix_timestamp truncates to whole seconds (oracle: floor(epoch));
        # floor-not-round for the displayed division (SURVEY §8 tie rule)
        (
            F.floor(
                F.sum(
                    F.when(
                        F.col("valid_to").isNotNull(),
                        F.unix_timestamp("valid_to") - F.unix_timestamp("valid_from"),
                    ).otherwise(0)
                )
                / 3600.0
                * 100
            )
            / 100.0
        ).alias("covered_hours"),
    )


SQL_SCD2 = """
WITH v AS (
  SELECT user_id, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id,
       count(*) AS n_versions,
       CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
       floor(sum(CASE WHEN valid_to IS NOT NULL
                      THEN floor(epoch(valid_to)) - floor(epoch(ts))
                      ELSE 0 END) / 3600.0 * 100) / 100.0 AS covered_hours
FROM v
GROUP BY user_id
"""


QUERIES = {
    "merge_upsert": (q_merge_upsert, SQL_MERGE_UPSERT),
    "scd2_intervals": (q_scd2_intervals, SQL_SCD2),
}


# ---------------------------------------------------------------------------
# Snapshot diff: the recrawl-reconciliation report.  Given two versions of
# a keyed table, classify every key as added / removed / changed /
# unchanged — the audit a pipeline runs BEFORE a merge_upsert to bound
# blast radius (a recrawl that "changes" 90% of keys is a bug, not an
# update).  One full-outer join keyed on the id, change detection via a
# digest of the payload columns so arbitrarily wide rows diff as one
# string compare.  Single exchange; at 100 TB both sides shuffle once on
# the key (or zero times if both snapshots are bucketed on it).
# ---------------------------------------------------------------------------


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str], payload_cols: list[str]
) -> DataFrame:
    """(key..., diff_status): added | removed | changed | unchanged."""
    def digest(df):
        return df.select(
            *key_cols,
            F.md5(F.concat_ws("\x1f", *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                for c in payload_cols
            ])).alias("__d"),
        )

    o = digest(old).withColumnRenamed("__d", "__d_old")
    n = digest(new).withColumnRenamed("__d", "__d_new")
    j = o.join(n, key_cols, "full_outer")
    return j.select(
        *key_cols,
        F.when(F.col("__d_old").isNull(), F.lit("added"))
        .when(F.col("__d_new").isNull(), F.lit("removed"))
        .when(F.col("__d_old") != F.col("__d_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("diff_status"),
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: diff the events snapshot against a synthetic recrawl (every
    7th event re-valued, every 11th dropped, 50 new ids appended)."""
    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    new = (
        e.filter(F.col("event_id") % 11 != 0)
        .withColumn(
            "value",
            F.when(F.col("event_id") % 7 == 0, F.col("value") * 2).otherwise(
                F.col("value")
            ),
        )
        .unionByName(
            spark.range(50).select(
                (F.col("id") + 90_000_000).alias("event_id"),
                F.lit("recrawl").alias("event_type"),
                F.lit(1.0).alias("value"),
            )
        )
    )
    d = snapshot_diff(e, new, ["event_id"], ["event_type", "value"])
    return d.groupBy("diff_status").agg(F.count(F.lit(1)).alias("n"))


SQL_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT event_id, event_type, value FROM events
), new AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 7 = 0 THEN value * 2 ELSE value END AS value
  FROM events WHERE event_id % 11 <> 0
  UNION ALL
  SELECT 90000000 + i AS event_id, 'recrawl', 1.0
  FROM range(0, 50) t(i)
), j AS (
  SELECT coalesce(o.event_id, n.event_id) AS event_id,
         CASE
           WHEN o.event_id IS NULL THEN 'added'
           WHEN n.event_id IS NULL THEN 'removed'
           WHEN o.event_type <> n.event_type OR o.value <> n.value THEN 'changed'
           ELSE 'unchanged'
         END AS diff_status
  FROM old o FULL OUTER JOIN new n ON o.event_id = n.event_id
)
SELECT diff_status, count(*) AS n FROM j GROUP BY diff_status
"""

QUERIES["cdc_snapshot_diff"] = (q_snapshot_diff, SQL_SNAPSHOT_DIFF)


# ---------------------------------------------------------------------------
# Kafka log compaction: latest-per-key with tombstone deletes
# ---------------------------------------------------------------------------


def log_compact(
    changelog: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    tombstone,
) -> DataFrame:
    """Kafka-style log compaction of a changelog: keep only the LATEST
    record per key, and drop the key entirely when that latest record is a
    tombstone (Kafka: a null-value record marks the key deleted once it is
    the newest — the compactor then removes the key from the log).

    This is the missing half of :func:`merge_upsert`: upsert merges two
    snapshots, compaction collapses an unbounded append-only topic — the
    reference's actual storage model (its DLQ topics are append-only Kafka
    logs; a downstream table view of them IS this operation).

    Plan: ONE groupBy(key) with ``max_by`` of the payload over the ordering
    tuple — partial aggregation combines map-side, so the exchange carries
    one candidate per key per map task regardless of how many superseded
    versions the log holds (the row_number() window formulation would sort
    every version).  The tombstone filter runs AFTER the winner is picked
    (a tombstone only deletes if nothing newer re-created the key).

    ``tombstone`` is a Column predicate evaluated on the winning row's
    payload struct (e.g. ``lambda r: r["event_type"] == "delete"``).
    """
    payload = [c for c in changelog.columns]
    row = F.struct(*[F.col(c) for c in payload])
    ordering = F.struct(*[F.col(c) for c in order_cols])
    compacted = changelog.groupBy(*key_cols).agg(
        F.max_by(row, ordering).alias("__row"),
        (F.count(F.lit(1)) - F.lit(1)).alias("n_superseded"),
    )
    return compacted.filter(~tombstone(F.col("__row"))).select(
        *key_cols,
        *[
            F.col(f"__row.{c}").alias(c)
            for c in payload
            if c not in key_cols
        ],
        "n_superseded",
    )


def q_log_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: compact the events stream as a per-user changelog (ordered by
    (ts, event_id)); an 'error' record in the newest position tombstones
    the user (the synthetic marker standing in for Kafka's null value).
    Output: surviving users with their live record + superseded count."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    c = log_compact(
        e,
        ["user_id"],
        ["ts", "event_id"],
        tombstone=lambda r: r["event_type"] == "error",
    )
    return c.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        "event_id",
        F.col("event_type").alias("last_type"),
        F.round("value", 2).alias("last_value"),
        "n_superseded",
    )


SQL_LOG_COMPACTION = """
WITH winner AS (
  SELECT user_id, ts, event_id, event_type, value,
         count(*) OVER (PARTITION BY user_id) - 1 AS n_superseded
  FROM events
  QUALIFY row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
)
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       event_id,
       event_type AS last_type,
       round(value, 2) AS last_value,
       n_superseded
FROM winner
WHERE event_type <> 'error'
"""

QUERIES["cdc_log_compaction"] = (q_log_compaction, SQL_LOG_COMPACTION)


# ---------------------------------------------------------------------------
# Point-in-time (temporal) join against an SCD2 dimension
# ---------------------------------------------------------------------------


def q_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join facts to the SCD2 version VALID AT the fact's timestamp — the
    data-warehouse temporal-join primitive (and the training-data analog:
    label each example with the feature-store snapshot in force when it
    was collected, preventing feature leakage from the future).

    The dimension is the per-user purchase history as [valid_from,
    valid_to) intervals (the same construction as ``scd2_intervals``);
    each click fact matches AT MOST ONE version (intervals are disjoint
    by construction), so the join is lossless to hash.  Plan: equi-join
    on user_id carries the shuffle; the interval predicate is a post-join
    FILTER, not a range-join condition — at 100 TB both sides
    co-partition on the key and no interval machinery is needed.  Facts
    before the first version have no interval and drop out of the inner
    join — by design: the report covers version exposure, and the
    uncovered-click count is derivable as clicks − Σ n_clicks_matched.
    """
    e = _t(spark, sf_dir, "events")
    versions = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("vts"),
        F.col("event_id").alias("version_id"),
        F.floor(F.col("value") * 100).cast("long").alias("version_cents"),
    )
    # the module's own interval builder, with the id tiebreak for a total
    # order (two purchases CAN share a timestamp)
    dim = scd2_intervals(
        versions, ["user_id"], "vts", tiebreak_cols=["version_id"]
    ).drop("vts", "is_current")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    matched = clicks.join(dim, "user_id").filter(
        (F.col("cts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("cts") < F.col("valid_to")))
    )
    return matched.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_clicks_matched"),
        F.count_distinct(F.col("version_id")).alias("n_versions_hit"),
        F.sum("version_cents").alias("exposure_cents"),
    )


SQL_SCD2_PIT = """
WITH dim AS (
  SELECT user_id, ts AS valid_from, event_id AS version_id,
         CAST(floor(value * 100) AS BIGINT) AS version_cents,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, event_id AS click_id, ts AS cts
  FROM events WHERE event_type = 'click'
),
matched AS (
  SELECT c.user_id, d.version_id, d.version_cents
  FROM clicks c JOIN dim d ON c.user_id = d.user_id
  WHERE c.cts >= d.valid_from
    AND (d.valid_to IS NULL OR c.cts < d.valid_to)
)
SELECT user_id,
       count(*) AS n_clicks_matched,
       count(DISTINCT version_id) AS n_versions_hit,
       CAST(sum(version_cents) AS BIGINT) AS exposure_cents
FROM matched
GROUP BY user_id
"""

QUERIES["scd2_point_in_time"] = (q_scd2_point_in_time, SQL_SCD2_PIT)
