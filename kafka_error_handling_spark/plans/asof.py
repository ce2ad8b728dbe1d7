"""As-of join — a custom operator Spark lacks, built shuffle-minimal.

``asof_join(left, right)``: for every left row, attach the most recent
right row with ``right_ts <= left_ts`` (or ``<`` in strict mode) within the
same key.  The classic implementations (per-key loops, range joins) don't
scale; this one is the **union + last_value(ignoreNulls) window** pattern:

1. tag and union both sides (cheap, no join);
2. one window over (key, time, side-tiebreak) per partitioned sort —
   a single shuffle on the join key, linear scan within partitions;
3. keep left rows, each carrying the forward-filled right payload.

At 100 TB this is one shuffle + one sort — the same cost as any keyed
window — versus a range-join's quadratic bucket blowup.  Skewed keys
follow the same remedies as any keyed op (AQE skew split / salting).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.files import load_table

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Optional[Sequence[str]] = None,
    strict: bool = False,
    tolerance: Optional[str] = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join.  ``right_cols`` are the right-side payload columns to
    forward-fill onto left rows (default: all non-key, non-ts columns).

    ``strict=True`` means ``right_ts < left_ts`` (exclude simultaneous rows)
    — ties at equal timestamps are resolved by sorting right rows first
    (non-strict) or last (strict) at the same instant.

    ``direction`` mirrors ``pandas.merge_asof``: ``"backward"`` (default)
    attaches the most recent right row at-or-before the left timestamp;
    ``"forward"`` the earliest right row at-or-after it.  Forward is the
    same single shuffle + sort with the window frame mirrored
    (``first(ignorenulls)`` over [current, unbounded following]).

    ``tolerance`` (interval string, e.g. ``"1 hour"``) bounds staleness the
    way ``pandas.merge_asof(tolerance=...)`` does: a matched right row
    older than ``left_ts - tolerance`` is treated as no match (NULL
    payload).  Implemented as a post-fill mask on the forward-filled right
    timestamp — same single shuffle + sort, no extra pass.  Caveat: each
    payload column forward-fills past NULL values independently
    (``last(..., ignorenulls)``), so with tolerance set, a right row whose
    payload is NULL can yield an older column value while the freshness
    check uses the newer row's timestamp — match pandas by coalescing
    NULL right payloads to a sentinel upstream if that distinction
    matters.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest":
        # nearest = closest right row in EITHER direction, tie → backward
        # (the earlier row).  Same single shuffle + sort: both frames hang
        # off one (partition, order) spec, so Spark evaluates them in one
        # WindowExec.  Equal-ts rows are exact matches (delta 0, backward
        # frame) — pandas merge_asof(direction="nearest") parity.
        if strict:
            raise ValueError("direction='nearest' requires strict=False")
        return _asof_nearest(left, right, on, left_ts, right_ts, right_cols, tolerance)
    fwd = direction == "forward"
    rcols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lcols = left.columns

    # side marker — backward: non-strict sorts right rows BEFORE left rows
    # at the same timestamp (<=), strict AFTER (<); forward mirrors it
    # (non-strict sorts right AFTER left so the [current, following) frame
    # includes equal-ts rows, strict BEFORE so it excludes them)
    if fwd:
        r_side = 1 if not strict else 0
    else:
        r_side = 0 if not strict else 1
    l_side = 1 - r_side

    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).cast("timestamp").alias("__t"),
        F.lit(r_side).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).cast("timestamp").alias("__t"),
        F.lit(l_side).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    unioned = r_tagged.unionByName(l_tagged)

    if fwd:
        w = (
            Window.partitionBy("__k")
            .orderBy("__t", "__side")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        fill = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    else:
        w = (
            Window.partitionBy("__k")
            .orderBy("__t", "__side")
            .rowsBetween(
                Window.unboundedPreceding, -1 if strict and r_side == 1 else 0
            )
        )
        fill = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    # fill every right payload column (+ the right timestamp when a
    # staleness bound must be enforced)
    ff_rt = (
        [
            fill(F.when(F.col("__side") == r_side, F.col("__t")))
            .over(w)
            .alias("__ff_rt")
        ]
        if tolerance is not None
        else []
    )
    filled = unioned.select(
        "*",
        *[fill(F.col(f"__r_{c}")).over(w).alias(f"__ff_{c}") for c in rcols],
        *ff_rt,
    )
    is_left = F.col("__side") == l_side

    def _payload(c: str):
        col = F.col(f"__ff_{c}")
        if tolerance is None:
            return col.alias(f"asof_{c}")
        if fwd:
            fresh = F.col("__ff_rt") <= F.col("__t") + F.expr(f"INTERVAL {tolerance}")
        else:
            fresh = F.col("__ff_rt") >= F.col("__t") - F.expr(f"INTERVAL {tolerance}")
        return F.when(fresh, col).alias(f"asof_{c}")

    return filled.filter(is_left).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[_payload(c) for c in rcols],
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Optional[Sequence[str]] = None,
    tolerance: Optional[str] = None,
) -> DataFrame:
    """Nearest-direction as-of: union-tag, one sort, backward + forward
    fills side by side, per-row delta compare.  Shares the asof_join
    payload caveat: fills skip NULL right payloads independently of the
    matched timestamp."""
    rcols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lcols = left.columns
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).cast("timestamp").alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).cast("timestamp").alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    unioned = r_tagged.unionByName(l_tagged)
    # payload columns as trailing sort keys: among right rows tied on
    # (__t, __side) the fill would otherwise pick a partition-order-
    # dependent row — run-to-run nondeterminism (round-4 review).  Rows
    # tied on timestamp AND payload are interchangeable, so this makes
    # the projected result fully deterministic.  (Timestamp ties between
    # DIFFERENT payloads remain a documented oracle caveat, as in the
    # backward/forward paths — impossible at µs event resolution.)
    order = ["__t", "__side", *[f"__r_{c}" for c in rcols]]
    wb = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    rt = F.when(F.col("__side") == 0, F.col("__t"))
    filled = unioned.select(
        "*",
        F.last(rt, ignorenulls=True).over(wb).alias("__bt"),
        F.first(rt, ignorenulls=True).over(wf).alias("__ft"),
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(wb).alias(f"__b_{c}")
            for c in rcols
        ],
        *[
            F.first(F.col(f"__r_{c}"), ignorenulls=True).over(wf).alias(f"__f_{c}")
            for c in rcols
        ],
    )
    t_us = F.unix_micros(F.col("__t"))
    db = t_us - F.unix_micros(F.col("__bt"))
    df_ = F.unix_micros(F.col("__ft")) - t_us
    b_ok = F.col("__bt").isNotNull()
    f_ok = F.col("__ft").isNotNull()
    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}")
        b_ok = b_ok & (F.col("__bt") >= F.col("__t") - tol)
        f_ok = f_ok & (F.col("__ft") <= F.col("__t") + tol)
    use_b = b_ok & (~f_ok | (db <= df_))
    use_f = f_ok & ~use_b

    def _pick(c: str):
        return (
            F.when(use_b, F.col(f"__b_{c}"))
            .when(use_f, F.col(f"__f_{c}"))
            .alias(f"asof_{c}")
        )

    return filled.filter(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[_pick(c) for c in rcols],
    )


# ---------------------------------------------------------------------------
# correctness-gate query: last previous purchase per user (self as-of)
# ---------------------------------------------------------------------------


def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    joined = asof_join(
        e,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["purchase_value"],
        strict=True,
    )
    return joined.select(
        "event_id",
        F.round("asof_purchase_value", 4).alias("last_purchase_value"),
    )


# Oracle: the strictly-most-recent purchase before each event for the same
# user; among simultaneous purchases (impossible at µs resolution here) the
# max ts wins in both engines.  NULL when no prior purchase.
SQL_ASOF_LAST_PURCHASE = """
SELECT e.event_id,
       round((
         SELECT p.value FROM events p
         WHERE p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts < e.ts
         ORDER BY p.ts DESC, p.event_id DESC LIMIT 1
       ), 4) AS last_purchase_value
FROM events e
"""


def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of with a 1-hour staleness bound: purchases older than an hour
    before the event no longer forward-fill (merge_asof tolerance)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    joined = asof_join(
        e,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["purchase_value"],
        strict=True,
        tolerance="1 hour",
    )
    return joined.select(
        "event_id",
        F.round("asof_purchase_value", 4).alias("recent_purchase_value"),
    )


SQL_ASOF_TOLERANCE = """
SELECT e.event_id,
       round((
         SELECT p.value FROM events p
         WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
           AND p.ts < e.ts AND p.ts >= e.ts - INTERVAL 1 HOUR
         ORDER BY p.ts DESC, p.event_id DESC LIMIT 1
       ), 4) AS recent_purchase_value
FROM events e
"""


def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward direction: the next purchase strictly after each event —
    merge_asof(direction='forward') parity, same one-shuffle plan."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    joined = asof_join(
        e,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["purchase_value"],
        strict=True,
        direction="forward",
    )
    return joined.select(
        "event_id",
        F.round("asof_purchase_value", 4).alias("next_purchase_value"),
    )


SQL_ASOF_FORWARD = """
SELECT e.event_id,
       round((
         SELECT p.value FROM events p
         WHERE p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts > e.ts
         ORDER BY p.ts ASC, p.event_id ASC LIMIT 1
       ), 4) AS next_purchase_value
FROM events e
"""


def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest purchase in either direction (merge_asof direction='nearest'):
    closest by |delta|, ties to the earlier (backward) row."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    joined = asof_join(
        e,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["purchase_value"],
        direction="nearest",
    )
    return joined.select(
        "event_id",
        F.round("asof_purchase_value", 4).alias("nearest_purchase_value"),
    )


SQL_ASOF_NEAREST = """
SELECT e.event_id,
       round((
         SELECT p.value FROM events p
         WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
         ORDER BY abs(epoch_us(p.ts) - epoch_us(e.ts)) ASC, p.ts ASC,
                  p.event_id ASC
         LIMIT 1
       ), 4) AS nearest_purchase_value
FROM events e
"""


QUERIES = {
    "asof_join_last_purchase": (q_asof_last_purchase, SQL_ASOF_LAST_PURCHASE),
    "asof_join_tolerance": (q_asof_tolerance, SQL_ASOF_TOLERANCE),
    "asof_join_forward": (q_asof_forward, SQL_ASOF_FORWARD),
    "asof_join_nearest": (q_asof_nearest, SQL_ASOF_NEAREST),
}
