"""merge_upsert / scd2_intervals semantics: latest-wins, delta tie-break,
insert handling, and the single-exchange plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_error_handling_spark.plans.cdc import merge_upsert, scd2_intervals

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
T1 = dt.datetime(2024, 1, 1, 1, 0, 0)
T2 = dt.datetime(2024, 1, 1, 2, 0, 0)


def _frames(spark):
    snap = spark.createDataFrame(
        [(1, T1, "a"), (2, T1, "b"), (3, T1, "c")], "k int, ts timestamp, v string"
    )
    delta = spark.createDataFrame(
        [
            (1, T2, "a2"),  # newer -> wins
            (2, T0, "b0"),  # older -> snapshot wins
            (3, T1, "c1"),  # exact tie -> delta wins
            (4, T1, "d"),  # new key -> insert
        ],
        "k int, ts timestamp, v string",
    )
    return snap, delta


def test_merge_upsert_semantics(spark):
    snap, delta = _frames(spark)
    out = {
        r["k"]: (r["v"], r["src"])
        for r in merge_upsert(snap, delta, ["k"], ["ts"]).collect()
    }
    assert out == {
        1: ("a2", 1),
        2: ("b", 0),
        3: ("c1", 1),  # tie: delta wins via the __src tiebreak
        4: ("d", 1),
    }


def test_merge_upsert_single_exchange_with_partial_agg(spark):
    snap, delta = _frames(spark)
    plan = (
        merge_upsert(snap, delta, ["k"], ["ts"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one shuffle on the key; max_by combines map-side (partial_max_by
    # below the exchange), so replicas never cross the wire
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_max_by" in plan
    assert "Window" not in plan


def test_scd2_intervals_chain(spark):
    v = spark.createDataFrame(
        [(1, T0, "x"), (1, T1, "y"), (1, T2, "z"), (2, T0, "only")],
        "k int, ts timestamp, v string",
    )
    rows = sorted(
        scd2_intervals(v, ["k"], "ts").collect(), key=lambda r: (r["k"], r["ts"])
    )
    assert [(r["valid_from"], r["valid_to"], r["is_current"]) for r in rows] == [
        (T0, T1, False),
        (T1, T2, False),
        (T2, None, True),
        (T0, None, True),
    ]
