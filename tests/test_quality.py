"""Data-quality operators: profiling single-pass shape, constraint
validation emitting the capture sum-type, and DLQ composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_error_handling_spark.functions.dead_letter import dead_letters
from kafka_error_handling_spark.model import ERROR_SCHEMA
from kafka_error_handling_spark.plans.quality import (
    fk_orphans,
    profile_columns,
    validate_to_dlq,
)


def test_profile_single_scan(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], "k int, v string"
    )
    out = {r["column"]: r for r in profile_columns(df, ["k", "v"]).collect()}
    assert out["k"]["n_null"] == 0 and out["k"]["n_distinct"] == 2
    assert out["v"]["n_null"] == 1 and out["v"]["n_distinct"] == 2
    assert out["k"]["min_str"] == "1" and out["k"]["max_str"] == "2"
    # one aggregate over one scan — no join, no repeated FileScan
    plan = (
        profile_columns(df, ["k", "v"])._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan


def test_validate_emits_capture_sum_type(spark):
    df = spark.createDataFrame([(1, 10.0), (2, -5.0), (3, None)], "k int, amt double")
    v = validate_to_dlq(
        df,
        {
            "amt_positive": F.col("amt") > 0,
            "amt_filled": F.col("amt").isNotNull(),
        },
        value_col="k",
    )
    assert v.schema["error"].dataType == ERROR_SCHEMA
    rows = {r["k"]: r["error"] for r in v.collect()}
    assert rows[1] is None
    assert rows[2]["message"] == "Constraint(s) violated: amt_positive"
    assert rows[2]["error_class"] == "ConstraintViolation"
    assert rows[2]["input_value"] == "2"
    # NULL fails BOTH checks (NOT(null > 0) is null -> when() keeps the name
    # only for definite failures): null amt must fail amt_filled at minimum
    assert "amt_filled" in rows[3]["message"]


def test_validate_null_predicate_counts_as_violation(spark):
    """A check whose predicate is NULL (three-valued logic) must still be
    reported — `~cond` is NULL, not TRUE, so the implementation wraps the
    name emission so that only cond===TRUE passes."""
    df = spark.createDataFrame([(1, None)], "k int, amt double")
    v = validate_to_dlq(df, {"amt_positive": F.col("amt") > 0}, value_col="k")
    (row,) = v.collect()
    assert row["error"] is not None
    assert "amt_positive" in row["error"]["message"]


def test_validate_routes_to_dead_letters(spark):
    """The violation rows feed dead_letters() exactly like captured
    exceptions — same description/cause contract."""
    df = spark.createDataFrame([(1, -1.0)], "k int, amt double")
    v = validate_to_dlq(df, {"amt_positive": F.col("amt") > 0}, value_col="k")
    dlq = dead_letters(v.filter(F.col("error").isNotNull()), "order validation")
    (row,) = dlq.select("dead_letter").collect()
    d = row["dead_letter"]
    assert d["description"] == "order validation"
    assert d["cause"]["error_class"] == "ConstraintViolation"
    assert d["input_value"] == "1"


def test_fk_orphans_finds_only_orphans(spark):
    child = spark.createDataFrame([(1, "x"), (2, "y"), (9, "z")], "fk int, p string")
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    got = sorted(r["fk"] for r in fk_orphans(child, parent, "fk", "pk").collect())
    assert got == [9]


def test_partition_balance_schemes_cover_all_rows(spark, sf_dir):
    """Both schemes must account for every event row (min <= max, 32
    buckets each) and report imbalance >= 1e6 (uniform floor)."""
    from kafka_error_handling_spark.plans.quality import q_partition_balance

    rows = {r["scheme"]: r for r in q_partition_balance(spark, sf_dir).collect()}
    assert set(rows) == {"raw", "salted"}
    for r in rows.values():
        assert r["n_buckets"] == 32
        assert 0 < r["min_rows"] <= r["max_rows"]
        assert r["imbalance_ppm"] >= 1_000_000
    # the schemes partition the SAME row set — a salted max above the raw
    # TOTAL would mean rows were duplicated or dropped
    assert rows["salted"]["max_rows"] <= rows["raw"]["max_rows"] * 32
