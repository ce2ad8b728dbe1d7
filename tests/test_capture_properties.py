"""Property-based checks of the capture sum-type invariants.

The reference pins these with hand-picked cases
(ErrorCapturingKeyValueMapperTopologyTest null matrix); hypothesis lets us
assert them for arbitrary inputs:

- exactly one of (result, error) is non-null per row (ProcessedValue);
- the wrapped fn's successes pass through bit-identically;
- failures never lose the input row, and the original key survives;
- drop-and-log output == success subset, regardless of failure pattern.

One session-scoped Spark round-trip per example would be seconds-slow, so
each property runs ONE Spark job over a hypothesis-generated batch of rows
(deadline disabled; the data volume, not the example count, carries the
coverage).
"""

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from kafka_error_handling_spark.operators import (
    capture_map_values_with_key,
    errors,
    log_map_values_with_key,
    values,
)

# printable payloads incl. None; keys incl. None (the reference's null matrix)
_vals = st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                       min_value=-1e6, max_value=1e6))
_keys = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
_rows = st.lists(st.tuples(_keys, _vals), min_size=1, max_size=30)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _fn(k, v):
    # deterministic failure pattern over both key and value, incl. nulls
    if v is None:
        raise ValueError("null value")
    if k is not None and k % 3 == 0:
        raise RuntimeError("unlucky key")
    return v * 2.0


def _expected(rows):
    ok, bad = {}, set()
    for i, (k, v) in enumerate(rows):
        try:
            ok[i] = _fn(k, v)
        except Exception:
            bad.add(i)
    return ok, bad


@given(_rows)
@_SETTINGS
def test_exactly_one_branch_and_key_preserved(spark, rows):
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)],
        "idx int, key int, value double",
    )
    p = capture_map_values_with_key(
        df, _fn, DoubleType(), key_col="key", value_col="value"
    )
    flat = p.select(
        "idx", "key", F.col("r.result").alias("res"), F.col("r.error").alias("err")
    ).collect()
    exp_ok, exp_bad = _expected(rows)

    assert len(flat) == len(rows)  # no row ever lost
    for r in flat:
        assert (r.res is None) != (r.err is None)  # exactly one branch
        assert r.key == rows[r.idx][0]  # original key preserved on BOTH branches
        if r.err is None:
            assert r.res == exp_ok[r.idx]
        else:
            assert r.idx in exp_bad
            assert r.err.error_class in ("ValueError", "RuntimeError")


@given(_rows)
@_SETTINGS
def test_log_drop_equals_success_subset(spark, rows):
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)],
        "idx int, key int, value double",
    )
    p = capture_map_values_with_key(
        df, _fn, DoubleType(), key_col="key", value_col="value"
    )
    captured_ok = {(r.idx, r.result) for r in values(p).collect()}
    logged = log_map_values_with_key(
        df, _fn, DoubleType(), key_col="key", value_col="value", observe=False
    )
    dropped_ok = {(r.idx, r.result) for r in logged.collect()}
    assert captured_ok == dropped_ok
