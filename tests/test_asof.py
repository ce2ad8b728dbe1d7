"""As-of join semantics matrix: backward fill, strict vs non-strict ties,
tolerance staleness bound, and no-match NULLs (plans/asof.py)."""

from datetime import datetime

from kafka_error_handling_spark.plans.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u", datetime(2026, 1, 1, 0, 10)),
            (2, "u", datetime(2026, 1, 1, 1, 0)),
            (3, "u", datetime(2026, 1, 1, 3, 0)),
            (4, "v", datetime(2026, 1, 1, 0, 30)),  # no right rows for v
        ],
        "event_id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", datetime(2026, 1, 1, 0, 0), 10.0),
            ("u", datetime(2026, 1, 1, 1, 0), 20.0),  # ties with event 2
        ],
        "user string, ts timestamp, px double",
    )
    return left, right


def _result(df):
    return {r.event_id: r.asof_px for r in df.collect()}


def test_asof_backward_fill_and_no_match(spark):
    left, right = _frames(spark)
    got = _result(
        asof_join(left, right, on="user", left_ts="ts", right_ts="ts")
    )
    assert got[1] == 10.0   # most recent right row at or before 00:10
    assert got[3] == 20.0   # carried forward hours later
    assert got[4] is None   # key with no right rows -> NULL


def test_asof_tie_strict_vs_nonstrict(spark):
    left, right = _frames(spark)
    nonstrict = _result(
        asof_join(left, right, on="user", left_ts="ts", right_ts="ts")
    )
    strict = _result(
        asof_join(left, right, on="user", left_ts="ts", right_ts="ts", strict=True)
    )
    assert nonstrict[2] == 20.0  # <=: the simultaneous row matches
    assert strict[2] == 10.0     # <:  it does not


def test_asof_tolerance_masks_stale_matches(spark):
    left, right = _frames(spark)
    got = _result(
        asof_join(
            left,
            right,
            on="user",
            left_ts="ts",
            right_ts="ts",
            tolerance="1 hour",
        )
    )
    assert got[1] == 10.0   # 10 min old: fresh
    assert got[2] == 20.0   # simultaneous: fresh
    assert got[3] is None   # 2h-old match exceeds the 1h bound -> masked
    assert got[4] is None   # still no match at all


def test_asof_forward_direction_matrix(spark):
    """direction='forward': earliest right row after (strict) / at-or-after
    (non-strict) each left row; NULL when nothing follows."""
    left, right = _frames(spark)

    fwd_strict = asof_join(
        left, right, on="user", left_ts="ts", right_ts="ts",
        right_cols=["px"], strict=True, direction="forward",
    )
    # event1@00:10 -> next right strictly after is 01:00 (20.0)
    # event2@01:00 -> tie excluded under strict -> NULL (nothing later)
    # event3@03:00 -> nothing follows -> NULL; v -> no rows -> NULL
    assert _result(fwd_strict) == {1: 20.0, 2: None, 3: None, 4: None}

    fwd = asof_join(
        left, right, on="user", left_ts="ts", right_ts="ts",
        right_cols=["px"], strict=False, direction="forward",
    )
    assert _result(fwd) == {1: 20.0, 2: 20.0, 3: None, 4: None}


def test_asof_forward_tolerance(spark):
    left, right = _frames(spark)
    fwd = asof_join(
        left, right, on="user", left_ts="ts", right_ts="ts",
        right_cols=["px"], strict=True, direction="forward",
        tolerance="30 minutes",
    )
    # event1@00:10: next right @01:00 is 50min ahead -> masked by tolerance
    assert _result(fwd) == {1: None, 2: None, 3: None, 4: None}


def test_asof_direction_validated(spark):
    import pytest

    left, right = _frames(spark)
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(left, right, on="user", left_ts="ts", right_ts="ts",
                  direction="sideways")
