"""Round-4 operators: DLQ replay lifecycle, robust outliers/winsorize,
event-time rate limiting, sliding-window chunking, containment dedup,
temperature source mixing."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from kafka_error_handling_spark.operators import (
    capture_map_values,
    errors,
    values,
)
from kafka_error_handling_spark.functions.dead_letter import (
    dead_letters,
    replay_dead_letters,
)


# ---------------------------------------------------------------------------
# dlq_replay
# ---------------------------------------------------------------------------


def _v1(v: str) -> float:
    n = int(v)
    if n < 0:
        raise ValueError("negative")  # the v1 bug
    return 10.0 / n  # ZeroDivisionError on 0 — genuinely bad


def _v2(v: str) -> float:
    return 10.0 / abs(int(v))  # fixed: negatives fine; 0 still dead


@pytest.fixture(scope="module")
def dlq(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(["4", "-5", "0", "2", "-1"])],
        "id long, payload string",
    )
    p1 = capture_map_values(df, _v1, DoubleType(), value_col="payload")
    return dead_letters(errors(p1), "v1 crash", key_cols=["id"])


def test_replay_recovers_fixed_rows(spark, dlq):
    p2 = replay_dead_letters(dlq, _v2, DoubleType())
    ok = {r.id: r.result for r in values(p2).select("id", "result").collect()}
    assert ok == {1: 2.0, 4: 10.0}  # the two v1-bug rows recovered


def test_replay_still_dead_keeps_error_metadata(spark, dlq):
    p2 = replay_dead_letters(dlq, _v2, DoubleType())
    dead = errors(p2).collect()
    assert [r.id for r in dead] == [2]
    e = dead[0].error
    assert e.error_class == "ZeroDivisionError"
    assert e.input_value == "0"  # the replay input (original stringified value)
    assert "ZeroDivisionError" in e.stack_trace


def test_replay_composes(spark, dlq):
    """A replay's own error branch formats into a well-formed DLQ again."""
    p2 = replay_dead_letters(dlq, _v2, DoubleType())
    dlq2 = dead_letters(errors(p2), "v2 replay", key_cols=["id"])
    row = dlq2.collect()[0]
    assert row.dead_letter.description == "v2 replay"
    assert row.dead_letter.cause.error_class == "ZeroDivisionError"
    p3 = replay_dead_letters(dlq2, lambda v: float(len(v)), DoubleType())
    assert values(p3).count() == 1  # third deployment finally handles it


def test_replay_input_is_stringified_original(spark):
    """Replay consumes dead_letter.input_value — all a DLQ consumer has."""
    seen = []

    def probe(v):
        seen.append(v)
        return v

    df = spark.createDataFrame([(1, "boom")], "id long, payload string")
    p1 = capture_map_values(
        df, lambda v: (_ for _ in ()).throw(ValueError(v)), StringType(),
        value_col="payload",
    )
    d = dead_letters(errors(p1), "d", key_cols=["id"])
    p2 = replay_dead_letters(d, probe, StringType())
    out = values(p2).collect()
    assert out[0].result == "boom"


# ---------------------------------------------------------------------------
# robust outliers + winsorize
# ---------------------------------------------------------------------------


def test_robust_outliers_flags_only_the_wild_value(spark):
    from kafka_error_handling_spark.plans.quality import robust_outliers

    rows = [("a", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9]] + [("a", 1000.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = robust_outliers(df, "g", "v", k=3.0)
    flagged = [r.v for r in out.filter("is_outlier").collect()]
    assert flagged == [1000.0]
    med = out.select("med").first().med
    assert med in (5.0, 6.0)  # discrete percentile picks an actual value


def test_winsorize_clamps_to_band(spark):
    from kafka_error_handling_spark.plans.quality import winsorize

    rows = [("a", float(v)) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, v double")
    w = winsorize(df, "g", "v", lo=0.10, hi=0.90)
    got = {r.v: r.clamped for r in w.collect()}
    assert got[1.0] == 10.0 and got[100.0] == 90.0  # clamped
    assert got[50.0] == 50.0  # interior untouched
    assert max(got.values()) == 90.0 and min(got.values()) == 10.0


# ---------------------------------------------------------------------------
# rate limiting
# ---------------------------------------------------------------------------


def test_rate_limit_keeps_first_n_per_minute(spark):
    from kafka_error_handling_spark.plans.advanced import rate_limit

    rows = [
        (i, 7, f"2024-01-01 00:00:{i:02d}") for i in range(6)  # 6 in minute 0
    ] + [(10, 7, "2024-01-01 00:01:00"), (11, 8, "2024-01-01 00:00:30")]
    df = spark.createDataFrame(rows, "event_id long, user_id long, s string")
    df = df.withColumn("ts", F.to_timestamp("s"))
    out = rate_limit(df, "user_id", "ts", 3)
    kept = sorted(r.event_id for r in out.filter("rl_kept").collect())
    # user 7 minute 0: earliest three; new minute resets; user 8 unaffected
    assert kept == [0, 1, 2, 10, 11]


# ---------------------------------------------------------------------------
# sliding-window chunking
# ---------------------------------------------------------------------------


def test_sliding_chunks_overlap_and_tail(spark):
    from kafka_error_handling_spark.datapipe.chunks import sliding_chunks

    text = " ".join(f"t{i}" for i in range(30))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sliding_chunks(df, width=8, stride=4).collect()
    # ceil(30/4) = 8 windows
    assert [r.win_idx for r in out] == list(range(8))
    assert [r.start_pos for r in out] == [0, 4, 8, 12, 16, 20, 24, 28]
    # all full-width except the tail windows
    assert [r.n_tokens for r in out] == [8, 8, 8, 8, 8, 8, 6, 2]


def test_sliding_chunks_short_doc_single_window(spark):
    from kafka_error_handling_spark.datapipe.chunks import sliding_chunks

    df = spark.createDataFrame([(1, "only"), (2, "")], "doc_id long, text string")
    out = {r.doc_id: r for r in sliding_chunks(df, width=8, stride=4).collect()}
    assert out[1].n_tokens == 1 and out[1].win_idx == 0
    assert out[2].win_idx == 0  # empty text still emits one (empty) window


# ---------------------------------------------------------------------------
# containment
# ---------------------------------------------------------------------------


def test_containment_detects_embedded_doc(spark, sf_dir):
    """A short doc pasted verbatim inside a longer one: containment of the
    short side ≈ 1 while Jaccard stays well below the near-dup bar."""
    from kafka_error_handling_spark.datapipe.dedup import shingle_sets

    short = " ".join(f"w{i}" for i in range(20))
    long = short + " " + " ".join(f"x{i}" for i in range(80))
    df = spark.createDataFrame(
        [(1, short, "s"), (2, long, "s")], "doc_id long, text string, source string"
    )
    sets = shingle_sets(df)
    a, b = sorted(sets.collect(), key=lambda r: r.doc_id)
    inter = len(set(a.hs) & set(b.hs))
    cont_short = inter / len(a.hs)
    jac = inter / len(set(a.hs) | set(b.hs))
    assert cont_short == 1.0
    assert jac < 0.5


# ---------------------------------------------------------------------------
# temperature sampling
# ---------------------------------------------------------------------------


def test_temperature_rates_flatten_distribution(spark):
    from kafka_error_handling_spark.datapipe.sampling import (
        DENOM,
        temperature_rates,
    )

    rows = [(i, "big") for i in range(1000)] + [(i + 1000, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    r = {x.source: x.thr_ppm for x in temperature_rates(df, "source").collect()}
    assert r["small"] == DENOM  # rarest source keeps everything
    # (10/1000)^0.3 = 0.251...: heavy source damped, not annihilated
    assert 0.24 * DENOM < r["big"] < 0.26 * DENOM


def test_temperature_sample_deterministic(spark):
    from kafka_error_handling_spark.datapipe.sampling import temperature_sample

    rows = [(i, "big") for i in range(1000)] + [(i + 1000, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(r.doc_id for r in temperature_sample(df).collect())
    b = sorted(r.doc_id for r in temperature_sample(df).collect())
    assert a == b
    assert all(i >= 1000 for i in a[-10:]) or len([x for x in a if x >= 1000]) == 10


# ---------------------------------------------------------------------------
# batch 2: tfidf keywords, global shuffle, PSI drift, nearest as-of
# ---------------------------------------------------------------------------


def test_tfidf_rare_term_outranks_common(spark):
    from kafka_error_handling_spark.datapipe.ranking import tfidf_keywords

    docs = [(1, "the the the zebra"), (2, "the cat"), (3, "the dog")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    top = {r.doc_id: r.token for r in tfidf_keywords(df, k=1).collect()}
    # 'the' appears in every doc (idf ln(4/4)=0); unique terms win
    assert top == {1: "zebra", 2: "cat", 3: "dog"}


def test_global_shuffle_partitions_and_orders(spark):
    from kafka_error_handling_spark.datapipe.sampling import global_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = global_shuffle(df, n_shards=4).collect()
    shards = {}
    for r in out:
        shards.setdefault(r.shard, []).append((r.pos, r.h))
    assert set(shards) == {0, 1, 2, 3}
    for s, rows in shards.items():
        rows.sort()
        assert [p for p, _ in rows] == list(range(len(rows)))  # dense 0..n-1
        assert [h for _, h in rows] == sorted(h for _, h in rows)  # md5 order
    # deterministic across invocations
    again = global_shuffle(df, n_shards=4).collect()
    assert sorted((r.doc_id, r.shard, r.pos) for r in again) == sorted(
        (r.doc_id, r.shard, r.pos) for r in out
    )


def test_psi_detects_shifted_distribution(spark):
    from kafka_error_handling_spark.plans.quality import psi_drift

    # ref half (ids 0..999): values ~ i%100; cur half: shifted by +50
    rows = [(i, "a", float(i % 100)) for i in range(1000)] + [
        (i + 1000, "a", float(i % 100 + 50)) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    psi = psi_drift(df, "event_type", "value").first()
    assert psi.n_ref == 1000 and psi.n_cur == 1000  # median id 999 splits evenly
    assert psi.psi > 0.2  # conventional "investigate" threshold


def test_psi_near_zero_for_identical_halves(spark):
    from kafka_error_handling_spark.plans.quality import psi_drift

    rows = [(i, "a", float(i % 100)) for i in range(2000)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    psi = psi_drift(df, "event_type", "value").first()
    assert abs(psi.psi) < 0.01


def test_asof_nearest_picks_closer_side_and_breaks_ties_backward(spark):
    from kafka_error_handling_spark.plans.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10"), (1, "2024-01-01 00:00:50")],
        "k long, s string",
    ).select("k", F.to_timestamp("s").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0),   # 10s before first left row
         (1, "2024-01-01 00:00:14", 2.0),   # 4s after it (closer)
         (1, "2024-01-01 00:00:45", 3.0),   # 5s before second left row
         (1, "2024-01-01 00:00:55", 4.0)],  # 5s after it (tie -> backward)
        "k long, s string, v double",
    ).select("k", F.to_timestamp("s").alias("rts"), "v")
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        right_cols=["v"], direction="nearest",
    ).orderBy("ts").collect()
    assert [r.asof_v for r in out] == [2.0, 3.0]


def test_asof_nearest_exact_match_and_no_candidates(spark):
    from kafka_error_handling_spark.plans.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10"), (2, "2024-01-01 00:00:10")],
        "k long, s string",
    ).select("k", F.to_timestamp("s").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10", 9.0)], "k long, s string, v double"
    ).select("k", F.to_timestamp("s").alias("rts"), "v")
    out = {r.k: r.asof_v for r in asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        right_cols=["v"], direction="nearest",
    ).collect()}
    assert out[1] == 9.0   # delta-0 exact match
    assert out[2] is None  # key with no right rows


def test_asof_nearest_tolerance_masks_far_matches(spark):
    from kafka_error_handling_spark.plans.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 01:00:00")], "k long, s string"
    ).select("k", F.to_timestamp("s").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)], "k long, s string, v double"
    ).select("k", F.to_timestamp("s").alias("rts"), "v")
    near = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                     right_cols=["v"], direction="nearest").first()
    assert near.asof_v == 1.0
    masked = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                       right_cols=["v"], direction="nearest",
                       tolerance="30 minutes").first()
    assert masked.asof_v is None


# ---------------------------------------------------------------------------
# batch 3: snapshot diff, retention cohorts, pareto share
# ---------------------------------------------------------------------------


def test_snapshot_diff_classifies_all_cases(spark):
    from kafka_error_handling_spark.plans.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0),      # unchanged
         (2, "b", 99.0),     # changed
         (3, "c", None),     # unchanged (NULL payload stable)
         (5, "e", 5.0)],     # added; id 4 removed
        "id long, s string, v double",
    )
    got = {r.id: r.diff_status
           for r in snapshot_diff(old, new, ["id"], ["s", "v"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "unchanged",
                   4: "removed", 5: "added"}


def test_snapshot_diff_null_vs_empty_string_differ(spark):
    from kafka_error_handling_spark.plans.cdc import snapshot_diff

    old = spark.createDataFrame([(1, None)], "id long, s string")
    new = spark.createDataFrame([(1, "")], "id long, s string")
    got = snapshot_diff(old, new, ["id"], ["s"]).first()
    assert got.diff_status == "changed"  # the \\x00 sentinel keeps them apart


def test_retention_cohorts_triangle(spark):
    from kafka_error_handling_spark.plans.advanced import retention_cohorts

    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-02 09:00:00"),
        (2, "2024-01-01 23:59:59"), (2, "2024-01-03 00:00:01"),
        (3, "2024-01-02 05:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, s string").select(
        "user_id", F.to_timestamp("s").alias("ts")
    )
    out = {(r.cohort_day.strftime("%m-%d"), r.day_offset): r.n_users
           for r in retention_cohorts(df).collect()}
    assert out[("01-01", 0)] == 2      # users 1 and 2 on day 0
    assert out[("01-01", 1)] == 1      # user 1 returns next day
    assert out[("01-01", 2)] == 1      # user 2 returns on day 2
    assert out[("01-02", 0)] == 1      # user 3's own cohort


def test_pareto_cum_share_monotone_and_complete(spark, sf_dir):
    from kafka_error_handling_spark.plans.advanced import q_pareto_supplier_revenue

    rows = q_pareto_supplier_revenue(spark, sf_dir).orderBy("rank").collect()
    shares = [r.cum_share_ppm for r in rows]
    assert shares == sorted(shares)  # cumulative share is monotone
    assert all(0 < s <= 1_000_000 for s in shares)
    ranks = [r.rank for r in rows]
    assert ranks == list(range(1, len(rows) + 1))


def test_pretrain_mix_exponent_matches_sampling_alpha():
    """text._PRETRAIN_MIX_ALPHA mirrors sampling.TEMP_ALPHA (text cannot
    import sampling at module load — sampling imports text)."""
    from kafka_error_handling_spark.datapipe.sampling import TEMP_ALPHA
    from kafka_error_handling_spark.datapipe.text import _PRETRAIN_MIX_ALPHA

    assert _PRETRAIN_MIX_ALPHA == TEMP_ALPHA


def test_split_is_independent_of_keep_decision(spark):
    """assign_split's salted bucket must decorrelate from the unsalted
    keep hash: a temperature-damped source's survivors still spread
    across train/val/test (the unsalted form put 100% in train)."""
    from kafka_error_handling_spark.datapipe.sampling import (
        assign_split,
        temperature_sample,
    )

    rows = [(i, "big") for i in range(3000)] + [(i + 3000, "small") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = temperature_sample(df)  # 'big' damped to ~25% keep
    s = assign_split(kept, "doc_id", {"train": 0.90, "val": 0.05, "test": 0.05})
    big_splits = {
        r.split for r in s.filter("source = 'big'").select("split").distinct().collect()
    }
    assert {"train", "val", "test"} <= big_splits


def test_upsample_copy_semantics(spark):
    from kafka_error_handling_spark.datapipe.sampling import upsample

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = upsample(df, 2.3).collect()
    per_copy = {}
    for r in out:
        per_copy.setdefault(r.copy_idx, set()).add(r.doc_id)
    assert per_copy[0] == per_copy[1] == set(range(500))  # whole copies
    frac = len(per_copy[2]) / 500
    assert 0.2 < frac < 0.4  # deterministic ~30% third copy
    again = upsample(df, 2.3).collect()
    assert sorted((r.doc_id, r.copy_idx) for r in again) == sorted(
        (r.doc_id, r.copy_idx) for r in out
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        upsample(df, 0.5)


def test_backlog_curve_brute_force(spark, tmp_path):
    """Sweep-line backlog must equal per-day interval stabbing on a
    hand-built schedule."""
    import pandas as pd

    from kafka_error_handling_spark.plans.advanced import q_backlog_curve

    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [1, 1, 2],
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [10.0] * 3,
            "o_orderdate": pd.to_datetime(["2020-01-01", "2020-01-02", "2020-01-05"]),
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 3],
            "l_partkey": [1, 2, 1, 1],
            "l_suppkey": [1, 1, 1, 1],
            "l_linenumber": [1, 2, 1, 1],
            "l_quantity": [1.0] * 4,
            "l_extendedprice": [1.0] * 4,
            "l_discount": [0.0] * 4,
            "l_tax": [0.0] * 4,
            "l_returnflag": ["N"] * 4,
            "l_linestatus": ["O"] * 4,
            # order 1 open 01-01..01-03, order 2 open 01-02..01-02,
            # order 3 open 01-05..01-06
            "l_shipdate": pd.to_datetime(
                ["2020-01-02", "2020-01-03", "2020-01-02", "2020-01-06"]
            ),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(orders).write.parquet(str(sf / "orders.parquet"))
    spark.createDataFrame(li).write.parquet(str(sf / "lineitem.parquet"))
    rows = {r["day"]: r["backlog"] for r in q_backlog_curve(spark, str(sf)).collect()}
    day0 = pd.Timestamp("2020-01-01").value // 86_400_000_000_000
    # backlog: 01-01:1, 01-02:2, 01-03:1(order2 closed), 01-04:0, 01-05:1, 01-06:1
    assert rows[day0] == 1
    assert rows[day0 + 1] == 2
    assert rows[day0 + 2] == 1
    assert rows[day0 + 4] == 1


def test_forecast_backtest_perfect_on_weekly_periodic(spark, tmp_path):
    """A perfectly 7-day-periodic series must backtest with MAE = 0."""
    import json

    src = tmp_path / "ev"
    src.mkdir()
    with open(src / "events.json", "w") as f:
        for day in range(21):
            # volume depends only on day-of-week
            for i in range((day % 7) + 1):
                f.write(
                    json.dumps(
                        {
                            "event_id": day * 100 + i,
                            "ts": f"2020-01-{day + 1:02d}T00:00:0{i % 10}",
                            "user_id": 1,
                            "event_type": "click",
                            "value": 1.0,
                            "props": "{}",
                        }
                    )
                    + "\n"
                )
    df = spark.read.schema(
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ).json(str(src))
    df.write.parquet(str(tmp_path / "sf" / "events.parquet"))
    from kafka_error_handling_spark.plans.advanced import q_forecast_backtest

    rows = q_forecast_backtest(spark, str(tmp_path / "sf")).collect()
    assert rows and all(r["mae_ppm"] == 0 and r["over_ppm"] == 0 for r in rows)


def test_boolean_search_subset_of_single_term_matches(spark, sf_dir):
    """Every conjunctive hit must contain BOTH terms — cross-check the
    fused-scan tf predicate against a direct substring filter."""
    from kafka_error_handling_spark.datapipe.ranking import (
        _QUERY_TERMS,
        q_boolean_search,
    )
    from kafka_error_handling_spark.sources.files import load_table

    hits = [r["doc_id"] for r in q_boolean_search(spark, sf_dir).collect()]
    d = load_table(spark, sf_dir, "documents")
    both = {
        r["doc_id"]
        for r in d.filter(
            F.array_contains(F.split("text", " "), _QUERY_TERMS[0])
            & F.array_contains(F.split("text", " "), _QUERY_TERMS[1])
        ).collect()
    }
    assert set(hits) <= both


def test_pq_memos_share_one_artifact(spark, sf_dir):
    """The PQ reconstruction and the exact-knn eval frames are built once
    per (session, sf_dir) and shared by the PQ/IVFPQ gates and every
    recall gate — and the memoized reconstruction must equal a fresh
    inline build (r5 derived-artifact contract)."""
    from kafka_error_handling_spark.datapipe import similarity as S
    from kafka_error_handling_spark.sources.files import load_table

    key = (spark.sparkContext.applicationId, sf_dir)
    S._PQ_RECON_CACHE.clear()
    S._EXACT_KNN_CACHE.clear()
    S.q_knn_pq(spark, sf_dir).collect()
    S.q_knn_ivfpq(spark, sf_dir).collect()
    S.q_pq_recall(spark, sf_dir).collect()
    S.q_ivfpq_recall(spark, sf_dir).collect()
    assert list(S._PQ_RECON_CACHE) == [key]
    assert list(S._EXACT_KNN_CACHE) == [key]
    e = load_table(spark, sf_dir, "embeddings")
    cb = S.pq_codebook(e)
    fresh = {
        (r["vec_id"], tuple(r["rv"]))
        for r in S.pq_reconstruct(S.pq_codes(e, cb), cb).collect()
    }
    memo = {
        (r["vec_id"], tuple(r["rv"]))
        for r in S._pq_recon_for(spark, sf_dir).collect()
    }
    assert fresh == memo
