"""Property-based checks of the round-4 operators against brute-force
Python models (same one-job-per-example discipline as
test_capture_properties)."""

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# sliding chunks: full coverage, window count, span math
# ---------------------------------------------------------------------------

_doc = st.lists(
    st.integers(min_value=0, max_value=9), min_size=1, max_size=60
)


@_SETTINGS
@given(
    docs=st.lists(_doc, min_size=1, max_size=6),
    width=st.integers(min_value=2, max_value=10),
    stride_frac=st.integers(min_value=1, max_value=10),
)
def test_sliding_chunks_cover_every_token(spark, docs, width, stride_frac):
    from kafka_error_handling_spark.datapipe.chunks import sliding_chunks

    stride = max(1, min(width, stride_frac))
    rows = [(i, " ".join(f"t{c}" for c in d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sliding_chunks(df, width=width, stride=stride).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, d in enumerate(docs):
        n = len(d)
        wins = sorted(by_doc[i], key=lambda r: r.win_idx)
        assert len(wins) == math.ceil(n / stride)
        covered = set()
        for r in wins:
            assert r.start_pos == r.win_idx * stride
            assert 1 <= r.n_tokens <= width
            covered.update(range(r.start_pos, r.start_pos + r.n_tokens))
        assert covered == set(range(n))  # every token in >= 1 window


# ---------------------------------------------------------------------------
# rate limit vs a Python model
# ---------------------------------------------------------------------------


@_SETTINGS
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),     # user
            st.integers(min_value=0, max_value=180),   # second offset
        ),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    n=st.integers(min_value=1, max_value=4),
)
def test_rate_limit_matches_model(spark, events, n):
    from kafka_error_handling_spark.plans.advanced import rate_limit

    rows = [
        (i, u, f"2024-01-01 00:{s // 60:02d}:{s % 60:02d}")
        for i, (u, s) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, s string")
    df = df.withColumn("ts", F.to_timestamp("s"))
    got = {
        r.event_id: r.rl_kept for r in rate_limit(df, "user_id", "ts", n).collect()
    }
    # model: first n per (user, minute) ordered by (ts, event_id)
    buckets = {}
    for i, (u, s) in sorted(enumerate(events), key=lambda t: (t[1][1], t[0])):
        key = (u, s // 60)
        buckets.setdefault(key, []).append(i)
    want = {
        i: i in set(ids[:n])
        for ids in buckets.values()
        for i in ids
    }
    assert got == want


# ---------------------------------------------------------------------------
# snapshot diff vs a Python model
# ---------------------------------------------------------------------------

_payload = st.one_of(st.none(), st.text(alphabet="abc", max_size=2))


@_SETTINGS
@given(
    old=st.dictionaries(st.integers(0, 9), _payload, max_size=8),
    new=st.dictionaries(st.integers(0, 9), _payload, max_size=8),
)
def test_snapshot_diff_matches_model(spark, old, new):
    from kafka_error_handling_spark.plans.cdc import snapshot_diff

    mk = lambda d: spark.createDataFrame(  # noqa: E731
        [(k, v) for k, v in d.items()] or [(None, None)], "id long, v string"
    ).filter(F.col("id").isNotNull())
    got = {
        r.id: r.diff_status
        for r in snapshot_diff(mk(old), mk(new), ["id"], ["v"]).collect()
    }
    want = {}
    for k in set(old) | set(new):
        if k not in old:
            want[k] = "added"
        elif k not in new:
            want[k] = "removed"
        elif old[k] != new[k]:
            want[k] = "changed"
        else:
            want[k] = "unchanged"
    assert got == want


# ---------------------------------------------------------------------------
# nearest as-of vs a Python model (unique timestamps, as the data contract)
# ---------------------------------------------------------------------------


@_SETTINGS
@given(
    left_ts=st.lists(st.integers(0, 500), min_size=1, max_size=12, unique=True),
    right_ts=st.lists(st.integers(0, 500), min_size=0, max_size=12, unique=True),
)
def test_asof_nearest_matches_model(spark, left_ts, right_ts):
    from kafka_error_handling_spark.plans.asof import asof_join

    left = spark.createDataFrame(
        [(1, f"2024-01-01 00:{s // 60:02d}:{s % 60:02d}") for s in left_ts],
        "k long, s string",
    ).select("k", F.to_timestamp("s").alias("ts"))
    right = spark.createDataFrame(
        [(1, f"2024-01-01 00:{s // 60:02d}:{s % 60:02d}", float(s)) for s in right_ts]
        or [(2, "2024-01-01 00:00:00", 0.0)],
        "k long, s string, v double",
    ).select("k", F.to_timestamp("s").alias("rts"), "v")
    out = {
        r.ts.second + r.ts.minute * 60: r.asof_v
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_cols=["v"], direction="nearest",
        ).collect()
    }
    for s in left_ts:
        if not right_ts:
            assert out[s] is None
            continue
        # nearest by |delta|; tie -> earlier (backward)
        best = min(right_ts, key=lambda r: (abs(r - s), r))
        assert out[s] == float(best), (s, best, out[s])


# ---------------------------------------------------------------------------
# token-budget water-fill: exactness vs brute-force waterline search
# ---------------------------------------------------------------------------


def _brute_waterfill(toks, budget):
    """O(max_tok) reference: the highest integer waterline L with
    sum(min(tok, L)) <= budget; alloc = min(tok, L)."""
    lo, hi = 0, max(toks)
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if sum(min(t, mid) for t in toks) <= budget:
            lo = mid
        else:
            hi = mid - 1
    return [min(t, lo) for t in toks], lo


@_SETTINGS
@given(
    toks=st.lists(st.integers(min_value=1, max_value=10_000), min_size=2, max_size=12),
    frac_ppm=st.integers(min_value=100_000, max_value=900_000),
)
def test_waterfill_closed_form_matches_brute_force(spark, toks, frac_ppm):
    from pyspark.sql.window import Window

    budget = (sum(toks) * frac_ppm) // 1_000_000
    df = spark.createDataFrame(
        [(f"s{i:02d}", t) for i, t in enumerate(toks)], "source string, tok long"
    )
    totals = df.agg(F.count(F.lit(1)).alias("n_src"), F.sum("tok").alias("tok_total"))
    w_ord = Window.orderBy("tok", "source")
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = (
        df.crossJoin(F.broadcast(totals))
        .withColumn("budget", F.expr(f"(tok_total * {frac_ppm}) DIV 1000000"))
        .withColumn("rn", F.row_number().over(w_ord))
        .withColumn("pfx", F.sum("tok").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn(
            "satisfied",
            (F.col("pfx") - F.col("tok"))
            + F.col("tok") * (F.col("n_src") - F.col("rn") + 1)
            <= F.col("budget"),
        )
        .withColumn("k", F.sum(F.col("satisfied").cast("long")).over(w_all))
        .withColumn("pk", F.sum(F.when(F.col("satisfied"), F.col("tok")).otherwise(0)).over(w_all))
    )
    rows = staged.select(
        "source",
        "tok",
        F.when(F.col("satisfied"), F.col("tok"))
        .otherwise(F.expr("(budget - pk) DIV (n_src - k)"))
        .alias("alloc"),
        "satisfied",
    ).collect()
    got = {r["source"]: r["alloc"] for r in rows}
    want_alloc, line = _brute_waterfill(toks, budget)
    want = {f"s{i:02d}": a for i, a in enumerate(want_alloc)}
    # clamped sources receive exactly the brute-force waterline; satisfied
    # sources keep everything — identical allocation overall
    assert got == want
    assert sum(got.values()) <= budget


# ---------------------------------------------------------------------------
# round-11 ops: gopher_pass equivalence, NB layout invariance, macro fold
# ---------------------------------------------------------------------------

# documents drawn from a vocabulary that straddles every rule boundary:
# stopwords (ratio rule), a repeated token (mode rule), one long word
# (mean-length rule); lengths cross the 10-word minimum
_word = st.sampled_from(
    ["the", "a", "of", "go", "stop", "apple", "banana", "verylongword",
     "x", "quick", "brown"]
)
_gopher_doc = st.lists(_word, min_size=1, max_size=30).map(" ".join)


@_SETTINGS
@given(texts=st.lists(_gopher_doc, min_size=1, max_size=8))
def test_gopher_pass_equals_audit_on_random_docs(spark, texts):
    """gopher_pass (sorted-run-length mode count) must agree with the
    gopher_rules audit on arbitrary token streams, not just the corpus —
    the sorted-run rewrite is only safe if max-run == max-multiplicity
    for EVERY input."""
    from kafka_error_handling_spark.datapipe.text import gopher_pass, gopher_rules

    def audit_ok(col):
        ok = None
        for flag in gopher_rules(col).values():
            ok = ~flag if ok is None else ok & ~flag
        return ok

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        gopher_pass(F.col("text")).alias("fast"),
        audit_ok(F.col("text")).alias("audit"),
    ).collect()
    assert all(r["fast"] == r["audit"] for r in rows), texts


@_SETTINGS
@given(
    docs=st.lists(
        st.tuples(_gopher_doc, st.sampled_from(["a", "b", "c"])),
        min_size=2,
        max_size=8,
    ),
    parts=st.integers(min_value=1, max_value=7),
)
def test_quality_nb_select_is_layout_invariant(spark, docs, parts):
    """The NB selection is integer-scored (floor-micro weights, integer
    sums), so repartitioning the input can never change the selected
    rows, their order, or their scores."""
    from kafka_error_handling_spark.datapipe.sampling import quality_nb_select

    rows = [(i, t, s) for i, (t, s) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    base = [
        (r.doc_id, r.weak_pass, r.n_feats, r.nb_micro)
        for r in quality_nb_select(df, n_select=20).collect()
    ]
    moved = [
        (r.doc_id, r.weak_pass, r.n_feats, r.nb_micro)
        for r in quality_nb_select(
            df.repartition(parts, "source"), n_select=20
        ).collect()
    ]
    assert base == moved
    assert len(base) == len(rows)  # n_select=20 >= corpus: every doc scored


def test_eval_macro_of_identical_topics_equals_single_query(spark):
    """Degenerate macro set: the same topic repeated 3x must produce
    three identical per-query rows and macro rows equal to them — the
    fold introduces no drift (floor(3x/3) == x)."""
    from kafka_error_handling_spark.datapipe.ranking import search_eval_macro

    docs = spark.createDataFrame(
        [(1, "apple banana"), (2, "apple"), (3, "cherry")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    topics = [(["apple", "banana"], 0)] * 3
    rows = search_eval_macro(docs, emb, queries=topics, k=2).collect()
    per = [r for r in rows if r["qid"] >= 0]
    macro = [r for r in rows if r["qid"] == -1]
    for ranker in ("bm25", "hybrid_rrf"):
        mine = [r for r in per if r["ranker"] == ranker]
        assert len(mine) == 3
        vals = {(r.ndcg_ppm, r.mrr_ppm, r.prec_ppm) for r in mine}
        assert len(vals) == 1, "identical topics must score identically"
        m = next(r for r in macro if r["ranker"] == ranker)
        assert (m.ndcg_ppm, m.mrr_ppm, m.prec_ppm) == vals.pop()
