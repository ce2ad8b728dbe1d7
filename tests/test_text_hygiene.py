"""Decontamination, bigram-LM scoring, and k-means clustering — the
training-data hygiene operators added in the round-2 continuation."""

import math

from pyspark.sql import functions as F

from kafka_error_handling_spark.datapipe.text import (
    decontaminate,
    lm_score,
    ngram_array,
)


# ---------------------------------------------------------------------------
# n-gram decontamination
# ---------------------------------------------------------------------------


def test_ngram_array_short_doc_guard(spark):
    """Docs shorter than n yield [] — F.sequence would otherwise descend
    and fabricate n-grams from negative element_at wraparound."""
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b"), (3, "")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", ngram_array(F.col("text"), 5).alias("g")
        ).collect()
    }
    assert rows[1] == ["a b c d e", "b c d e f"]
    assert rows[2] == []
    assert rows[3] == []


def test_decontaminate_counts_distinct_overlaps(spark):
    """Overlap counts distinct shared n-grams per doc; clean docs emit no
    row (at scale the clean majority must never leave the scan stage)."""
    corpus = spark.createDataFrame(
        [
            # shares two distinct 3-grams with the benchmark
            (1, "q1 q2 q3 q4 z z"),
            # repeats ONE contaminated 3-gram twice — still counts once
            (2, "q1 q2 q3 x q1 q2 q3"),
            (3, "clean words only here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "q1 q2 q3 q4")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.n_overlap
        for r in decontaminate(corpus, bench, n=3).collect()
    }
    assert got == {1: 2, 2: 1}


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The benchmark n-gram side must ride a broadcast join — a shuffle
    join keyed on n-grams would move the 100 TB corpus explode."""
    from kafka_error_handling_spark.sources.files import load_table

    d = load_table(spark, sf_dir, "documents")
    plan = decontaminate(
        d.filter(F.col("doc_id") % 97 != 0), d.filter(F.col("doc_id") % 97 == 0)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# bigram-LM scoring
# ---------------------------------------------------------------------------


def test_lm_score_hand_computed(spark):
    """Two-doc corpus scored by hand.

    Corpus: d1 = "a b a b", d2 = "a b".  Vocab V = {a, b} → 2.
    Unigrams: a→3, b→3.  Bigrams: "a b"→3, "b a"→1.
    d2's single bigram "a b": ln((3+1)/(3+2)) = ln(4/5).
    """
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in lm_score(docs).collect()}
    assert got[2].n_bigrams == 1
    assert abs(got[2].avg_logp - round(math.log(4 / 5), 4)) < 1e-9
    # d1: bigrams [a b, b a, a b] → (2*ln(4/5) + ln(2/5)) / 3
    want = round((2 * math.log(4 / 5) + math.log(2 / 5)) / 3, 4)
    assert got[1].n_bigrams == 3
    assert abs(got[1].avg_logp - want) < 1e-9


def test_lm_score_single_token_doc_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, "a b")], "doc_id long, text string"
    )
    assert [r.doc_id for r in lm_score(docs).collect()] == [2]


# ---------------------------------------------------------------------------
# k-means clustering
# ---------------------------------------------------------------------------


def test_kmeans_hand_computed(spark):
    """Four 2-point blobs in 64-d (nonzero only in dim 0/1), k=2, 2 iters:
    init = vecs 0 and 1 (both in blob A), first update pulls centroid 1
    onto blob B, final assignment separates the blobs."""
    from kafka_error_handling_spark.datapipe.clustering import kmeans_assign

    def v(x, y):
        return [float(x), float(y)] + [0.0] * 62

    rows = [
        (0, v(0, 0)), (1, v(0, 1)),          # blob A
        (2, v(10, 10)), (3, v(10, 11)),      # blob B
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.cluster for r in kmeans_assign(df, k=2, iters=2).collect()}
    assert got[0] == got[1]
    assert got[2] == got[3]
    assert got[0] != got[2]


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    """k larger than the number of distinct points: the unused centroid
    keeps its init position instead of collapsing to NaN."""
    from kafka_error_handling_spark.datapipe.clustering import kmeans_assign

    rows = [(i, [float(i % 2)] * 64) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_assign(df, k=3, iters=2).collect()
    assert len(out) == 6
    assert all(0 <= r.cluster < 3 for r in out)


def test_kmeans_assignment_plan_is_codegen_no_join(spark, sf_dir):
    """The assignment pass must be a pure projection over the scan —
    centroids are plan literals, so no join/shuffle may appear."""
    from kafka_error_handling_spark.datapipe.clustering import kmeans_assign
    from kafka_error_handling_spark.sources.files import load_table

    e = load_table(spark, sf_dir, "embeddings")
    plan = kmeans_assign(e)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_semdedup_drops_within_cluster_only(spark):
    """Two identical vectors in one blob are deduped; an identical pair
    split across far-apart blobs is NOT compared (cluster-scoped)."""
    from kafka_error_handling_spark.datapipe.clustering import semdedup

    def v(x):
        return [float(x), 0.0] + [0.0] * 62

    rows = [
        (0, v(1)), (1, v(1)),      # blob A: exact dup pair
        (2, v(100)), (3, v(100)),  # blob B: exact dup pair
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.dup_of for r in semdedup(df, k=2, iters=2, threshold=0.99).collect()}
    # 1 dups 0; 3 dups 2 — and no cross-blob pair can appear because
    # clusters separate the blobs
    assert got == {1: 0, 3: 2}


def test_event_funnel_hand_computed(spark, tmp_path):
    """u1 completes view->click->purchase in order; u2 clicks BEFORE its
    first view (out of order — stalls at view); u3 never views."""
    import datetime as dt

    from kafka_error_handling_spark.plans.advanced import event_funnel

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        (2, t(1), "click"), (2, t(2), "view"),
        (3, t(1), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)
    # event_funnel loads via load_table(sf_dir, 'events')
    got = {
        r.funnel_stage: r.n_users
        for r in event_funnel(spark, str(tmp_path)).collect()
    }
    assert got == {1: 2, 2: 1, 3: 1}


def test_countmin_estimate_never_undercounts(spark, sf_dir):
    """The count-min invariant: est >= exact for every probed key."""
    from kafka_error_handling_spark.plans.stats import q_sketch_countmin_estimate

    rows = q_sketch_countmin_estimate(spark, sf_dir).collect()
    assert rows
    assert all(r.est >= r.exact for r in rows)
    assert all(r.overcount == r.est - r.exact for r in rows)


def test_countmin_sketch_merges_by_cellwise_addition(spark):
    """Sketching two halves independently and adding cells equals
    sketching the whole — the mergeability that lets every executor
    sketch its partition and combine (the whole point at 100 TB)."""
    from kafka_error_handling_spark.plans.stats import sketch_countmin

    df = spark.createDataFrame([(i, i % 7) for i in range(100)], "i long, k long")
    whole = {
        (r.depth, r.col): r.cnt
        for r in sketch_countmin(df, F.col("k")).collect()
    }
    h1 = sketch_countmin(df.filter("i < 50"), F.col("k")).collect()
    h2 = sketch_countmin(df.filter("i >= 50"), F.col("k")).collect()
    merged = {}
    for r in list(h1) + list(h2):
        merged[(r.depth, r.col)] = merged.get((r.depth, r.col), 0) + r.cnt
    assert merged == whole


def test_decontaminate_semantic_flags_and_argmax(spark):
    """Semantic screen semantics on hand-built vectors: a corpus doc is
    flagged iff its max benchmark cosine reaches tau, the flagged row
    carries the ARGMAX benchmark id (ties on bench_id ascending), and
    clean docs are absent from the output entirely."""
    from kafka_error_handling_spark.datapipe.text import decontaminate_semantic

    bench = spark.createDataFrame(
        [
            (10, [1.0, 0.0]),
            (11, [0.0, 1.0]),
            # duplicate of bench 10 -> cosine ties against doc 1; the
            # smaller bench_id must win the argmax
            (12, [2.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (1, [0.9, 0.1]),    # close to bench 10 AND 12 (tied cosine)
            (2, [-1.0, 0.0]),   # anti-aligned with everything -> clean
            (3, [0.1, 0.9]),    # close to bench 11
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.doc_id: (r.bench_id, r.max_cos)
        for r in decontaminate_semantic(corpus, bench, tau=0.9).collect()
    }
    import math

    cos_1_10 = round(0.9 / math.sqrt(0.9**2 + 0.1**2), 4)
    assert set(got) == {1, 3}
    # doc 1 ties bench 10 vs 12 exactly -> argmax takes the smaller id
    assert got[1] == (10, cos_1_10)
    # doc 3's best is bench 11 by symmetry
    assert got[3][0] == 11 and got[3][1] == cos_1_10
    assert 2 not in got  # clean doc emits nothing

    # raising tau above the best cosine empties the report
    assert decontaminate_semantic(corpus, bench, tau=0.999).count() == 0


def test_decontaminate_semantic_broadcasts_benchmark(spark, sf_dir):
    """Scale-shape pin: the benchmark side must reach the corpus scan as a
    broadcast (one corpus pass, no shuffle before the per-doc argmax).

    r14 shape: the bench matrix rides a SparkContext broadcast VARIABLE
    into one MapInPandas that scores, tau-filters and argmaxes map-side —
    so the pin is now zero-shuffle + the single Python node, not a
    BroadcastExchange (there is no join left to broadcast into)."""
    from kafka_error_handling_spark.datapipe.text import decontaminate_semantic
    from kafka_error_handling_spark.sources.files import load_table

    e = load_table(spark, sf_dir, "embeddings")
    plan = decontaminate_semantic(
        e.filter(F.col("vec_id") % 97 != 0), e.filter(F.col("vec_id") % 97 == 0)
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    # the corpus never leaves its scan stage: no shuffle of any kind
    assert "Exchange" not in plan
    assert "SortMergeJoin" not in plan


def test_gopher_pass_equals_rule_audit(spark, sf_dir):
    """gopher_pass (the O(n log n) weak-label form — sorted-run-length
    mode count) must agree with the gopher_rules audit on EVERY corpus
    document, plus the hand cases that exercise each rule boundary."""
    from pyspark.sql import functions as F

    from kafka_error_handling_spark.datapipe.text import gopher_pass, gopher_rules
    from kafka_error_handling_spark.sources.files import load_table

    def audit_ok(col):
        rules = gopher_rules(col)
        ok = None
        for flag in rules.values():
            ok = ~flag if ok is None else ok & ~flag
        return ok

    docs = load_table(spark, sf_dir, "documents")
    disagree = docs.filter(
        gopher_pass(F.col("text")) != audit_ok(F.col("text"))
    ).count()
    assert disagree == 0

    hand = spark.createDataFrame(
        [
            # too short / too repetitive / no stopwords / passes
            ("one two three",),
            ("the the the the the the the the the the go go stop now here",),
            ("alpha beta gamma delta epsilon zeta eta theta iota kappa lam",),
            ("the quick brown fox jumps over a lazy dog and runs far away",),
            # run-length edge: repeated token NOT adjacent in raw order
            ("a x a y a z a w a v the on is to in for quick brown fox tail",),
        ],
        "text string",
    )
    rows = hand.select(
        gopher_pass(F.col("text")).alias("fast"),
        audit_ok(F.col("text")).alias("audit"),
    ).collect()
    assert all(r["fast"] == r["audit"] for r in rows)
