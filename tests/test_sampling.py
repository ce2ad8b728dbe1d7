"""Deterministic sampling: reproducibility and cross-table consistency."""

from pyspark.sql import functions as F

from kafka_error_handling_spark.datapipe.sampling import (
    assign_split,
    hash_sample,
)
from kafka_error_handling_spark.sources.files import load_table


def test_sample_reproducible_across_partitionings(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    a = {r.event_id for r in hash_sample(e, "event_id", 0.2).select("event_id").collect()}
    b = {
        r.event_id
        for r in hash_sample(e.repartition(17), "event_id", 0.2)
        .select("event_id")
        .collect()
    }
    assert a == b and 0.1 < len(a) / e.count() < 0.3


def test_sample_consistent_across_tables(spark, sf_dir):
    """Sampling two tables by the SAME key keeps their join complete —
    the property RNG sampling cannot provide."""
    c = hash_sample(load_table(spark, sf_dir, "customer"), "c_custkey", 0.2)
    o = hash_sample(load_table(spark, sf_dir, "orders"), "o_custkey", 0.2)
    dangling = o.join(c, o.o_custkey == c.c_custkey, "left_anti").count()
    assert dangling == 0


def test_split_assignment_partition_and_exclusivity(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    s = assign_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.05})
    n = d.count()
    counts = {r.split: r.n for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # every row labeled (incl. NULL holdout)
    assert counts.get("train", 0) > counts.get("val", 0) > 0
    # deterministic: same assignment on recompute
    again = {r.split: r.n for r in assign_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.05}).groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts == again


def test_split_weights_validated(spark, sf_dir):
    import pytest

    d = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="> 1"):
        assign_split(d, "doc_id", {"a": 0.7, "b": 0.6})


def test_knn_arrow_matches_jvm_fold(spark, sf_dir):
    """The BLAS scale path returns the same neighbors and scores as the
    oracle-checked JVM fold."""
    from pyspark.sql import functions as F

    from kafka_error_handling_spark.datapipe.similarity import (
        knn_bruteforce,
        knn_bruteforce_arrow,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    a = {(r.query_id, r.neighbor_id, r.cos_sim) for r in knn_bruteforce(e, q).collect()}
    b = {(r.query_id, r.neighbor_id, r.cos_sim) for r in knn_bruteforce_arrow(e, q).collect()}
    assert a == b


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """Hamming-1 multi-probe must recover at least as many true
    brute-force neighbors as single-probe LSH."""
    from pyspark.sql import functions as F

    from kafka_error_handling_spark.datapipe.similarity import (
        knn_bruteforce,
        knn_lsh,
        knn_lsh_multiprobe,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    truth = {(r.query_id, r.neighbor_id) for r in knn_bruteforce(e, q).collect()}
    single = {(r.query_id, r.neighbor_id) for r in knn_lsh(e, q).collect()}
    multi = {(r.query_id, r.neighbor_id) for r in knn_lsh_multiprobe(e, q).collect()}
    assert len(multi & truth) >= len(single & truth)
    assert single & truth <= multi & truth or len(multi & truth) > len(single & truth)


def test_ivf_probes_use_corpus_codebook(spark, sf_dir):
    """Regression: query probes must rank against the CORPUS codebook —
    with 4/16 probes the IVF result should recover a solid share of the
    true brute-force neighbors (the original bug ranked queries against
    their own low-id vectors and silently probed wrong cells)."""
    from pyspark.sql import functions as F

    from kafka_error_handling_spark.datapipe.similarity import (
        knn_bruteforce,
        knn_ivf,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    truth = {(r.query_id, r.neighbor_id) for r in knn_bruteforce(e, q).collect()}
    ivf = {(r.query_id, r.neighbor_id) for r in knn_ivf(e, q).collect()}
    recall = len(ivf & truth) / len(truth)
    assert recall >= 0.3, f"IVF recall {recall:.2f} — probe assignment broken?"


def test_ivf_assignment_paths_agree(spark, sf_dir):
    """The BLAS (arrow) and JVM-fold assignment paths must emit identical
    (id, cid, c_sim, crank) rows — rounding to 6 absorbs summation-order
    ULP differences; a disagreement here means the arrow path would
    silently build different cells."""
    from kafka_error_handling_spark.datapipe.similarity import (
        ivf_assignments,
        ivf_assignments_arrow,
        ivf_centroids,
    )

    e = load_table(spark, sf_dir, "embeddings")
    codebook = ivf_centroids(e)
    jvm = ivf_assignments(e, centroids=codebook)
    arrow = ivf_assignments_arrow(e, codebook.select("cid", "cv").collect())
    a = {(r.vec_id, r.cid): (r.c_sim, r.crank) for r in jvm.collect()}
    b = {(r.vec_id, r.cid): (r.c_sim, r.crank) for r in arrow.collect()}
    assert a == b


def test_knn_arrow_query_set_size_guard(spark, sf_dir, monkeypatch):
    """knn_bruteforce_arrow broadcasts the collected query matrix — an
    accidentally corpus-sized query frame must fail loudly at the bound,
    not OOM the driver (VERDICT r2 #7)."""
    import pytest

    from kafka_error_handling_spark.datapipe import similarity as S

    e = load_table(spark, sf_dir, "embeddings")
    monkeypatch.setattr(S, "MAX_QUERY_VECTORS", 10)
    with pytest.raises(ValueError, match="MAX_QUERY_VECTORS"):
        S.knn_bruteforce_arrow(e, e)


def test_pq_centroid_vectors_reconstruct_exactly(spark, sf_dir):
    """A corpus vector that IS a sub-codebook centroid (vec_id < PQ_K)
    must encode to itself in every subspace (sub-distance 0, tie-break
    moot) and reconstruct bit-exactly — the zero-distortion fixpoint of
    the quantizer."""
    from kafka_error_handling_spark.datapipe.similarity import (
        PQ_K,
        PQ_M,
        _dvec,
        pq_codebook,
        pq_codes,
    )
    from kafka_error_handling_spark.sources.files import load_table

    e = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebook(e)
    codes = pq_codes(e.filter(F.col("vec_id") < PQ_K), cb)
    rows = codes.collect()
    assert len(rows) == PQ_K * PQ_M
    assert all(r["code"] == r["vec_id"] for r in rows)


def test_kfold_partitions_and_is_split_independent(spark, sf_dir):
    """Every doc gets exactly one fold in [0, 5); the fold must not be
    correlated with assign_split's train/val/test label (both are salted
    differently off the same key)."""
    from kafka_error_handling_spark.datapipe.sampling import assign_split, kfold_assign
    from kafka_error_handling_spark.sources.files import load_table

    d = load_table(spark, sf_dir, "documents")
    f = kfold_assign(assign_split(d, "doc_id", {"train": 0.8, "val": 0.2}), "doc_id")
    folds = f.groupBy("fold").count().collect()
    assert {r["fold"] for r in folds} == {0, 1, 2, 3, 4}
    # independence: every (split, fold) cell populated at 500 docs
    cells = f.groupBy("split", "fold").count().collect()
    assert len(cells) == 10


def test_ivfpq_recall_bounded_by_ivf(spark, sf_dir):
    """IVF+PQ probes the SAME cells as IVF but ranks candidates through
    the quantizer, so per-query recall@5 can only lose (modulo one slot
    of rounded-cosine tie noise) — the dominance structure that makes
    the two-level index a tuning ladder, not a lottery."""
    from kafka_error_handling_spark.datapipe.similarity import (
        q_ivf_recall,
        q_ivfpq_recall,
    )

    ivf = {r["query_id"]: r["recall_at_5"] for r in q_ivf_recall(spark, sf_dir).collect()}
    ivfpq = {
        r["query_id"]: r["recall_at_5"] for r in q_ivfpq_recall(spark, sf_dir).collect()
    }
    assert set(ivf) == set(ivfpq)
    for qid in ivf:
        assert ivfpq[qid] <= ivf[qid] + 0.21


def test_dsir_importance_prefers_target_like_docs(spark):
    """DSIR semantics on a hand-built corpus: a pool doc sharing the
    target domain's n-grams outranks one that shares none, the target
    source itself never appears in the selection, and the importance
    score is the integer micro-sum (reproducible under any layout)."""
    from kafka_error_handling_spark.datapipe.sampling import dsir_importance

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta", "tgt"),
            (2, "alpha beta gamma", "tgt"),
            (3, "alpha beta alpha", "web"),    # target-like
            (4, "zeta eta theta iota", "web"),  # unlike the target
        ],
        "doc_id long, text string, source string",
    )
    got = dsir_importance(docs, target_source="tgt", n_select=10).collect()
    ids = [r.doc_id for r in got]
    assert set(ids) == {3, 4}, "selection must cover exactly the pool"
    by_id = {r.doc_id: r for r in got}
    assert by_id[3].imp_micro > by_id[4].imp_micro
    # repartitioned layout cannot change an integer-sum score
    again = {
        r.doc_id: r.imp_micro
        for r in dsir_importance(
            docs.repartition(7, "source"), target_source="tgt", n_select=10
        ).collect()
    }
    assert again == {r.doc_id: r.imp_micro for r in got}


def test_dsir_single_token_doc_has_no_bigrams(spark):
    from kafka_error_handling_spark.datapipe.sampling import dsir_importance

    docs = spark.createDataFrame(
        [(1, "alpha", "tgt"), (2, "alpha", "web")],
        "doc_id long, text string, source string",
    )
    got = dsir_importance(docs, target_source="tgt", n_select=10).collect()
    assert [r.doc_id for r in got] == [2]
    assert got[0].n_feats == 1  # the unigram only, no null bigram leaked


def test_quality_nb_matches_independent_python_model(spark):
    """The NB quality classifier pinned against a from-scratch pure-
    Python implementation of the SAME model (md5 bucketing, Gopher weak
    labels, +1/bucket-space Laplace smoothing, integer micro units) on a
    hand-built corpus — an independent second implementation, not a
    re-read of the Spark expressions.  nb_micro is allowed ±(n_feats+1)
    micro units (each log term floors independently and libm ulps can
    sit on a floor boundary); ordering, labels, and feature counts must
    be exact."""
    import hashlib
    import math

    from kafka_error_handling_spark.datapipe.sampling import quality_nb_select
    from kafka_error_handling_spark.datapipe.text import (
        GOPHER_MAX_MEAN_LEN,
        GOPHER_MAX_TOP_TOKEN_FRACTION,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MEAN_LEN,
        GOPHER_MIN_STOPWORD_RATIO,
        GOPHER_MIN_WORDS,
        _STOPWORDS,
    )

    rows = [
        (1, "the quick brown fox jumps over a lazy dog and runs far away", "a"),
        (2, "a stream of data flows into the lake for batch and query use", "a"),
        (3, "short doc", "b"),  # fails word_count
        (4, "go go go go go go go go go go go go", "b"),  # fails repetition
        (5, "the fast brown fox sleeps under a shady tree and dreams away", "b"),
        (6, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu", "b"),
    ]

    def label(text):
        toks = text.split(" ")
        n = len(toks)
        mean_len = (len(text) - n + 1) / n
        sw = sum(t in _STOPWORDS for t in toks) / n
        top = max(toks.count(t) for t in set(toks)) / n
        return (
            GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS
            and GOPHER_MIN_MEAN_LEN <= mean_len <= GOPHER_MAX_MEAN_LEN
            and sw >= GOPHER_MIN_STOPWORD_RATIO
            and top <= GOPHER_MAX_TOP_TOKEN_FRACTION
        )

    def feats(text):
        toks = text.split(" ")
        grams = toks + [
            f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)
        ]
        return [
            int(hashlib.md5(f"dsir|{g}".encode()).hexdigest()[:15], 16) % 4096
            for g in grams
        ]

    cp, cf = {}, {}
    n_pass = n_fail = 0
    for _id, text, _src in rows:
        ok = label(text)
        n_pass += ok
        n_fail += not ok
        for b in feats(text):
            (cp if ok else cf)[b] = (cp if ok else cf).get(b, 0) + 1
    tp, tf = sum(cp.values()), sum(cf.values())
    prior = math.floor(
        (math.log((n_pass + 1) / (n_pass + n_fail + 2))
         - math.log((n_fail + 1) / (n_pass + n_fail + 2))) * 1e6
    )

    def w(b):
        return math.floor(
            (math.log((cp.get(b, 0) + 1) / (tp + 4096.0))
             - math.log((cf.get(b, 0) + 1) / (tf + 4096.0))) * 1e6
        )

    expected = []
    for _id, text, src in rows:
        fb = feats(text)
        expected.append(
            (_id, src, label(text), len(fb), prior + sum(w(b) for b in fb))
        )
    expected.sort(key=lambda r: (-r[4], r[0]))

    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = quality_nb_select(docs, n_select=10).collect()
    assert [r.doc_id for r in got] == [e[0] for e in expected]
    for r, e in zip(got, expected):
        assert (r.source, r.weak_pass, r.n_feats) == (e[1], e[2], e[3]), r
        assert abs(r.nb_micro - e[4]) <= r.n_feats + 1, (r, e)


def test_one_shot_selection_caches_release_on_gc(spark):
    """The persist-barrier contract (VERDICT r11 #2): the one-shot
    dsir/NB modes cache the feature fan-out with FULL lineage and tie
    release to the returned frame via a weakref finalizer — after the
    caller drops the result, no cache-manager entry may survive (the
    ADVICE-r10 leak was exactly stranded persists in long sessions)."""
    import gc
    import time

    from kafka_error_handling_spark.datapipe.sampling import (
        dsir_importance,
        quality_nb_select,
    )

    docs = spark.createDataFrame(
        [(i, "src%d" % (i % 2), "alpha beta gamma delta token%d" % i)
         for i in range(40)],
        "doc_id long, source string, text string",
    ).withColumn("source", F.when(F.col("doc_id") < 20, "src0").otherwise("src1"))

    def n_persisted():
        return len(spark.sparkContext._jsc.getPersistentRDDs())

    baseline = n_persisted()  # tolerate caches other fixtures may hold
    out = dsir_importance(docs, n_select=5)
    out.collect()
    out2 = quality_nb_select(docs, n_select=5)
    out2.collect()
    # while the frames are alive their caches may legitimately persist
    del out, out2
    gc.collect()
    deadline = time.time() + 10
    while time.time() < deadline:
        if n_persisted() <= baseline:
            break
        time.sleep(0.5)
    assert n_persisted() <= baseline, (
        "one-shot selection caches survived GC of the returned frames"
    )


def test_quality_nb_select_rejects_malformed_merged_sketch(spark):
    """A merged sketch must be groupBy(bucket)-re-aggregated: a missing
    bucket −1 prior row used to silently annihilate the selection
    (ADVICE r11), and a union-merged sketch with duplicate bucket rows
    silently double-counted (r12 review) — both now fail loudly."""
    import pytest as _pytest

    from kafka_error_handling_spark.datapipe.sampling import (
        quality_nb_counts,
        quality_nb_select,
    )

    docs = spark.createDataFrame(
        [(i, "src0", "alpha beta gamma tok%d" % i) for i in range(20)],
        "doc_id long, source string, text string",
    )
    good = quality_nb_counts(docs)
    # sanity: the well-formed sketch scores fine
    assert quality_nb_select(docs, n_select=3, counts=good).count() > 0

    no_prior = good.filter(F.col("bucket") >= 0)
    with _pytest.raises(ValueError, match="prior rows: 0"):
        quality_nb_select(docs, n_select=3, counts=no_prior)

    union_merged = good.unionByName(good)  # the documented merge mistake
    with _pytest.raises(ValueError, match="duplicated buckets"):
        quality_nb_select(docs, n_select=3, counts=union_merged)

    # validate=False keeps the builder lazy (ADVICE r12: no eager probe
    # job per call) — proven by the malformed sketch NOT raising at
    # build time; the caller owns sketch hygiene on this path
    lazy = quality_nb_select(
        docs, n_select=3, counts=no_prior, validate=False
    )
    assert lazy.columns[0] == "doc_id"
