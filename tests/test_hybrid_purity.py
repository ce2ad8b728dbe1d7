"""Contract tests for the round-7 retrieval/quality gates on tiny
hand-built frames: hybrid RRF fusion (one-pool documents coalesce the
missing reciprocal to 0, ties break on doc id) and kNN label purity
(majority-vote disagreement counting).  The three-SF oracle gates prove
engine parity; these pin the SEMANTICS a reader should be able to trust
without running DuckDB."""

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _emb(spark, rows):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    return df.withColumn("embedding", F.col("embedding").cast("array<float>"))


def test_rrf_fuses_both_pools_and_coalesces_single_pool(spark):
    from kafka_error_handling_spark.datapipe.ranking import hybrid_rrf_topk

    # lexical signal: "apple" appears only in docs 1 and 2 (doc 1 twice
    # in fewer words -> higher bm25); dense signal: query vec 0 is
    # closest to vecs 2 then 3 (vec 1 orthogonal).
    docs = _docs(
        spark,
        [
            (1, "apple apple pie"),
            (2, "apple and a very long tail of words diluting frequency"),
            (3, "no fruit here at all"),
            (4, "entirely unrelated text"),
        ],
    )
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0, 0.0], "q"),
            (1, [0.0, 1.0, 0.0], "a"),
            (2, [0.9, 0.1, 0.0], "a"),
            (3, [0.6, 0.4, 0.0], "a"),
        ],
    )
    # pool=2 so the dense pool is exactly {vec 2, vec 3} — the orthogonal
    # vec 1 stays OUT of the pool and doc 1 is genuinely lexical-only
    out = hybrid_rrf_topk(docs, emb, ["apple"], query_vec_id=0, pool=2, k=4)
    rows = {r["doc_id"]: r for r in out.collect()}

    # doc 2 is in BOTH pools: lex_rank 2, vec_rank 1
    assert rows[2]["lex_rank"] == 2 and rows[2]["vec_rank"] == 1
    # doc 1 is lexical-only: vec side coalesced (NULL rank)
    assert rows[1]["lex_rank"] == 1 and rows[1]["vec_rank"] is None
    # doc 3 is dense-only (rank 2 behind doc 2)
    assert rows[3]["lex_rank"] is None and rows[3]["vec_rank"] == 2
    # fused scores: two reciprocals beat any single one at these ranks
    def rrf(*ranks):
        return sum(1.0 / (60 + r) for r in ranks)

    assert abs(rows[2]["rrf"] - int(rrf(2, 1) * 1e6) / 1e6) < 1e-9
    assert abs(rows[1]["rrf"] - int(rrf(1) * 1e6) / 1e6) < 1e-9
    # ordering: doc2 (both pools) first, then the single-pool docs by
    # their reciprocal; doc4 appears in neither pool and is absent
    order = [r["doc_id"] for r in out.orderBy(F.desc("rrf"), F.asc("doc_id")).collect()]
    assert order[0] == 2 and 4 not in rows


def test_label_purity_clean_clusters_and_one_flip(spark):
    from kafka_error_handling_spark.datapipe.similarity import label_knn_purity

    # two well-separated clusters of 4; k=3 keeps each query's neighbor
    # set inside its own cluster.  All 8 vectors are audited (ids < 100).
    a = [(i, [1.0 + 0.01 * i, 0.0, 0.0], "A") for i in range(4)]
    b = [(10 + i, [0.0, 1.0 + 0.01 * i, 0.0], "B") for i in range(4)]
    clean = _emb(spark, a + b)
    out = {
        r["label"]: r
        for r in label_knn_purity(clean, k=3, sample=100).collect()
    }
    assert out["A"]["n_queries"] == 4 and out["B"]["n_queries"] == 4
    assert out["A"]["mean_purity"] == 1.0 and out["B"]["mean_purity"] == 1.0
    assert out["A"]["n_low_purity"] == 0 and out["B"]["n_low_purity"] == 0

    # flip one A-cluster vector's label to B: that query sees 3/3
    # A-labeled neighbors (0 matches -> low purity under its OWN label B),
    # and each true-A query now has a B neighbor in range
    flipped = a[:3] + [(3, a[3][1], "B")] + b
    out = {
        r["label"]: r
        for r in label_knn_purity(_emb(spark, flipped), k=3, sample=100).collect()
    }
    # the mislabeled point is its label-group's disagreement candidate
    assert out["B"]["n_low_purity"] >= 1
    # true-B cluster is untouched (its 4 queries still match k=3 inside
    # the B cluster? no — the flipped point is FAR from B's cluster, so
    # B's geometric neighbors stay B): mean purity over B's 5 queries =
    # (4 * 3 matches + 0 matches) / (5 * 3)
    assert abs(out["B"]["mean_purity"] - int(12 / 15 * 1e6) / 1e6) < 1e-9
    # A's remaining 3 queries each have neighbors {other 2 A, flipped-B}
    # -> 2/3 matches, still majority (not low purity)
    assert out["A"]["n_queries"] == 3
    assert out["A"]["n_low_purity"] == 0


def test_mmr_greedy_matches_bruteforce_reference(spark):
    """MMR semantics on a hand-built pool, pinned against an independent
    pure-Python greedy: relevance is pool-min-max-normalized, similarity
    is cosine rounded to 4, score = 0.7·rel − 0.3·max-sim-to-selected,
    ties break on doc id, and a pool doc WITHOUT an embedding row has no
    sim edges (max-sim coalesces to 0 — maximally diverse)."""
    import math

    from kafka_error_handling_spark.datapipe.ranking import mmr_diversify

    pool = spark.createDataFrame(
        [(1, 0.05), (2, 0.04), (3, 0.03), (4, 0.02), (5, 0.01)],
        "doc_id long, rrf double",
    )
    # 1 and 2 nearly parallel (redundant); 3 orthogonal; 4 anti-aligned
    # with 1; doc 5 has NO embedding row
    vecs = {
        1: [1.0, 0.0], 2: [0.999, 0.04], 3: [0.0, 1.0], 4: [-1.0, 0.0],
    }
    emb = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()], "vec_id long, embedding array<double>"
    )

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 4)

    rrf = {1: 0.05, 2: 0.04, 3: 0.03, 4: 0.02, 5: 0.01}
    mn, mx = min(rrf.values()), max(rrf.values())
    rel = {d: (v - mn) / (mx - mn) for d, v in rrf.items()}
    selected, expect = [], []
    for _ in range(4):
        best = None
        for d in sorted(rrf):
            if d in selected:
                continue
            ms = max(
                (cos(vecs[d], vecs[s]) for s in selected if d in vecs and s in vecs),
                default=0.0,
            )
            score = 0.7 * rel[d] - 0.3 * ms
            if best is None or score > best[1]:
                best = (d, score)
        selected.append(best[0])
        expect.append((best[0], math.floor(best[1] * 1000000) / 1000000.0))

    got = [
        (r.doc_id, r.mmr_score)
        for r in mmr_diversify(pool, emb, k=4).orderBy("mmr_rank").collect()
    ]
    assert got == expect
    # semantic spot-pins: doc 1 first (top relevance); doc 2 must NOT be
    # second despite 2nd-best relevance (0.9992 cosine redundancy with 1)
    assert got[0][0] == 1
    assert got[1][0] != 2


def test_rerank_cross_feature_semantics(spark):
    """Cross-encoder reranker semantics on a hand-built pool: coverage /
    density / proximity / phrase-bonus behave as documented, a NULL-text
    dense-only candidate scores with zeroed features instead of NULL
    (which would hit engine-dependent NULL ordering at the rank
    boundary), and ties break on doc id."""
    import math

    from kafka_error_handling_spark.datapipe.ranking import rerank_cross_encoder

    docs = _docs(
        spark,
        [
            # all three terms, adjacent (phrase "spark join" present)
            (1, "spark join window now"),
            # all three terms, far apart -> same coverage, worse proximity
            (2, "spark a b c d e f g h join k l m n o p q r s window"),
            # one term only, repeated -> coverage low, density high
            (3, "spark spark spark spark"),
            (4, None),  # dense-only candidate with NULL text
        ],
    )
    pool = spark.createDataFrame(
        [(1, 0.03), (2, 0.03), (3, 0.03), (4, 0.03)], "doc_id long, rrf double"
    )
    got = {
        r.doc_id: (r.ce_score, r.ce_rank)
        for r in rerank_cross_encoder(docs, pool, ["spark", "join", "window"]).collect()
    }
    assert set(got) == {1, 2, 3, 4}

    def expect(text):
        toks = (text or "").split(" ")
        dl = len(toks)
        tfs = [toks.count(t) for t in ("spark", "join", "window")]
        poss = [toks.index(t) + 1 if t in toks else 0 for t in ("spark", "join", "window")]
        cov = sum(1 for t in tfs if t > 0) / 3.0
        dens = sum(tfs) / dl
        gaps = [
            abs(poss[i] - poss[i + 1])
            for i in range(2)
            if poss[i] > 0 and poss[i + 1] > 0
        ]
        prox = 1.0 / (1.0 + min(gaps)) if gaps else 0.0
        phrase = 0.5 if "spark join" in (text or "") else 0.0
        raw = 2.0 * cov + 3.0 * dens + prox + phrase - 0.1 * math.log(1.0 + dl) + 10.0 * 0.03
        return math.floor(raw * 1000000) / 1000000.0

    for doc_id, text in [(1, "spark join window now"),
                         (2, "spark a b c d e f g h join k l m n o p q r s window"),
                         (3, "spark spark spark spark"),
                         (4, None)]:
        assert got[doc_id][0] == expect(text), (doc_id, got[doc_id][0], expect(text))
    # semantic ordering: 1 (adjacent + phrase) beats 2 (scattered) beats
    # the NULL-text candidate, which still ranks deterministically
    assert got[1][1] < got[2][1]
    assert got[4][1] == 4


def test_mmr_pool_smaller_than_k_returns_pool(spark):
    """ADVICE r9: the greedy loop must stop when the pool is exhausted
    (it used to IndexError on an empty collect) — a 2-doc pool with k=5
    yields exactly 2 picks, and an empty pool yields an empty frame."""
    from kafka_error_handling_spark.datapipe.ranking import mmr_diversify

    pool = spark.createDataFrame(
        [(1, 0.05), (2, 0.01)], "doc_id long, rrf double"
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = mmr_diversify(pool, emb, k=5).orderBy("mmr_rank").collect()
    assert [r.doc_id for r in got] == [1, 2]
    assert [r.mmr_rank for r in got] == [1, 2]

    empty = pool.filter("doc_id < 0")
    assert mmr_diversify(empty, emb, k=5).count() == 0


def test_rerank_short_query_guards(spark):
    """ADVICE r9: a single-term query has no adjacent term pairs — the
    proximity feature must be a deterministic 0 (NULL min_gap), not an
    IndexError; zero terms fail loud at plan build; and the SQL builder
    mirrors both (NULL literal for n=1, ValueError for n=0)."""
    import math

    import duckdb
    import pytest

    from kafka_error_handling_spark.datapipe.ranking import (
        _sql_rerank_cross,
        rerank_cross_encoder,
    )

    docs = _docs(spark, [(1, "spark runs fine"), (2, "no hit here")])
    pool = spark.createDataFrame(
        [(1, 0.03), (2, 0.02)], "doc_id long, rrf double"
    )
    got = {
        r.doc_id: r.ce_score
        for r in rerank_cross_encoder(docs, pool, ["spark"]).collect()
    }
    # single term: coverage 1, density 1/3, prox 0 (no pairs), phrase hits
    # the lone-term substring, length prior, rrf prior
    raw = 2.0 * 1.0 + 3.0 * (1 / 3) + 0.0 + 0.5 - 0.1 * math.log(4.0) + 0.3
    assert got[1] == math.floor(raw * 1000000) / 1000000.0

    with pytest.raises(ValueError):
        rerank_cross_encoder(docs, pool, [])
    with pytest.raises(ValueError):
        _sql_rerank_cross([])
    # the n=1 SQL must at least be parseable DuckDB (zero-arg least() was
    # a parse error before the guard)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT 1::BIGINT AS doc_id,"
        " 'spark runs fine' AS text"
    )
    con.execute(
        "CREATE VIEW embeddings AS SELECT 1::BIGINT AS vec_id,"
        " [1.0, 0.0]::FLOAT[] AS embedding"
    )
    con.sql(_sql_rerank_cross(["spark"]))  # must prepare without error


def test_query_expansion_mines_cooccurring_terms(spark):
    """PRF semantics on a hand-built corpus: terms co-occurring with the
    query inside the feedback set (df_fb >= 2) pull in documents that
    contain NO original query term; a term seen in only one feedback doc
    is below the noise floor and must not expand."""
    from kafka_error_handling_spark.datapipe.ranking import query_expansion_prf

    docs = _docs(
        spark,
        [
            (1, "apple pie cinnamon"),
            (2, "apple pie cinnamon"),
            (3, "apple pie quince"),
            (4, "cinnamon pie"),        # reachable only via expansion
            (5, "quince only here"),    # quince df_fb=1 -> never expanded
            (6, "nothing relevant"),
        ],
    )
    got = query_expansion_prf(docs, ["apple"], k=10, fb_k=10, m=2).collect()
    ids = [r.doc_id for r in got]
    # docs 1-3 match "apple"; doc 4 matches only the mined expansion
    # terms (pie, cinnamon); docs 5/6 match nothing that expanded
    assert set(ids) == {1, 2, 3, 4}
    # identical docs 1/2 tie-break ascending; the expansion-only doc is
    # last (its contributions all carry the 0.5 expansion weight)
    assert ids == [1, 2, 3, 4]
    by_id = {r.doc_id: r for r in got}
    assert by_id[1].n_terms == 3  # apple + pie + cinnamon
    assert by_id[4].n_terms == 2  # pie + cinnamon only
    assert by_id[1].exp_score > by_id[4].exp_score


def test_query_expansion_requires_terms(spark):
    import pytest as _pytest

    from kafka_error_handling_spark.datapipe.ranking import query_expansion_prf

    with _pytest.raises(ValueError):
        query_expansion_prf(_docs(spark, [(1, "a b")]), [])


def test_search_eval_ndcg_hand_computed(spark):
    """Pin the metric arithmetic end-to-end on a corpus where both
    rankers' orders are hand-derivable.

    Corpus: d1 holds all 3 query terms, d2 two, d3 one, d4 none; all
    docs are 3 tokens so bm25's length norm cancels and the lexical
    order is d1>d2>d3 (each extra term adds a positive idf) — exactly
    the ideal (grade-desc) order, so bm25's nDCG must be 1.  Embeddings
    put the DENSE order at d3>d2>d1 (cosine 1 / .7071 / 0 to query vec
    0), and the RRF arithmetic makes d1 and d3 TIE on the fused score
    (1/61+1/63 vs 1/63+1/61), so the hybrid eval order is d1,d3,d2
    (tie → doc id) — a hand-computable nDCG below 1:

      contrib(g,r) = floor(1e6·(2^g−1)/log2(r+1))
      bm25  : 7000000 + 1892789 + 500000 = 9392789 = IDCG → ndcg 1e6
      hybrid: 7000000 +  630929 + 1500000 = 9130929
              ndcg = floor(9130929e6/9392789) = 972121
    Both rankers' first hit is relevant (MRR 1e6) and all 3 of k=3 are
    relevant (P@3 = 3·floor(1e6/3) = 999999).
    """
    from kafka_error_handling_spark.datapipe.ranking import search_eval_ndcg

    docs = _docs(
        spark,
        [
            (1, "spark join window"),
            (2, "spark join x"),
            (3, "spark y z"),
            (4, "x y z"),
        ],
    )
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0], "q"),
            (1, [0.0, 1.0], "a"),
            (2, [1.0, 1.0], "a"),
            (3, [1.0, 0.0], "a"),
        ],
    )
    out = search_eval_ndcg(docs, emb, ["spark", "join", "window"], k=3)
    rows = {r["ranker"]: r for r in out.collect()}
    assert set(rows) == {"bm25", "hybrid_rrf"}

    lex = rows["bm25"]
    assert lex["dcg_micro"] == 9392789
    assert lex["ndcg_ppm"] == 1000000
    assert lex["mrr_ppm"] == 1000000
    assert lex["prec_ppm"] == 999999

    hyb = rows["hybrid_rrf"]
    assert hyb["dcg_micro"] == 9130929
    assert hyb["ndcg_ppm"] == 972121
    assert hyb["mrr_ppm"] == 1000000
    assert hyb["prec_ppm"] == 999999


def test_search_eval_ndcg_empty_and_single_term_queries(spark):
    """The rerank short-query lesson (ADVICE r9) applied to the eval op:
    an empty query must degrade, not crash — the grade fold is seeded
    with a literal 0, so the dense-only ranking evaluates to zero
    metrics with a NULL nDCG (no relevant doc exists anywhere).  A
    single-term query exercises the fold's 1-iteration path."""
    from kafka_error_handling_spark.datapipe.ranking import search_eval_ndcg

    docs = _docs(spark, [(1, "a b"), (2, "c d")])
    emb = _emb(
        spark,
        [(0, [1.0, 0.0], "q"), (1, [0.0, 1.0], "a"), (2, [1.0, 1.0], "a")],
    )
    rows = {r["ranker"]: r for r in search_eval_ndcg(docs, emb, [], k=2).collect()}
    # lexical list is empty (bm25 > 0 never holds); the dense-only
    # hybrid list survives with all-zero metrics and NULL nDCG
    assert set(rows) == {"hybrid_rrf"}
    z = rows["hybrid_rrf"]
    assert (z["dcg_micro"], z["ndcg_ppm"], z["mrr_ppm"], z["prec_ppm"]) == (
        0, None, 0, 0,
    )

    one = {r["ranker"]: r for r in search_eval_ndcg(docs, emb, ["a"], k=2).collect()}
    # doc 1 is the only relevant doc and both rankers surface it first
    assert one["bm25"]["ndcg_ppm"] == 1000000
    assert one["hybrid_rrf"]["mrr_ppm"] == 1000000
    assert one["bm25"]["prec_ppm"] == 500000  # 1 of k=2 relevant


def test_eval_ndcg_hand_computed_matrix(spark):
    """VERDICT r10 #2: the offline-eval metric arithmetic pinned on a
    hand-worked query×doc matrix — independent of the three-SF oracle.

    Query ["apple", "banana"], k=3.  Grades (distinct terms contained):
    d2=2, d3=1, d1=1, d4=0.  BM25 ranks d2 (both terms), d3 (one term,
    dl=1), d1 (one term, dl=3 — diluted): all relevant, perfectly
    grade-ordered -> nDCG=1.  The dense side has NO vector for d1 and its
    query vector hugs d4, so hybrid-RRF serves d2, d3, then the
    IRRELEVANT d4 (dense-only 1/61 beats lex-rank-3-only 1/63):

      hybrid DCG  = floor(1e6·3/log2(2)) + floor(1e6·1/log2(3)) + 0
                  = 3_000_000 + 630_929
      ideal IDCG  = 3_000_000 + 630_929 + floor(1e6·1/log2(4))
                  = 4_130_929
    """
    from kafka_error_handling_spark.datapipe.ranking import search_eval_ndcg

    docs = _docs(
        spark,
        [
            (1, "banana kiwi kiwi"),
            (2, "apple banana"),
            (3, "apple"),
            (4, "kiwi"),
        ],
    )
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0], "q"),
            (2, [0.9, 0.1], "x"),
            (3, [0.8, 0.2], "x"),
            (4, [0.99, 0.01], "x"),
        ],
    )
    out = {
        r["ranker"]: r
        for r in search_eval_ndcg(docs, emb, ["apple", "banana"], k=3).collect()
    }
    dcg_r1_g2 = 3_000_000          # floor(1e6·(2²−1)/log2(1+1))
    dcg_r2_g1 = 630_929            # floor(1e6·1/log2(3))
    dcg_r3_g1 = 500_000            # floor(1e6·1/log2(4))
    idcg = dcg_r1_g2 + dcg_r2_g1 + dcg_r3_g1

    bm25 = out["bm25"]
    assert bm25["dcg_micro"] == idcg
    assert bm25["ndcg_ppm"] == 1_000_000
    assert bm25["mrr_ppm"] == 1_000_000
    assert bm25["prec_ppm"] == 3 * (1_000_000 // 3)  # 3/3 relevant

    hyb = out["hybrid_rrf"]
    assert hyb["dcg_micro"] == dcg_r1_g2 + dcg_r2_g1  # d4 contributes 0
    assert hyb["ndcg_ppm"] == (dcg_r1_g2 + dcg_r2_g1) * 1_000_000 // idcg
    assert hyb["mrr_ppm"] == 1_000_000                # d2 at rank 1
    assert hyb["prec_ppm"] == 2 * (1_000_000 // 3)    # d4 irrelevant


def test_eval_macro_fold_is_floor_mean_of_per_query_rows(spark):
    """The macro rows (qid = -1) must equal floor(sum/|Q|) of the
    per-query rows in the SAME frame, and qid 0's per-query row must
    equal the single-query eval on the same topic — the fold adds no
    arithmetic of its own."""
    from kafka_error_handling_spark.datapipe.ranking import (
        search_eval_macro,
        search_eval_ndcg,
    )

    docs = _docs(
        spark,
        [
            (1, "banana kiwi kiwi"),
            (2, "apple banana"),
            (3, "apple"),
            (4, "kiwi"),
        ],
    )
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0], "q"),
            (2, [0.9, 0.1], "x"),
            (3, [0.8, 0.2], "x"),
            (4, [0.99, 0.01], "x"),
        ],
    )
    topics = [(["apple", "banana"], 0), (["kiwi"], 0)]
    rows = search_eval_macro(docs, emb, queries=topics, k=3).collect()
    per = [r for r in rows if r["qid"] >= 0]
    macro = {r["ranker"]: r for r in rows if r["qid"] == -1}
    assert len(per) == 4 and len(macro) == 2  # 2 rankers × 2 topics
    for ranker in ("bm25", "hybrid_rrf"):
        mine = [r for r in per if r["ranker"] == ranker]
        for col in ("ndcg_ppm", "mrr_ppm", "prec_ppm"):
            want = sum(r[col] for r in mine) // len(topics)
            assert macro[ranker][col] == want, (ranker, col)
    single = {
        r["ranker"]: r
        for r in search_eval_ndcg(docs, emb, ["apple", "banana"], k=3).collect()
    }
    q0 = {r["ranker"]: r for r in per if r["qid"] == 0}
    for ranker in ("bm25", "hybrid_rrf"):
        for col in ("ndcg_ppm", "mrr_ppm", "prec_ppm"):
            assert q0[ranker][col] == single[ranker][col], (ranker, col)


def test_batched_eval_equals_per_topic_singles(spark):
    """The r12 batched eval engine (one fused scan for ALL topics) must
    reproduce the single-query eval EXACTLY for every topic — including
    topics with DISTINCT dense query vectors (exercises the qid↔vec_id
    broadcast map), a topic sharing another's vector, a single-term
    topic, and a topic whose terms match nothing (NULL nDCG row)."""
    from kafka_error_handling_spark.datapipe.ranking import (
        search_eval_macro,
        search_eval_ndcg,
    )

    docs = _docs(
        spark,
        [
            (1, "apple banana cherry"),
            (2, "apple banana"),
            (3, "cherry pie crumble"),
            (4, "banana split"),
            (5, "nothing relevant here"),
        ],
    )
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0], "q"),
            (1, [0.0, 1.0], "q"),
            (2, [0.9, 0.1], "a"),
            (3, [0.2, 0.8], "a"),
            (4, [0.7, 0.7], "a"),
            (5, [0.5, 0.1], "a"),
        ],
    )
    topics = [
        (["apple", "banana"], 0),
        (["cherry"], 1),
        (["banana", "split", "cherry"], 1),  # shares topic 1's vector
        (["zzz"], 0),                        # no matches -> NULL nDCG
    ]
    rows = search_eval_macro(docs, emb, queries=topics, k=3).collect()
    per = {(r["ranker"], r["qid"]): r for r in rows if r["qid"] >= 0}
    for qid, (terms, vec_id) in enumerate(topics):
        want = {
            r["ranker"]: r
            for r in search_eval_ndcg(
                docs, emb, terms, k=3
            ).collect()
        } if vec_id == 0 else None
        # search_eval_ndcg pins vec 0; for other vectors compare against
        # a 1-topic macro run (same engine, but a separate plan build)
        if want is None:
            want = {
                r["ranker"]: r
                for r in search_eval_macro(
                    docs, emb, queries=[(terms, vec_id)], k=3
                ).collect()
                if r["qid"] == 0
            }
        for ranker in ("bm25", "hybrid_rrf"):
            got = per.get((ranker, qid))
            exp = want.get(ranker)
            assert (got is None) == (exp is None), (qid, ranker)
            if got is None:
                continue
            for col in ("ndcg_ppm", "mrr_ppm", "prec_ppm"):
                assert got[col] == exp[col], (qid, ranker, col, got, exp)
    # macro rows still present for both rankers
    assert sum(1 for r in rows if r["qid"] == -1) == 2
