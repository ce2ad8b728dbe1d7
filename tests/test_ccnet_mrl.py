"""Round-14 additions: CCNet-style perplexity bucketing and Matryoshka
dim-truncation retrieval — unit-level semantics (the cross-engine value
parity lives in the DuckDB gates `text_ccnet_buckets` /
`embedding_knn_mrl` / `embedding_mrl_recall`)."""

from pyspark.sql import functions as F

from kafka_error_handling_spark.datapipe.similarity import (
    MRL_DIM,
    knn_bruteforce,
    q_knn_mrl,
    q_mrl_recall,
)
from kafka_error_handling_spark.datapipe.text import ccnet_buckets


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_ccnet_tertiles_are_balanced_and_ordered(spark, sf_dir):
    """Per language: ntile(3) bucket sizes differ by ≤1, and every head
    score ≤ every middle score ≤ every tail score (the CCNet contract:
    head = most reference-like)."""
    from kafka_error_handling_spark.sources.files import load_table

    out = ccnet_buckets(load_table(spark, sf_dir, "documents")).collect()
    assert out, "no scored docs at the test SF"
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r.lang, {}).setdefault(r.bucket, []).append(r.avg_nll)
    for lang, buckets in by_lang.items():
        sizes = [len(buckets.get(b, [])) for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        if buckets.get("head") and buckets.get("middle"):
            assert max(buckets["head"]) <= min(buckets["middle"]), lang
        if buckets.get("middle") and buckets.get("tail"):
            assert max(buckets["middle"]) <= min(buckets["tail"]), lang


def test_ccnet_reference_docs_score_better_on_average(spark, sf_dir):
    """Sanity on real data: documents INSIDE the reference slice must
    have a lower mean NLL than held-out ones — the model has seen their
    n-grams, so add-one smoothing penalizes them less.  Catches a
    swapped join direction or an inverted sign."""
    from kafka_error_handling_spark.datapipe.bucket_sql import hash_bucket
    from kafka_error_handling_spark.datapipe.text import CCNET_REF_PPM
    from kafka_error_handling_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    scored = ccnet_buckets(docs)
    in_ref = hash_bucket(
        F.concat(F.lit("ccnet|"), F.col("doc_id").cast("string"))
    ) < CCNET_REF_PPM
    means = {
        r.ref: r.m
        for r in scored.groupBy(in_ref.alias("ref"))
        .agg(F.avg("avg_nll").alias("m"))
        .collect()
    }
    assert means[True] < means[False], means


def test_ccnet_unseen_language_is_excluded_not_fake_scored(spark):
    """A language whose reference slice is empty has no model — its docs
    must be absent from the output (inner vocab join), never scored
    against a zero-vocab model (ln of a 0/0)."""
    rows = [(i, "en", "the quick brown fox jumps over the dog") for i in range(40)]
    # one doc in a lang that cannot appear in any reference slice of an
    # all-English reference: whatever the hash split keeps, 'zz' has no
    # other members, so IF this one doc lands outside the slice the lang
    # has no model at all
    zz_id = 999983
    from kafka_error_handling_spark.datapipe.bucket_sql import hash_bucket
    from kafka_error_handling_spark.datapipe.text import CCNET_REF_PPM

    rows.append((zz_id, "zz", "unseen language text here"))
    df = _docs(spark, rows)
    zz_in_ref = (
        df.filter(F.col("doc_id") == zz_id)
        .select(
            (
                hash_bucket(F.concat(F.lit("ccnet|"), F.col("doc_id").cast("string")))
                < CCNET_REF_PPM
            ).alias("r")
        )
        .first()
        .r
    )
    out = ccnet_buckets(df).collect()
    langs = {r.lang for r in out}
    assert "en" in langs
    # PIN the exclusion contract: 'zz' has exactly one doc, so its model
    # exists iff that doc hashed into the reference slice
    assert ("zz" in langs) == zz_in_ref
    for r in out:
        assert r.avg_nll is not None and r.avg_nll == r.avg_nll  # not NaN


def test_mrl_knn_equals_bruteforce_on_truncated_vectors(spark, sf_dir):
    """q_knn_mrl IS knn_bruteforce over the first MRL_DIM dims — pinned
    so the registry entry can never drift from the audited semantics."""
    from kafka_error_handling_spark.sources.files import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.slice(F.col("embedding"), 1, MRL_DIM).alias("embedding")
    )
    expect = sorted(
        map(
            tuple,
            knn_bruteforce(e, e.filter(F.col("vec_id") < 10), k=5).collect(),
        )
    )
    got = sorted(map(tuple, q_knn_mrl(spark, sf_dir).collect()))
    assert got == expect


def test_mrl_recall_bounds_and_width(spark, sf_dir):
    """One recall row per query vector, recall in [0, 1] — and at 16 of
    64 dims on real data it should retain SOMETHING (> 0 mean)."""
    rows = q_mrl_recall(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(0.0 <= r.recall_at_5 <= 1.0 for r in rows)
    assert sum(r.recall_at_5 for r in rows) > 0


def test_text_sampling_import_order_is_free():
    """Both module-level import orders of the text <-> sampling pair must
    work in FRESH interpreters: sampling's module-level oracle builders
    import text attributes, so text must never import sampling at module
    load (it uses the leaf bucket_sql module instead — r14 review)."""
    import subprocess
    import sys

    for first, second in (("text", "sampling"), ("sampling", "text")):
        code = (
            f"import kafka_error_handling_spark.datapipe.{first} as a\n"
            f"import kafka_error_handling_spark.datapipe.{second} as b\n"
            "assert 'text_ccnet_buckets' in "
            "__import__('kafka_error_handling_spark.datapipe.text', "
            "fromlist=['QUERIES']).QUERIES\n"
        )
        p = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=120,
            cwd="/root/repo",
        )
        assert p.returncode == 0, (first, second, p.stderr[-800:])


def test_ccnet_bigram_positions_match_transform_reference(spark):
    """r14 perf: the ccnet bigram fan-out is a positions explode with
    codegen element_at (guide §4.1) instead of exploding a per-doc array
    built by an interpreted ``transform`` lambda.  The (keys, bigram, w1)
    multiset must equal the lambda reference on the awkward rows: 1-token
    and empty docs (emit nothing), exactly-2-token docs, repeated tokens
    (multiset counts!), and multibyte text."""
    from kafka_error_handling_spark.datapipe.text import _bigram_positions

    docs = spark.createDataFrame(
        [
            (1, "en", "alpha beta gamma"),
            (2, "en", "solo"),
            (3, "en", ""),
            (4, "de", "zwei wörter"),
            (5, "en", "dup dup dup dup"),
            (6, "fr", "café au lait au café"),
        ],
        "doc_id long, lang string, text string",
    )
    base = docs.select(
        "doc_id", "lang", F.split(F.col("text"), " ").alias("__toks")
    )
    got = _bigram_positions(base, "doc_id", "lang")
    toks = F.col("__toks")
    ref = (
        base.filter(F.size(toks) >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.struct(
                        F.concat_ws(
                            " ",
                            F.element_at(toks, i),
                            F.element_at(toks, i + 1),
                        ).alias("bigram"),
                        F.element_at(toks, i).alias("w1"),
                    ),
                )
            ).alias("bs"),
        )
        .select("doc_id", "lang", "bs.bigram", "bs.w1")
    )
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0
    # the guard rows emit nothing
    assert got.filter(F.col("doc_id").isin(2, 3)).count() == 0
