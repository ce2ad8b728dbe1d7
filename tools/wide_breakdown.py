"""One-off decomposition of search_eval_wide's wall time (guide §1).

Times each sub-frame of the wide engine in isolation (min-of-3, GC-first,
bench-identical session) so the optimization targets the real cost center.
Not part of the test surface; kept for the r14 evidence trail.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kafka_error_handling_spark.datapipe import ranking as R
    from kafka_error_handling_spark.sources.files import load_table

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("keh-wide-breakdown")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    jvm_gc = spark.sparkContext._jvm.System.gc

    d = load_table(spark, SF_DIR, "documents")
    e = load_table(spark, SF_DIR, "embeddings")
    topics = R.EVAL_WIDE_QUERIES
    pool = max(R.RRF_POOL, R.EVAL_K)

    def timed(label, mk):
        ts = []
        for _ in range(3):
            jvm_gc()
            t0 = time.time()
            df = mk()
            df.count()
            ts.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        print(f"{min(ts):8.3f}  {label}  {ts}", flush=True)

    # warmup whole query once
    R.search_eval_macro(d, e, topics).count()
    spark.catalog.clearCache()

    term_lists = [t for t, _v in topics]

    def scored_only():
        scored, grades, caches = R._wide_bm25_scores(d, term_lists)
        return R._anchor_caches(scored, *caches)

    def tf_only():
        # replicate the tf frame without persist to time the explode+agg
        toks = F.split(F.col("text"), " ")
        tterms = spark.createDataFrame(
            [
                (qid, i, t)
                for qid, terms in enumerate(term_lists)
                for i, t in enumerate(terms)
            ],
            "qid int, term_idx int, term string",
        )
        hits = (
            d.select(
                F.col("doc_id"), F.size(toks).alias("dl"), F.explode(toks).alias("tok")
            )
            .join(F.broadcast(tterms), F.col("tok") == F.col("term"))
            .select("qid", "term_idx", "doc_id", "dl")
        )
        return hits.groupBy("qid", "term_idx", "doc_id", "dl").agg(
            F.count(F.lit(1)).alias("tf")
        )

    def graded_piv_only():
        scored, grades, caches = R._wide_bm25_scores(d, term_lists)
        return R._anchor_caches(grades, *caches)

    def lexranks_only():
        from pyspark.sql.window import Window

        scored, grades, caches = R._wide_bm25_scores(d, term_lists)
        wl = Window.partitionBy("qid").orderBy(F.desc("bm25"), F.asc("doc_id"))
        lex = (
            scored.filter(F.col("bm25") > 0.0)
            .withColumn("lex_rank", F.row_number().over(wl))
            .filter(F.col("lex_rank") <= pool)
            .select("qid", "doc_id", "lex_rank")
        )
        return R._anchor_caches(lex, *caches)

    def dense_only():
        return R._dense_ranks(spark, e, topics, pool, "doc_id")

    def runs_only():
        from pyspark.sql.window import Window

        scored, grades, caches = R._wide_bm25_scores(d, term_lists)
        wl = Window.partitionBy("qid").orderBy(F.desc("bm25"), F.asc("doc_id"))
        lex = (
            scored.filter(F.col("bm25") > 0.0)
            .withColumn("lex_rank", F.row_number().over(wl))
            .filter(F.col("lex_rank") <= pool)
            .select("qid", "doc_id", "lex_rank")
        )
        dense = R._dense_ranks(spark, e, topics, pool, "doc_id")
        runs = R._rrf_runs(lex, dense, R.EVAL_K, "doc_id")
        return R._anchor_caches(runs, *caches)

    def full():
        return R.search_eval_macro(d, e, topics)

    timed("tf (no persist)", tf_only)
    timed("scored (persist both levels)", scored_only)
    timed("graded_piv", graded_piv_only)
    timed("lexranks", lexranks_only)
    timed("dense_ranks", dense_only)
    timed("runs (lex+dense+rrf)", runs_only)
    timed("FULL search_eval_wide", full)
    spark.stop()


if __name__ == "__main__":
    main()
